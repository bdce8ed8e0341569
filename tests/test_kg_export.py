"""Characteristic sets + embedding-training export (operators/kg_export.py).

The oracle replay for the two registered queries lives in
test_registry_oracles.py (they are pytest-carried); this file pins the
operator semantics on planted graphs and the SCALE property the module
exists for — no SinglePartition exchange in the export plan.
"""

from pyspark.sql import functions as F

from extract_address_ner_spark.operators.kg_export import (
    characteristic_sets,
    embedding_training_export,
)

EDGE_SCHEMA = "subj string, pred string, obj string, confidence double"


def _toy_edges(spark):
    rows = [
        # a: two preds (one of them twice); b: one pred; c: one pred
        ("a", "mentions", "x", 0.9),
        ("a", "mentions", "y", 0.9),
        ("a", "located_in", "r1", 1.0),
        ("b", "mentions", "x", 0.9),
        ("c", "located_in", "r1", 1.0),
    ]
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def test_characteristic_sets_grouping(spark):
    got = {
        r["pred_set"]: (r["n_subjects"], r["n_triples"])
        for r in characteristic_sets(_toy_edges(spark)).collect()
    }
    assert got == {
        "located_in,mentions": (1, 3),  # a
        "mentions": (1, 1),  # b
        "located_in": (1, 1),  # c
    }


def test_predicate_stats(spark):
    from extract_address_ner_spark.operators.kg_export import predicate_stats

    got = {
        r["pred"]: (r["n_triples"], r["n_subjects"], r["n_objects"])
        for r in predicate_stats(_toy_edges(spark)).collect()
    }
    assert got == {"mentions": (3, 2, 2), "located_in": (2, 2, 1)}


def test_schema_graph(spark):
    from extract_address_ner_spark.operators.kg_export import schema_graph

    nodes = spark.createDataFrame(
        [("a", "file"), ("b", "file"), ("c", "address"),
         ("x", "address"), ("y", "address"), ("r1", "region")],
        "node_id string, node_type string",
    )
    got = {
        (r["src_type"], r["pred"], r["dst_type"]):
            (r["n_edges"], r["n_src"], r["n_dst"])
        for r in schema_graph(_toy_edges(spark), nodes).collect()
    }
    assert got == {
        # a→x, a→y, b→x : 3 edges, 2 files, 2 addresses
        ("file", "mentions", "address"): (3, 2, 2),
        # a→r1 (a is a file), c→r1 (c is an address) — split by src type
        ("file", "located_in", "region"): (1, 1, 1),
        ("address", "located_in", "region"): (1, 1, 1),
    }


def test_embed_export_semantics(spark):
    edges = _toy_edges(spark)
    out = embedding_training_export(edges, k=2, seed=7)
    rows = out.collect()
    pos = {(r.subj, r.pred, r.obj) for r in rows if r.label == 1}
    neg = {(r.subj, r.pred, r.obj) for r in rows if r.label == 0}
    assert {r.label for r in rows} <= {0, 1}
    # positives are exactly the distinct input triples
    assert pos == {
        (r.subj, r.pred, r.obj)
        for r in edges.select("subj", "pred", "obj").distinct().collect()
    }
    # filtered protocol: no negative is a true triple, none collide with pos
    assert not (neg & pos)
    # ≤ k negatives per positive, and at least one survived the filter
    assert 0 < len(neg) <= 2 * len(pos)
    # every negative's object is a real graph node
    nodes = {
        r.n
        for r in edges.select(F.col("subj").alias("n"))
        .unionByName(edges.select(F.col("obj").alias("n")))
        .distinct()
        .collect()
    }
    assert {o for (_, _, o) in neg} <= nodes


def test_embed_export_deterministic(spark):
    edges = _toy_edges(spark)
    a = sorted(map(tuple, embedding_training_export(edges, k=2).collect()))
    b = sorted(map(tuple, embedding_training_export(edges, k=2).collect()))
    assert a == b
    # a different seed draws different corruptions (same positives)
    c = embedding_training_export(edges, k=2, seed=99)
    neg_a = {t[:3] for t in a if t[3] == 0}
    neg_c = {(r.subj, r.pred, r.obj) for r in c.collect() if r.label == 0}
    assert neg_a != neg_c


def test_embed_export_plan_has_no_single_partition_window(spark):
    """The scale pin: node ranking is salt-bucketed, so NOTHING in the
    export plan funnels through one task. A global row_number() (the naive
    formulation) would show `Exchange SinglePartition` feeding the Window."""
    out = embedding_training_export(_toy_edges(spark), k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan
    assert "Window" in plan  # the in-bucket ranking is really a window
