"""Incremental KG construction (round 4): streaming edge-delta merge into a
snapshot-versioned warehouse table must converge to exactly the batch
``build_edges`` result, and a replayed micro-batch (foreachBatch re-executes
its last batch after a failure) must be a no-op, not a double-count."""

from pyspark.sql import functions as F

from extract_address_ner_spark import entry_queries_streaming as ES
from extract_address_ner_spark.operators.canonicalize import canonicalize_mentions
from extract_address_ner_spark.operators.link import build_edges
from extract_address_ner_spark.operators.tagger import extract_mentions
from extract_address_ner_spark.operators.validate import road_address_gate
from extract_address_ner_spark.sources import corpus as C


def _edge_rows(df):
    return sorted(
        map(tuple, df.select("subj", "pred", "obj", "confidence").collect())
    )


def test_streaming_edges_equals_batch(spark, sf_smoke):
    """The driver query end-to-end: three drops through streaming
    extraction + foreachBatch merge == one batch build_edges pass."""
    batch = build_edges(
        canonicalize_mentions(
            road_address_gate(
                extract_mentions(C.corpus_from_documents(spark, sf_smoke))
            )
        )
    )
    streamed = ES.q_streaming_edges(spark, sf_smoke)
    assert _edge_rows(streamed) == _edge_rows(batch)


def test_merge_replay_is_idempotent(spark, sf_smoke, tmp_path):
    """merge_edge_snapshot is max-merge: re-running a batch against the
    snapshot it already produced changes nothing, and drop order does not
    change the final table."""
    corpus = C.corpus_from_documents(spark, sf_smoke)

    def delta(part):
        return build_edges(
            canonicalize_mentions(
                road_address_gate(
                    extract_mentions(corpus.filter(F.col("doc_id") % 2 == part))
                )
            )
        )

    root_a = str(tmp_path / "a")
    ES.merge_edge_snapshot(delta(0), root_a, 0)
    ES.merge_edge_snapshot(delta(1), root_a, 1)
    final_a = _edge_rows(ES._latest_edge_snapshot(spark, root_a))

    # replay of batch 1 (same delta, same id) must reproduce v1 exactly
    ES.merge_edge_snapshot(delta(1), root_a, 1)
    assert _edge_rows(ES._latest_edge_snapshot(spark, root_a)) == final_a

    # reversed drop order converges to the same final table
    root_b = str(tmp_path / "b")
    ES.merge_edge_snapshot(delta(1), root_b, 0)
    ES.merge_edge_snapshot(delta(0), root_b, 1)
    assert _edge_rows(ES._latest_edge_snapshot(spark, root_b)) == final_a


def test_snapshot_diff_reads_the_versioned_table(spark, sf_smoke, tmp_path):
    """snapshot_diff over merge_edge_snapshot's versions: additions are
    exactly the edges the later drop introduced, nothing is removed by a
    pure merge, and a synthetic removal IS reported (the diff is
    symmetric, not additions-only)."""
    corpus = C.corpus_from_documents(spark, sf_smoke)

    def delta(pred):
        return build_edges(
            canonicalize_mentions(
                road_address_gate(extract_mentions(corpus.filter(pred)))
            )
        )

    root = str(tmp_path / "w")
    ES.merge_edge_snapshot(delta("doc_id % 3 = 0"), root, 0)
    v0 = ES._latest_edge_snapshot(spark, root)
    ES.merge_edge_snapshot(delta("doc_id % 3 != 0"), root, 1)
    v1 = ES._latest_edge_snapshot(spark, root)

    d = {r["pred"]: r for r in ES.snapshot_diff(v0, v1).collect()}
    full = _edge_rows(delta("true"))
    old = _edge_rows(v0)
    assert all(r["n_removed"] == 0 for r in d.values())
    assert sum(r["n_new"] for r in d.values()) == len(full)
    added_expected = len(full) - len(old)
    assert sum(r["n_added"] for r in d.values()) == added_expected > 0

    # synthetic removal: drop one located_in edge from the new side
    import pyspark.sql.functions as F  # noqa: N812
    one = v1.filter("pred = 'located_in'").limit(1).collect()[0]
    pruned = v1.filter(
        ~((F.col("subj") == one["subj"]) & (F.col("pred") == one["pred"])
          & (F.col("obj") == one["obj"])))
    d2 = {r["pred"]: r for r in ES.snapshot_diff(v1, pruned).collect()}
    assert d2["located_in"]["n_removed"] == 1
    assert d2["located_in"]["n_added"] == 0
