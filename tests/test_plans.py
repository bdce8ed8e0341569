"""Physical-plan regression pins for the scale claims in PLANS.md.

These assert the plan SHAPE (join strategy, top-k operator, partial
aggregation, scan pruning/pushdown), not timings — the properties that
decide whether an operator survives a 100× scale-up. If a refactor or a
Spark upgrade silently degrades one (broadcast → sort-merge, top-k →
global sort, pruned scan → full scan), these fail before any benchmark
does.
"""

from pyspark.sql import functions as F

from extract_address_ner_spark.operators import ann
from extract_address_ner_spark.operators.canonicalize import canonicalize_mentions
from extract_address_ner_spark.operators.link import build_edges
from extract_address_ner_spark.operators.tagger import extract_mentions
from extract_address_ner_spark.operators.validate import road_address_gate
from extract_address_ner_spark.sources import corpus as C


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_graph_edges_joins_are_broadcast_only(spark, sf_smoke):
    """The 100 TB fact side must never shuffle for the dimension joins:
    BroadcastHashJoin only, zero SortMergeJoin in the full KG chain."""
    edges = build_edges(
        canonicalize_mentions(
            road_address_gate(
                extract_mentions(C.corpus_from_documents(spark, sf_smoke))
            )
        )
    )
    plan = _plan(edges)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 1


def test_events_latest_n_is_take_ordered(spark, sf_smoke):
    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    topk = ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(100)
    plan = _plan(topk)
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no global sort operator


def test_seed_centroids_is_take_ordered(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    plan = _plan(ann.seed_centroids(emb, n_centroids=32))
    assert "TakeOrderedAndProject" in plan


def test_ivf_assign_argmax_is_partially_aggregated(spark, sf_smoke):
    """The nearest-centroid argmax must be max(struct(...)) with a map-side
    partial (one combined row per vector crosses the shuffle), NOT a
    row_number window (which would shuffle-and-sort every scored row)."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    cents = ann.seed_centroids(emb, n_centroids=32)
    plan = _plan(ann.ivf_assign(emb, cents))
    assert "partial_max" in plan
    assert "Window" not in plan


def test_corpus_scan_is_pruned_to_needed_columns(spark, sf_smoke):
    """documents has (doc_id, text, lang, ...); the mention pipeline must
    read exactly the columns the derivation uses — at 100 TB a scan that
    reads extra columns is wrong."""
    m = extract_mentions(C.corpus_from_documents(spark, sf_smoke))
    plan = _plan(m)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    cols = {c.split(":")[0] for s in schemas for c in s.split(",") if c}
    assert cols == {"doc_id", "text", "lang"}


def test_ann_query_filter_pushed_to_scan(spark, sf_smoke):
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    queries = emb.filter("vec_id < 5")
    plan = _plan(ann.brute_force_topk(emb, queries, k=10))
    assert "LessThan(vec_id,5)" in plan  # PushedFilters reaches parquet


def test_repo_counts_aggregation_has_map_side_partial(spark, sf_smoke):
    from extract_address_ner_spark.operators.link import repo_mention_counts

    m = extract_mentions(C.corpus_from_documents(spark, sf_smoke))
    plan = _plan(repo_mention_counts(m))
    assert "partial_" in plan  # partial agg before every exchange


def _built_edges(spark, sf_smoke):
    return build_edges(
        canonicalize_mentions(
            road_address_gate(
                extract_mentions(C.corpus_from_documents(spark, sf_smoke))
            )
        )
    )


def test_graph_queries_no_sort_merge_join(spark, sf_smoke):
    """Round-3 read-side KG queries: every join must be broadcast (the
    located_in / backbone sides are dimensions bounded by the address
    vocabulary); a SortMergeJoin here would shuffle the 100 TB fact side."""
    from extract_address_ner_spark.operators import graph_query as GQ

    edges = _built_edges(spark, sf_smoke)
    for df in (
        GQ.degree_distribution(edges),
        GQ.top_addresses_per_repo(edges),
        GQ.region_rollup(edges),
    ):
        plan = _plan(df)
        assert "SortMergeJoin" not in plan
        assert "ShuffledHashJoin" not in plan


def test_refine_centroids_mean_is_partially_aggregated(spark, sf_smoke):
    """The element-wise centroid mean must show partial_avg BEFORE its
    exchange — the posexplode is pipelined into a map-side combine, so the
    shuffle carries at most n_centroids x dim partial rows per partition,
    never n x dim exploded rows."""
    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    plan = _plan(ann.refine_centroids(emb, ann.seed_centroids(emb, 32), 1))
    assert "partial_avg" in plan
    assert "SortMergeJoin" not in plan


def test_bucketed_edges_aggregate_is_shuffle_free(spark, sf_smoke, tmp_path):
    """Round-3 storage-layer co-location: subj-keyed aggregation over the
    bucketed edge table must plan with ZERO Exchange (bucket files ARE the
    partitioning) and scan only the subj column."""
    from extract_address_ner_spark.operators.link import write_edges_bucketed

    edges = _built_edges(spark, sf_smoke)
    t = write_edges_bucketed(edges, table="kg_edges_bucketed_test",
                             n_buckets=8)
    agg = t.groupBy("subj").agg(F.count(F.lit(1)).alias("degree"))
    plan = _plan(agg)
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan
    # row parity with the unbucketed aggregate
    direct = edges.groupBy("subj").agg(F.count(F.lit(1)).alias("degree"))
    assert sorted(map(tuple, agg.collect())) == sorted(
        map(tuple, direct.collect()))
    spark.sql("DROP TABLE kg_edges_bucketed_test")


def test_ivf_index_probe_scan_is_partition_pruned(spark, sf_smoke, tmp_path):
    """Round-4 serving shape: a probe against the materialized IVF index
    must push the probed-cluster predicate into the scan's
    PartitionFilters (static literal IN-list → pruning at planning time),
    and the pruned scan must touch only the probed cluster directories —
    nprobe of n_centroids — never the full index."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{sf_smoke}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    ann.write_ivf_index(emb, idx, n_centroids=16)
    served = ann.ivf_topk_from_index(spark, idx, emb.filter("vec_id < 3"),
                                     k=5, nprobe=2)
    plan = _plan(served)
    # the IN-list lands in PartitionFilters with the attribute id baked in
    # (e.g. "PartitionFilters: [cluster_id#71 IN (9,14)") — match the
    # pruning site, not a bare substring the #id would break
    import re
    assert re.search(r"PartitionFilters: \[cluster_id#\d+ IN \(", plan), plan
    # ground truth on the filesystem: exactly one parquet dir per cluster
    # (small-files discipline), and a probed read lists only probed dirs
    import os
    dirs = [d for d in os.listdir(f"{idx}/vectors")
            if d.startswith("cluster_id=")]
    assert len(dirs) == 16
    one = int(dirs[0].split("=")[1])
    pruned = spark.read.parquet(f"{idx}/vectors").filter(
        F.col("cluster_id") == one)
    assert pruned.collect()  # execute THIS df so its scan metrics populate
    # ground truth from the executed scan node itself: 1 of 16 cluster
    # directories actually read. (inputFiles() is no evidence — it lists
    # the whole relation, ignoring partition pruning.)
    leaves = pruned._jdf.queryExecution().executedPlan().collectLeaves()
    nums = {}
    for i in range(leaves.size()):
        it = leaves.apply(i).metrics().iterator()
        while it.hasNext():
            kv = it.next()
            nums[kv._1()] = kv._2().value()
    assert nums.get("numFiles") == 1 and nums.get("numPartitions") == 1, nums


def test_asof_join_is_single_shuffle_no_join(spark, sf_smoke):
    """The as-of join's reason to exist: the naive theta-join formulation
    has per-key quadratic candidate output; the union+window formulation
    must plan with ZERO join operators and exactly ONE exchange (the
    key-partitioned window sort)."""
    from extract_address_ner_spark.operators.temporal import asof_join

    ev = spark.read.parquet(f"{sf_smoke}/events.parquet")
    out = asof_join(
        ev.filter("event_type='click'"), ev.filter("event_type='error'"),
        on=["user_id"], right_cols=["event_id", "ts", "value"],
        tiebreak="event_id",
    )
    plan = _plan(out)
    assert "Join" not in plan, plan
    assert plan.count("Exchange") == 1, plan
    assert "Window" in plan and "Union" in plan


def test_components_round_shuffles_messages_not_labels(spark):
    """Round-4 shuffle diet for connected_components: with edges cached
    partitioned on the message source and labels cached partitioned on the
    node id, ONE propagation round must plan exactly ONE new exchange —
    the message aggregation (∝ edges) — and must never re-shuffle the
    O(nodes) label table (the old union+groupBy formulation did, every
    round). AQE/broadcast are disabled in-test to force the at-scale
    co-partitioned join shape that the claim is about."""
    from pyspark.sql import functions as F

    conf = spark.conf
    old_aqe = conf.get("spark.sql.adaptive.enabled")
    old_bc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        conf.set("spark.sql.adaptive.enabled", "false")
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        edges = (spark.range(1000)
                 .select((F.col("id") % 97).alias("_u"),
                         (F.col("id") % 89).alias("_v"))
                 .repartition(F.col("_u")).persist())
        labels = (spark.range(200)
                  .select(F.col("id").alias("_id"), F.col("id").alias("_lab"))
                  .repartition(F.col("_id")).persist())
        edges.count(); labels.count()
        msgs = edges.join(labels, edges["_u"] == labels["_id"]).select(
            F.col("_v").alias("_id"), "_lab")
        mm = msgs.groupBy("_id").agg(F.min("_lab").alias("_m"))
        new_labels = labels.join(mm, "_id", "left").select(
            "_id", F.least(F.col("_lab"),
                           F.coalesce(F.col("_m"), F.col("_lab"))).alias("_lab"))

        def count_ex(p):
            if "InMemoryTableScan" in p.nodeName():
                return 0  # the cache boundary: its child plan is history
            c = 1 if "Exchange" in p.nodeName() else 0
            ch = p.children()
            return c + sum(count_ex(ch.apply(i)) for i in range(ch.size()))

        n_ex = count_ex(new_labels._jdf.queryExecution().executedPlan())
        assert n_ex == 1, n_ex
    finally:
        conf.set("spark.sql.adaptive.enabled", old_aqe)
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        edges.unpersist(); labels.unpersist()


def test_integrity_report_anti_join_budget(spark):
    """integrity_report (round 5): exactly THREE anti-joins in the whole
    eight-check plan — Catalyst distributes the unpivoted-endpoint
    dangling join across the union's two branches (one LeftAnti per
    endpoint direction, each edge endpoint tested exactly once) plus the
    orphan check — and the three row-level checks (self-loop, confidence
    range, unknown pred) fold into aggregates rather than extra joins."""
    from extract_address_ner_spark.operators.graph_query import (
        integrity_report,
    )

    edges = spark.createDataFrame(
        [("a", "p", "b", 0.9)],
        "subj string, pred string, obj string, confidence double",
    )
    nodes = spark.createDataFrame(
        [("a", "t"), ("b", "t")], "node_id string, node_type string"
    )
    plan = _plan(integrity_report(edges, nodes, ontology=(("p", "t", "t"),)))
    assert plan.count("LeftAnti") == 3, plan


def test_comention_pair_join_runs_on_capped_preaggregated_sets(spark, sf_smoke):
    """comention_pairs (round 5): the pair self-join must consume the
    rank-CAPPED per-repo sets built from pre-aggregated (repo, address)
    counts — partial aggregation (map-side combine) feeding a bounded
    Window — never raw corpus-sized mention rows on either join side."""
    from extract_address_ner_spark.entry_queries import _built_edges
    from extract_address_ner_spark.operators.graph_query import (
        comention_pairs,
    )

    plan = _plan(comention_pairs(_built_edges(spark, sf_smoke)))
    assert "partial_count" in plan, plan      # map-side combine
    assert "Window" in plan, plan             # the rank cap
    assert "row_number" in plan, plan


def test_triangle_stats_no_cartesian_equi_joins_only(spark):
    """triangle_stats (round 5): every join in the degree-oriented wedge
    enumeration is a keyed equi-join — the apex-keyed wedge self-join and
    the (lo, hi) closing-edge probe must never degrade to a cartesian /
    broadcast-nested-loop product, and the degree aggregation must keep
    its map-side combine (what bounds the plan at 100 TB is the
    orientation, not optimizer luck)."""
    from extract_address_ner_spark.operators.graph_query import (
        triangle_stats,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")],
        "addr_a string, addr_b string",
    )
    plan = _plan(triangle_stats(pairs))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_count" in plan, plan


def test_repo_similarity_joins_on_filtered_index(spark):
    """repo_similarity (round 5): the inverted-index pair join must be a
    keyed equi-join on the address (never cartesian), the per-repo rank
    cap must run as a bounded Window over PRE-AGGREGATED counts
    (partial_count = map-side combine), and the document-frequency
    filter must appear as an aggregate-then-join — the two quadratic
    bounds are plan structure, not optimizer luck."""
    from extract_address_ner_spark.operators.graph_query import (
        repo_similarity,
    )

    edges = spark.createDataFrame(
        [("r1:f", "mentions_address", "A", 0.9),
         ("r2:f", "mentions_address", "A", 0.9)],
        "subj string, pred string, obj string, confidence double",
    )
    plan = _plan(repo_similarity(edges))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_count" in plan, plan
    assert "Window" in plan, plan
    assert "row_number" in plan, plan


def test_label_propagation_no_window_no_cartesian(spark):
    """label_propagation (round 5): the per-round winner must be picked by
    the groupBy-min-over-(−count, label)-struct trick — NO Window/sort in
    the plan (a hub's candidate labels are aggregated, never sorted) —
    and every join must stay a keyed equi-join."""
    from extract_address_ner_spark.operators.graph_query import (
        label_propagation,
    )

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "addr_a string, addr_b string")
    plan = _plan(label_propagation(pairs, iterations=1))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "row_number" not in plan, plan
