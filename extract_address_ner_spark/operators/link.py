"""Entity linking + graph materialization (SURVEY.md §2.9, north_star).

Produces the KG tables:

- ``edges(subj, pred, obj, confidence)`` with pred ∈
  {mentions_address, located_in}
- ``nodes(node_id, node_type, attrs)`` with node_type ∈
  {file, address, admin_region}

Skew: repos are Zipf-distributed (one mega-repo can hold ~half the corpus)
and canonical address ids are few and hot. Aggregations keyed on either are
therefore two-phase SALTED: partial aggregate on (key, salt) — map-side
combine spreads the hot key over ``n_salts`` reducers — then final aggregate
on key. ``salted_agg`` is the generic operator; AQE skew-join splitting
covers the join side (session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.admin_regions import hierarchy_edges


def salted_partials(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_seed: int = 42,
) -> DataFrame:
    """Phase 1 of salted aggregation: aggregate within (keys, salt). Exposed
    so tests can assert the skew bound directly — a hot key's rows land in
    ~n_salts groups of ~|hot|/n_salts rows each, so no single reducer sees
    the whole key.

    The salt MUST vary within a group: both production call sites
    (repo_mention_counts feeds only the group key; build_edges' only
    non-key column is a per-tagger-constant confidence) have every non-key
    column constant within the hot group, so any salt derived from column
    VALUES degenerates to one salt per key and phase 1 becomes a plain
    groupBy — silently, exactly where the salt is supposed to defend.

    The salt is ``pmod(hash(spark_partition_id() + seed), n_salts)``:

    - It varies within a hot group because a key is only HOT when its rows
      span many input partitions — each partition contributes its own salt,
      so the key spreads over ~min(n_partitions, n_salts) partials. (A key
      confined to ONE partition gets one salt, which is fine: phase-1
      map-side aggregation collapses it locally to a single row and no
      reducer ever sees its raw rows.)
    - It is DETERMINISTIC under stage retries: the salt is constant per
      partition and independent of intra-partition row ORDER, so a
      recomputed map task emits identical partials even though shuffle
      fetch order differs between attempts. (A per-row ordinal salt like
      monotonically_increasing_id would make retried partials disagree
      with the first attempt's — reducers holding a mix of attempt-1 and
      attempt-2 blocks would double-count or drop rows.)
    - ``pmod`` not ``abs``: under ANSI mode (Spark 4 default)
      ``abs(hash(...))`` raises ARITHMETIC_OVERFLOW when the 32-bit hash
      lands exactly on Int.MinValue (~1 row in 2^32 — near-certain at
      100 TB scale)."""
    salt = F.pmod(
        F.hash(F.spark_partition_id() + F.lit(salt_seed)), F.lit(n_salts)
    ).alias("_salt")
    return df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(*partial_aggs)


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    n_salts: int = 16,
    salt_seed: int = 42,
) -> DataFrame:
    """Two-phase aggregation defeating hot-key skew.

    ``partial_aggs`` aggregate within (keys, salt); ``final_aggs`` combine the
    partials per key (they see the partial columns by alias).
    """
    partial = salted_partials(df, keys, partial_aggs, n_salts, salt_seed)
    return partial.groupBy(*keys).agg(*final_aggs)


def mention_edges(canonical_mentions: DataFrame) -> DataFrame:
    """(repo:path, mentions_address, canonical_id) triples, deduped with max
    confidence per triple. Generalizes the reference's D5 result rows into the
    edge table (reference result shape: app/models/address.py:9-13)."""
    m = canonical_mentions.filter(F.col("canonical_id").isNotNull())
    return salted_agg(
        m.select(
            F.concat_ws(":", "repo", "path").alias("subj"),
            F.lit("mentions_address").alias("pred"),
            F.col("canonical_id").alias("obj"),
            F.col("confidence"),
        ),
        keys=("subj", "pred", "obj"),
        partial_aggs=[F.max("confidence").alias("_pc")],
        final_aggs=[F.max("_pc").alias("confidence")],
    )


def located_in_edges(canonical_mentions: DataFrame) -> DataFrame:
    """(canonical_address, located_in, admin_region) + the static region
    hierarchy backbone (admin_regions parent links)."""
    spark = canonical_mentions.sparkSession
    addr_region = (
        canonical_mentions.filter(F.col("canonical_id").isNotNull())
        .select(
            F.col("canonical_id").alias("subj"),
            F.lit("located_in").alias("pred"),
            F.col("region_id").alias("obj"),
        )
        .dropDuplicates(["subj", "pred", "obj"])
        .withColumn("confidence", F.lit(1.0))
    )
    backbone = spark.createDataFrame(
        hierarchy_edges(), "subj string, pred string, obj string"
    ).withColumn("confidence", F.lit(1.0))
    return addr_region.unionByName(backbone)


def build_edges(canonical_mentions: DataFrame, persist: bool = False) -> DataFrame:
    """Both edge families in ONE pass: each canonical mention emits its
    mentions_address edge and its located_in edge (a 2-element inline
    explode), then a single salted two-phase aggregate dedupes/maxes
    confidence for both families at once. The upstream extraction DAG runs
    exactly once with NO caching — at 3M rows the previous
    persist-then-two-branches formulation spent more time writing cache
    blocks under 32-thread MemoryStore contention than recomputing
    (+70s @32c) and doubled the shuffles.

    The static region hierarchy backbone is unioned afterwards (tiny)."""
    if persist:
        canonical_mentions = canonical_mentions.persist()
    m = canonical_mentions.filter(F.col("canonical_id").isNotNull())
    both = m.select(
        F.explode(
            F.array(
                F.struct(
                    F.concat_ws(":", "repo", "path").alias("subj"),
                    F.lit("mentions_address").alias("pred"),
                    F.col("canonical_id").alias("obj"),
                    F.col("confidence").alias("confidence"),
                ),
                F.struct(
                    F.col("canonical_id").alias("subj"),
                    F.lit("located_in").alias("pred"),
                    F.col("region_id").alias("obj"),
                    F.lit(1.0).alias("confidence"),
                ),
            )
        ).alias("_e")
    ).select("_e.subj", "_e.pred", "_e.obj", "_e.confidence")
    deduped = salted_agg(
        both,
        keys=("subj", "pred", "obj"),
        partial_aggs=[F.max("confidence").alias("_pc")],
        final_aggs=[F.max("_pc").alias("confidence")],
    )
    spark = canonical_mentions.sparkSession
    backbone = spark.createDataFrame(
        hierarchy_edges(), "subj string, pred string, obj string"
    ).withColumn("confidence", F.lit(1.0))
    return deduped.unionByName(backbone)


def build_nodes(canonical_mentions: DataFrame) -> DataFrame:
    """nodes(node_id, node_type, attrs map<string,string>)."""
    spark = canonical_mentions.sparkSession
    m = canonical_mentions.filter(F.col("canonical_id").isNotNull())
    files = (
        m.select(
            F.concat_ws(":", "repo", "path").alias("node_id"),
            F.col("repo"),
        )
        .dropDuplicates(["node_id"])
        .select(
            "node_id",
            F.lit("file").alias("node_type"),
            F.create_map(F.lit("repo"), F.col("repo")).alias("attrs"),
        )
    )
    addrs = (
        m.select(F.col("canonical_id").alias("node_id"), F.col("canonical_addr"))
        .dropDuplicates(["node_id"])
        .select(
            "node_id",
            F.lit("address").alias("node_type"),
            F.create_map(F.lit("text"), F.col("canonical_addr")).alias("attrs"),
        )
    )
    from ..sources.admin_regions import ADMIN_REGIONS

    regions = spark.createDataFrame(
        [(rid, name) for rid, name, _lvl, _p, _a in ADMIN_REGIONS],
        "node_id string, name string",
    ).select(
        "node_id",
        F.lit("admin_region").alias("node_type"),
        F.create_map(F.lit("name"), F.col("name")).alias("attrs"),
    )
    return files.unionByName(addrs).unionByName(regions)


def write_edges_bucketed(
    edges: DataFrame,
    table: str = "kg_edges_bucketed",
    n_buckets: int = 64,
    mode: str = "overwrite",
) -> DataFrame:
    """Materialize the edge table BUCKETED by subj (bucketBy + sortBy into
    the session catalog) and return the bucketed read. Read-side queries
    keyed on subj — degree counts, per-node rollups, self-joins on subj —
    then plan with ZERO Exchange: the bucket files are the co-location
    (`SelectedBucketsCount` in the scan, partial+final HashAggregate with
    no shuffle between; pinned by tests/test_plans.py). This is the §2.6
    storage-layer answer to the same problem `salted_agg` solves at
    shuffle time: write once bucketed, aggregate forever shuffle-free.

    At 100 TB: n_buckets should be sized so a bucket fits one task
    (corpus_edges/n_buckets rows); a pathologically hot subj concentrates
    in ONE bucket's task — streaming aggregation keeps memory flat, but
    for wall-clock-critical reads on extremely skewed keys the salted
    shuffle path remains the fallback. Catalog note: bucketing metadata
    lives in the session catalog (saveAsTable) — on a cluster this is the
    Hive/Iceberg metastore; plain `.parquet()` writes cannot carry it.

    The write REPARTITIONS on the bucket key first (round 4): Spark emits
    one file per (write task × bucket it holds rows of), so bucketing a
    W-task upstream directly produces up to W × n_buckets files — measured
    1033 files for a 25-file edge stage, with every read-side scan paying
    the per-file open cost (3-4× slower reads at 1.3M edges; at 100 TB it
    is a small-files catastrophe). ``repartition(n_buckets, subj)`` uses
    the same pmod(Murmur3) assignment as the bucket spec, so each task
    holds exactly one bucket and the table lands as exactly n_buckets
    files; the extra exchange is one-time write cost, the read-side
    co-location is forever."""
    (
        edges.repartition(n_buckets, F.col("subj"))
        .write.bucketBy(n_buckets, "subj")
        .sortBy("subj")
        .mode(mode)
        .format("parquet")
        .saveAsTable(table)
    )
    return edges.sparkSession.table(table)


def repo_mention_counts(canonical_mentions: DataFrame, n_salts: int = 16) -> DataFrame:
    """Per-repo mention counts — the canonical hot-key aggregation (the
    mega-repo holds ~half the rows), done salted two-phase."""
    return salted_agg(
        canonical_mentions.select("repo"),
        keys=("repo",),
        partial_aggs=[F.count(F.lit(1)).alias("_pc")],
        final_aggs=[F.sum("_pc").alias("n_mentions")],
    )
