"""Approximate-nearest-neighbor search over an embedding column.

- ``brute_force_topk``: exact cosine top-k. The query side is broadcast (ANN
  workloads have |queries| ≪ |corpus|), so the scan side never shuffles for
  the join; only the per-query top-k aggregation shuffles, keyed by query id.
  Scores are rounded before ranking so ranking is deterministic and
  cross-engine stable.

- ``lsh_bucket_topk``: the scale path — random-hyperplane LSH. Hyperplane
  components are derived from md5 (deterministic, reproducible on any
  engine/cluster); vectors meet only within matching bucket signatures, so
  the candidate set is bucket-local. Recall vs brute force is measured in
  tests (and is a tunable of n_planes/n_tables, as in standard LSH practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import cosine_sim_expr


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(q_id, neighbor_id, rank, cosine): exact top-k per query, self-matches
    excluded. Deterministic rank: (cosine 4dp desc, neighbor_id asc)."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"), F.col(vec_col).alias("_qv")
        )
    )
    c = emb.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    scored = (
        c.join(q, F.col("q_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            F.round(F.expr(cosine_sim_expr("_qv", "_cv")), 4).cast("double"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )


def hyperplanes_expr(dim: int, n_planes: int, seed: int = 42) -> str:
    """array<array<double>> of deterministic pseudo-random hyperplanes:
    component (j, i) = h64(md5('p:seed:j:i')) scaled to [-0.5, 0.5)."""
    comp = (
        f"CAST(conv(substr(md5(concat('p:{seed}:', j, ':', i)), 1, 15), 16, 10) AS BIGINT)"
    )
    return (
        f"transform(sequence(0, {n_planes - 1}), j -> "
        f"transform(sequence(0, {dim - 1}), i -> "
        f"(CAST(pmod({comp}, 1000) AS DOUBLE) / 1000.0) - 0.5))"
    )


def lsh_bucket_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: MULTI-TABLE sign-pattern LSH. Each of ``n_tables``
    hash tables uses ``n_planes`` independent hyperplanes; a corpus vector is
    a candidate for a query if they share a bucket in ANY table (standard
    recall amplification: miss prob = (1 - p^n_planes)^n_tables). Bucket
    signatures are computed narrow (HOF); the candidate join is keyed on
    (table, bucket); exact cosine rerank on candidates only."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(emb.sparkSession)
    total_planes = n_planes * n_tables
    planes = hyperplanes_expr(dim, total_planes, seed)
    buckets = f"""
    transform(sequence(0, {n_tables - 1}), t ->
      concat_ws('', transform(slice({planes}, t * {n_planes} + 1, {n_planes}), p ->
        CASE WHEN aggregate(zip_with(p, {vec_col}, (a, b) -> a * CAST(b AS DOUBLE)),
                            CAST(0 AS DOUBLE), (acc, v) -> acc + v) >= 0
             THEN '1' ELSE '0' END)))
    """.strip()
    cb = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        F.posexplode(F.expr(buckets)).alias("_table", "_bucket"),
    )
    qb = F.broadcast(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("_qv"),
            F.posexplode(F.expr(buckets)).alias("_table", "_bucket"),
        )
    )
    candidates = (
        cb.join(qb, on=["_table", "_bucket"])
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "_qv", "neighbor_id", "_cv")
        .dropDuplicates(["q_id", "neighbor_id"])
    )
    scored = candidates.withColumn(
        "cosine",
        F.round(F.expr(cosine_sim_expr("_qv", "_cv")), 4).cast("double"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", "cosine")
    )
