"""Deterministic corpus sampling and source mixing.

The last stage of a training-data pipeline is subsetting: Bernoulli-sample a
cleaned corpus, take a per-group quota (per language / per source / per
domain), and mix several sources at target weights. Engine RNG sampling
(``df.sample``) is not reproducible across runs, partitionings, engines, or
retried tasks — a retried partition can emit a different subset, which breaks
the pipeline's sha256 lineage invariant. These operators make a row's
membership a pure function of ``(seed, key)`` via the repo's shared
md5-derived hash dialect (operators/split.py), so the same rows are selected
on any cluster, any partitioning, and by the DuckDB oracle bit-for-bit.

Reference tie-in: the reference's only sampling is sklearn
``train_test_split(random_state=42)`` (app/utils/preprocess.py:225-279),
whose exact membership is not distributed-reproducible; hash sampling is the
same seed-discipline idea made engine-reproducible (see operators/split.py).

Scale notes (100 TB):
- ``hash_sample`` is a pure narrow filter — no shuffle, survives predicate
  pushdown past column pruning; cost is one md5 per row.
- ``stratified_quota_sample`` bounds the per-group sort: a hash prefilter
  keeps only the ~``oversample × quota`` smallest-hash rows of each big
  group before the exact ``row_number`` window, so a mega-group (one
  language owning half the corpus) contributes a bounded window input
  instead of sorting its full row set in one task. The prefilter is a
  PREFIX of the ranking order (it cuts on the same hash the window sorts
  by), so whenever it leaves >= quota survivors the result is identical to
  the unfiltered global top-quota; groups at or below ``oversample × quota``
  rows skip the prefilter entirely, so small groups can never under-fill.
- ``mix_corpora`` computes each source's keep-fraction IN the plan (a
  broadcast one-row count joined back), so no driver-side collect and the
  whole mixture is one lazy plan per source, unioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: Hash granularity: membership cuts are expressed as integer thresholds on
#: a bucket in [0, GRAIN), so fractions are exactly representable on both
#: engines (no float-rounding divergence between Spark and DuckDB).
GRAIN = 1_000_000


def hash_bucket_sql(key_col: str, seed: int, duck: bool = False) -> str:
    """Uniform bucket in [0, GRAIN) as a pure function of (seed, key) —
    the split.py md5 idiom at sampling granularity. ``duck=True`` emits the
    DuckDB spelling (hex literal parse instead of conv)."""
    ty = "VARCHAR" if duck else "STRING"
    inner = f"substr(md5(concat('{seed}:', CAST({key_col} AS {ty}))), 1, 15)"
    if duck:
        return f"(CAST(concat('0x', {inner}) AS BIGINT) % {GRAIN})"
    return f"(CAST(conv({inner}, 16, 10) AS BIGINT) % {GRAIN})"


def _cut(fraction: float) -> int:
    return max(0, min(GRAIN, int(round(fraction * GRAIN))))


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: keep iff hash bucket < fraction·GRAIN.

    Reproducible across runs / partitionings / engines (unlike ``df.sample``,
    whose membership depends on partition layout), and consistent under
    composition: sampling at 0.5 then 0.2 with the same seed+key keeps a
    subset of the 0.5 sample (the cuts nest)."""
    return df.where(F.expr(hash_bucket_sql(key_col, seed)) < F.lit(_cut(fraction)))


def stratified_quota_sample(
    df: DataFrame,
    group_col: str,
    quota: int,
    key_col: str = "doc_id",
    seed: int = 42,
    oversample: int = 4,
) -> DataFrame:
    """Exactly ``min(quota, |group|)`` rows per group, chosen as the
    ``quota`` smallest ``(hash, key)`` rows — a deterministic per-group
    reservoir.

    Two-phase to bound skew: per-group counts (map-side combined) come back
    as a broadcast join; groups larger than ``oversample × quota`` are
    prefiltered to ``bucket < ceil(oversample·quota/|group| · GRAIN)``
    BEFORE the exact row_number window, so the one-task-per-group sort sees
    ~``oversample × quota`` rows no matter how large the group is. Because
    the prefilter cuts on the same hash the window orders by, it is a prefix
    of the ranking: with >= quota survivors (probability ~1 at
    oversample >= 4) the output equals the unfiltered global top-quota.
    Under-fill on big groups is detectable by the caller (fewer than
    ``quota`` rows for a group whose count exceeds it) and fixable by
    raising ``oversample``; small groups never prefilter, never under-fill.
    """
    clash = set(df.columns) & {"_hb", "_grp_n", "_rk"}
    if clash:
        raise ValueError(
            f"stratified_quota_sample: input columns collide with "
            f"reserved internal names: {sorted(clash)}"
        )
    bucket = F.expr(hash_bucket_sql(key_col, seed))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_grp_n"))
    thresh = oversample * quota
    pre = (
        df.withColumn("_hb", bucket)
        .join(F.broadcast(counts), group_col)
        .where(
            (F.col("_grp_n") <= F.lit(thresh))
            # thresh * GRAIN overflows int32 once oversample·quota >= 2148
            # (ANSI mode makes that a hard error) — multiply as longs
            | (F.col("_hb")
               < F.ceil(F.lit(int(thresh)).cast("long") * F.lit(GRAIN).cast("long")
                        / F.col("_grp_n")))
        )
    )
    w = Window.partitionBy(group_col).orderBy(F.col("_hb"), F.col(key_col))
    return (
        pre.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.lit(quota))
        .drop("_hb", "_grp_n", "_rk")
    )


def stratified_quota_sql(
    table_sql: str,
    group_col: str,
    quota: int,
    key_col: str = "doc_id",
    seed: int = 42,
    oversample: int = 4,
    duck: bool = True,
    select_cols: str = "*",
) -> str:
    """The exact SQL twin of ``stratified_quota_sample`` (same two-phase
    rule, so engine outputs match even in the measure-zero under-fill case).
    ``table_sql`` is a parenthesizable SELECT producing the input."""
    hb = hash_bucket_sql(key_col, seed, duck=duck)
    thresh = oversample * quota
    return f"""
WITH _in AS ({table_sql}),
_cnt AS (SELECT {group_col}, count(*) AS _grp_n FROM _in GROUP BY {group_col}),
_pre AS (
  SELECT _in.*, {hb} AS _hb, _cnt._grp_n
  FROM _in JOIN _cnt USING ({group_col})
  WHERE _cnt._grp_n <= {thresh}
     OR {hb} < CAST(ceil({thresh * GRAIN} * 1.0 / _cnt._grp_n) AS BIGINT)
),
_rk AS (
  SELECT _pre.*, row_number() OVER (
    PARTITION BY {group_col} ORDER BY _hb, {key_col}) AS _rn
  FROM _pre
)
SELECT {select_cols} FROM _rk WHERE _rn <= {quota}"""


def mix_corpora(
    parts: list[tuple[str, DataFrame, float]],
    target_total: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic weighted mixture: from each ``(name, df, weight)``
    source, keep a hash sample sized ``weight × target_total`` rows in
    expectation (capped at the source's full size), tagged with a ``source``
    column. The keep-fraction ``min(1, weight·target/|source|)`` is computed
    IN the plan — each source's count is a broadcast one-row aggregate
    joined back — so the mixture stays lazy end-to-end with no driver
    collect, and membership is the same pure (seed, key) function as
    ``hash_sample`` (so re-mixing at a higher target keeps every previously
    selected row: the cuts nest)."""
    out = None
    for name, df, weight in parts:
        clash = set(df.columns) & {"_src_n", "source_name"}
        if clash:
            raise ValueError(
                f"mix_corpora: source {name!r} columns collide with "
                f"reserved names: {sorted(clash)}"
            )
        cnt = df.agg(F.count(F.lit(1)).alias("_src_n"))
        cut = F.least(
            F.lit(GRAIN).cast("bigint"),
            F.ceil(F.lit(weight * target_total) * F.lit(GRAIN) / F.col("_src_n")),
        )
        picked = (
            df.crossJoin(F.broadcast(cnt))
            .where(F.expr(hash_bucket_sql(key_col, seed)) < cut)
            .drop("_src_n")
            .withColumn("source_name", F.lit(name))
        )
        out = picked if out is None else out.unionByName(picked)
    if out is None:
        raise ValueError("mix_corpora: no sources given")
    return out


def mix_corpora_sql(
    parts: list[tuple[str, str, float]],
    target_total: int,
    key_col: str = "doc_id",
    seed: int = 42,
    duck: bool = True,
    select_cols: str = "*",
) -> str:
    """SQL twin of ``mix_corpora``: ``parts`` holds (name, table SELECT,
    weight); per-source count via scalar subquery, identical cut rule."""
    hb = hash_bucket_sql(key_col, seed, duck=duck)
    pieces = []
    for name, table_sql, weight in parts:
        pieces.append(f"""
SELECT {select_cols}, '{name}' AS source_name FROM ({table_sql}) _s
WHERE {hb} < least(CAST({GRAIN} AS BIGINT),
  CAST(ceil({weight * target_total} * {GRAIN} * 1.0
       / (SELECT count(*) FROM ({table_sql}) _c)) AS BIGINT))""")
    return "\nUNION ALL\n".join(pieces)
