"""Deterministic train/test splitting (reference R1 analogue).

The reference uses sklearn ``train_test_split(test_size=0.2, random_state=42,
stratify=is_address)`` with a small-data fallback
(app/utils/preprocess.py:225-279). sklearn's exact row membership is not
reproducible distributed, so the distributed split is HASH-based: a row's
split is a pure function of its key — reproducible on any cluster, any
partitioning, any engine (md5-derived, so the DuckDB oracle reproduces it
exactly), and naturally stratified in expectation since the hash is uniform
within every class.

``split_report`` reproduces the reference's split-distribution report
(preprocess.py:268-277) as a groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

M31 = 2147483647


def split_hash_expr(key_col: str, seed: int = 42, buckets: int = 100) -> str:
    """Deterministic bucket in [0, buckets) from an md5-derived hash of
    (seed, key) — identical in Spark and DuckDB."""
    return (
        f"CAST(conv(substr(md5(concat('{seed}:', {key_col})), 1, 15), 16, 10) "
        f"AS BIGINT) % {buckets}"
    )


def with_split(
    df: DataFrame,
    key_col: str = "doc_id",
    test_fraction: float = 0.2,
    seed: int = 42,
) -> DataFrame:
    """Adds ``split`` ∈ {train, test}: test iff hash bucket < 100·fraction.
    Mirrors the reference's 80/20 default and its seed discipline
    (random_state=42, preprocess.py:225)."""
    cut = int(round(test_fraction * 100))
    return df.withColumn(
        "split",
        F.when(
            F.expr(split_hash_expr(key_col, seed)) < cut, F.lit("test")
        ).otherwise(F.lit("train")),
    )


def split_report(
    df: DataFrame, label_col: str, key_col: str = "doc_id",
    test_fraction: float = 0.2, seed: int = 42,
) -> DataFrame:
    """(split, label, n) — the reference's distribution printout
    (preprocess.py:268-277) as a relational result."""
    return (
        with_split(df, key_col, test_fraction, seed)
        .groupBy("split", label_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
