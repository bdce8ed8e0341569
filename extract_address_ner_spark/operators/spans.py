"""Span-derivation projections (reference P2/P3) and small lifecycle guards
(P5, A6, A8 analogues).

- ``full_text_span``: P2 (preprocess.py:46-59) — a positive row's span is
  the whole text; negatives get (0, 0).
- ``derive_span_by_locate``: P3 (train_service.py:401-421) — find the
  address substring's FIRST occurrence: ``start = locate(addr, text) - 1``
  (Spark locate is 1-based where the reference's str.find is 0-based — the
  off-by-one is handled here, SURVEY.md §7 "hard parts"), ``end = start +
  length(addr)``; rows where the address does not occur get start = -1
  (the reference pre-checks membership, train_service.py:409).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def full_text_span(df: DataFrame, text_col: str = "text",
                   label_col: str = "is_address") -> DataFrame:
    """P2: start/end projection for whole-text addresses."""
    pos = F.col(label_col) == 1
    return df.withColumn(
        "span_start", F.when(pos, F.lit(0)).otherwise(F.lit(0))
    ).withColumn(
        "span_end", F.when(pos, F.length(text_col)).otherwise(F.lit(0))
    )


def derive_span_by_locate(
    df: DataFrame, text_col: str = "text", addr_col: str = "address"
) -> DataFrame:
    """P3: first-occurrence span of addr inside text (0-based, exclusive
    end); -1/-1 when absent."""
    start = F.expr(f"locate({addr_col}, {text_col}) - 1")
    found = start >= 0
    return df.withColumn(
        "span_start", F.when(found, start).otherwise(F.lit(-1)).cast("int")
    ).withColumn(
        "span_end",
        F.when(found, start + F.length(addr_col)).otherwise(F.lit(-1)).cast("int"),
    )


def should_retrain(df: DataFrame, min_rows: int = 10) -> bool:
    """P5 (app/main.py:76-78): skip the refresh job when fewer than
    ``min_rows`` feedback rows exist. Driver-side count on a tiny table."""
    return df.limit(min_rows).count() >= min_rows


def best_version(versions: list[dict], metric: str = "f1") -> dict | None:
    """A6 (train_service.py:207,323-339): keep the best artifact by metric;
    ties break toward the more recent version (list is latest-first, as
    sources.artifacts.list_versions returns)."""
    best = None
    for row in reversed(versions):  # oldest→newest so newer ties win
        m = row.get("metrics", {}).get(metric)
        if m is None:
            continue
        if best is None or m >= best["metrics"][metric]:
            best = row
    return best


def cluster_info(spark: SparkSession) -> dict:
    """A8 (train_model_from_csv.py:100-117 GPU inventory analogue):
    parallelism facts used for adaptive partition sizing."""
    sc = spark.sparkContext
    return {
        "default_parallelism": sc.defaultParallelism,
        "shuffle_partitions": int(spark.conf.get("spark.sql.shuffle.partitions")),
        "master": sc.master,
    }


def adaptive_partitions(
    n_rows: int, rows_per_partition: int = 50_000, min_parts: int = 1,
    max_parts: int = 100_000,
) -> int:
    """R3 analogue: explicit partition sizing from input stats (the
    runtime-side counterpart of AQE's coalescing)."""
    return max(min_parts, min(max_parts, (n_rows + rows_per_partition - 1) // rows_per_partition))
