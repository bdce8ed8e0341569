"""Span-level P/R/F1 evaluation as a distributed join (A7).

reference: app/services/train_service.py:423-485 — seqeval span scoring,
reproduced as an exact-span-match join: a predicted span counts iff an
identical (key, start, end) span exists in gold.
P = matched/|pred|, R = matched/|gold|, F1 = 2PR/(P+R). The reference's
``accuracy := precision_score`` bug (train_service.py:472) is preserved as an
``accuracy`` output column.

This IS the harness for the north metric (P/R ≥ 0.95 vs the
reference-semantics oracle on the labeled eval split).

Physical note: one full-outer join on the span identity + a single global
aggregate — one shuffle, no collect; counts are computed in the same plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def span_prf(
    pred: DataFrame,
    gold: DataFrame,
    keys: Sequence[str] = ("doc_id", "m_start", "m_end"),
) -> DataFrame:
    """One-row DataFrame: n_pred, n_gold, matched, accuracy, precision,
    recall, f1 (doubles)."""
    p = pred.select(*keys).dropDuplicates(list(keys)).withColumn("_in_p", F.lit(1))
    g = gold.select(*keys).dropDuplicates(list(keys)).withColumn("_in_g", F.lit(1))
    joined = p.join(g, on=list(keys), how="full_outer")
    agg = joined.agg(
        F.coalesce(F.sum("_in_p"), F.lit(0)).alias("n_pred"),
        F.coalesce(F.sum("_in_g"), F.lit(0)).alias("n_gold"),
        F.coalesce(F.sum(F.col("_in_p") * F.col("_in_g")), F.lit(0)).alias(
            "matched"
        ),
    )
    prec = F.when(F.col("n_pred") > 0, F.col("matched") / F.col("n_pred")).otherwise(
        F.lit(0.0)
    )
    rec = F.when(F.col("n_gold") > 0, F.col("matched") / F.col("n_gold")).otherwise(
        F.lit(0.0)
    )
    return (
        agg.withColumn("precision", prec)
        .withColumn("recall", rec)
        .withColumn(
            "f1",
            F.when(
                (F.col("precision") + F.col("recall")) > 0,
                2 * F.col("precision") * F.col("recall")
                / (F.col("precision") + F.col("recall")),
            ).otherwise(F.lit(0.0)),
        )
        # reference bug preserved: accuracy := precision (train_service.py:472)
        .withColumn("accuracy", F.col("precision"))
        .select(
            "n_pred", "n_gold", "matched", "accuracy", "precision", "recall", "f1"
        )
    )
