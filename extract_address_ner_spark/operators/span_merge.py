"""Alternative span-merge physical strategy: exploded long format + windows.

The default path (operators.tagger.extract_mentions) does everything in
per-row array folds — narrow, no shuffle. This module implements the same
semantics on an EXPLODED token table with window functions:

    tokens(doc, pos, token, tok_start, tok_end)
      → labels via running windows (lexicon start / continuation propagation)
      → segment ids via a cumulative sum over span-start indicators
      → groupBy(doc, seg) → min(start), max(end), avg(conf)

Useful when the token table is itself the product of an upstream stage (e.g.
a neural tagger emitting per-token labels), where a shuffle-by-doc is already
paid. Equivalence with the HOF path is tested (tests/test_span_merge.py).

Window semantics replicate reference ml_model.py:352-437: each B starts a new
segment; an I after O also starts one (bare-I quirk); O closes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .. import CONF_ADDRESS, CONF_OTHER
from .tagger import CONT_REGEX, _start_set_expr, tokens_with_offsets_expr


def tokenize_long(
    corpus: DataFrame,
    text_col: str = "content",
    key_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """Exploded token table with char offsets (empty tokens already dropped
    by the offset fold)."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(corpus.sparkSession)
    toks = tokens_with_offsets_expr(text_col)
    keys = [c for c in key_cols if c in corpus.columns]
    return (
        corpus.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(*keys, F.posexplode(F.expr(toks)).alias("pos", "_t"))
        .select(
            *keys,
            "pos",
            F.col("_t.token").alias("token"),
            F.col("_t.tok_start").alias("tok_start"),
            F.col("_t.tok_end").alias("tok_end"),
        )
    )


def label_tokens_window(
    tokens: DataFrame, key_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """BIO labels via windows: a token is a span member iff it is a lexicon
    start, or a continuation token with no 'breaker' since the last start.
    last_start/last_break positions are running conditional maxima."""
    keys = list(key_cols)
    w = Window.partitionBy(*keys).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    esc_cont = CONT_REGEX.replace("\\", "\\\\")
    t = (
        tokens.withColumn(
            "_is_start", F.expr(f"array_contains({_start_set_expr()}, token)")
        )
        .withColumn("_is_cont", F.expr(f"token RLIKE '{esc_cont}'"))
        .withColumn(
            "_last_start",
            F.max(F.when(F.col("_is_start"), F.col("pos"))).over(w),
        )
        .withColumn(
            "_last_break",
            F.max(
                F.when(~F.col("_is_start") & ~F.col("_is_cont"), F.col("pos"))
            ).over(w),
        )
    )
    member = F.col("_is_start") | (
        F.col("_is_cont")
        & F.col("_last_start").isNotNull()
        & (
            F.col("_last_break").isNull()
            | (F.col("_last_break") < F.col("_last_start"))
        )
    )
    return (
        t.withColumn(
            "label",
            F.when(F.col("_is_start"), F.lit("B-ADDRESS"))
            .when(member, F.lit("I-ADDRESS"))
            .otherwise(F.lit("O")),
        )
        .withColumn(
            "conf",
            F.when(F.col("label") != "O", F.lit(CONF_ADDRESS)).otherwise(
                F.lit(CONF_OTHER)
            ),
        )
        .drop("_is_start", "_is_cont", "_last_start", "_last_break")
    )


def merge_spans_window(
    labeled: DataFrame, key_cols: Sequence[str] = ("doc_id",)
) -> DataFrame:
    """Segment-id formulation of the reference state machine: a new segment
    opens at every B, and at an I whose previous token's label is O/absent
    (bare-I quirk). Non-O runs group into mentions."""
    keys = list(key_cols)
    order = Window.partitionBy(*keys).orderBy("pos")
    run = Window.partitionBy(*keys).orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = labeled.withColumn("_prev", F.lag("label").over(order)).withColumn(
        "_seg_start",
        (
            (F.col("label") == "B-ADDRESS")
            | (
                (F.col("label") == "I-ADDRESS")
                & (F.col("_prev").isNull() | (F.col("_prev") == "O"))
            )
        ).cast("int"),
    )
    t = t.withColumn("_seg", F.sum("_seg_start").over(run))
    return (
        t.filter(F.col("label") != "O")
        .groupBy(*keys, "_seg")
        .agg(
            F.min("tok_start").alias("m_start"),
            F.max("tok_end").alias("m_end"),
            F.avg("conf").alias("confidence"),
        )
        .drop("_seg")
    )


def extract_mentions_window(
    corpus: DataFrame,
    text_col: str = "content",
    key_cols: Sequence[str] = ("doc_id",),
) -> DataFrame:
    """End-to-end window-strategy extraction; joins the text back for the
    slice (mention_text = content[m_start:m_end], ml_model.py:369)."""
    keys = [c for c in key_cols if c in corpus.columns]
    toks = tokenize_long(corpus, text_col, keys)
    spans = merge_spans_window(label_tokens_window(toks, keys), keys)
    src = corpus.select(*keys, F.col(text_col).alias("_text"))
    return (
        spans.join(src, on=keys)
        .select(
            *keys,
            F.expr("substring(_text, m_start + 1, m_end - m_start)").alias(
                "mention_text"
            ),
            "m_start",
            "m_end",
            "confidence",
        )
    )
