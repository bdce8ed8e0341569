"""Text-analysis functions for large-scale training-data pipelines.

Language-ID (stopword-hit heuristic), quality scoring (length / punctuation /
stopword ratios), token counting (whitespace + word-regex), and document
fingerprinting (md5-derived 64-bit + sha256). All pure built-in expressions —
JVM-side, codegen-friendly, no Python in the hot path; each has an exact
DuckDB oracle in entry_queries.

Design note: every ratio is rounded to 4 decimals AFTER double arithmetic so
Spark and the oracle agree bit-for-bit in the driver's value-hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WORD_RE = "[A-Za-z]+"
PUNCT_RE = "[^A-Za-z0-9 ]"
# GPT-2-style pre-tokenizer pattern ("BPE-ish"): contraction suffixes,
# space-prefixed letter runs, digit runs, punctuation runs, whitespace runs.
# Pure RE2/Java-regex common subset (no lookahead) so Spark and DuckDB
# tokenize identically — verified over Korean/contraction/whitespace cases.
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

# tiny per-language function-word sets for the heuristic language ID
STOPWORDS = {
    "en": ["the", "of", "and", "to", "is"],
    "fr": ["le", "la", "de", "et", "les"],
    "de": ["der", "die", "und", "das", "ist"],
}
EN_STOP = STOPWORDS["en"]


def _words(text_col: str) -> str:
    return f"regexp_extract_all({text_col}, '{WORD_RE}', 0)"


def _stop_hits(text_col: str, words: list[str]) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in words) + ")"
    return (
        f"size(filter(split(lower({text_col}), ' '), t -> array_contains({arr}, t)))"
    )


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """n_chars / whitespace-token count / word count / avg word length."""
    words = _words(text_col)
    return (
        df.withColumn("n_chars_calc", F.length(text_col))
        .withColumn(
            "n_tokens_ws",
            F.expr(f"size(filter(split({text_col}, ' '), t -> length(t) > 0))"),
        )
        .withColumn("n_words", F.expr(f"size({words})"))
        .withColumn(
            # BPE-ish token count (GPT-2 pre-tokenizer shape) — the
            # training-data-pipeline token budget estimator; F.lit avoids
            # SQL-literal escaping of the pattern's apostrophe
            "n_tokens_bpe",
            F.size(F.regexp_extract_all(text_col, F.lit(BPE_RE), F.lit(0))),
        )
        .withColumn(
            "avg_word_len",
            F.round(
                F.expr(
                    f"aggregate({words}, CAST(0 AS BIGINT), (a, w) -> a + length(w))"
                )
                / F.greatest(F.expr(f"size({words})"), F.lit(1)),
                4,
            ).cast("double"),
        )
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Composite quality score: length saturation + stopword density +
    punctuation cleanliness (each a 4-dp-rounded double; fixed weights)."""
    words = _words(text_col)
    n_words = F.expr(f"size({words})")
    n_chars = F.length(text_col)
    n_stop = F.expr(_stop_hits(text_col, EN_STOP))
    n_punct = F.expr(f"size(regexp_extract_all({text_col}, '{PUNCT_RE}', 0))")
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    length_score = F.least(F.lit(1.0), n_words / F.lit(100.0))
    quality = F.round(
        0.5 * length_score + 0.25 * stop_ratio + 0.25 * (1 - punct_ratio), 4
    ).cast("double")
    return (
        df.withColumn("stop_ratio", F.round(stop_ratio, 4).cast("double"))
        .withColumn("punct_ratio", F.round(punct_ratio, 4).cast("double"))
        .withColumn("quality", quality)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: Korean char check first, then argmax of
    function-word hits (ties break en > fr > de, deterministic)."""
    s_en = F.expr(_stop_hits(text_col, STOPWORDS["en"]))
    s_fr = F.expr(_stop_hits(text_col, STOPWORDS["fr"]))
    s_de = F.expr(_stop_hits(text_col, STOPWORDS["de"]))
    pred = (
        F.when(F.col(text_col).rlike("[가-힣]"), F.lit("ko"))
        .when((s_en >= s_fr) & (s_en >= s_de), F.lit("en"))
        .when(s_fr >= s_de, F.lit("fr"))
        .otherwise(F.lit("de"))
    )
    return df.withColumn("pred_lang", pred)


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """sha256 content hash + 64-bit md5-derived fingerprint (the md5-prefix
    trick is the cross-engine-reproducible stand-in for a rolling hash)."""
    return df.withColumn("fp_sha256", F.sha2(F.col(text_col), 256)).withColumn(
        "fp64",
        F.expr(f"CAST(conv(substr(md5({text_col}), 1, 15), 16, 10) AS BIGINT)"),
    )
