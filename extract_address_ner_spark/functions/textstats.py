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
# The characters PUNCT_RE complements — `length(translate(text, _CLEAN, ''))`
# counts exactly the code points PUNCT_RE matches (each match is one code
# point), but through a plain char map instead of the regex engine: the
# multi-range negated class measured ~5x slower per row than translate on
# the JVM (1.9s vs 0.37s over 50k docs at sf1.0; round 6). Equivalence
# pinned on punctuation/Hangul/astral fixtures in tests.
_CLEAN_CHARS = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
)
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
    punctuation cleanliness (each a 4-dp-rounded double; fixed weights).

    Round 6: the counts are materialized in their OWN projection and the
    ratios derived in a second one. The single-Project formulation sits
    outside whole-stage codegen (the stop-hit lambda disqualifies it) and
    the interpreted projection does no common-subexpression elimination, so
    the word regex ran 3x and the stop/punct scans 2x per row (visible in
    the round-start plan). The multi-referenced non-cheap aliases stop
    CollapseProject from merging the two projections back. Same arithmetic,
    same rounding — values identical (driver oracle unchanged)."""
    words = _words(text_col)
    counted = (
        df.withColumns({
            "_nw": F.expr(f"size({words})"),
            "_nc": F.length(text_col),
            "_ns": F.expr(_stop_hits(text_col, EN_STOP)),
            "_np": F.expr(
                f"length(translate({text_col}, '{_CLEAN_CHARS}', ''))"
            ),
        })
    )
    n_words, n_chars = F.col("_nw"), F.col("_nc")
    n_stop, n_punct = F.col("_ns"), F.col("_np")
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    length_score = F.least(F.lit(1.0), n_words / F.lit(100.0))
    quality = F.round(
        0.5 * length_score + 0.25 * stop_ratio + 0.25 * (1 - punct_ratio), 4
    ).cast("double")
    return (
        counted.withColumn("stop_ratio", F.round(stop_ratio, 4).cast("double"))
        .withColumn("punct_ratio", F.round(punct_ratio, 4).cast("double"))
        .withColumn("quality", quality)
        .drop("_nw", "_nc", "_ns", "_np")
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


def with_repetition_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher/MassiveText-style repetition quality signals, per document:

    - ``n_lines``: non-blank (trimmed) lines.
    - ``dup_line_frac``: fraction of lines that are repeats of an earlier
      line value (``1 - distinct/total``; 0 for line-less docs).
    - ``dup_line_char_frac``: fraction of line characters contained in
      occurrences AFTER the first of each repeated line value —
      ``sum((count_l - 1) * len(l)) / sum(len(l))`` over distinct lines l.
    - ``top_bigram``: the most frequent lowercased word 2-gram (ties break
      to the lexicographically smallest; NULL when < 2 words).
    - ``top2gram_char_frac``: chars covered by that bigram's occurrences —
      ``count * len(top_bigram) / len(text)`` (the Gopher "fraction of
      characters in the most common n-gram" filter at n=2).

    All array-local HOF expressions — a NARROW zero-Exchange projection.
    The distinct×occurrence scans are O(m·d) per doc (m tokens/lines, d
    distinct): fine at prose-document lengths and exactly mirrorable in the
    DuckDB oracle; for extreme documents (m in the hundreds of thousands)
    the same statistics are computable as explode → groupBy → window-max at
    the cost of a shuffle — this local form keeps the 100 TB plan scan-bound.
    Fractions are 4-dp-rounded doubles so both engines hash identically.
    """
    for helper in ("_lines", "_bg", "_toks", "_maxc", "_top"):
        if helper in df.columns:
            raise ValueError(
                f"with_repetition_stats: input already has a {helper!r} column"
            )
    lines_expr = (
        f"filter(transform(split({text_col}, '\\n'), l -> trim(l)), "
        f"l -> l != '')"
    )
    # Materialize the token array as a COLUMN ATTRIBUTE before the bigram
    # transform: if the tokenization subtree were spliced textually into the
    # lambda body, it would re-evaluate PER ELEMENT — O(tokens²) per doc,
    # and catastrophic when text_col is itself an expensive expression
    # (lazy synthesized corpus + regexp chain: observed >400 s/task on a
    # 1000-row partition). As a multiply-referenced non-cheap projection it
    # survives CollapseProject and is computed exactly once per row.
    ws = f"filter(split(lower({text_col}), ' '), t -> t != '')"
    bg_expr = (
        "CASE WHEN size(_toks) >= 2 THEN "
        "transform(sequence(1, size(_toks) - 1), i -> concat_ws(' ', slice(_toks, i, 2))) "
        "ELSE CAST(array() AS array<string>) END"
    )
    df = (
        df.withColumn("_toks", F.expr(ws))
        .withColumn("_lines", F.expr(lines_expr))
        .withColumn("_bg", F.expr(bg_expr))
    )
    tot_line_chars = F.expr(
        "aggregate(_lines, CAST(0 AS BIGINT), (a, l) -> a + length(l))"
    )
    dup_line_chars = F.expr(
        "aggregate(array_distinct(_lines), CAST(0 AS BIGINT), (a, l) -> "
        "a + (size(filter(_lines, x -> x = l)) - 1) * length(l))"
    )
    # _maxc/_top are materialized as column attributes for the same reason
    # as _toks above: maxc is itself O(d·m); splicing its TEXT into the
    # `top` filter lambda re-evaluates it per distinct bigram — O(d²·m)
    # per document (measured: a single 1000-token doc took 73 s; 2000
    # tokens never finished). As multiply-referenced non-cheap projections
    # they are computed once per row and the top-bigram pass stays O(d·m).
    maxc = (
        "array_max(transform(array_distinct(_bg), "
        "b -> size(filter(_bg, x -> x = b))))"
    )
    top = (
        "array_min(filter(array_distinct(_bg), "
        "b -> size(filter(_bg, x -> x = b)) = _maxc))"
    )
    df = df.withColumn("_maxc", F.expr(maxc)).withColumn("_top", F.expr(top))
    n_lines = F.expr("size(_lines)")
    out = (
        df.withColumn("n_lines", n_lines.cast("int"))
        .withColumn(
            "dup_line_frac",
            F.round(
                F.when(n_lines > 0,
                       1.0 - F.expr("size(array_distinct(_lines))") / n_lines)
                .otherwise(F.lit(0.0)), 4).cast("double"),
        )
        .withColumn(
            "dup_line_char_frac",
            F.round(
                F.when(tot_line_chars > 0, dup_line_chars / tot_line_chars)
                .otherwise(F.lit(0.0)), 4).cast("double"),
        )
        .withColumn("top_bigram", F.expr("CASE WHEN size(_bg) > 0 THEN _top END"))
        .withColumn(
            "top2gram_char_frac",
            F.round(
                F.when(
                    F.expr("size(_bg)") > 0,
                    F.expr("_maxc * length(_top)")
                    / F.greatest(F.length(text_col), F.lit(1)),
                ).otherwise(F.lit(0.0)), 4).cast("double"),
        )
    )
    return out.drop("_lines", "_bg", "_toks", "_maxc", "_top")


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_top2gram_char_frac: float = 0.20,
) -> DataFrame:
    """Keep documents passing the Gopher repetition thresholds (the paper's
    rule shape; defaults are its published dup-line/char bounds and the
    n=2 top-n-gram bound). A pure filter over :func:`with_repetition_stats` —
    still a narrow, scan-bound plan.

    The ``_pushdown_fence`` column is load-bearing: without it,
    PushPredicateThroughNonJoin substitutes the three stat ALIASES back
    into the filter condition — and unlike CollapseProject, predicate
    pushdown has NO expression-cost check, so the aggregate/HOF trees
    (each referencing ``_toks``/``_lines``/``_bg``, themselves lambda
    bodies) are re-inlined per reference, MULTIPLICATIVELY: each pushdown
    level substitutes the lower project's aliases into lambda bodies where
    they re-evaluate per array element, so the nested tokenize/bigram/
    distinct-scan trees compound to ~m²·d work per doc — 2000×46-token
    docs never finished (>100 s, killed) vs 1.8 s fenced.

    The fence must satisfy TWO conditions (both verified the hard way):
    (a) it is non-deterministic — Catalyst only pushes predicates through
    fully-deterministic Projects (``fields.forall(_.deterministic)``), and
    (b) it is REFERENCED BY THE FILTER CONDITION itself (an always-true
    conjunct ``_pushdown_fence >= -1``; rand ∈ [0,1)) — an unreferenced
    fence column is deleted by ColumnPruning *before* the pushdown rule
    looks at the Project, which silently re-enables the substitution. The
    fence is dropped before returning, so results are unchanged (pinned by
    tests/test_repetition.py, incl. a plan pin that the executed Filter
    reads stat ATTRIBUTES, not re-inlined trees)."""
    stats = with_repetition_stats(df, text_col=text_col)
    fenced = stats.withColumn("_pushdown_fence", F.rand(seed=0))
    kept = fenced.filter(
        (F.col("_pushdown_fence") >= F.lit(-1.0))
        & (F.col("dup_line_frac") <= max_dup_line_frac)
        & (F.col("dup_line_char_frac") <= max_dup_line_char_frac)
        & (F.col("top2gram_char_frac") <= max_top2gram_char_frac)
    )
    return kept.select(*df.columns)


def with_fingerprints(df: DataFrame, text_col: str = "text") -> DataFrame:
    """sha256 content hash + 64-bit md5-derived fingerprint (the md5-prefix
    trick is the cross-engine-reproducible stand-in for a rolling hash)."""
    return df.withColumn("fp_sha256", F.sha2(F.col(text_col), 256)).withColumn(
        "fp64",
        F.expr(f"CAST(conv(substr(md5({text_col}), 1, 15), 16, 10) AS BIGINT)"),
    )
