"""String-literal / comment extraction from source code (north_star stage:
"…emitting triples from string literals and comments in source files").

``extract_code_segments`` is an Arrow-batched mapInPandas operator: per-lang
regexes with match offsets (Python ``finditer`` — Spark SQL regex builtins
return no positions) produce one row per segment with GLOBAL char offsets
into ``content``:

    (keys…, lang, seg_type ∈ {string, comment, text}, seg_start, seg_end,
     seg_text)

``extract_mentions_from_code`` then runs the standard HOF tagger over
``seg_text`` and re-bases mention offsets to the whole file
(global = seg_start + local), so slice identity vs the original content holds
(reference invariant, ml_model.py:369).

Scale notes: segment extraction is narrow (one Arrow batch in, one out, no
shuffle); regexes are compiled once per task. Languages without comment or
string syntax knowledge (markdown/unknown) degrade to one whole-file 'text'
segment — never dropped silently.

Known simplification: no handling of escaped quotes or comment markers inside
string literals (segments may overlap in pathological sources); duplicate
(start, end) segments are deduped.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (seg_type, compiled regex) — group 1 is the segment's inner content
_STRING_DQ = (r'"([^"\n]*)"', "string")
_STRING_SQ = (r"'([^'\n]*)'", "string")
_STRING_BT = (r"`([^`\n]*)`", "string")
_COMMENT_HASH = (r"#([^\n]*)", "comment")
_COMMENT_SLASH = (r"//([^\n]*)", "comment")
_COMMENT_BLOCK = (r"/\*((?:[^*]|\*(?!/))*)\*/", "comment")

LANG_SYNTAX: dict[str, list[tuple[str, str]]] = {
    "python": [_STRING_DQ, _STRING_SQ, _COMMENT_HASH],
    "javascript": [_STRING_DQ, _STRING_SQ, _STRING_BT, _COMMENT_SLASH, _COMMENT_BLOCK],
    "java": [_STRING_DQ, _COMMENT_SLASH, _COMMENT_BLOCK],
    "go": [_STRING_DQ, _STRING_BT, _COMMENT_SLASH, _COMMENT_BLOCK],
}


def _compiled() -> dict[str, list[tuple[re.Pattern, str]]]:
    return {
        lang: [(re.compile(p, re.DOTALL), t) for p, t in pats]
        for lang, pats in LANG_SYNTAX.items()
    }


def extract_code_segments(
    corpus: DataFrame,
    text_col: str = "content",
    lang_col: str = "lang",
    key_cols: Sequence[str] = ("repo", "path", "commit", "content_sha256", "doc_id"),
) -> DataFrame:
    keys = [c for c in key_cols if c in corpus.columns]
    src = corpus.select(
        *keys, F.col(lang_col).alias("_lang"), F.col(text_col).alias("_text")
    )
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in src.schema.fields
        if f.name not in ("_lang", "_text")
    )
    out_schema = (
        f"{fields}, lang string, seg_type string, seg_start int, "
        f"seg_end int, seg_text string"
    )

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pats = _compiled()  # compiled once per task
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                lang, text = row["_lang"], row["_text"]
                base = {k: row[k] for k in keys}
                base["lang"] = lang
                segs: set[tuple[int, int, str]] = set()
                for rx, seg_type in pats.get(lang, []):
                    for m in rx.finditer(text):
                        segs.add((m.start(1), m.end(1), seg_type))
                if lang not in pats:
                    segs.add((0, len(text), "text"))
                for s, e, t in sorted(segs):
                    rows.append(
                        {**base, "seg_type": t, "seg_start": s, "seg_end": e,
                         "seg_text": text[s:e]}
                    )
            cols = keys + ["lang", "seg_type", "seg_start", "seg_end", "seg_text"]
            yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(process, schema=out_schema)


def extract_mentions_from_code(
    corpus: DataFrame,
    text_col: str = "content",
    key_cols: Sequence[str] = ("repo", "path", "commit", "content_sha256", "doc_id"),
) -> DataFrame:
    """Segments → HOF tagger over seg_text → mention offsets re-based to the
    whole file. Output: keys + seg_type + mention_text, m_start, m_end,
    confidence (global offsets)."""
    from .tagger import extract_mentions

    keys = [c for c in key_cols if c in corpus.columns]
    segs = extract_code_segments(corpus, text_col=text_col, key_cols=keys)
    local = extract_mentions(
        segs,
        text_col="seg_text",
        key_cols=tuple(keys) + ("seg_type", "seg_start"),
    )
    return local.select(
        *keys,
        "seg_type",
        "mention_text",
        (F.col("seg_start") + F.col("m_start")).cast("int").alias("m_start"),
        (F.col("seg_start") + F.col("m_end")).cast("int").alias("m_end"),
        "confidence",
    )
