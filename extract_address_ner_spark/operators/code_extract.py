"""String-literal / comment extraction from source code (north_star stage:
"…emitting triples from string literals and comments in source files").

``extract_code_segments`` is an Arrow-batched mapInPandas operator: per-lang
LEXER regexes with match offsets (Python ``finditer`` — Spark SQL regex
builtins return no positions) produce one row per segment with GLOBAL char
offsets into ``content``:

    (keys…, lang, seg_type ∈ {string, comment, text}, seg_start, seg_end,
     seg_text)

Lexer semantics: each language compiles to ONE alternation regex scanned
left-to-right by ``finditer`` — because ``finditer`` never yields overlapping
matches, whichever token starts first consumes the other's marker, exactly
like a real tokenizer:

- a ``#`` or ``//`` inside a string literal does NOT open a comment;
- a quote inside a comment does NOT open a string;
- ``\\"`` / ``\\'`` escapes inside single-line string literals are consumed
  (``"서울시 \\"강남구\\""`` is ONE string segment);
- JS template literals / Go raw strings span newlines (Go raw strings take
  no escapes, per the language).

One ``finditer`` pass per row (the round-1 version ran 3-5 independent
pattern scans per row AND could emit overlapping segments).

``extract_mentions_from_code`` then runs the standard HOF tagger over
``seg_text`` and re-bases mention offsets to the whole file
(global = seg_start + local), so slice identity vs the original content holds
(reference invariant, ml_model.py:369).

Scale notes: segment extraction is narrow (one Arrow batch in, one out, no
shuffle); regexes are compiled once per task; batch assembly is columnar
(index-array take on the key columns — no per-row dict building, no
``iterrows``).

Known simplifications: Python triple-quoted strings lex as two empty strings
around the body; unterminated literals are skipped (scan resumes after the
opening quote) rather than recovered.
"""

from __future__ import annotations

import re
from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Token alternatives (pattern with exactly ONE capture group = the segment's
# inner content, seg_type). Escapes: \X is consumed atomically inside
# single-line strings ([^\n] keeps them line-bounded) and multi-line
# template literals ([\s\S]).
_STRING_DQ = (r'"((?:\\[^\n]|[^"\\\n])*)"', "string")
_STRING_SQ = (r"'((?:\\[^\n]|[^'\\\n])*)'", "string")
_STRING_BT_JS = (r"`((?:\\[\s\S]|[^`\\])*)`", "string")  # template literal
_STRING_BT_GO = (r"`([^`]*)`", "string")  # raw string: no escapes
_COMMENT_HASH = (r"#([^\n]*)", "comment")
_COMMENT_SLASH = (r"//([^\n]*)", "comment")
_COMMENT_BLOCK = (r"/\*((?:[^*]|\*(?!/))*)\*/", "comment")

LANG_SYNTAX: dict[str, list[tuple[str, str]]] = {
    "python": [_STRING_DQ, _STRING_SQ, _COMMENT_HASH],
    "javascript": [_STRING_DQ, _STRING_SQ, _STRING_BT_JS, _COMMENT_BLOCK,
                   _COMMENT_SLASH],
    "java": [_STRING_DQ, _COMMENT_BLOCK, _COMMENT_SLASH],
    "go": [_STRING_DQ, _STRING_BT_GO, _COMMENT_BLOCK, _COMMENT_SLASH],
}


def _compiled() -> dict[str, tuple[re.Pattern, list[str]]]:
    """lang → (combined alternation regex, seg_type per capture-group index).
    Each alternative holds exactly one group, so ``m.lastindex`` identifies
    which token matched."""
    out = {}
    for lang, pats in LANG_SYNTAX.items():
        combined = "|".join(p for p, _t in pats)
        out[lang] = (re.compile(combined), [t for _p, t in pats])
    return out


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
            langs = pdf["_lang"].tolist()
            texts = pdf["_text"].tolist()
            row_idx: list[int] = []
            seg_type: list[str] = []
            seg_start: list[int] = []
            seg_end: list[int] = []
            seg_text: list[str] = []
            for i, (lang, text) in enumerate(zip(langs, texts)):
                lx = pats.get(lang)
                if lx is None:
                    row_idx.append(i)
                    seg_type.append("text")
                    seg_start.append(0)
                    seg_end.append(len(text))
                    seg_text.append(text)
                    continue
                rx, types = lx
                for m in rx.finditer(text):
                    g = m.lastindex
                    row_idx.append(i)
                    seg_type.append(types[g - 1])
                    seg_start.append(m.start(g))
                    seg_end.append(m.end(g))
                    seg_text.append(m.group(g))
            out = pdf.iloc[row_idx][keys].reset_index(drop=True)
            out["lang"] = [langs[i] for i in row_idx]
            out["seg_type"] = seg_type
            out["seg_start"] = pd.array(seg_start, dtype="int32")
            out["seg_end"] = pd.array(seg_end, dtype="int32")
            out["seg_text"] = seg_text
            yield out

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
