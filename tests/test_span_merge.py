"""Window-SQL span merge ≡ HOF path ≡ oracle, incl. forced-label quirks."""

import pandas as pd

from extract_address_ner_spark.operators.span_merge import (
    extract_mentions_window,
    merge_spans_window,
)
from extract_address_ner_spark.operators.tagger import extract_mentions
from extract_address_ner_spark.sources import corpus as C
from tests.test_tagger import TEXTS


def _key(rows):
    return {
        (r["doc_id"], r["mention_text"], r["m_start"], r["m_end"],
         round(r["confidence"], 9))
        for r in rows
    }


def test_window_path_equals_hof_on_fixtures(spark):
    pdf = pd.DataFrame({"doc_id": range(len(TEXTS)), "content": TEXTS})
    df = spark.createDataFrame(pdf)
    hof = _key(extract_mentions(df, key_cols=("doc_id",)).collect())
    win = _key(extract_mentions_window(df).collect())
    assert win == hof


def test_window_path_equals_hof_on_corpus(spark, sf_smoke):
    corpus = C.corpus_from_documents(spark, sf_smoke)
    hof = _key(extract_mentions(corpus, key_cols=("doc_id",)).collect())
    win = _key(extract_mentions_window(corpus).collect())
    assert win == hof


def test_merge_spans_window_bare_i(spark):
    """Forced labels: I at sequence start opens a span; B after B splits."""
    rows = [
        # doc 0: I I O  → one span covering toks 0-1
        (0, 0, "aa", 0, 2, "I-ADDRESS", 0.5),
        (0, 1, "bb", 3, 5, "I-ADDRESS", 0.7),
        (0, 2, "cc", 6, 8, "O", 0.1),
        # doc 1: B B  → two spans
        (1, 0, "dd", 0, 2, "B-ADDRESS", 0.9),
        (1, 1, "ee", 3, 5, "B-ADDRESS", 0.8),
        # doc 2: O I  → bare-I span at the end (trailing flush)
        (2, 0, "ff", 0, 2, "O", 0.1),
        (2, 1, "gg", 3, 5, "I-ADDRESS", 0.6),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, pos int, token string, tok_start int, tok_end int, "
        "label string, conf double",
    )
    got = {
        (r["doc_id"], r["m_start"], r["m_end"], round(r["confidence"], 9))
        for r in merge_spans_window(df).collect()
    }
    assert got == {
        (0, 0, 5, round((0.5 + 0.7) / 2, 9)),
        (1, 0, 2, 0.9),
        (1, 3, 5, 0.8),
        (2, 3, 5, 0.6),
    }
