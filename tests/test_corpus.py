"""Corpus derivation: Spark and DuckDB agree on the shared SQL; the extraction
pipeline recovers exactly the planted gold mentions (P/R = 1.0)."""

import duckdb
import pytest

from extract_address_ner_spark import oracle
from extract_address_ner_spark.operators.tagger import extract_mentions
from extract_address_ner_spark.sources import corpus as C


def _duck(sf_dir, sql):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    return con.execute(sql).fetchall()


def test_corpus_sql_cross_engine(spark, sf_smoke):
    """Same template, two engines → identical rows (incl. sha256/md5 text)."""
    spark_rows = {
        tuple(r) for r in C.corpus_from_documents(spark, sf_smoke).collect()
    }
    duck_rows = {
        tuple(r) for r in _duck(sf_smoke, C.corpus_sql(sha256_fn="sha256({})"))
    }
    assert spark_rows == duck_rows
    assert len(spark_rows) == 500


def test_gold_mentions_cross_engine(spark, sf_smoke):
    spark_rows = {
        tuple(r) for r in C.gold_mentions_from_documents(spark, sf_smoke).collect()
    }
    duck_rows = {
        tuple(r)
        for r in _duck(sf_smoke, C.gold_mentions_sql(sha256_fn="sha256({})"))
    }
    assert spark_rows == duck_rows
    # 2/3 of docs carry a planted address
    assert len(spark_rows) == pytest.approx(500 * 2 / 3, abs=2)


def test_pipeline_recovers_planted_gold(spark, sf_smoke):
    """Flagship end-to-end: corpus → extract_mentions == gold by construction.
    This is the north-metric P/R harness at P=R=1.0 (SURVEY.md §5.2.3)."""
    corpus = C.corpus_from_documents(spark, sf_smoke)
    got = {
        (r["repo"], r["path"], r["commit"], r["mention_text"], r["m_start"],
         r["m_end"], round(r["confidence"], 9), r["content_sha256"], r["doc_id"])
        for r in extract_mentions(corpus).collect()
    }
    gold = {
        (r["repo"], r["path"], r["commit"], r["mention_text"], r["m_start"],
         r["m_end"], round(r["confidence"], 9), r["content_sha256"], r["doc_id"])
        for r in C.gold_mentions_from_documents(spark, sf_smoke).collect()
    }
    assert got == gold
    prf = oracle.span_prf(got, gold)
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0 and prf["f1"] == 1.0


def test_slice_identity_on_corpus(spark, sf_smoke):
    """mention_text == substring(content, m_start+1, len) — invariant of
    reference ml_model.py:369, checked distributed-side (no collect of
    content)."""
    corpus = C.corpus_from_documents(spark, sf_smoke)
    m = extract_mentions(corpus).alias("m")
    j = m.join(corpus.alias("c"), on="doc_id")
    bad = j.filter(
        "substring(c.content, m.m_start + 1, m.m_end - m.m_start) <> m.mention_text"
    ).count()
    assert bad == 0


def test_synthesize_corpus_deterministic(spark):
    df1 = C.synthesize_corpus(spark, 1000, seed=7).collect()
    df2 = C.synthesize_corpus(spark, 1000, seed=7).collect()
    assert sorted(map(tuple, df1)) == sorted(map(tuple, df2))
    # skew: mega repo holds ~half the rows
    from collections import Counter

    repos = Counter(r["repo"] for r in df1)
    assert repos["repo_mega"] == 500


def test_synthetic_corpus_extraction(spark):
    """Planted addresses in the synthetic corpus are recovered with exact
    offsets (doc_id % 3 == 2 rows have none)."""
    df = C.synthesize_corpus(spark, 300, seed=42)
    got = extract_mentions(df).groupBy("doc_id").count().collect()
    per_doc = {r["doc_id"]: r["count"] for r in got}
    for doc_id in range(300):
        assert per_doc.get(doc_id, 0) == (1 if doc_id % 3 < 2 else 0), doc_id
