"""P2/P3 span projections and lifecycle guards (P5, A6, A8)."""

import pandas as pd

from extract_address_ner_spark.operators.spans import (
    adaptive_partitions,
    best_version,
    cluster_info,
    derive_span_by_locate,
    full_text_span,
    should_retrain,
)


def test_full_text_span(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"text": ["부산광역시 해운대구", "아님"],
                      "is_address": [1, 0]})
    )
    rows = {r["text"]: (r["span_start"], r["span_end"])
            for r in full_text_span(df).collect()}
    assert rows["부산광역시 해운대구"] == (0, 10)
    assert rows["아님"] == (0, 0)


def test_derive_span_by_locate(spark):
    """Matches Python str.find semantics (0-based, first occurrence, -1 when
    absent) — reference train_service.py:409-410."""
    cases = [
        ("내일 서울특별시 강남구에서", "서울특별시 강남구"),
        ("abc", "zzz"),
        ("반복 주소 반복 주소", "주소"),  # first occurrence
        ("주소로 시작", "주소"),
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"text": [t for t, _ in cases],
                      "address": [a for _, a in cases]})
    )
    got = {(r["text"], r["address"]): (r["span_start"], r["span_end"])
           for r in derive_span_by_locate(df).collect()}
    for t, a in cases:
        want = t.find(a)
        want_span = (want, want + len(a)) if want >= 0 else (-1, -1)
        assert got[(t, a)] == want_span, (t, a)


def test_should_retrain(spark):
    small = spark.range(5)
    big = spark.range(50)
    assert not should_retrain(small, min_rows=10)
    assert should_retrain(big, min_rows=10)


def test_best_version():
    versions = [  # latest-first, as list_versions returns
        {"version": "v3", "metrics": {"f1": 0.9}},
        {"version": "v2", "metrics": {"f1": 0.95}},
        {"version": "v1", "metrics": {"f1": 0.95}},
        {"version": "v0", "metrics": {}},
    ]
    assert best_version(versions)["version"] == "v2"  # newer tie wins
    assert best_version([{"version": "x", "metrics": {}}]) is None


def test_cluster_info_and_partitions(spark):
    info = cluster_info(spark)
    assert info["default_parallelism"] >= 1
    assert info["shuffle_partitions"] >= 1
    assert adaptive_partitions(0) == 1
    assert adaptive_partitions(100_000, 50_000) == 2
    assert adaptive_partitions(10**12, 50_000, max_parts=100_000) == 100_000
