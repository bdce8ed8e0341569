"""Fuzzy address-variant matching."""

import pandas as pd
import pytest

from extract_address_ner_spark.operators.fuzzy import (
    fuzzy_match_broadcast,
    fuzzy_match_lsh,
)
from extract_address_ner_spark.sources import corpus as C

VARIANTS = [
    # (candidate, expected canonical index or None)
    ("서울특별시 강남구 테헤란로 123번길 45", 0),
    ("서울특별시강남구테헤란로123번길45", 0),        # spacing removed
    ("서울시 강남구 테헤란로 123번길 45", 0),        # alias region
    ("경기도 성남시 분당구 판교역로 235", 1),
    ("경기도 성남시 분당구 판교역로235", 1),
    ("부산광역시 해운대구 해운대해변로 264", 2),
    ("부산시 해운대구 해운대해변로 264", 2),
    ("경상북도 경주시 보문로 507", 3),
    ("인천광역시 중구 월미로 329", 4),
    ("인천광역시 중구 월미로 330", 4),              # digit tweak, still close
    ("전혀 다른 문자열입니다", None),
    ("hello world", None),
]


@pytest.fixture(scope="module")
def dictionary(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "canonical_id": [
                    "kaddr:" + a.replace(" ", "/") for a in C.PLANTED_ADDRESSES
                ],
                "canonical_addr": C.PLANTED_ADDRESSES,
            }
        )
    )


@pytest.fixture(scope="module")
def candidates(spark):
    return spark.createDataFrame(
        pd.DataFrame({"mention_text": [v for v, _ in VARIANTS]})
    )


def _check(matches):
    got = {r["mention_text"]: r["canonical_addr"] for r in matches}
    for cand, idx in VARIANTS:
        if idx is None:
            assert cand not in got, cand
        else:
            assert got.get(cand) == C.PLANTED_ADDRESSES[idx], cand


def test_broadcast_path(spark, dictionary, candidates):
    _check(fuzzy_match_broadcast(candidates, dictionary).collect())


def test_lsh_path(spark, dictionary, candidates):
    _check(fuzzy_match_lsh(candidates, dictionary).collect())


def test_paths_agree(spark, dictionary, candidates):
    b = {(r["mention_text"], r["canonical_id"], r["jaccard"])
         for r in fuzzy_match_broadcast(candidates, dictionary).collect()}
    l = {(r["mention_text"], r["canonical_id"], r["jaccard"])
         for r in fuzzy_match_lsh(candidates, dictionary).collect()}
    # LSH may only MISS pairs (probabilistic recall), never invent or rescore
    assert l <= b
    assert len(l) >= len(b) - 1
