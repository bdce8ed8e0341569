"""Deterministic sampling & corpus mixing (operators/sampling.py).

The registry oracles (docs_hash_sample / docs_stratified_sample /
docs_corpus_mix) are replayed against DuckDB by tests/test_registry_oracles.py;
this file pins the semantics the oracle compare can't see: partition
invariance, cut nesting, quota exactness vs a driver-side reference, the
prefilter's window-input bound (the skew story), and the plan shapes.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from extract_address_ner_spark.operators.sampling import (
    GRAIN,
    hash_sample,
    mix_corpora,
    stratified_quota_sample,
)


def _py_bucket(key, seed=42) -> int:
    """Driver-side reference of hash_bucket_sql: md5 first 15 hex digits."""
    h = hashlib.md5(f"{seed}:{key}".encode()).hexdigest()[:15]
    return int(h, 16) % GRAIN


@pytest.fixture(scope="module")
def skewed(spark):
    """Groups a=1000 (mega), b=50 (mid), c=3 (below quota)."""
    rows = (
        [(i, "a") for i in range(1000)]
        + [(10_000 + i, "b") for i in range(50)]
        + [(20_000 + i, "c") for i in range(3)]
    )
    return spark.createDataFrame(rows, "doc_id bigint, grp string")


def test_hash_sample_partition_invariant(skewed):
    a = sorted(r.doc_id for r in hash_sample(
        skewed.repartition(7), 0.3).collect())
    b = sorted(r.doc_id for r in hash_sample(
        skewed.repartition(3), 0.3).collect())
    assert a == b and len(a) > 0


def test_hash_sample_matches_reference_rule(skewed):
    got = sorted(r.doc_id for r in hash_sample(skewed, 0.3).collect())
    want = sorted(
        r.doc_id for r in skewed.collect()
        if _py_bucket(r.doc_id) < int(round(0.3 * GRAIN))
    )
    assert got == want


def test_hash_sample_cuts_nest(skewed):
    small = {r.doc_id for r in hash_sample(skewed, 0.2).collect()}
    big = {r.doc_id for r in hash_sample(skewed, 0.5).collect()}
    assert small <= big


def test_hash_sample_plan_is_pure_filter(skewed):
    plan = hash_sample(skewed, 0.25)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_quota_exact_and_matches_global_topk(skewed):
    out = stratified_quota_sample(skewed, "grp", quota=10).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append(r.doc_id)
    assert sorted(by_grp) == ["a", "b", "c"]
    assert len(by_grp["a"]) == 10 and len(by_grp["b"]) == 10
    assert len(by_grp["c"]) == 3  # below quota: whole group, never inflated
    # equals the UNfiltered global top-quota by (hash, key) — the prefilter
    # is a prefix of the ranking order, so it must not change the answer
    rows = [(r.doc_id, r.grp) for r in skewed.collect()]
    for g in ("a", "b", "c"):
        want = sorted(
            (d for d, gg in rows if gg == g),
            key=lambda d: (_py_bucket(d), d),
        )[:10]
        assert sorted(by_grp[g]) == sorted(want), g


def test_stratified_prefilter_bounds_window_input(spark, skewed):
    """The mega-group's window input is ~oversample·quota, not |group| —
    replay the prefilter predicate and check what survives it."""
    from extract_address_ner_spark.operators.sampling import hash_bucket_sql

    thresh = 4 * 10  # oversample * quota
    cut = -(-thresh * GRAIN // 1000)  # ceil, group a has 1000 rows
    survivors = (
        skewed.where(F.col("grp") == "a")
        .where(F.expr(hash_bucket_sql("doc_id", 42)) < cut)
        .count()
    )
    assert 10 <= survivors <= 5 * thresh  # >= quota, << |group|=1000


def test_stratified_rejects_reserved_column_collision(skewed):
    with pytest.raises(ValueError, match="reserved"):
        stratified_quota_sample(skewed.withColumn("_hb", F.lit(1)), "grp", 5)


def test_stratified_plan_one_window_no_sortmergejoin(skewed):
    plan = (
        stratified_quota_sample(skewed, "grp", quota=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Window") >= 1
    assert "SortMergeJoin" not in plan  # counts come back broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


@pytest.fixture(scope="module")
def three_sources(spark):
    mk = lambda lo, n: spark.createDataFrame(  # noqa: E731
        [(lo + i,) for i in range(n)], "doc_id bigint")
    return [("w", mk(0, 1000), 0.5),
            ("b", mk(100_000, 1000), 0.3),
            ("tiny", mk(200_000, 50), 0.2)]


def test_mix_proportions_and_cap(three_sources):
    out = mix_corpora(three_sources, target_total=600).collect()
    n = {}
    for r in out:
        n[r.source_name] = n.get(r.source_name, 0) + 1
    # w wants 300 of 1000, b wants 180 of 1000 — hash-binomial around target
    assert abs(n["w"] - 300) < 75 and abs(n["b"] - 180) < 60
    # tiny wants 120 > |tiny|=50 — cap branch keeps the whole source
    assert n["tiny"] == 50


def test_mix_cuts_nest(three_sources):
    small = {(r.source_name, r.doc_id)
             for r in mix_corpora(three_sources, target_total=300).collect()}
    big = {(r.source_name, r.doc_id)
           for r in mix_corpora(three_sources, target_total=600).collect()}
    assert small <= big


def test_mix_rejects_reserved_column_collision(spark, three_sources):
    bad = three_sources[0][1].withColumn("source_name", F.lit("x"))
    with pytest.raises(ValueError, match="reserved"):
        mix_corpora([("w", bad, 0.5)], 100)


def test_stratified_quota_large_quota_no_int32_overflow(skewed):
    """quota ≥ 537 (default oversample=4) used to throw ARITHMETIC_OVERFLOW
    under this repo's ANSI session: the prefilter computed
    int32(thresh) * int32(GRAIN) and 4·537·1e6 > 2³¹. The multiply must be
    long-typed; production quotas (jobs --quota-sample 1000) are well past
    the old ceiling. Groups smaller than the quota come back whole."""
    out = stratified_quota_sample(skewed, "grp", 600).groupBy("grp").count()
    got = {r["grp"]: r["count"] for r in out.collect()}
    assert got == {"a": 600, "b": 50, "c": 3}
