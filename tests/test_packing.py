"""Sequence packing (operators/packing.py): every doc exactly once, no bin
over capacity, deterministic under repartitioning, FFD quality vs a
driver-side reference, oversized-doc isolation, one-shuffle plan."""

import pytest
from pyspark.sql import functions as F

from extract_address_ner_spark.operators.packing import (
    pack_sequences,
    packing_stats,
)

SEQ = 100


@pytest.fixture(scope="module")
def docs(spark):
    """Deterministic mixed sizes incl. zero-length and oversize docs."""
    rows = [(i, (i * 37) % 90 + 1) for i in range(400)]
    rows += [(1000, 0), (1001, 250), (1002, SEQ)]  # empty / oversize / exact
    return spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")


@pytest.fixture(scope="module")
def assign(docs):
    return pack_sequences(docs, seq_len=SEQ, n_groups=8).cache()


def test_every_doc_packed_exactly_once(docs, assign):
    want = sorted(r.doc_id for r in docs.collect())
    got = sorted(r.doc_id for r in assign.collect())
    assert got == want


def test_no_bin_over_capacity(assign):
    over = (
        assign.groupBy("pack_group", "bin_in_group")
        .agg(F.sum("n_tokens_packed").alias("fill"))
        .where(F.col("fill") > SEQ)
        .count()
    )
    assert over == 0


def test_partition_invariant(docs):
    a = sorted(map(tuple, pack_sequences(
        docs.repartition(13), SEQ, n_groups=8).collect()))
    b = sorted(map(tuple, pack_sequences(
        docs.repartition(2), SEQ, n_groups=8).collect()))
    assert a == b


def test_oversize_doc_isolated_and_flagged(assign):
    row = assign.where(F.col("doc_id") == 1001).collect()[0]
    assert row.truncated and row.n_tokens_packed == SEQ
    mates = assign.where(
        (F.col("pack_group") == row.pack_group)
        & (F.col("bin_in_group") == row.bin_in_group)
    ).count()
    assert mates == 1  # a truncated doc fills its bin — nothing joins it


def test_matches_driver_side_ffd_reference(docs, assign):
    """Per group, bin CONTENTS equal a pure-Python FFD over the same
    (n_tokens desc, tie_hash, doc_id) order."""
    keyed = docs.select(
        "doc_id", "n_tokens",
        F.pmod(F.xxhash64("doc_id", F.lit(42)), F.lit(8)).alias("g"),
        F.xxhash64("doc_id", F.lit(43)).alias("t"),
    ).collect()
    by_grp = {}
    for r in keyed:
        by_grp.setdefault(r.g, []).append((r.n_tokens, r.t, r.doc_id))
    want = {}
    for g, items in by_grp.items():
        items.sort(key=lambda x: (-x[0], x[1], x[2]))
        fills = []
        for n, _t, d in items:
            packed = min(n, SEQ)
            placed = None
            if n <= SEQ:
                for b, f in enumerate(fills):
                    if f + packed <= SEQ:
                        placed = b
                        break
            if placed is None:
                placed = len(fills)
                fills.append(0)
            fills[placed] += packed if n <= SEQ else SEQ + 1
            want[d] = (g, placed)
    got = {r.doc_id: (r.pack_group, r.bin_in_group) for r in assign.collect()}
    assert got == want


def test_packing_stats_accounting(docs, assign):
    st = packing_stats(assign, SEQ).collect()[0]
    assert st.n_docs == docs.count()
    n_bins = assign.select("pack_group", "bin_in_group").distinct().count()
    assert st.n_bins == n_bins
    total = sum(r.n_tokens_packed for r in assign.collect())
    assert st.waste_frac == pytest.approx(1 - total / (n_bins * SEQ))
    assert st.mean_fill > 0.8  # FFD on mixed sizes packs well


def test_plan_one_shuffle_no_collect(docs):
    # different (seq_len, n_groups) than the cached fixture, so the plan
    # is built fresh instead of resolving to an InMemoryTableScan
    plan = (
        pack_sequences(docs, SEQ + 1, n_groups=7)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "FlatMapGroupsInPandas" in plan


def test_rejects_bad_params(docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, 0, 8)
    with pytest.raises(ValueError):
        pack_sequences(docs, SEQ, 0)
