"""Training-data export stage (round 5): deterministic sharded export
(balance, completeness, manifest accounting, one file per shard) and
source-mixture sampling (exact deterministic subsets, upsampling epochs,
partitioning independence)."""

import glob
import json

from pyspark.sql import functions as F

from extract_address_ner_spark.entry_queries_data import dup_documents
from extract_address_ner_spark.operators import export as X


def test_export_shards_roundtrip_balance_manifest(spark, sf_smoke, tmp_path):
    docs = dup_documents(spark, sf_smoke).select("doc_id", "text")
    n = docs.count()
    out = str(tmp_path / "shards")
    man = X.export_shards(docs, out, n_shards=8)

    # completeness: round-trip row set identical
    back = spark.read.parquet(out)
    assert back.count() == n
    assert sorted(r["doc_id"] for r in back.select("doc_id").collect()) == \
        sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    # manifest accounting matches the data exactly
    with open(f"{out}/_manifest.json") as f:
        disk = json.load(f)
    assert disk == man
    assert man["total_docs"] == n
    sizes = [s["docs"] for s in man["shards"].values()]
    assert sum(sizes) == n and len(sizes) == 8
    # hash balance at 672/8 ≈ 84 docs/shard: loose 2x bound on spread
    assert max(sizes) <= 2 * max(1, min(sizes)), sizes
    # token accounting consistent with the shared estimator
    from extract_address_ner_spark.functions.textstats import (
        with_token_stats,
    )
    total_tokens = with_token_stats(docs).agg(
        F.sum("n_tokens_bpe")).collect()[0][0]
    assert man["total_tokens"] == total_tokens

    # small-files discipline: exactly one parquet file per shard dir
    for k in range(8):
        assert len(glob.glob(f"{out}/shard={k}/*.parquet")) == 1, k

    # determinism: re-export under any input partitioning → same shards
    man2 = X.export_shards(docs.repartition(13), str(tmp_path / "s2"),
                           n_shards=8)
    assert man2["shards"] == man["shards"]


def test_mixture_sample_semantics(spark, sf_smoke):
    docs = dup_documents(spark, sf_smoke).select("doc_id", "text") \
        .withColumn("source", F.when(F.col("doc_id") % 3 == 0, "web")
                    .when(F.col("doc_id") % 3 == 1, "code")
                    .otherwise("books"))
    counts = {r["source"]: r["n"] for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}

    rates = {"web": 0.3, "code": 2.5, "books": 0.0}
    mixed = X.mixture_sample(docs, rates, "source")
    rows = mixed.select("doc_id", "source", "epoch").collect()

    by_source = {}
    per_doc = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # rate 0: nothing survives; rate 0.3: a strict hash subset near 30%
    assert "books" not in by_source
    n_web = len(by_source["web"])
    assert 0.15 * counts["web"] <= n_web <= 0.45 * counts["web"]
    assert all(e == [0] for d, e in per_doc.items() if d % 3 == 0)
    # rate 2.5: EVERY code doc appears 2 or 3 times with epochs 0..k-1,
    # and the mean lands near 2.5
    code_epochs = [sorted(per_doc[d]) for d in per_doc if d % 3 == 1]
    assert len(code_epochs) == counts["code"]
    assert all(e in ([0, 1], [0, 1, 2]) for e in code_epochs)
    mean = sum(len(e) for e in code_epochs) / counts["code"]
    assert 2.2 <= mean <= 2.8, mean

    # pure function of (id, seed): identical under re-run AND any input
    # partitioning; different seed → different subset
    key = lambda rs: sorted((r["doc_id"], r["epoch"]) for r in rs)  # noqa: E731
    again = X.mixture_sample(docs.repartition(17), rates, "source").collect()
    assert key(again) == key(rows)
    other = X.mixture_sample(docs, rates, "source", seed=1).collect()
    assert key(other) != key(rows)

    # unknown sources pass through exactly once
    thru = X.mixture_sample(docs, {"web": 0.5}, "source")
    assert thru.filter("source != 'web'").count() == \
        counts["code"] + counts["books"]


def test_mixture_sample_stays_narrow(spark, sf_smoke):
    """The scale claim: mixture sampling adds NO exchange — the plan on a
    parquet scan contains zero Exchange operators (filter + generate ride
    the scan stage). floor=False: the round-6 source partition floor adds
    its own (input-side) exchange on the one-row-group test parquet; this
    pin is about the SAMPLING operator, so it reads the raw scan."""
    docs = dup_documents(spark, sf_smoke, floor=False) \
        .select("doc_id", "text").withColumn("source", F.lit("web"))
    out = X.mixture_sample(docs, {"web": 1.7}, "source")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_export_reserved_name_guards(spark):
    """Inputs shadowing the operators' output columns must raise clearly
    (the ADVICE-r04 collision rule, applied to new surface)."""
    import pytest

    df = spark.createDataFrame([(1, "t")], "doc_id long, text string")
    with pytest.raises(ValueError, match="shard"):
        X.with_shard(df.withColumn("shard", F.lit(0)), 4)
    with pytest.raises(ValueError, match="epoch"):
        X.mixture_sample(df.withColumn("epoch", F.lit(0)),
                         {}, "text")
    with pytest.raises(ValueError, match="n_shards"):
        X.with_shard(df, 0)
    with pytest.raises(ValueError, match=">= 0"):
        X.mixture_sample(df.withColumn("source", F.lit("a")),
                         {"a": -0.1}, "source")
