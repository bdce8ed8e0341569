"""Training-data EXPORT stage: deterministic sharded corpus export and
source-mixture sampling — the step a training-data pipeline runs after
dedup + quality filtering, producing the sharded table a data loader
streams and the mixture the training run actually sees.

Design rules shared with the rest of the repo: no wall-clock or RNG state
inside jobs (assignments are seeded hash functions of the row id — any
re-run, any partitioning, any cluster size produces the identical
export); one aligned shuffle per materialization with one file per shard
directory (the ``write_edges_bucketed`` small-files discipline); driver
sees only per-shard counters, never row data.

At 100 TB: shard assignment is a narrow projection (no shuffle until the
single aligned repartition that the write itself needs); mixture
sampling is a narrow filter/explode (NO shuffle at all) that composes
under pushdown with the scan. Shard-count choice is the usual
bucket-sizing rule: total bytes / n_shards ≈ a comfortable loader unit.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HASH_MOD = 1_000_000


def with_shard(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", seed: int = 0
) -> DataFrame:
    """Deterministic shard assignment: ``pmod(xxhash64(id, seed), n)``.
    Hash-uniform, so shards are balanced in docs AND (because content is
    independent of the id hash) in tokens, with the usual O(1/sqrt(m))
    concentration — the balance bound is pytest-measured, not assumed."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if "shard" in df.columns:
        raise ValueError(
            "with_shard reserves the output column name 'shard' — rename "
            "the input column"
        )
    return df.withColumn(
        "shard",
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(n_shards))
        .cast("int"),
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
) -> dict:
    """Materialize the corpus as ``out_dir/shard=<k>/`` parquet, one file
    per shard (aligned ``repartition(n_shards, shard)`` →
    ``partitionBy``), plus a ``_manifest.json`` of per-shard doc/BPE-token
    counts written AFTER the data — its presence is the export's
    completeness marker (same role as a ``_SUCCESS``/snapshot manifest).
    Returns the manifest dict. Token counts use the shared
    ``textstats.with_token_stats`` BPE-ish estimator, so the manifest's
    budget numbers agree with the pipeline's other token accounting."""
    from ..functions.textstats import with_token_stats

    sharded = with_shard(df, n_shards, id_col, seed)
    (
        sharded.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    # counters only to the driver: n_shards rows of (docs, tokens). Stats
    # read the WRITTEN files, not the input lineage — one cheap columnar
    # scan instead of recomputing a possibly-expensive upstream twice, and
    # the manifest provably describes the bytes on disk.
    stats = {
        int(r["shard"]): {"docs": int(r["docs"]), "tokens": int(r["tokens"])}
        for r in with_token_stats(
            df.sparkSession.read.parquet(out_dir).select("shard", text_col),
            text_col,
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens_bpe").alias("tokens"),
        )
        .collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "shards": {str(k): stats.get(k, {"docs": 0, "tokens": 0})
                   for k in range(n_shards)},
        "total_docs": sum(s["docs"] for s in stats.values()),
        "total_tokens": sum(s["tokens"] for s in stats.values()),
    }
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def mixture_sample(
    df: DataFrame,
    rates: dict,
    source_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic source-mixture sampling: each row's source gets a
    target ``rate`` (epochs) — ``0.3`` keeps a fixed hash-selected 30%,
    ``2.5`` repeats every row twice and a hash-selected half a third time
    (the high-quality-source upweighting a training mixture needs).
    Sources absent from ``rates`` pass through at rate 1.

    Output adds ``epoch`` (0-based repeat index) so downstream shuffling
    can spread repeats across shards. The decision is a pure function of
    (id, seed): NO shuffle, no RNG state, identical under any
    partitioning or retry — `pmod(xxhash64(id, seed), 1e6) < frac * 1e6`
    decides the fractional repeat, `explode(sequence(...))` emits the
    integer repeats; Catalyst keeps the whole thing in the scan stage."""
    for k, v in rates.items():
        if v < 0:
            raise ValueError(f"rate for {k!r} must be >= 0")
    clash = {"epoch", "_n"} & set(df.columns)
    if clash:
        raise ValueError(
            f"mixture_sample reserves output column names {sorted(clash)} "
            "— rename the input column(s)"
        )
    rate = F.lit(1.0)
    for k, v in rates.items():
        rate = F.when(F.col(source_col) == F.lit(k), F.lit(float(v))) \
            .otherwise(rate)
    whole = F.floor(rate).cast("int")
    frac = rate - whole
    u = F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(_HASH_MOD)) \
        / F.lit(float(_HASH_MOD))
    n_copies = (whole + (u < frac).cast("int")).alias("_n")
    return (
        df.withColumn("_n", n_copies)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )
