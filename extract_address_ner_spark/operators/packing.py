"""Sequence packing: place each document into exactly one fixed-capacity
training sequence (a "bin" of ``seq_len`` tokens), bins near-full.

LLM training consumes fixed-length token sequences; feeding one (padded)
document per sequence wastes the context window, so production pipelines
pack many short documents into each sequence (T5's "packing", GPT-style
concat-and-chunk without the cross-document attention bleed). Packing is a
bin-packing problem — inherently sequential within a bin — so the Spark
formulation splits it in two:

1. a DISTRIBUTED deterministic partition of the corpus into pack-groups
   (``pmod(xxhash64(doc_id, seed), n_groups)``) — any engine, partitioning,
   or retry produces the same groups, and each group's expected token mass
   is corpus_tokens/n_groups, so the caller sizes ``n_groups`` to make a
   group comfortably fit one task (the ONLY shuffle in the operator);
2. a PER-GROUP first-fit-decreasing (FFD) pass inside ``applyInPandas`` —
   classic 11/9·OPT + 1 bin quality, deterministic because the scan order
   is (n_tokens DESC, hash, doc_id), a total order.

Global bin ids are ``(group, local_bin)`` pairs — no driver coordination,
no global sequence generator, so the operator scales with executors.

Documents longer than ``seq_len`` are kept alone in their own bin and
flagged ``truncated`` (packed length capped at ``seq_len``); a training
exporter can split them instead — the flag carries the information either
way.

Scale notes (100 TB): one hash-key shuffle of (doc_id, n_tokens) pairs —
NOT of the text — then a narrow per-group pass whose state is one Python
list per open bin; re-joining the assignment to content is the caller's
broadcast-free equi-join on doc_id. Skew is impossible by construction:
groups are uniform hash buckets of doc_ids, and FFD's worst group cost is
O(n·bins) over the docs IN that group only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_ASSIGN_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("pack_group", IntegerType()),
    StructField("bin_in_group", IntegerType()),
    StructField("n_tokens_packed", LongType()),
    StructField("truncated", BooleanType()),
])


def _ffd_group(pdf: pd.DataFrame, seq_len: int) -> pd.DataFrame:
    """First-fit-decreasing over one pack-group. Deterministic: docs are
    scanned in (n_tokens DESC, tie_hash, doc_id) order — a total order —
    and each goes to the FIRST bin it fits, else opens a new bin."""
    cols = [
        "doc_id", "pack_group", "bin_in_group",
        "n_tokens_packed", "truncated",
    ]
    if len(pdf) == 0:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols[:4]}
                            | {"truncated": pd.Series(dtype="bool")})
    pdf = pdf.sort_values(
        ["n_tokens", "tie_hash", "doc_id"],
        ascending=[False, True, True],
    )
    grp = int(pdf["pack_group"].iloc[0])
    fills: list[int] = []  # fills[b] = tokens already in bin b
    out = []
    for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
        n = int(n)
        packed, trunc = (min(n, seq_len), n > seq_len)
        placed = None
        if not trunc:
            for b, f in enumerate(fills):
                if f + packed <= seq_len:
                    placed = b
                    break
        if placed is None:
            placed = len(fills)
            fills.append(0)
        # a truncated doc CLOSES its bin (sentinel over capacity) so even
        # zero-token docs can't share a sequence with a split document
        fills[placed] += packed if not trunc else seq_len + 1
        out.append((int(doc_id), grp, placed, packed, trunc))
    return pd.DataFrame(out, columns=cols)


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_groups: int,
    doc_id_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
    seed: int = 42,
) -> DataFrame:
    """Assignment table ``(doc_id, pack_group, bin_in_group,
    n_tokens_packed, truncated)`` — each input doc exactly once, every
    bin's packed total <= seq_len, identical output for any input
    partitioning. Join it back to the corpus on doc_id to materialize the
    packed sequences."""
    if seq_len <= 0 or n_groups <= 0:
        raise ValueError("pack_sequences: seq_len and n_groups must be > 0")
    keyed = df.select(
        F.col(doc_id_col).cast("long").alias("doc_id"),
        F.col(n_tokens_col).cast("long").alias("n_tokens"),
        F.pmod(F.xxhash64(doc_id_col, F.lit(seed)), F.lit(n_groups))
        .cast("int").alias("pack_group"),
        F.xxhash64(doc_id_col, F.lit(seed + 1)).alias("tie_hash"),
    )
    return keyed.groupBy("pack_group").applyInPandas(
        lambda pdf: _ffd_group(pdf, seq_len), _ASSIGN_SCHEMA
    )


def packing_stats(assign: DataFrame, seq_len: int) -> DataFrame:
    """One row: (n_docs, n_bins, n_truncated, mean_fill, waste_frac).
    ``waste_frac`` = unused token slots / total slots across all bins."""
    per_bin = assign.groupBy("pack_group", "bin_in_group").agg(
        F.sum("n_tokens_packed").alias("fill"),
        F.max(F.col("truncated").cast("int")).alias("trunc"),
    )
    return per_bin.agg(
        F.sum(F.lit(1)).cast("long").alias("n_bins"),
        F.sum("trunc").cast("long").alias("n_truncated_bins"),
        F.avg(F.col("fill") / F.lit(seq_len)).alias("mean_fill"),
        (F.lit(1.0) - F.sum("fill") / (F.count(F.lit(1)) * F.lit(seq_len)))
        .alias("waste_frac"),
    ).crossJoin(
        F.broadcast(assign.agg(F.count(F.lit(1)).cast("long").alias("n_docs")))
    ).select("n_docs", "n_bins", "n_truncated_bins", "mean_fill", "waste_frac")
