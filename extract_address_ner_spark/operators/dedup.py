"""Deduplication operators for training-data pipelines.

Seven families, each usable standalone and each with a driver-checked query
in entry_queries:

- exact:       sha256 content hash → groupBy (one shuffle on the hash; at
               100 TB this is the cheapest possible dedup — hash computed in
               the scan projection, map-side combine on the group).
- MinHash:     k-word shingles → n md5-derived min-hashes per doc — computed
               NARROW (no explode/shuffle until the band join); since round
               6 the default signature engine is an Arrow-batched vectorized
               kernel (hashlib md5 + NumPy family minima — the HOF
               expression path runs interpreted and measured ~7× slower;
               SPARK_GRAFT_MINHASH_IMPL=expr selects it, values identical).
- LSH:         banded minhash signatures → candidate pairs via an equi-join
               on (band_idx, band_signature) — the scale path for near-dup:
               candidates ∝ true duplicates, not n².
- n-gram Jaccard: exact verification on candidates (or, small-scale, on the
               shingle inverted index) — inter/union over distinct shingles.
- SimHash:     16-bit sign-sum sketch, narrow HOF compute; hamming-distance
               pairing for near-dup.
- embedding:   cosine near-dup over an embedding column (brute pairs at test
               scale; the ANN module's LSH buckets are the 100 TB path).
- components:  connected components over the near-dup pair list — cluster
               collapse / keeper selection, the stage after pair generation
               in a real dedup. Two interchangeable algorithms: min-label
               propagation (O(diameter) rounds — dense near-dup clusters)
               and alternating large-star/small-star (O(log² n) worst case —
               chain-shaped components).

All hash material derives from md5 hex prefixes so DuckDB oracles reproduce
values exactly (cross-engine bridge: conv(substr(md5(x),1,15),16,10)).

Caching contract: operators that feed one subplan into a self-join
(``lsh_candidate_pairs``, ``jaccard_pairs``, ``simhash_near_pairs``, and
``lsh_verified_pairs`` with prefilter) persist() that subplan so the
shingle/sketch work runs once, and the blocks stay cached after the result
is materialized (the laziness of the returned DataFrame means the operator
itself cannot know when it is safe to unpersist). Storage is MEMORY_AND_DISK
and LRU-evictable, so correctness is never at risk, but LONG-LIVED sessions
issuing many dedup calls have two escape hatches:

- ``dedup_cache_scope()`` (the library-friendly one): a context manager that
  collects every subplan these operators persist while it is active and
  unpersists them all on exit. Materialize the result INSIDE the scope::

      with dedup_cache_scope():
          pairs = lsh_verified_pairs(docs).collect()
      # no residual cached blocks here

- ``spark.catalog.clearCache()`` between workloads (bench.py does this; it
  also clears caches the caller made, so it is the blunt instrument).

``connected_components`` unpersists every intermediate round itself and
leaves only its final (already materialized) label table cached — that
final table is scope-registered too, so a ``dedup_cache_scope`` releases
it (unpersisting the already-released intermediates is a no-op).
"""

from __future__ import annotations

import contextlib
import threading

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Active dedup_cache_scope registries (a stack — scopes can nest; every
# active scope sees the persist so nesting never leaks). THREAD-LOCAL:
# scopes opened on one thread must never capture (and later unpersist)
# caches another thread sharing the SparkSession is still using.
_TLS = threading.local()


def _scopes() -> list[list[DataFrame]]:
    if not hasattr(_TLS, "stack"):
        _TLS.stack = []
    return _TLS.stack


def _persist(df: DataFrame) -> DataFrame:
    """persist() that registers with any active dedup_cache_scope on THIS
    thread so the scope can unpersist it on exit."""
    df = df.persist()
    for scope in _scopes():
        scope.append(df)
    return df


@contextlib.contextmanager
def dedup_cache_scope():
    """Unpersist every subplan the dedup operators cached while the scope
    was active. Results must be materialized (collected / written) inside
    the scope — after exit their cached inputs are released and a re-run
    would recompute them (correct, just slower)."""
    scope: list[DataFrame] = []
    stack = _scopes()
    stack.append(scope)
    try:
        yield
    finally:
        # remove by IDENTITY, not equality — two scopes' lists compare ==
        # whenever they hold the same DataFrames (or are both empty), and
        # list.remove would pop the OUTER scope's list from under a nested
        # scope, leaking its persists and raising on the outer exit
        for i, sc in enumerate(stack):
            if sc is scope:
                del stack[i]
                break
        for df in scope:
            df.unpersist()

N_HASHES = 16
BAND_SIZE = 4
SHINGLE_K = 3

#: Recommended PRODUCTION bucket cap for lsh_candidate_pairs /
#: lsh_verified_pairs (the correctness default stays None = exact
#: semantics). Measured trade-off (BENCH.md round-4 table): on the
#: sf0.1 planted-duplicate corpus, recall vs exact Jaccard is 1.0000 at
#: cap ∈ {None, 200, 50} — every pair in a capped bucket still meets in
#: one of its other n_bands-1 buckets (pinned ≥ 0.99 by pytest) — while
#: the cap bounds the worst-case m²/2 pair blowup of a boilerplate bucket
#: (the stress corpus in tests/test_datapipeline.py shows the blowup the
#: cap exists to stop).
DEFAULT_MAX_BUCKET_SIZE = 200


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(content_sha256, n_copies, keeper_id) per distinct content; keeper is
    the minimum id (deterministic)."""
    return (
        df.select(F.sha2(F.col(text_col), 256).alias("content_sha256"), id_col)
        .groupBy("content_sha256")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly the keeper row of each content group (min id)."""
    keepers = exact_dup_groups(df, text_col, id_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# shingles + minhash (narrow, HOF)
# --------------------------------------------------------------------------

def shingles_expr(text_col: str, k: int = SHINGLE_K) -> str:
    """k-word shingles as an array<string>; docs shorter than k words yield a
    single shingle of the whole text (so every doc has ≥1 shingle).

    Implementation: ONE regex scan (zero-width lookbehind anchors each word
    start, lookahead captures the k-word window) over space-normalized text —
    equivalent to the textbook filter/split/slice/concat_ws HOF pipeline but
    ~6x faster per row (the HOF form allocates a slice + concat per word
    position in the interpreted-expression path; measured 2.27s -> 0.37s on
    6.7k docs). Word = maximal run of non-space chars after collapsing runs
    of ' ' (tabs/newlines stay inside tokens, matching split(text, ' ') with
    empty segments dropped — the DuckDB oracle's formulation)."""
    norm = f"trim(regexp_replace({text_col}, ' +', ' '))"
    rx = r"'(?<=^| )(?=(([^ ]+ ){" + str(k - 1) + r"}[^ ]+))'"
    return f"""
    CASE WHEN size(split({norm}, ' ')) < {k} THEN array({norm})
    ELSE regexp_extract_all({norm}, {rx}, 1)
    END""".strip()


def _h64(expr: str) -> str:
    """Cross-engine 64-bit hash of a string expression (md5 hex prefix)."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


# Minhash family: DOUBLE HASHING (Kirsch-Mitzenmacher) — two independent
# 60-bit values h1, h2 from ONE md5 per shingle (hex chars 1-15 and 16-30),
# each reduced mod the Mersenne prime M31; family j is (h1 + j·h2) mod M31.
# Round-1 used an affine family (2j+1)·h + 7919j over a SINGLE base hash —
# small odd multipliers are piecewise-monotone transforms of h, so the
# families in a band were strongly correlated and accidental band
# collisions exploded with corpus size (measured: 20k distinct 24-word-
# vocab docs → 35,773 accidental candidate pairs affine vs 600 with double
# hashing; at 200k docs the affine family produced 1.87M candidates whose
# verification dominated the dedup job and killed its core-scaling).
# Products stay < 2^36 — exact in BIGINT on both engines (Spark 4 runs ANSI
# mode: overflow would raise, so staying in range is load-bearing).
M31 = 2147483647


def hash_pairs_expr(arr_col: str) -> str:
    """array<bigint> with BOTH base hashes PACKED per element of a
    string-array column: ``(h1 << 31) | h2`` (each h < M31 < 2^31, so the
    pack fits 62 bits — exact in BIGINT under ANSI). ONE md5 per element
    (the nested transform materializes the hex string before both substr
    reads; inlining by CollapseProject cannot duplicate the md5 because the
    inner transform is a separate HOF).

    Round-3 change: the round-2 formulation emitted a 2-element
    array<bigint> per shingle; packing into one primitive long removes that
    per-shingle ArrayData allocation + per-read element boxing in the
    interpreted-HOF path — measured 15-20% faster on the signature query at
    60k docs with byte-identical output."""
    return (
        f"transform(transform({arr_col}, s -> md5(s)), m -> "
        f"shiftleft(CAST(conv(substr(m, 1, 15), 16, 10) AS BIGINT) % {M31}, 31)"
        f" + CAST(conv(substr(m, 16, 15), 16, 10) AS BIGINT) % {M31})"
    )


def minhash_sig_expr(hash_col: str, n_hashes: int = N_HASHES) -> str:
    """array<bigint> of length n_hashes over a pre-computed packed-hash
    column (see hash_pairs_expr): sig[j] = min over shingles of
    (h1 + j·h2) mod M31, with h1 = p >> 31 and h2 = p & (2^31-1).

    md5 runs ONCE per shingle (the per-j work is integer bit ops), and the
    whole expression is wrapped in a dummy second reference to ``hash_col``:
    CollapseProject inlines single-referenced aliases into lambda bodies,
    where they are re-evaluated PER SEQUENCE ELEMENT — without the guard the
    shingle+md5 pipeline ran n_hashes× per row (measured 38.9s → 3.9s on 6.7k
    docs)."""
    sig = (
        f"transform(sequence(0, {n_hashes - 1}), "
        f"j -> array_min(transform({hash_col}, "
        f"p -> (shiftright(p, 31) + j * (p & {(1 << 31) - 1})) % {M31})))"
    )
    return f"CASE WHEN size({hash_col}) = -1 THEN NULL ELSE {sig} END"


def _minhash_sigs_batch(texts, n_hashes: int = N_HASHES, k: int = SHINGLE_K):
    """Vectorized Python twin of shingles_expr → hash_pairs_expr →
    minhash_sig_expr for ONE Arrow batch: returns a list (per text) of
    length-``n_hashes`` int lists (all-NULL elements for a NULL text —
    matching the expression path's ANSI semantics), byte-identical
    to the SQL-expression path (equality pinned in tests).

    Why it exists (optimization round 6, guide §4.2): Spark's higher-order
    functions (transform/aggregate lambdas) run INTERPRETED — no whole-stage
    codegen — so the md5+conv pack plus the 16-family min fold measured
    ~9.5s of the 14s dedup_minhash_signatures query at sf1.0 (67k docs,
    3.1M shingles, 32 cores). Here the md5s run through hashlib (C) and the
    (h1 + j*h2) % M31 family minima through one NumPy broadcast +
    minimum.reduceat per batch — same values, ~10x less per-shingle cost.

    Exactness notes: md5 hashes the UTF-8 bytes (same as Spark/DuckDB);
    int(hex[:15], 16) == conv(substr(md5, 1, 15), 16, 10) (60-bit, exact in
    int64); products stay < 2^36 so the int64 NumPy arithmetic is exact."""
    import hashlib

    import numpy as np

    md5 = hashlib.md5
    fb = int.from_bytes
    m60 = (1 << 60) - 1
    counts: list[int] = []
    h1l: list[int] = []
    h2l: list[int] = []
    null_rows: list[int] = []
    ap1, ap2 = h1l.append, h2l.append
    for i, text in enumerate(texts):
        if text is None:
            null_rows.append(i)
            counts.append(0)
            continue
        # encode words ONCE (each word sits in up to k shingles — hashing
        # the UTF-8 byte concatenation is identical to encoding the joined
        # string); generic slice path only for k != 3
        words = [w.encode("utf-8") for w in text.split(" ") if w]
        if len(words) < k:
            sh = [b" ".join(words)]
        elif k == 3:
            sh = [b"%s %s %s" % t for t in zip(words, words[1:], words[2:])]
        else:
            sh = [b" ".join(words[i0:i0 + k])
                  for i0 in range(len(words) - k + 1)]
        counts.append(len(sh))
        for s in sh:
            # digest bytes, not hexdigest: hex chars [0,15) are the first
            # 60 bits (d[:8] >> 4), chars [15,30) the next 60 (low 60 bits
            # of d[7:15]) — same values as conv(substr(md5_hex,...),16,10)
            d = md5(s).digest()
            ap1(fb(d[:8], "big") >> 4)
            ap2(fb(d[7:15], "big") & m60)
    # NULL text mirrors the expression path exactly: under ANSI size(NULL)
    # is NULL (never -1), so minhash_sig_expr's ELSE branch yields an array
    # of n_hashes NULL elements — not a NULL array (and the band table then
    # hashes concat_ws of all-null slices, i.e. md5('')). Byte-identical
    # here: [None] * n_hashes per null row.
    null_sig = [None] * n_hashes
    if not h1l:
        return [null_sig for _ in counts]
    h1 = np.asarray(h1l, dtype=np.int64) % M31
    h2 = np.asarray(h2l, dtype=np.int64) % M31
    j = np.arange(n_hashes, dtype=np.int64)
    mat = (h1[:, None] + j[None, :] * h2[:, None]) % M31
    ends = np.cumsum(np.asarray(counts, dtype=np.int64))
    starts = ends - np.asarray(counts, dtype=np.int64)
    null_set = set(null_rows)
    # reduceat needs non-empty segments; compute per-doc minima only over
    # docs that have shingles (every non-null doc has >= 1 by construction)
    live = [i for i in range(len(counts)) if i not in null_set]
    if live:
        sigs = np.minimum.reduceat(mat, starts[live], axis=0)
    out: list = [null_sig] * len(counts)
    for pos, i in enumerate(live):
        out[i] = sigs[pos]
    return out


def _sig_frame(
    df: DataFrame, text_col: str, id_col: str, n_hashes: int = N_HASHES
) -> DataFrame:
    """(id, _sig array<bigint>) — the MinHash signature table. Default
    engine is the Arrow-vectorized batch path (``_minhash_sigs_batch``);
    set SPARK_GRAFT_MINHASH_IMPL=expr for the pure-SQL-expression original
    (same values — equality pinned in tests)."""
    import os

    if os.environ.get("SPARK_GRAFT_MINHASH_IMPL", "arrow") == "expr":
        sig = minhash_sig_expr("_hs", n_hashes)
        return with_shingle_hashes(df, text_col).select(
            id_col, F.expr(sig).alias("_sig")
        )
    def _sig_fn(texts: pd.Series) -> pd.Series:
        return pd.Series(_minhash_sigs_batch(texts.tolist(), n_hashes))

    _sig_udf = F.pandas_udf(_sig_fn, "array<bigint>")
    return df.select(id_col, _sig_udf(F.col(text_col)).alias("_sig"))


def with_shingles(
    df: DataFrame, text_col: str = "text", out_col: str = "_shingles",
    k: int = SHINGLE_K,
) -> DataFrame:
    """Materialize the shingle array once as a column (shared subplan for
    signature / band / jaccard stages)."""
    return df.withColumn(out_col, F.expr(shingles_expr(text_col, k)))


def with_shingle_hashes(
    df: DataFrame, text_col: str = "text", out_col: str = "_hs",
    k: int = SHINGLE_K,
) -> DataFrame:
    """Packed (h1 << 31) + h2 base-hash pair per shingle (one md5 per
    shingle, shared by all hash families via double hashing)."""
    return with_shingles(df, text_col, "_shingles", k).withColumn(
        out_col, F.expr(hash_pairs_expr("_shingles"))
    )


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """Long format (id, h_idx, minhash) — the driver-checkable projection of
    the signature matrix."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(df.sparkSession)
    return (
        _sig_frame(df, text_col, id_col, n_hashes)
        .select(id_col, F.posexplode("_sig").alias("h_idx", "minhash"))
    )


def lsh_band_table(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
) -> DataFrame:
    """(id, band_idx, band_sig): each doc's banded MinHash signature, one
    row per band — the LSH bucket membership table. Shared by the one-shot
    self-join (``lsh_candidate_pairs``) and the incremental probe
    (``incremental_lsh_pairs``, which accumulates this table as the
    durable band INDEX across batches)."""
    n_bands = n_hashes // band_size
    return (
        _sig_frame(df, text_col, id_col, n_hashes)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {n_bands - 1}), "
                    f"b -> md5(concat_ws(',', slice(_sig, b * {band_size} + 1, {band_size}))))"
                )
            ).alias("band_idx", "band_sig"),
        )
    )


def lsh_candidate_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b): docs agreeing on ALL hashes
    of any band meet in a bucket. One equi-join keyed on (band_idx,
    band_sig) — skew-safe via AQE; bucket sizes are bounded by duplicate
    cluster sizes, not corpus size.

    ``max_bucket_size``: drop buckets holding more than this many docs
    BEFORE the self-join. The realistic failure of banded LSH on code/web
    corpora is a boilerplate bucket (shared license header, template page):
    a bucket of m docs emits m²/2 candidate pairs in ONE join group, so a
    single hot bucket holding 10% of a 100 TB corpus is quadratic output,
    not a skew-rebalance problem — AQE can split the straggler task but
    cannot shrink the pair count. Capping is the standard production fix
    (pairs within a dropped bucket can still meet in their other n_bands-1
    buckets). Default None = exact semantics (every bucket joined)."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(df.sparkSession)
    bands = lsh_band_table(df, text_col, id_col, n_hashes, band_size)
    if max_bucket_size is not None:
        # one extra aggregation on the SAME key the join shuffles on (the
        # exchange is reused), then filter — buckets above the cap never
        # reach the pair join
        sizes = bands.groupBy("band_idx", "band_sig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = (
            bands.join(sizes, ["band_idx", "band_sig"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    # the self-join would recompute the signature DAG for each side —
    # persist (LRU-evictable) so shingle/minhash work runs once
    bands = _persist(bands)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (inverted-index join)
# --------------------------------------------------------------------------

def jaccard_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact shingle-Jaccard for every pair sharing ≥1 shingle, filtered to
    J ≥ threshold. Shuffle keyed on shingle (inverted index) then on the
    pair — at 100 TB this runs on LSH candidates instead of the full index
    (compose: lsh_candidate_pairs → semi-join this)."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(df.sparkSession)
    sh = shingles_expr(text_col)
    toks = (
        df.select(id_col, F.explode(F.array_distinct(F.expr(sh))).alias("shingle"))
    )
    toks = _persist(toks)  # consumed 3x: both join sides + counts
    counts = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = toks.alias("a")
    b = toks.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(ca, "id_a")
        .join(cb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def lsh_verified_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    prefilter_candidates: bool = False,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """THE 100 TB near-dup path: banded-LSH candidate generation composed
    with exact shingle-Jaccard verification on candidates only. Unlike
    ``jaccard_pairs`` (inverted-index join — cost scales with shingle
    co-occurrence, i.e. corpus size), verification here touches only pairs
    LSH already bucketed together, so total cost scales with the duplicate
    volume. Jaccard is computed per candidate pair from the two docs'
    distinct-shingle arrays (array_intersect), matching jaccard_pairs'
    values exactly on shared pairs.

    ``prefilter_candidates``: semi-join the corpus to candidate-pair ids
    before shingling the verification sides. Turn ON at cluster scale,
    where candidates are a small fraction of the corpus (~1% near-dup rate
    → ~100x less verification scan+shingle work). OFF by default because
    at small/dup-dense scale (tests, sf0.1 bench: candidates cover most
    docs) the extra distinct+semi-join exchanges cost more than the
    shingling they avoid (measured 1.7s → 5.2s on 6.7k docs). Result is
    identical either way (equality-tested).

    ``max_bucket_size`` is forwarded to ``lsh_candidate_pairs`` (boilerplate-
    bucket cap — see there)."""
    cand = lsh_candidate_pairs(df, text_col, id_col, n_hashes, band_size,
                               max_bucket_size)
    return jaccard_verify(df, cand, text_col, id_col, threshold,
                          prefilter_candidates)


def similar_docs(
    df: DataFrame, queries: DataFrame, k: int = 10,
    text_col: str = "text", id_col: str = "doc_id",
    n_hashes: int = N_HASHES, band_size: int = BAND_SIZE,
    max_bucket_size: int | None = None,
    band_index: DataFrame | None = None,
) -> DataFrame:
    """Textual similarity SEARCH over the corpus — the serving read of the
    MinHash-LSH machinery (the embedding family's ``ann.py`` twin for
    text): for each query doc, the top-``k`` most-similar corpus docs as
    ``(query_id, doc_id, jaccard, rank)``, by exact shingle-Jaccard over
    LSH-candidate docs only. The "find documents like this one" read a
    training-data pipeline needs next after dedup — e.g. expanding one
    contaminated/flagged document into its whole near-dup family.

    Scale shape (100 TB corpus, handful-to-thousands of queries):

    - The corpus is scanned ONCE for its band table; the query band table
      (n_bands rows per query) is broadcast, so candidate generation is a
      map-side BroadcastHashJoin — no corpus self-join, no corpus shuffle.
    - Exact Jaccard runs on candidates only (same candidate-bounded cost
      argument as ``lsh_verified_pairs``); the corpus is semi-joined to
      candidate ids BEFORE shingling the verification side, so the
      shingle+intersect work is ∝ candidates, not corpus.
    - The per-query top-k window sees only that query's candidates —
      bounded by its duplicate family, never the corpus.
    - ``max_bucket_size`` (default None = exact) drops boilerplate buckets
      before the probe, same trade-off as ``lsh_candidate_pairs``.

    Ranking is deterministic cross-engine: jaccard is 4-dp-rounded FIRST
    (integer-count ratios — both engines compute the identical double) and
    ties break on ascending doc id. Queries drawn from the corpus never
    match themselves (``doc_id != query_id``).

    ``band_index``: a pre-materialized corpus band table — e.g. the
    durable ``bands/v*`` parquet index the incremental dedup path
    accumulates (entry_queries_streaming.merge_dedup_labels /
    compact_band_index) — so serving skips re-banding the corpus
    entirely: the probe reads the index, and the only corpus scan left is
    shingling the candidate docs. Must have been built with the same
    (n_hashes, band_size) and id/text columns; results are identical to
    the from-scratch path (pytest-pinned)."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(df.sparkSession)
    if band_index is not None:
        bands = band_index
    else:
        bands = lsh_band_table(df, text_col, id_col, n_hashes, band_size)
    if max_bucket_size is not None:
        sizes = bands.groupBy("band_idx", "band_sig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        bands = (
            bands.join(sizes, ["band_idx", "band_sig"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    q_bands = lsh_band_table(queries, text_col, id_col, n_hashes, band_size
                             ).withColumnRenamed(id_col, "query_id")
    cand = (
        bands.join(F.broadcast(q_bands), ["band_idx", "band_sig"])
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", id_col)
        .distinct()
    )
    cand = _persist(cand)  # feeds the semi-join AND the verify join
    corpus_sh = (
        with_shingles(df.join(cand.select(id_col).distinct(),
                              id_col, "left_semi"), text_col)
        .select(id_col, F.array_distinct(F.col("_shingles")).alias("_sb"))
    )
    q_sh = (
        with_shingles(queries, text_col)
        .select(F.col(id_col).alias("query_id"),
                F.array_distinct(F.col("_shingles")).alias("_sa"))
    )
    n_inter = F.size(F.array_intersect("_sa", "_sb"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("jaccard"), F.asc(id_col)
    )
    return (
        cand.join(corpus_sh, id_col)
        .join(F.broadcast(q_sh), "query_id")
        .withColumn(
            "jaccard",
            F.round(
                n_inter / (F.size("_sa") + F.size("_sb") - n_inter), 4
            ).cast("double"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "jaccard",
                F.col("rank").cast("int").alias("rank"))
    )


def jaccard_verify(
    df: DataFrame, cand: DataFrame, text_col: str = "text",
    id_col: str = "doc_id", threshold: float = 0.8,
    prefilter_candidates: bool = False,
) -> DataFrame:
    """Exact shingle-Jaccard verification of a candidate pair list
    (id_a, id_b) against the corpus — the shared back half of
    ``lsh_verified_pairs`` and the incremental probe path. See
    ``lsh_verified_pairs`` for the ``prefilter_candidates`` trade-off.

    Join shape (round 6): both endpoints' shingle arrays are gathered by
    TWO INDEPENDENT joins of the pair list against the (persisted) shingle
    table — both keyed on the doc id, so the shingle table's exchange is
    planned once and reused — and the two array-carrying halves then join
    on the full (id_a, id_b) pair key. The previous serial
    cand⋈a⋈b chain re-shuffled the array payload of the growing
    intermediate between the two joins; this shape shuffles array payloads
    ∝ candidates only and runs the two gathers as independent stages
    (measured 3.65s → 2.93s at sf1.0, identical output)."""
    cand = _persist(cand.select("id_a", "id_b"))  # both gathers + pair join
    base = df
    if prefilter_candidates:
        cand_ids = (
            cand.select(F.col("id_a").alias(id_col))
            .union(cand.select(F.col("id_b").alias(id_col)))
            .distinct()
        )
        base = df.join(cand_ids, id_col, "left_semi")
    # persist: the shingle table feeds BOTH gathers — without it the regex
    # shingling of the corpus runs twice (measured ~0.9s per pass at sf1.0)
    sh = _persist(
        with_shingles(base, text_col).select(
            id_col, F.array_distinct(F.col("_shingles")).alias("_sh")
        )
    )
    r1 = sh.join(cand, sh[id_col] == cand["id_a"]).select(
        "id_a", "id_b", F.col("_sh").alias("_sa")
    )
    r2 = sh.join(cand, sh[id_col] == cand["id_b"]).select(
        F.col("id_a").alias("_ia"), F.col("id_b").alias("_ib"),
        F.col("_sh").alias("_sb"),
    )
    n_inter = F.size(F.array_intersect("_sa", "_sb"))
    return (
        r1.join(
            r2,
            (r1["id_a"] == r2["_ia"]) & (r1["id_b"] == r2["_ib"]),
        )
        .withColumn(
            "jaccard",
            F.round(
                n_inter
                / (F.size("_sa") + F.size("_sb") - n_inter),
                4,
            ).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# near-dup connected components (cluster collapse / keeper selection)
# --------------------------------------------------------------------------

def _unionfind_remap(rows) -> list:
    """Driver-side union-find over a bounded pair list: returns
    ``(node, root)`` tuples for every non-root member, roots being the MIN
    id of each component — exactly the min-label CC contract. Shared by
    ``incremental_components`` and the bounded fast path of
    ``connected_components``."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for row in rows:
        ra, rb = find(row["id_a"]), find(row["id_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    groups: dict = {}
    for n in parent:
        groups.setdefault(find(n), []).append(n)
    return [
        (n, root) for root, members in groups.items()
        for n in members if n != root
    ]


def connected_components(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    max_iter: int = 25, driver_threshold: int = 0,
) -> DataFrame:
    """(doc_id, component_id): connected components over a near-dup pair
    list, component_id = min doc id in the component (deterministic);
    singletons label themselves. This is the stage a 100 TB dedup actually
    needs after pair generation — pairs don't pick keepers, clusters do.

    Algorithm: iterative min-label propagation (each round, every node takes
    the min of its own label and its neighbors' labels) — converges in
    O(component diameter) rounds; near-dup clusters are small and dense
    (diameter 1-3), so a handful of bounded shuffles, each keyed on the node
    id. Labels are persisted per round and the previous round is unpersisted
    (bounded lineage + bounded cache); convergence = no node's label changed
    this round, detected by an EXISTENCE check (limit(1) short-circuit) on a
    ``_changed`` flag computed INLINE with the label update
    (``min_incoming < own`` — round 5: the previous formulation joined the
    new label table back to the old one, a second O(nodes) join per round
    that the flag makes unnecessary at any scale). Round-3
    change (ADVICE r02): the previous sum-of-labels checksum silently
    assumed a numeric id column — with string ids F.sum returns NULL (or
    raises under ANSI) and None == None exited after one round,
    under-merging; huge numeric ids could also overflow the ANSI sum. The
    flag comparison works for any orderable id type. ``max_iter`` bounds
    pathological chain-shaped graphs — for those (long drift series where
    each doc is near-dup only of its neighbor) use
    ``connected_components_star``, the large-star/small-star variant that
    converges in ~log₂(chain) rounds; near-dup graphs are usually dense
    enough (diameter 1-3) that plain propagation wins on constant factors."""
    # Bounded driver fast path (round 6, opt-in via driver_threshold > 0):
    # when the pair list holds at most driver_threshold edges, one
    # limit(threshold+1).collect() + union-find replaces the whole
    # propagation loop (per-round join/aggregate/convergence-probe jobs are
    # pure fixed overhead at small pair counts — measured ~3-4s for 23k
    # pairs at sf1.0). Same contract and scale story as
    # incremental_components' driver_threshold: the collect is BOUNDED
    # (threshold+1 rows), an oversized pair list falls back to the
    # distributed loop below at the cost of that one probe action, and the
    # result is pytest-pinned identical between the paths.
    if driver_threshold > 0:
        rows = pairs.select("id_a", "id_b").limit(driver_threshold + 1).collect()
        if len(rows) <= driver_threshold:
            remap_rows = _unionfind_remap(rows)
            id_type = docs.schema[id_col].dataType
            schema = T.StructType([
                T.StructField("_old", id_type),
                T.StructField("_new", id_type),
            ])
            remap = docs.sparkSession.createDataFrame(remap_rows, schema)
            return docs.select(id_col).join(
                F.broadcast(remap),
                F.col(id_col) == F.col("_old"), "left"
            ).select(
                id_col,
                F.coalesce(F.col("_new"), F.col(id_col)).alias("component_id"),
            )
    # Round-4 per-round shuffle diet: edges are pre-partitioned on the
    # message SOURCE key and labels on the node key, both with the session
    # shuffle-partition count, and both CACHED — a cached DataFrame
    # preserves its outputPartitioning, so every round's edge⋈label join
    # and the label⋈min-message merge plan with ZERO new exchange
    # (pinned by tests/test_plans.py). The only per-round shuffle left is
    # the message aggregation itself — ∝ |edges|, never ∝ |nodes|. The
    # previous union+groupBy formulation re-shuffled the FULL label table
    # (O(nodes)) every round; at 100 TB that dominates.
    edges = _persist(
        pairs.select(F.col("id_a").alias("_u"), F.col("id_b").alias("_v"))
        .union(pairs.select(F.col("id_b").alias("_u"), F.col("id_a").alias("_v")))
        .repartition(F.col("_u"))
    )
    labels = _persist(
        docs.select(F.col(id_col).alias("_id"), F.col(id_col).alias("_lab"))
        .repartition(F.col("_id"))
    )
    for _ in range(max_iter):
        msgs = edges.join(
            labels, edges["_u"] == labels["_id"]
        ).select(F.col("_v").alias("_id"), "_lab")
        min_msgs = msgs.groupBy("_id").agg(F.min("_lab").alias("_m"))
        # new label = min(own, min incoming): identical to the
        # union+groupBy(min) formulation, but labels stay put. _changed is
        # computed inline (min incoming strictly improves the label), so
        # convergence needs NO second O(nodes) join — just an existence
        # scan of this round's cached labels. Next round's joins project
        # the flag away for free.
        new_labels = _persist(
            labels.join(min_msgs, "_id", "left").select(
                "_id",
                F.least(
                    F.col("_lab"), F.coalesce(F.col("_m"), F.col("_lab"))
                ).alias("_lab"),
                F.coalesce(
                    F.col("_m") < F.col("_lab"), F.lit(False)
                ).alias("_changed"),
            )
        )
        changed = new_labels.filter("_changed").limit(1).count()
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    out = labels.select(
        F.col("_id").alias(id_col), F.col("_lab").alias("component_id")
    )
    return out


def connected_components_star(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id",
    max_iter: int = 50, stats: dict | None = None,
) -> DataFrame:
    """(doc_id, component_id): connected components via ALTERNATING
    LARGE-STAR / SMALL-STAR (Kiveris et al., "Connected Components in
    MapReduce and Beyond") — the chain-safe variant of
    ``connected_components``. Same output contract: component_id = min doc
    id in the component, singletons label themselves.

    Why it exists: plain min-label propagation converges in O(component
    DIAMETER) rounds — fine for near-dup clusters (diameter 1-3) but O(n)
    on a chain-shaped component (pairwise-similar drift series, where each
    doc is within threshold of its neighbor only). Star contraction
    restructures the graph itself each round — large-star hooks every
    node's larger neighbors directly onto the minimum of its neighborhood,
    small-star flattens the smaller neighbors — so path lengths collapse
    geometrically: O(log² n) rounds worst-case, ~log₂(chain length)
    observed (pinned by tests/test_datapipeline.py on a 200-node chain).

    Each round is two bounded shuffle stages (a groupBy-min keyed on the
    node + an equi-join on the same key — AQE-handled, no cross join, no
    window), and edges stay in canonical (u > v) form throughout. The
    per-round edge set is ``localCheckpoint``-ed (eager): unlike persist(),
    checkpointing TRUNCATES the logical plan, which is load-bearing for
    this algorithm — the edge expression references the previous round's
    ~5 times, so without truncation Catalyst re-analyzes a plan tree that
    grows ~5^rounds and the driver, not the cluster, becomes the
    bottleneck. (The propagation variant gets away with persist() because
    its per-round fan-out is 2 and its round count small.) Checkpoint
    blocks are executor-local storage, dereferenced each round and
    reclaimed by the ContextCleaner; on a real cluster with flaky
    executors you'd point this at reliable checkpoint storage instead.
    Convergence = the edge set reached a fixed point (stars), checked by
    two left-anti existence probes over the two checkpointed sets that
    short-circuit at the first differing edge. ``stats``, if given,
    receives ``{"rounds": n_rounds_run}`` so callers/tests can assert the
    round bound."""
    e = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"),
            F.least("id_a", "id_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )

    def sym(edges: DataFrame) -> DataFrame:
        return edges.select(F.col("u").alias("x"), F.col("v").alias("nbr")).union(
            edges.select(F.col("v").alias("x"), F.col("u").alias("nbr"))
        )

    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # LARGE-STAR: every node x computes m = min(neighborhood(x) ∪ {x})
        # and hooks each STRICTLY LARGER neighbor onto m.
        s = sym(e)
        mins = (
            s.groupBy("x")
            .agg(F.min("nbr").alias("_mn"))
            .select("x", F.least("x", "_mn").alias("m"))
        )
        large = (
            s.join(mins, "x")
            .filter(F.col("nbr") > F.col("x"))
            .select(F.col("nbr").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()  # feeds small-star's sym twice
        )
        # SMALL-STAR: every node x hooks itself and all of its SMALLER
        # neighbors onto the minimum of those smaller neighbors.
        s2 = sym(large).filter(F.col("nbr") < F.col("x"))
        mins2 = s2.groupBy("x").agg(F.min("nbr").alias("m"))
        new_e = (
            s2.join(mins2, "x")
            .select(
                F.explode(
                    F.array(
                        F.struct(F.col("x").alias("u"), F.col("m").alias("v")),
                        F.struct(F.col("nbr").alias("u"), F.col("m").alias("v")),
                    )
                ).alias("_e")
            )
            .select("_e.u", "_e.v")
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # fixed point iff edge sets are equal — two short-circuiting
        # existence probes (both sides checkpointed, canonical (u>v) form)
        changed = (
            new_e.join(e, ["u", "v"], "left_anti").limit(1).count()
            + e.join(new_e, ["u", "v"], "left_anti").limit(1).count()
        )
        e = new_e
        if changed == 0:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # at the fixed point every edge is (node, component_min); centers and
    # singletons appear only on the v side / not at all → label themselves
    parents = e.groupBy(F.col("u").alias(id_col)).agg(
        F.min("v").alias("_parent")
    )
    return (
        docs.select(id_col)
        .join(parents, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("_parent"), F.col(id_col)).alias("component_id"),
        )
    )


def dedup_near(
    docs: DataFrame, pairs: DataFrame | None = None,
    text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.8, algorithm: str = "propagation",
    driver_threshold: int = 100_000,
) -> DataFrame:
    """END-TO-END near-dedup: keep exactly one representative (the min-id
    keeper) per near-duplicate component. Composes the full production
    chain — banded LSH candidates → Jaccard verification → connected
    components → keeper semi-join — as one operator; ``pairs`` lets a
    caller substitute any pair generator (SimHash, embedding cosine).
    The semi-join back to the corpus is keyed on the id (broadcast-able
    keeper side when duplicates are sparse).

    ``algorithm``: ``"propagation"`` (min-label — O(diameter) rounds, the
    right default for dense near-dup clusters) or ``"star"``
    (large-star/small-star — chain-safe, ~log₂ rounds on path-shaped
    components). Identical output either way (pytest-pinned)."""
    if algorithm not in ("propagation", "star"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    if pairs is None:
        pairs = lsh_verified_pairs(docs, text_col, id_col,
                                   threshold=threshold)
    if algorithm == "propagation":
        # driver_threshold: bounded union-find fast path for small verified
        # pair lists (see connected_components); identical output, falls
        # back to the distributed loop past the threshold
        comp = connected_components(
            docs, pairs, id_col, driver_threshold=driver_threshold
        )
    else:
        comp = connected_components_star(docs, pairs, id_col)
    keepers = comp.filter(F.col(id_col) == F.col("component_id")).select(id_col)
    return docs.join(keepers, id_col, "left_semi")


def incremental_components(
    prev_labels: DataFrame,
    new_pairs: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "component_id",
    max_iter: int = 25,
    driver_threshold: int = 0,
) -> DataFrame:
    """Merge a DELTA batch of near-dup pairs into an existing component
    labeling without recomputing components over the whole corpus — the
    missing piece of the incremental-KG story: ``merge_edge_snapshot``
    keeps the edge table fresh per micro-batch, and this keeps the dedup
    clusters fresh at a per-batch cost ∝ |delta|, never ∝ |corpus|.

    Contract matches ``connected_components``: labels are the MIN doc id
    in each component (any orderable id type), singletons label
    themselves, and the result is pytest-pinned IDENTICAL to a full
    recompute over (old edges ∪ delta edges) — the contraction argument:
    an existing label IS the min of its old component, so running CC over
    the delta edges with each endpoint contracted to its super-node (its
    prior label, or itself if new) yields per-super-node minima that equal
    the merged components' global minima.

    Scale shape (the reason this exists):
    - the delta's endpoints are resolved against the label table with the
      SMALL side broadcast (one map-side pass over prev_labels, no
      shuffle of it);
    - CC runs on the CONTRACTED graph only — O(|delta| + touched
      components) nodes;
    - the relabel is one broadcast join of the remap table (∝ delta)
      against prev_labels — a second map-side pass, again no shuffle of
      the big table.
    Two full scans of the label table per batch is the irreducible cost
    of reading + rewriting labels; nothing is ever shuffled or iterated
    at corpus size.

    ``driver_threshold`` (>0 to enable): when the CONTRACTED graph holds
    at most this many edges, compute its components with a driver-side
    union-find instead of the iterative distributed CC — one bounded
    ``limit(threshold+1).collect()`` replaces the CC loop's per-round
    join/aggregate/convergence-probe jobs (~6-10 Spark jobs of pure fixed
    overhead for a micro-batch-sized delta). This is NOT a driver-side
    loop over corpus data: the contracted graph is ∝ |delta| + touched
    components by construction, and a delta exceeding the threshold
    falls back to the distributed path (same one action spent checking).
    Result identity between the two paths is pytest-pinned."""
    clash = {"_n", "_s", "_old", "_new"} & set(prev_labels.columns)
    if clash:
        raise ValueError(
            f"incremental_components reserves internal column names "
            f"{sorted(clash)} — rename the input column(s)"
        )
    ends = _persist(
        new_pairs.select(F.col("id_a").alias("_n"))
        .union(new_pairs.select(F.col("id_b").alias("_n")))
        .distinct()
    )
    # endpoint → super-node (= prior label, or itself when unseen). The
    # inner join builds the broadcast from ends (small); the anti-join's
    # broadcast side is `known`, which is ⊆ ends.
    known = _persist(
        prev_labels.join(F.broadcast(ends),
                         prev_labels[id_col] == F.col("_n"))
        .select(F.col("_n"), F.col(label_col).alias("_s"))
    )
    unseen = ends.join(F.broadcast(known.select("_n")), "_n", "left_anti")
    mapped = known.unionByName(
        unseen.select("_n", F.col("_n").alias("_s"))
    )
    ce = (
        new_pairs
        .join(F.broadcast(mapped.withColumnRenamed("_n", "id_a")
                          .withColumnRenamed("_s", "_sa")), "id_a")
        .join(F.broadcast(mapped.withColumnRenamed("_n", "id_b")
                          .withColumnRenamed("_s", "_sb")), "id_b")
        .select(F.col("_sa").alias("id_a"), F.col("_sb").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    snodes = (
        ce.select(F.col("id_a").alias(id_col))
        .union(ce.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # remap: old super-node id → merged component label (∝ delta rows)
    remap = None
    if driver_threshold > 0:
        ce_rows = ce.limit(driver_threshold + 1).collect()
        if len(ce_rows) <= driver_threshold:
            remap_rows = _unionfind_remap(ce_rows)
            id_type = ce.schema["id_a"].dataType
            schema = T.StructType([
                T.StructField("_old", id_type),
                T.StructField("_new", id_type),
            ])
            remap = _persist(
                prev_labels.sparkSession.createDataFrame(remap_rows, schema)
            )
    if remap is None:
        remap = _persist(
            connected_components(snodes, ce, id_col=id_col, max_iter=max_iter)
            .select(F.col(id_col).alias("_old"),
                    F.col("component_id").alias("_new"))
            .filter(F.col("_old") != F.col("_new"))
        )
    relabeled = prev_labels.join(
        F.broadcast(remap), prev_labels[label_col] == F.col("_old"), "left"
    ).select(
        prev_labels[id_col].alias(id_col),
        F.coalesce(F.col("_new"), prev_labels[label_col]).alias(label_col),
    )
    added = unseen.join(
        F.broadcast(remap), unseen["_n"] == F.col("_old"), "left"
    ).select(
        F.col("_n").alias(id_col),
        F.coalesce(F.col("_new"), F.col("_n")).alias(label_col),
    )
    return relabeled.unionByName(added)


def incremental_lsh_pairs(
    new_docs: DataFrame,
    band_index: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket_size: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup candidate pairs for a DELTA batch of docs against a durable
    band INDEX (the accumulated ``lsh_band_table`` of every prior batch).
    Returns ``(pairs, new_bands)`` — the caller appends ``new_bands`` to
    the index. Pair-set completeness across batches: a pair {x, y} with
    x arriving no later than y shares some band bucket iff full-corpus LSH
    buckets them, and x's bands are in the index when y arrives — so the
    union of per-batch pair sets EQUALS the one-shot
    ``lsh_candidate_pairs`` set (pytest-pinned batch-by-batch).

    Scale shape: banding touches ONLY the new docs (∝ batch); the probe is
    one equi-join on (band_idx, band_sig) with the new side small — at
    cluster scale store the index PARTITIONED by a band-key hash so the
    probe co-locates and prunes, and broadcast the new side when the batch
    is small. Nothing rescans or re-hashes the existing corpus.

    ``max_bucket_size`` caps buckets by their size in (index ∪ new) AT
    PROBE TIME — equal to the one-shot cap only once all batches have
    arrived; mid-stream a bucket may emit pairs before it grows past the
    cap, so incremental-capped recall is ≥ one-shot-capped recall (and ≤
    uncapped). Pass None (default) for exact one-shot equivalence."""
    from ..session import ensure_optimizer_confs

    ensure_optimizer_confs(new_docs.sparkSession)
    nb = _persist(
        lsh_band_table(new_docs, text_col, id_col, n_hashes, band_size)
    )
    all_b = nb if band_index is None else band_index.unionByName(nb)
    if max_bucket_size is not None:
        sizes = all_b.groupBy("band_idx", "band_sig").agg(
            F.count(F.lit(1)).alias("_bn")
        )
        all_b = (
            all_b.join(sizes, ["band_idx", "band_sig"])
            .filter(F.col("_bn") <= max_bucket_size)
            .drop("_bn")
        )
    a = nb.alias("a")
    b = all_b.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_sig") == F.col("b.band_sig"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return pairs, nb


def incremental_dedup_batch(
    labels: DataFrame | None,
    band_index: DataFrame | None,
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    max_bucket_size: int | None = None,
    driver_threshold: int = 100_000,
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of NEAR-dup dedup-on-arrival — the full incremental
    chain: band the new docs and probe the durable band index
    (``incremental_lsh_pairs``), Jaccard-verify only the delta candidates
    (``jaccard_verify`` with the prefilter semi-join — candidates are
    sparse relative to the corpus by construction), and merge the verified
    delta pairs into the component labeling (``incremental_components``).
    Returns ``(labels', new_bands)``; the caller durably appends
    ``new_bands`` to the index, persists ``labels'``, and appends
    ``new_docs`` to ``corpus`` — exactly the foreachBatch shape
    ``merge_edge_snapshot`` uses for the edge table.

    ``corpus`` must already INCLUDE this batch (verification reads both
    sides' text), and doc ids must be unique across batches (append-only
    corpus — exact re-arrivals belong to the EXACT dedup-on-arrival stage
    upstream). New docs with no verified pair enter ``labels'`` as
    singletons, so keeper selection (label == id) works mid-stream.

    End-to-end equivalence with the one-shot ``dedup_near`` keeper set is
    pytest-pinned batch-by-batch at ``max_bucket_size=None`` (see the
    probe-time cap note on ``incremental_lsh_pairs``).

    ``driver_threshold`` defaults ON here (100k contracted edges ≈ a few
    MB driver-side): a micro-batch's verified-dup delta is small by
    construction, and the union-find fast path removes the CC loop's
    fixed per-round job overhead from every batch (see
    ``incremental_components``; oversized deltas fall back)."""
    cand, nb = incremental_lsh_pairs(
        new_docs, band_index, text_col, id_col, n_hashes, band_size,
        max_bucket_size,
    )
    verified = jaccard_verify(
        corpus, cand, text_col, id_col, threshold, prefilter_candidates=True
    )
    if labels is None:
        labels = (
            new_docs.select(F.col(id_col), F.col(id_col).alias("component_id"))
            .limit(0)
        )
    # EAGER lineage truncation, not just persist: the verified delta feeds
    # incremental_components through several broadcast builds and the CC
    # convergence loop's per-round actions — with a lazy cache each of
    # those replans the full band→probe→verify DAG and the batch costs
    # ~12x more wall (measured 109s → 9s at smoke scale). The delta is
    # tiny (∝ batch dup volume), so checkpointing it is cheap; same
    # plan-truncation rationale (incl. the reliable-storage caveat on real
    # clusters) as connected_components_star's per-round edge sets.
    verified = verified.select("id_a", "id_b").localCheckpoint()
    merged = incremental_components(
        labels, verified, id_col=id_col, driver_threshold=driver_threshold
    )
    # singleton arrivals: new docs untouched by any verified pair still get
    # a self-label row. The anti-join's right side is the DELTA pairs'
    # endpoint set (small, broadcast) — never the corpus-sized label table.
    ends = (
        verified.select(F.col("id_a").alias(id_col))
        .union(verified.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    singles = new_docs.select(id_col).join(
        F.broadcast(ends), id_col, "left_anti"
    ).select(F.col(id_col), F.col(id_col).alias("component_id"))
    return merged.unionByName(singles), nb


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    # materialize shingles, then per-shingle hashes, then the bit fold —
    # each computed once per row, not once per bit
    return (
        with_shingles(df, text_col)
        .withColumn(
            "_hashes", F.expr(f"transform(_shingles, s -> {_h64('s')})")
        )
        .select(
            id_col,
            # the double reference to _hashes (size guard) stops
            # CollapseProject from inlining the md5 pipeline into the per-bit
            # lambda (same trap as minhash_sig_expr)
            F.expr(
                f"""
    CASE WHEN size(_hashes) = -1 THEN NULL ELSE
    aggregate(sequence(0, {SIMHASH_BITS - 1}), CAST(0 AS BIGINT),
      (acc, b) -> acc + CASE WHEN
        aggregate(_hashes, 0, (c, h64) ->
          c + CASE WHEN shiftright(h64, b) % 2 = 1 THEN 1 ELSE -1 END) > 0
        THEN CAST(pow(2, b) AS BIGINT) ELSE CAST(0 AS BIGINT) END) END
    """.strip()
            ).alias("simhash"),
        )
    )


def simhash_near_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    max_hamming: int = 4, n_blocks: int = 4, bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance, with PIGEONHOLE blocking:
    the sketch is cut into ``n_blocks`` chunks and docs meet if ANY chunk
    matches exactly (a pair within hamming ≤ n_blocks-1 is guaranteed to
    share a clean chunk; with max_hamming ≥ n_blocks recall is probabilistic
    but high). Join is keyed on (chunk_idx, chunk_value) — never a cross
    join."""
    chunk_bits = bits // n_blocks
    mask = (1 << chunk_bits) - 1
    sigs = simhash_signatures(df, text_col, id_col)
    chunks = sigs.select(
        id_col,
        "simhash",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {n_blocks - 1}), "
                f"c -> shiftright(simhash, c * {chunk_bits}) % {mask + 1})"
            )
        ).alias("chunk_idx", "chunk_val"),
    )
    chunks = _persist(chunks)  # self-join: compute the sketch once
    a = chunks.alias("a")
    b = chunks.alias("b")
    pop = "bit_count(a.simhash ^ b.simhash)"
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .withColumn("hamming", F.expr(pop))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            "hamming",
        )
        .dropDuplicates(["id_a", "id_b"])
    )


# --------------------------------------------------------------------------
# embedding-cosine near-dup
# --------------------------------------------------------------------------

def cosine_sim_expr(a: str, b: str) -> str:
    """Cosine similarity of two array<float/double> columns, computed in
    double with deterministic left-to-right summation."""
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    na = f"sqrt(aggregate({a}, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    nb = f"sqrt(aggregate({b}, CAST(0 AS DOUBLE), (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    return f"({dot}) / (({na}) * ({nb}))"


def embedding_dup_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (id_a < id_b), score rounded to 4 dp.
    Brute-force pair join — correct baseline; ``embedding_dup_pairs_ivf``
    is the bucketed scale path."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(F.expr(cosine_sim_expr("_va", "_vb")), 4).cast("double"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_dup_pairs_ivf(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_centroids: int = 32, seed: int = 42,
) -> DataFrame:
    """Bucketed embedding near-dup — the 100 TB path: vectors are assigned
    to IVF clusters (a FIXED count of broadcast hash-sampled seed centroids
    — bounded broadcast, O(n · n_centroids) assignment — and a map-side-
    combinable argmax; see operators/ann.py) and the pair join is keyed on
    cluster_id, so the comparison count is sum over clusters of |c|² instead
    of n². Near-dups at cosine ≥ 0.95 sit closer to each other than to
    distinct centroids, so same-cluster recall is high (measured in tests
    against the brute path). Same scoring expression and output schema as
    ``embedding_dup_pairs``."""
    from .ann import ivf_assign, seed_centroids

    cents = seed_centroids(emb, n_centroids, seed, id_col, vec_col)
    assign = ivf_assign(emb, cents, id_col, vec_col)
    clustered = emb.select(id_col, vec_col).join(assign, id_col)
    a = clustered.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"), "cluster_id"
    )
    b = clustered.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"), "cluster_id"
    )
    return (
        a.join(b, "cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cosine",
            F.round(F.expr(cosine_sim_expr("_va", "_vb")), 4).cast("double"),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
