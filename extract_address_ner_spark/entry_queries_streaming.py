"""Driver-checkable STREAMING queries (round 3, VERDICT r02 #6).

The streaming operators (extract_address_ner_spark.streaming) were
pytest-only in round 2; these queries drive them through the round driver's
CORRECTNESS harness the same way ``pipeline_resume_equivalence`` drives the
checkpoint-resume path: each query runs a real Structured Streaming job
(file source → transform → availableNow drain → parquet sink, exactly-once
checkpointed) inside a temp dir, reads the sink back as a batch DataFrame,
and returns rows an ANSI-SQL oracle pins exactly.

- ``streaming_extract_mentions``: the stream≡batch equivalence — the
  stateless extraction plan over a 3-drop incremental ingest must emit
  EXACTLY the batch gold mention rows (same oracle as ``extract_mentions``).
- ``streaming_dedup_exact``: dedup-on-arrival
  (dropDuplicatesWithinWatermark) over the planted-duplicate corpus — the
  emitted hash SET equals DISTINCT sha256(text), independent of which
  arrival won a group (so the oracle is order-insensitive and exact).
- ``streaming_windowed_counts``: watermarked 1-hour windows over events in
  APPEND mode — only windows the final watermark (max ts − 30 min) closed
  are emitted; the oracle reproduces the cutoff rule in SQL.
- ``streaming_stateful_totals`` / ``streaming_stateful_multibatch``: the
  applyInPandasWithState operator over one batch (per-batch emission) and
  over TWO batches (state carrying across micro-batches — the final
  per-repo maxima are SQL-expressible).
- ``streaming_graph_edges`` (round 4): INCREMENTAL KG construction —
  foreachBatch merges each micro-batch's edge delta into a
  snapshot-versioned warehouse table; the final snapshot equals the batch
  ``graph_edges`` result (same oracle verbatim).
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .entry_queries import DUCK_SHA, register
from .entry_queries_data import DUP_DOCS_DUCK, dup_documents
from .sources import corpus as C
from .streaming import stream as S

MERGE_KEYS = ["subj", "pred", "obj"]

MENTION_COLS = [
    "repo", "path", "commit", "mention_text", "m_start", "m_end",
    "confidence", "content_sha256", "doc_id",
]


#: hard cap on rows these HARNESS queries may pull to the driver. The
#: production streaming operators write to sinks; re-materializing through
#: the driver is a harness-only idiom (the sink's temp dir vanishes before
#: the round driver collects), bounded at driver-check scale. If anything
#: ever runs these at a scale where the cap trips, the loud failure is the
#: point — the fix is a persisted temp table, not raising the cap.
HARNESS_MAX_ROWS = 100_000


def _bounded_rows(out: DataFrame) -> DataFrame:
    """Materialize a sink read-back as a driver-local DataFrame, failing
    loudly instead of silently becoming a driver-memory bomb (VERDICT r03
    #8)."""
    rows = out.limit(HARNESS_MAX_ROWS + 1).collect()
    if len(rows) > HARNESS_MAX_ROWS:
        raise RuntimeError(
            f"streaming harness read-back exceeds {HARNESS_MAX_ROWS} rows — "
            "this collect() is a driver-check-scale idiom; stage through a "
            "persisted temp table for larger runs"
        )
    return out.sparkSession.createDataFrame(rows, out.schema)


def _drain(stream_df: DataFrame, out_dir: str, ckpt_dir: str) -> None:
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


@register("streaming_extract_mentions", C.gold_mentions_sql(sha256_fn=DUCK_SHA))
def q_streaming_mentions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream ≡ batch for the flagship extraction: the corpus lands as three
    separate parquet drops (simulating incremental ingest); the SAME
    extract_mentions plan runs on the file-source stream and must produce
    exactly the batch gold rows — the file source is exactly-once and the
    operator is stateless, so nothing is duplicated or lost."""
    work = tempfile.mkdtemp(prefix="stream_mentions_")
    try:
        corpus = C.corpus_from_documents(spark, sf_dir)
        in_dir = f"{work}/ingest"
        # three incremental drops keyed on doc_id (deterministic split)
        for part in range(3):
            corpus.filter(F.col("doc_id") % 3 == part).coalesce(1) \
                .write.mode("append").parquet(in_dir)
        stream = S.read_corpus_stream(spark, in_dir, max_files_per_trigger=1)
        mentions = S.stream_extract_mentions(stream)
        _drain(mentions, f"{work}/out", f"{work}/ckpt")
        out = spark.read.parquet(f"{work}/out").select(*MENTION_COLS)
        # materialize (bounded) before the temp dir vanishes
        return _bounded_rows(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


@register(
    "streaming_dedup_exact",
    f"""
WITH dup AS ({DUP_DOCS_DUCK})
SELECT DISTINCT {DUCK_SHA.format('text')} AS content_sha256 FROM dup""",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup on arrival: the planted-duplicate corpus flows through
    content-hash-keyed dropDuplicatesWithinWatermark; exactly one row per
    distinct content is emitted. Arrival timestamps are packed inside the
    watermark horizon so a batch split can never age state out and re-emit
    a hash — the emitted SET is therefore exactly DISTINCT sha256(text)
    regardless of which physical row won each group."""
    work = tempfile.mkdtemp(prefix="stream_dedup_")
    try:
        docs = dup_documents(spark, sf_dir).withColumn(
            "ts",
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_dt_interval(
                    F.lit(0), F.lit(0), F.lit(0), (F.col("doc_id") % 300)
                )
            # write NTZ so the read-back schema below is a plain match, not
            # an engine/config-sensitive LTZ→NTZ reinterpretation (ADVICE
            # r03 — harmless under the pinned UTC session tz, fragile
            # otherwise)
            ).cast("timestamp_ntz"),
        )
        in_dir = f"{work}/ingest"
        docs.coalesce(1).write.parquet(in_dir)
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp_ntz")
            .parquet(in_dir)
        )
        deduped = S.stream_dedup_exact(stream, ts_col="ts", text_col="text")
        _drain(deduped, f"{work}/out", f"{work}/ckpt")
        out = spark.read.parquet(f"{work}/out").select("content_sha256").distinct()
        return _bounded_rows(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


_STATEFUL_ORACLE = f"""
WITH m AS ({{gold}})
SELECT repo, CAST(count(*) AS BIGINT) AS batch_mentions,
  CAST(count(*) AS BIGINT) AS total_mentions,
  CAST(1 AS BIGINT) AS updates
FROM m GROUP BY repo"""


@register(
    "streaming_stateful_totals",
    _STATEFUL_ORACLE.format(gold=C.gold_mentions_sql(sha256_fn=DUCK_SHA)),
)
def q_streaming_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (applyInPandasWithState running
    per-repo totals) driven through the driver harness: the corpus lands
    as ONE parquet file so the availableNow drain is exactly one
    micro-batch — each repo then emits exactly one update row
    (batch_mentions = total_mentions = its gold mention count,
    updates = 1), which is exactly SQL-expressible. The state store,
    Arrow group iteration, and update-mode emission all run for real;
    multi-batch accumulation semantics stay pinned by
    tests/test_stateful_streaming.py."""
    from .streaming.stateful import running_repo_totals

    work = tempfile.mkdtemp(prefix="stream_state_")
    try:
        corpus = C.corpus_from_documents(spark, sf_dir)
        in_dir = f"{work}/ingest"
        corpus.coalesce(1).write.parquet(in_dir)  # one file → one batch
        stream = S.read_corpus_stream(spark, in_dir)
        totals = running_repo_totals(S.stream_extract_mentions(stream))
        q = (
            totals.writeStream.format("memory")
            .queryName("stateful_totals_driver")
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.sql(
            "SELECT repo, batch_mentions, total_mentions, updates "
            "FROM stateful_totals_driver"
        )
        return _bounded_rows(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


_STATEFUL_MULTI_ORACLE = """
WITH m AS ({gold})
SELECT repo, CAST(count(*) AS BIGINT) AS total_mentions,
  CAST(count(DISTINCT doc_id % 2) AS BIGINT) AS updates
FROM m GROUP BY repo"""


@register(
    "streaming_stateful_multibatch",
    _STATEFUL_MULTI_ORACLE.format(gold=C.gold_mentions_sql(sha256_fn=DUCK_SHA)),
)
def q_streaming_stateful_multibatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-BATCH state accumulation driven through the driver harness
    (VERDICT r03 #5): the corpus lands as TWO parquet drops (doc_id
    parity); maxFilesPerTrigger=1 makes the availableNow drain exactly two
    micro-batches, so the GroupState genuinely CARRIES between batches —
    the reason applyInPandasWithState exists. The update-mode memory sink
    accumulates one row per (batch, repo-with-mentions); taking the
    per-repo maxima (both counters are monotone) yields the FINAL state,
    which is exactly SQL-expressible and batch-order-independent:
    total_mentions = the repo's gold mention count, updates = how many of
    the two parity drops contained a mention for that repo."""
    from .streaming.stateful import running_repo_totals

    work = tempfile.mkdtemp(prefix="stream_state_mb_")
    try:
        corpus = C.corpus_from_documents(spark, sf_dir)
        in_dir = f"{work}/ingest"
        for part in range(2):  # two drops → two micro-batches
            corpus.filter(F.col("doc_id") % 2 == part).coalesce(1) \
                .write.mode("append").parquet(in_dir)
        stream = S.read_corpus_stream(spark, in_dir, max_files_per_trigger=1)
        totals = running_repo_totals(S.stream_extract_mentions(stream))
        q = (
            totals.writeStream.format("memory")
            .queryName("stateful_multibatch_driver")
            .outputMode("update")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = spark.sql(
            "SELECT repo, max(total_mentions) AS total_mentions, "
            "max(updates) AS updates "
            "FROM stateful_multibatch_driver GROUP BY repo"
        )
        return _bounded_rows(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


_STREAM_WIN_ORACLE = """
WITH ev AS (SELECT * FROM events),
wm AS (SELECT max(ts) - INTERVAL '30 minutes' AS w FROM ev)
SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
  time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS win_end,
  event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(round(sum(value), 4) AS DOUBLE) AS sum_value
FROM ev GROUP BY 1, 2, 3
HAVING win_end <= (SELECT w FROM wm)"""


@register("streaming_windowed_counts", _STREAM_WIN_ORACLE)
def q_streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked windowed aggregation in APPEND mode: the availableNow
    drain processes all events in one batch (watermark still at epoch → no
    rows dropped), then the final no-data batch advances the watermark to
    max(ts) − 30 min and flushes every window it closed. The oracle
    reproduces exactly that cutoff: windows with win_end <= max(ts) − 30
    min. Windows still open at the cutoff stay in state and are not
    emitted — the defining append-mode behavior this query pins."""
    work = tempfile.mkdtemp(prefix="stream_win_")
    try:
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        in_dir = f"{work}/ingest"
        ev.coalesce(1).write.parquet(in_dir)  # one file → one batch
        stream = spark.readStream.schema(ev.schema).parquet(in_dir)
        agg = S.windowed_event_counts(
            stream, window="1 hour", watermark="30 minutes"
        )
        _drain(agg, f"{work}/out", f"{work}/ckpt")
        out = spark.read.parquet(f"{work}/out").select(
            "win_start", "win_end", "event_type", "n_events",
            F.col("sum_value").cast("double").alias("sum_value"),
        )
        return _bounded_rows(out)
    finally:
        shutil.rmtree(work, ignore_errors=True)


#: buckets per edge snapshot — the unit of incremental rewrite. At 100 TB
#: this is sized so one bucket ≈ one comfortable rewrite task set (e.g. 4096
#: buckets over a 100 TB table → ~25 GB/bucket); the driver-check default
#: keeps directories countable in tests.
EDGE_SNAPSHOT_BUCKETS = 16

_MANIFEST = "manifest.json"


def _edge_bucket(n_buckets: int):
    """Deterministic bucket of an edge row — pmod(xxhash64(subj), n). Keyed
    on subj ONLY (not the full edge identity) so the snapshot layout doubles
    as the subj-keyed read layout (``link.write_edges_bucketed`` discipline)
    and a delta's touched-bucket set is exactly its distinct-subj hash set."""
    return F.pmod(F.xxhash64(F.col("subj")), F.lit(n_buckets))


def _version_dirs(edges_root: str) -> list[int]:
    import os
    import re

    if not os.path.isdir(edges_root):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(edges_root)
        if (m := re.fullmatch(r"v(\d+)", d))
    )


def _read_manifest(edges_root: str, version: int) -> dict:
    import json

    with open(f"{edges_root}/v{version}/{_MANIFEST}") as f:
        return json.load(f)


def merge_edge_snapshot(delta: DataFrame, edges_root: str,
                        batch_id: int,
                        n_buckets: int = EDGE_SNAPSHOT_BUCKETS) -> None:
    """One INCREMENTAL KG merge step (the foreachBatch body of
    ``q_streaming_edges``, exposed for pytest): merge the micro-batch's edge
    delta into the snapshot chain under ``edges_root`` as version
    ``v<batch_id>``, rewriting ONLY the subj-hash buckets the delta touches.

    Round-5 rework (VERDICT r04 #2 — the old shape re-wrote the ENTIRE
    table every micro-batch):

    - The snapshot is hash-bucketed on subj (``_edge_bucket``, the
      ``write_edges_bucketed`` layout). A merge reads the previous
      snapshot's TOUCHED buckets only, unions the delta, re-aggregates, and
      writes those buckets under ``v<batch_id>/data/bucket=<b>``. Write
      amplification is O(touched buckets), not O(table).
    - UNTOUCHED buckets are never copied: the version's ``manifest.json``
      points them at the prior version's bucket directories (Iceberg's
      manifest-reuse of unchanged data files, on the parquet stand-in).
      Readers resolve the manifest, so a version is always a complete table
      view while storing only its own delta's buckets.
    - The merge is ``groupBy(subj, pred, obj).max(confidence)`` — max is
      associative, commutative, AND idempotent, so any drop order converges
      to the same table.
    - REPLAY safety is structural, not just algebraic: the previous state
      is the latest version STRICTLY BELOW ``batch_id``, so a replayed
      batch (foreachBatch re-executes its last batch after a failure) never
      reads the snapshot it is rewriting. The new version is staged to
      ``v<batch_id>.tmp`` and atomically renamed (ADVICE r04: a mid-write
      crash leaves the prior chain fully intact — the partial tmp dir is
      simply re-staged on replay).

    Old versions accumulate until ``expire_snapshots`` prunes them to a
    retention window (manifest-liveness aware)."""
    import json
    import os
    import shutil

    spark = delta.sparkSession
    prior = [v for v in _version_dirs(edges_root) if v < batch_id]
    prev_manifest = _read_manifest(edges_root, prior[-1]) if prior else None
    if prev_manifest is not None:
        n_buckets = prev_manifest["n_buckets"]  # layout is chain-wide

    # EAGER lineage truncation (round-5 code review): the delta plan —
    # typically the whole extract→canonicalize→link chain over the
    # micro-batch — is consumed TWICE below (touched-bucket collect, then
    # the staged write); unpersisted it would run end-to-end twice per
    # batch. The delta is micro-batch-sized, so checkpointing it is cheap.
    delta = delta.select(*MERGE_KEYS, "confidence").withColumn(
        "bucket", _edge_bucket(n_buckets)
    ).localCheckpoint()
    # touched-bucket set: ≤ n_buckets scalars to the driver, never row data
    touched = sorted(
        r["bucket"] for r in delta.select("bucket").distinct().collect()
    )
    prev_pointers: dict[str, str] = (
        dict(prev_manifest["buckets"]) if prev_manifest else {}
    )
    prev_paths = [
        f"{edges_root}/{prev_pointers[str(b)]}"
        for b in touched
        if str(b) in prev_pointers
    ]
    merged = delta
    if prev_paths:
        prev_df = spark.read.parquet(*prev_paths).select(
            *MERGE_KEYS, "confidence"
        ).withColumn("bucket", _edge_bucket(n_buckets))
        merged = merged.unionByName(prev_df)
    merged = (
        merged.groupBy("bucket", *MERGE_KEYS)
        .agg(F.max("confidence").alias("confidence"))
    )

    staged = f"{edges_root}/v{batch_id}.tmp"
    final = f"{edges_root}/v{batch_id}"
    shutil.rmtree(staged, ignore_errors=True)
    if touched:
        # one shuffle task per touched bucket → exactly one file per bucket
        # directory (small-files discipline, same as write_edges_bucketed)
        (
            merged.repartition(len(touched), F.col("bucket"))
            .write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{staged}/data")
        )
    else:
        os.makedirs(staged, exist_ok=True)
    pointers = {
        k: v for k, v in prev_pointers.items() if int(k) not in set(touched)
    }
    pointers.update(
        {str(b): f"v{batch_id}/data/bucket={b}" for b in touched}
    )
    with open(f"{staged}/{_MANIFEST}", "w") as f:
        json.dump(
            {"batch_id": batch_id, "n_buckets": n_buckets,
             "buckets": pointers},
            f, indent=1, sort_keys=True,
        )
    # atomic publish: the version becomes visible only complete; a replay
    # discards any previous copy of ITS OWN version (recomputable from the
    # prior chain + the replayed delta) before the rename
    shutil.rmtree(final, ignore_errors=True)
    os.rename(staged, final)


def expire_snapshots(edges_root: str, keep: int) -> list[int]:
    """Retention for the snapshot chain (VERDICT r04 #2): keep the newest
    ``keep`` manifests as readable versions and delete every version
    directory that is neither retained nor REFERENCED by a retained
    manifest's bucket pointers. Manifest-liveness matters: an incremental
    version stores only its touched buckets, so an old version's data dir
    must survive as long as any retained manifest still points into it —
    exactly Iceberg's expire_snapshots reachability rule. Returns the
    deleted version ids."""
    import shutil

    versions = _version_dirs(edges_root)
    if keep < 1:
        raise ValueError("keep must be >= 1")
    retained = versions[-keep:]
    live = set(retained)
    for v in retained:
        for rel in _read_manifest(edges_root, v)["buckets"].values():
            live.add(int(rel.split("/", 1)[0][1:]))  # "v<N>/data/..." → N
    deleted = [v for v in versions if v not in live]
    for v in deleted:
        shutil.rmtree(f"{edges_root}/v{v}", ignore_errors=True)
    return deleted


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-predicate delta between two edge-table snapshot versions — the
    read-side complement of ``merge_edge_snapshot``'s versioned writes
    (Iceberg's snapshot-diff / incremental-read, on the parquet-warehouse
    stand-in): (pred, n_old, n_new, n_added, n_removed), where added /
    removed are keyed on (subj, pred, obj). Both directions are left-anti
    joins keyed on the edge identity — output ∝ the CHANGED edges, the
    per-pred rollup is map-side combined, and nothing is materialized
    driver-side."""
    keys = MERGE_KEYS
    added = new.join(old.select(keys), keys, "left_anti")
    removed = old.join(new.select(keys), keys, "left_anti")

    def _count(df: DataFrame, name: str) -> DataFrame:
        return df.groupBy("pred").agg(
            F.count(F.lit(1)).cast("long").alias(name)
        )

    return (
        _count(new, "n_new")
        .join(_count(old, "n_old"), "pred", "full")
        .join(_count(added, "n_added"), "pred", "left")
        .join(_count(removed, "n_removed"), "pred", "left")
        .select(
            "pred",
            *[F.coalesce(c, F.lit(0)).cast("long").alias(c)
              for c in ("n_old", "n_new", "n_added", "n_removed")],
        )
    )


def merge_dedup_labels(
    new_docs: DataFrame,
    root: str,
    batch_id: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> None:
    """foreachBatch body for NEAR-dup dedup-on-arrival: maintain the near-
    duplicate component labeling of an append-only corpus across micro-
    batches, per-batch cost ∝ the batch (``incremental_dedup_batch``:
    band the batch → probe the durable band index → verify delta
    candidates → merge into the labeling). The streaming sibling of
    ``merge_edge_snapshot`` — same durable layout discipline under
    ``root``:

    - ``corpus/v<batch>/``, ``bands/v<batch>/``: per-batch appends (docs
      and their ``lsh_band_table`` rows). A replayed batch OVERWRITES its
      own directory — idempotent, and the batch is re-read from its own
      durable parquet before processing, which both survives source
      replays and cuts the streaming-source lineage (the operator's
      localCheckpoint rationale).
    - ``labels/v<batch>/``: snapshot-versioned label table; the previous
      state is the latest version STRICTLY BELOW ``batch_id`` (a replay
      never reads the version it rewrites), staged to ``.tmp`` and
      atomically renamed. Label versions are SELF-CONTAINED (the table is
      O(corpus ids), not O(corpus text)) so retention needs no manifest
      liveness — ``expire_label_snapshots(root, keep>=2)`` simply keeps
      the newest K (keep ≥ 2 is the replay floor: a replayed last batch
      reads the version before it). Band/corpus drops are never expired —
      the probe index needs full history.

    Replay safety end-to-end: a crash between the corpus/bands overwrite
    and the labels rename leaves the prior label chain intact; the replay
    recomputes from strictly-prior state plus its own re-written batch
    (pytest corrupts and replays the last batch; labels byte-equal)."""
    import os
    import shutil

    spark = new_docs.sparkSession
    own_corpus = f"{root}/corpus/v{batch_id}"
    # stage-and-rename, not overwrite-in-place: a REPLAY's input may be
    # derived from this very directory (recovery tooling re-feeding the
    # durable drop), and overwriting a path mid-read is the read-while-
    # overwrite hazard (ADVICE r04). The staged write reads the input
    # while the old copy is still intact, then swaps.
    staged_c = f"{own_corpus}.tmp"
    shutil.rmtree(staged_c, ignore_errors=True)
    new_docs.select(id_col, text_col).write.mode("overwrite").parquet(
        staged_c
    )
    shutil.rmtree(own_corpus, ignore_errors=True)
    os.rename(staged_c, own_corpus)
    batch = spark.read.parquet(own_corpus)

    _restore_displaced_bands(root)  # heal a crashed compaction first
    prior_band_vs = [v for v in _version_dirs(f"{root}/bands")
                     if v < batch_id]
    band_index = (
        spark.read.parquet(
            *[f"{root}/bands/v{v}" for v in prior_band_vs]
        )
        if prior_band_vs else None
    )
    prior_label_vs = [v for v in _version_dirs(f"{root}/labels")
                      if v < batch_id]
    labels = (
        spark.read.parquet(f"{root}/labels/v{prior_label_vs[-1]}")
        if prior_label_vs else None
    )
    corpus_vs = [v for v in _version_dirs(f"{root}/corpus")
                 if v <= batch_id]
    corpus = spark.read.parquet(
        *[f"{root}/corpus/v{v}" for v in corpus_vs]
    )

    from .operators.dedup import dedup_cache_scope, incremental_dedup_batch

    # scope the operator-held persists to THIS batch: a long-running
    # streaming query runs thousands of micro-batches, and without the
    # scope each batch would leak ~5 cached subplans into the CacheManager
    # forever (the dedup module's own cache-contract — dedup.py:89)
    with dedup_cache_scope():
        new_labels, nb = incremental_dedup_batch(
            labels, band_index, batch, corpus,
            text_col=text_col, id_col=id_col, threshold=threshold,
        )
        nb.write.mode("overwrite").parquet(f"{root}/bands/v{batch_id}")
        staged = f"{root}/labels/v{batch_id}.tmp"
        final = f"{root}/labels/v{batch_id}"
        shutil.rmtree(staged, ignore_errors=True)
        new_labels.write.mode("overwrite").parquet(staged)
    shutil.rmtree(final, ignore_errors=True)
    os.rename(staged, final)


def _restore_displaced_bands(root: str) -> None:
    """Crash recovery for ``compact_band_index``'s publish window: a
    compaction displaces the original ``v<N>`` to ``v<N>.old`` before
    renaming the combined dir into place. If it died between those two
    renames, the index would silently lose v<N>'s rows (``.old`` isn't a
    listed version) — so restore any displaced original whose base dir is
    missing, drop ``.old`` leftovers whose base exists (the combined dir
    already holds their rows), and clear stray ``.tmp`` stages. Called
    before every compaction AND every probe-index read; single-writer
    maintenance assumed, like the rest of the chain."""
    import os
    import shutil

    bands = f"{root}/bands"
    if not os.path.isdir(bands):
        return
    for d in os.listdir(bands):
        path = f"{bands}/{d}"
        if d.endswith(".old"):
            base = path[:-4]
            if os.path.isdir(base):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.rename(path, base)
        elif d.endswith(".tmp"):
            shutil.rmtree(path, ignore_errors=True)


def compact_band_index(spark: SparkSession, root: str,
                       keep: int = 2) -> list[int]:
    """Compact the ``merge_dedup_labels`` band index: every batch appends
    a ``bands/v<batch>`` directory, so the per-batch probe's multi-path
    read lists O(batches) directories forever. Compaction merges all band
    drops EXCEPT the newest ``keep`` into the highest merged version's
    directory (one combined parquet dir), deleting the originals — reads
    of "versions strictly below N" see exactly the same rows, and replay
    only ever re-feeds the LAST batch, which stays uncompacted
    (``keep >= 2`` enforced, the same replay floor as
    ``expire_label_snapshots``).

    Crash safety by atomic renames + recovery + idempotence: the combined
    dir is staged, the original ``v<high>`` is DISPLACED to ``v<high>.old``
    (atomic rename, rows never deleted before the replacement is live),
    the staged dir is renamed into place (atomic), and only then are the
    ``.old`` copy and the older originals removed. The one dangerous
    window — died between the two renames, leaving no listed ``v<high>``
    — is healed by ``_restore_displaced_bands`` (run before every
    compaction and every probe read); every other crash point leaves at
    worst duplicate band rows, which the probe's canonical
    ``dropDuplicates`` tolerates and a re-run removes, so compacting a
    half-compacted chain converges. Returns the removed version ids."""
    import os
    import shutil

    if keep < 2:
        raise ValueError(
            "keep must be >= 2 — the last batch must stay replayable"
        )
    _restore_displaced_bands(root)
    versions = _version_dirs(f"{root}/bands")
    to_merge = versions[:-keep] if len(versions) > keep else []
    if len(to_merge) < 2:
        return []
    high = to_merge[-1]
    combined = spark.read.parquet(
        *[f"{root}/bands/v{v}" for v in to_merge]
    ).dropDuplicates()
    staged = f"{root}/bands/v{high}.tmp"
    shutil.rmtree(staged, ignore_errors=True)
    combined.write.mode("overwrite").parquet(staged)
    final = f"{root}/bands/v{high}"
    displaced = f"{final}.old"
    shutil.rmtree(displaced, ignore_errors=True)
    os.rename(final, displaced)
    os.rename(staged, final)
    shutil.rmtree(displaced, ignore_errors=True)
    removed = [v for v in to_merge if v != high]
    for v in removed:
        shutil.rmtree(f"{root}/bands/v{v}", ignore_errors=True)
    return removed


def expire_label_snapshots(root: str, keep: int) -> list[int]:
    """Retention for the ``merge_dedup_labels`` label chain: keep the
    newest ``keep`` versions, delete the rest (label versions are
    self-contained — no manifest-liveness rule needed, unlike
    ``expire_snapshots``). ``keep >= 2`` is enforced: a replayed batch N
    reads the latest version strictly below N, so the version before the
    newest must survive until the newest can no longer be replayed.
    Returns the deleted version ids."""
    import shutil

    if keep < 2:
        raise ValueError(
            "keep must be >= 2 — a replayed last batch reads the version "
            "before it"
        )
    versions = _version_dirs(f"{root}/labels")
    deleted = versions[:-keep] if len(versions) > keep else []
    for v in deleted:
        shutil.rmtree(f"{root}/labels/v{v}", ignore_errors=True)
    return deleted


def read_edge_snapshot(
    spark: SparkSession, edges_root: str, version: int | None = None
):
    """Read one complete table view from the snapshot chain: resolve the
    version's manifest and scan the union of its bucket directories (its own
    touched buckets + pointers into prior versions). Default: latest."""
    versions = _version_dirs(edges_root)
    if not versions:
        return None
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"snapshot v{v} does not exist under {edges_root}")
    pointers = _read_manifest(edges_root, v)["buckets"]
    if not pointers:
        return None
    paths = [f"{edges_root}/{rel}" for rel in pointers.values()]
    return spark.read.parquet(*paths).select(*MERGE_KEYS, "confidence")


def _latest_edge_snapshot(spark: SparkSession, edges_root: str):
    return read_edge_snapshot(spark, edges_root)


@register("streaming_graph_edges", None)  # oracle attached below (shared)
def q_streaming_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL KG construction end-to-end: the corpus arrives as three
    drops; the streaming side runs the stateless extraction
    (``stream_extract_mentions``), and ``foreachBatch`` canonicalizes each
    micro-batch, builds its edge DELTA with the production ``build_edges``
    operator, and merges it into a snapshot-versioned warehouse edge table
    (``merge_edge_snapshot``). After the availableNow drain, the latest
    snapshot must equal the BATCH ``graph_edges`` result exactly — pinned
    by sharing ``gold_edges_sql()`` verbatim. This is the production shape
    for keeping a 100 TB KG current: per-batch work ∝ the delta, the
    merge shuffle ∝ |edge table|, and nothing reprocesses the corpus."""
    from .operators.canonicalize import canonicalize_mentions
    from .operators.link import build_edges
    from .operators.validate import road_address_gate

    work = tempfile.mkdtemp(prefix="stream_edges_")
    try:
        corpus = C.corpus_from_documents(spark, sf_dir)
        in_dir = f"{work}/ingest"
        for part in range(3):
            corpus.filter(F.col("doc_id") % 3 == part).coalesce(1) \
                .write.mode("append").parquet(in_dir)
        stream = S.read_corpus_stream(spark, in_dir, max_files_per_trigger=1)
        mentions = S.stream_extract_mentions(stream)
        edges_root = f"{work}/edges"

        def _merge(batch_df: DataFrame, batch_id: int) -> None:
            delta = build_edges(
                canonicalize_mentions(road_address_gate(batch_df)))
            merge_edge_snapshot(delta, edges_root, batch_id)
            # production retention runs inline with the merge: keep the two
            # newest readable versions; manifest-liveness keeps any older
            # version they still point into (result-invariant — readers
            # take the latest version either way)
            expire_snapshots(edges_root, keep=2)

        q = (
            mentions.writeStream.foreachBatch(_merge)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out = _latest_edge_snapshot(spark, edges_root)
        assert out is not None, "stream drained but no edge snapshot exists"
        return _bounded_rows(out.select("subj", "pred", "obj", "confidence"))
    finally:
        shutil.rmtree(work, ignore_errors=True)


def _attach_shared_edges_oracle() -> None:
    from .entry_queries import _REGISTRY

    _REGISTRY["streaming_graph_edges"] = (
        _REGISTRY["streaming_graph_edges"][0],
        _REGISTRY["graph_edges"][1],
    )


_attach_shared_edges_oracle()


def _snapshot_diff_oracle() -> str:
    from .entry_queries import gold_edges_sql

    v0 = gold_edges_sql("(SELECT * FROM documents WHERE doc_id % 3 = 0)")
    vf = gold_edges_sql()
    return f"""
WITH v0 AS ({v0}),
vf AS ({vf}),
added AS (SELECT pred FROM vf ANTI JOIN v0 USING (subj, pred, obj)),
removed AS (SELECT pred FROM v0 ANTI JOIN vf USING (subj, pred, obj)),
nn AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_new FROM vf GROUP BY 1),
no AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_old FROM v0 GROUP BY 1),
na AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_added FROM added GROUP BY 1),
nr AS (SELECT pred, CAST(count(*) AS BIGINT) AS n_removed
       FROM removed GROUP BY 1)
SELECT pred,
  CAST(coalesce(n_old, 0) AS BIGINT) AS n_old,
  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
  CAST(coalesce(n_added, 0) AS BIGINT) AS n_added,
  CAST(coalesce(n_removed, 0) AS BIGINT) AS n_removed
FROM nn FULL JOIN no USING (pred)
LEFT JOIN na USING (pred) LEFT JOIN nr USING (pred)"""


@register("edges_snapshot_diff", None)  # oracle attached below (built lazily)
def q_edges_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot TIME-TRAVEL diff (round 4): the per-predicate edge delta
    between snapshot v0 (edges built from the first ingest drop —
    doc_id % 3 == 0, the same drop split ``streaming_graph_edges`` uses)
    and the final merged table (≡ edges over the full corpus, by the
    max-merge idempotency that query pins). This is Iceberg's
    incremental-read/changelog shape on the parquet-warehouse stand-in:
    consumers ask "what changed between snapshots", not "give me the
    table twice". The oracle rebuilds both versions from the planted gold
    and anti-joins them natively."""
    from .operators.canonicalize import canonicalize_mentions
    from .operators.link import build_edges
    from .operators.tagger import extract_mentions
    from .operators.validate import road_address_gate

    corpus = C.corpus_from_documents(spark, sf_dir)

    def chain(c: DataFrame) -> DataFrame:
        return build_edges(
            canonicalize_mentions(road_address_gate(extract_mentions(c)))
        )

    old = chain(corpus.filter(F.col("doc_id") % 3 == 0))
    return snapshot_diff(old, chain(corpus))


def _attach_snapshot_diff_oracle() -> None:
    from .entry_queries import _REGISTRY

    _REGISTRY["edges_snapshot_diff"] = (
        _REGISTRY["edges_snapshot_diff"][0],
        _snapshot_diff_oracle(),
    )


_attach_snapshot_diff_oracle()
