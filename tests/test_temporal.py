"""Temporal operators (round 4): asof_join and session_agg against
independent driver-side reference implementations on adversarial fixtures
(equal timestamps, unmatched lefts, duplicate right keys needing the
tiebreak, gap-boundary sessions)."""

import random

from pyspark.sql import functions as F

from extract_address_ner_spark.operators.temporal import asof_join, session_agg


def test_asof_join_matches_reference(spark):
    rng = random.Random(11)
    lefts = [(i, rng.randint(0, 5), rng.randint(0, 1000)) for i in range(300)]
    rights = [(1000 + i, rng.randint(0, 5), rng.randint(0, 1000))
              for i in range(200)]
    # force equal-timestamp collisions (inclusive bound) and duplicate
    # (key, ts) right rows (tiebreak: max id wins deterministically)
    rights += [(2000, lefts[0][1], lefts[0][2]),
               (2001, lefts[0][1], lefts[0][2])]
    left = spark.createDataFrame(lefts, "id long, k long, t long")
    right = spark.createDataFrame(rights, "rid long, k long, t long")

    got = {
        r["id"]: (r["r_rid"], r["r_t"])
        for r in asof_join(
            left, right, on=["k"], left_ts="t", right_ts="t",
            right_cols=["rid", "t"], tiebreak="rid",
        ).collect()
    }

    assert len(got) == len(lefts)  # output is exactly |left|
    for lid, lk, lt in lefts:
        cands = [(rid, rt) for rid, rk, rt in rights if rk == lk and rt <= lt]
        if not cands:
            assert got[lid] == (None, None), lid
        else:
            # latest ts wins; among equal ts the LARGEST rid (tiebreak asc
            # ordering + last() carry-forward)
            best = max(cands, key=lambda c: (c[1], c[0]))
            assert got[lid] == (best[0], best[1]), (lid, got[lid], best)


def test_asof_join_rejects_reserved_column_names(spark):
    """An input column shadowing an internal name must raise, not silently
    produce ambiguous output (ADVICE r04)."""
    import pytest

    left = spark.createDataFrame([(1, 1, 1)], "id long, k long, t long")
    right = spark.createDataFrame([(1, 1, 1)], "rid long, k long, t long")
    for bad in ("_ats", "_rp"):
        with pytest.raises(ValueError, match="reserve"):
            asof_join(left.withColumnRenamed("id", bad), right,
                      on=["k"], left_ts="t", right_ts="t")
        with pytest.raises(ValueError, match="reserve"):
            asof_join(left, right.withColumnRenamed("rid", bad),
                      on=["k"], left_ts="t", right_ts="t")
    # a left frame holding BOTH "id" and "_l_id" would make the internal
    # alias of "id" ambiguous — the specific case ADVICE r04 called out
    with pytest.raises(ValueError, match="reserve"):
        asof_join(left.withColumn("_l_id", F.lit(1)), right,
                  on=["k"], left_ts="t", right_ts="t")
    # OUTPUT collision (round-5 code review): a left column equal to
    # prefix+right_col would silently duplicate the output name
    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumn("r_rid", F.lit(1)), right,
                  on=["k"], left_ts="t", right_ts="t", right_cols=["rid"])


def test_asof_join_skewed_key_wall_time(spark):
    """VERDICT r04 #5: the union+window formulation bounds a hot key's cost
    at THAT KEY'S row count (one task sorts its rows), never the row count
    squared — a seeded fixture with one key holding ~60% of all rows must
    stay within a small factor of the uniform case at equal total rows.
    The factor bound is deliberately loose (local[8-ish] pytest shares a
    noisy host); the quadratic theta-join formulation this operator exists
    to avoid measures >50x here. Mitigation if this ever fails at scale:
    time-chunked sub-keys ((k, floor(ts/chunk))) with each chunk's last
    right row carried forward into the next chunk's head — documented in
    the operator docstring as the escalation path."""
    import random
    import time

    rng = random.Random(7)
    n = 60_000
    skew_key = 0

    def rows(skewed: bool):
        out = []
        for i in range(n):
            k = (skew_key if rng.random() < 0.6 else rng.randint(1, 31)) \
                if skewed else rng.randint(0, 31)
            out.append((i, k, rng.randint(0, 10_000_000)))
        return out

    def run(data_rows) -> float:
        left = spark.createDataFrame(data_rows, "id long, k long, t long")
        right = spark.createDataFrame(
            [(i, rng.randint(0, 31), rng.randint(0, 10_000_000))
             for i in range(n // 10)],
            "rid long, k long, t long",
        )
        j = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                      right_cols=["rid"], tiebreak="rid")
        j.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.monotonic()
        j.write.format("noop").mode("overwrite").save()
        return time.monotonic() - t0

    t_uniform = run(rows(skewed=False))
    t_skewed = run(rows(skewed=True))
    # one task holding 60% of rows vs ~3% per task: linear-in-key-size sort
    # keeps the ratio small; a quadratic candidate set would blow past this
    assert t_skewed <= max(5.0 * t_uniform, t_uniform + 10.0), (
        t_skewed, t_uniform
    )


def test_asof_join_time_chunked_equivalence(spark):
    """Round-5: the time-chunked skew escalation (window on
    (key, floor(ts/chunk)) + boundary carry-forward) must return EXACTLY
    the unchunked result — across chunk widths that produce many chunks
    (width 1), a few chunks (width 137), and one chunk (width ≥ ts range,
    which degenerates to the plain path incl. a fully-null carry). The
    fixture plants the adversarial spots: equal-timestamp collisions,
    duplicate (key, ts) right rows needing the tiebreak, lefts preceding
    any right (NULL carry-in), and chunks holding only left rows (carry
    must skip right-less chunks, not stop at them)."""
    rng = random.Random(23)
    lefts = [(i, rng.randint(0, 4), rng.randint(0, 2000)) for i in range(400)]
    # sparse rights → many left-only chunks at width 137
    rights = [(1000 + i, rng.randint(0, 4), rng.randint(0, 2000))
              for i in range(60)]
    rights += [(2000, lefts[0][1], lefts[0][2]),
               (2001, lefts[0][1], lefts[0][2])]  # dup (key, ts) → tiebreak
    left = spark.createDataFrame(lefts, "id long, k long, t long")
    right = spark.createDataFrame(rights, "rid long, k long, t long")

    def run(chunk):
        return sorted(
            (r["id"], r["r_rid"], r["r_t"])
            for r in asof_join(
                left, right, on=["k"], left_ts="t", right_ts="t",
                right_cols=["rid", "t"], tiebreak="rid", time_chunk=chunk,
            ).collect()
        )

    want = run(None)
    assert any(r[1] is None for r in want)  # unmatched lefts present
    for chunk in (1, 137, 10**9):
        assert run(chunk) == want, chunk


def test_asof_join_time_chunked_spreads_the_hot_key(spark):
    """The escalation's point, pinned in the PLAN: the big window's
    exchange partitions on (key, _chunk) — the hot key's sort spreads over
    |chunks| tasks instead of one — and the carry join adds only
    small-table work (the carry side is one row per (key, chunk))."""
    left = spark.createDataFrame(
        [(i, 0, i) for i in range(1000)], "id long, k long, t long")
    right = spark.createDataFrame(
        [(i, 0, i * 3) for i in range(100)], "rid long, k long, t long")
    j = asof_join(left, right, on=["k"], left_ts="t", right_ts="t",
                  right_cols=["rid"], tiebreak="rid", time_chunk=100)
    plan = j._jdf.queryExecution().executedPlan().toString()
    parts = plan.split("hashpartitioning(k")[1:]
    assert parts, plan
    assert any("_chunk" in p[:80] for p in parts), plan


def test_session_agg_streams_with_watermark(spark, tmp_path):
    """The operator docstring's streaming claim, pinned: the SAME
    session_agg expression runs under Structured Streaming with a
    watermark, and an availableNow drain emits exactly the batch sessions
    the final watermark closed (append mode ≡ the windowed-counts cutoff
    rule: session_end + gap <= max(ts) - watermark... Spark closes a
    session window when the watermark passes its END, which already
    includes the gap)."""
    import datetime as dt

    from pyspark.sql import functions as F

    base = dt.datetime(2024, 1, 1)
    rows, rng, t = [], random.Random(3), 0
    for i in range(200):
        t += rng.choice([60, 300, 1200])
        rows.append((i, rng.randint(0, 3), base + dt.timedelta(seconds=t), 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double")
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ck"))
    ev.coalesce(1).write.parquet(in_dir)

    stream = spark.readStream.schema(ev.schema).parquet(in_dir) \
        .withWatermark("ts", "30 minutes")
    agg = session_agg(stream, keys=["user_id"], gap="10 minutes")
    q = (agg.writeStream.format("parquet").option("path", out_dir)
         .option("checkpointLocation", ckpt).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect())

    batch = session_agg(ev, keys=["user_id"], gap="10 minutes")
    cutoff = max(r[2] for r in rows) - dt.timedelta(minutes=30)
    want = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch.collect() if r["session_end"] <= cutoff)
    assert got == want and len(got) > 0
    # sanity: something stayed OPEN in state (the defining append behavior)
    assert len(want) < batch.count()


def test_session_agg_matches_reference(spark):
    """Gap-rule sessions incl. the boundary: an event at EXACTLY
    prev + gap MERGES into the session (Spark's bound is inclusive —
    probed on a fixed fixture; this test pins it so the SQL oracle's
    <= stays honest)."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows, rng = [], random.Random(5)
    t = 0
    for i in range(400):
        # jumps chosen to hit < gap, == gap (boundary), and > gap
        t += rng.choice([60, 300, 600, 601, 1200])
        rows.append((i, rng.randint(0, 3), base + dt.timedelta(seconds=t), 1.0))
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")

    got = sorted(
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in session_agg(ev, keys=["user_id"], gap="10 minutes").collect()
    )

    gap = dt.timedelta(minutes=10)
    by_user = {}
    for _i, u, ts, _v in sorted(rows, key=lambda r: (r[1], r[2])):
        sessions = by_user.setdefault(u, [])
        if sessions and ts - sessions[-1][-1] <= gap:  # inclusive
            sessions[-1].append(ts)
        else:
            sessions.append([ts])
    want = sorted(
        (u, s[0], s[-1] + gap, len(s))
        for u, ss in by_user.items() for s in ss
    )
    assert got == want
