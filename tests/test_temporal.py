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
