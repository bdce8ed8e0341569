"""Temporal operators Spark lacks as built-ins (round 4): AS-OF join and
session aggregation.

- ``asof_join``: for each left row, the latest right row with
  ``right_ts <= left_ts`` in the same key group (the "state at event time"
  join — quotes-to-trades, config-to-request, last-error-before-click).
  Spark has no ASOF JOIN; the naive formulation (theta-join on
  ``l.ts >= r.ts`` + row_number) is a per-key cross product — quadratic
  OUTPUT in hot keys, exactly what kills a 100 TB run. This implementation
  is the scalable classic instead: TAG both sides, UNION, one window sort
  per key ordered by (ts, right-before-left), and carry the last non-null
  right payload forward. ONE shuffle keyed on the join keys, output
  exactly |left|, skew bounded by the biggest single key's rows (not their
  square). DuckDB's native ASOF JOIN is the oracle for the driver query.

- ``session_agg``: per-key session windows (gap-separated activity bursts)
  via Spark's built-in ``session_window`` — kept here so batch and
  Structured-Streaming callers share one definition; the oracle reproduces
  the gap rule with lag + cumulative-sum session ids.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] | None = None,
    prefix: str = "r_",
    tiebreak: str | None = None,
    time_chunk: int | None = None,
) -> DataFrame:
    """AS-OF (backward, inclusive) join: every left row gains the payload
    of the latest right row with ``right_ts <= left_ts`` in its ``on``
    group, or NULLs if none precedes it (left-outer semantics, matching
    DuckDB ``ASOF LEFT JOIN``).

    Plan shape: union of the two tagged sides → ONE window sort keyed on
    ``on`` ordered by (event time, right-rows-first at equal time, then
    ``tiebreak``) → ``last(payload, ignorenulls)`` carry-forward → keep
    left rows. Right rows sort BEFORE left rows at the same timestamp, so
    equal-time matches are included (ASOF's inclusive bound). ``tiebreak``
    (a right-side column, e.g. its id) makes the winner among right rows
    with IDENTICAL (key, ts) deterministic; leave None only when that
    combination is unique by construction.

    Skew: a hot key's cost is ONE task sorting that key's rows — linear,
    never quadratic (pinned by tests/test_temporal.py's 60%-hot-key fixture
    staying within a small factor of uniform). If a single key ever
    outgrows one task at 100 TB, pass ``time_chunk`` (a width in ts units;
    ts must be numeric): the window then partitions on
    ``(key, floor(ts / time_chunk))`` so the hot key's sort spreads over
    |chunks| tasks, and chunk heads are patched by a boundary
    carry-forward — the latest right payload of all EARLIER chunks,
    computed over a small per-(key, chunk) table (one row per key-chunk,
    never per event) and joined back on the same (key, chunk) partitioning.
    Output is pinned identical to the unchunked path
    (tests/test_temporal.py::test_asof_join_time_chunked_equivalence); the
    price is one extra column-pruned pass over the inputs to build the
    chunk spine plus the small-table join. Same documented precondition:
    with duplicate (key, ts) right rows, supply ``tiebreak`` — both paths
    tie-break on it."""
    keys = list(on)
    rcols = list(right_cols) if right_cols is not None else [
        c for c in right.columns if c not in keys
    ]
    # the union construction owns these internal names; an input column that
    # shadows one would silently produce ambiguous/duplicate columns, so
    # fail loudly instead (ADVICE r04)
    reserved = {"_ats", "_is_right", "_tb", "_rp", "_asof",
                "_chunk", "_cl", "_carry"}
    reserved |= {f"_l_{c}" for c in left.columns}
    clash = (set(left.columns) | set(right.columns)) & reserved
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(clash)} — "
            "rename the input column(s) before joining"
        )
    # the OUTPUT names collide too if a left column equals prefix+right_col
    # (round-5 code review): the final select would emit two columns with
    # the same name — fail loudly instead
    out_clash = {f"{prefix}{c}" for c in rcols} & set(left.columns)
    if out_clash:
        raise ValueError(
            f"asof_join output column(s) {sorted(out_clash)} collide with "
            "left columns — pass a different prefix or rename"
        )
    payload = F.struct(*[F.col(c) for c in rcols])
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    rs = right.select(
        *keys,
        F.col(right_ts).alias("_ats"),
        F.lit(1).alias("_is_right"),
        tb.alias("_tb"),
        payload.alias("_rp"),
        *[F.lit(None).alias(f"_l_{c}") for c in left.columns],
    )
    ls = left.select(
        *keys,
        F.col(left_ts).alias("_ats"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(rs.schema["_tb"].dataType).alias("_tb"),
        F.lit(None).cast(rs.schema["_rp"].dataType).alias("_rp"),
        *[F.col(c).alias(f"_l_{c}") for c in left.columns],
    )
    order = [F.asc("_ats"), F.desc("_is_right"), F.asc_nulls_first("_tb")]
    if time_chunk is None:
        w = (
            Window.partitionBy(*keys)
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = rs.unionByName(ls).withColumn(
            "_asof", F.last("_rp", ignorenulls=True).over(w)
        )
    else:
        if time_chunk <= 0:
            raise ValueError("time_chunk must be a positive ts-unit width")
        # skew escalation: spread the hot key's sort over time chunks, then
        # patch chunk heads with the latest right payload of EARLIER chunks
        chunk_of = F.floor(F.col("_ats") / F.lit(time_chunk)).cast("long")
        un = rs.unionByName(ls).withColumn("_chunk", chunk_of)
        wl = (
            Window.partitionBy(*keys, "_chunk")
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        local = un.withColumn("_asof", F.last("_rp", ignorenulls=True).over(wl))
        # one row per (key, chunk) that holds a right row: its latest payload
        rchunk = (
            rs.withColumn("_chunk", chunk_of)
            .groupBy(*keys, "_chunk")
            .agg(F.max_by("_rp", F.struct("_ats", "_tb")).alias("_cl"))
        )
        # the spine adds chunks that hold only left rows, so the window-carry
        # below can fill them from earlier chunks; column-pruned second pass
        spine = un.select(*keys, "_chunk").distinct()
        wc = (
            Window.partitionBy(*keys)
            .orderBy("_chunk")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        carry = (
            spine.join(rchunk, [*keys, "_chunk"], "left")
            .withColumn("_carry", F.last("_cl", ignorenulls=True).over(wc))
            .select(*keys, "_chunk", "_carry")
        )
        carried = local.join(carry, [*keys, "_chunk"], "left").withColumn(
            "_asof", F.coalesce("_asof", "_carry")
        )
    out_left = [
        F.col(f"_l_{c}").alias(c) for c in left.columns
    ]
    out_right = [
        F.col("_asof").getField(c).alias(f"{prefix}{c}") for c in rcols
    ]
    return carried.filter(F.col("_is_right") == 0).select(*out_left, *out_right)


def session_agg(
    events: DataFrame,
    keys: Sequence[str],
    ts_col: str = "ts",
    gap: str = "10 minutes",
    aggs: Sequence[Column] | None = None,
) -> DataFrame:
    """Per-key session windows: consecutive events of a key belong to one
    session while each is within ``gap`` of the previous; a longer silence
    starts a new session. Built on Spark's native ``session_window`` (the
    same expression works under Structured Streaming with a watermark —
    state per OPEN session only). Output: keys, session_start (first event
    ts), session_end (last event ts + gap, Spark's convention), plus
    ``aggs`` (default: n_events, sum_value)."""
    if aggs is None:
        aggs = [
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 4).cast("double").alias("sum_value"),
        ]
    win = F.session_window(F.col(ts_col), gap)
    grouped = events.groupBy(*keys, win.alias("_sw")).agg(*aggs)
    agg_cols = [c for c in grouped.columns if c not in (*keys, "_sw")]
    return grouped.select(
        *keys,
        F.col("_sw.start").alias("session_start"),
        F.col("_sw.end").alias("session_end"),
        *agg_cols,
    )
