"""Custom stateful streaming operator via applyInPandasWithState.

``running_repo_totals``: per-repo running mention counters across
micro-batches — each batch emits (repo, batch_mentions, total_mentions,
batch_id-ish seq) with the running total held in GroupState. This is the
Structured Streaming pattern for custom stateful rollups the built-in
windowed aggregations can't express (monotone lifetime totals, emitted
per batch).

State is one small row per repo — bounded by repo cardinality, not stream
length. No timeout is set (lifetime totals); a TTL would use
GroupStateTimeout.ProcessingTimeTimeout.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "repo string, batch_mentions long, total_mentions long, updates long"
STATE_SCHEMA = "total long, updates long"


def _update_repo_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch = 0
    for pdf in pdfs:
        batch += len(pdf)
    if state.exists:
        (total, updates) = state.get
    else:
        total, updates = 0, 0
    total += batch
    updates += 1
    state.update((total, updates))
    yield pd.DataFrame(
        {
            "repo": [key[0]],
            "batch_mentions": [batch],
            "total_mentions": [total],
            "updates": [updates],
        }
    )


def running_repo_totals(mentions_stream: DataFrame) -> DataFrame:
    """mentions stream → per-repo running totals (update output mode).
    GroupState rides the session's RocksDB state store provider
    (stream.ensure_streaming_confs) like every other stateful path."""
    from .stream import ensure_streaming_confs

    ensure_streaming_confs(mentions_stream.sparkSession)
    return mentions_stream.groupBy("repo").applyInPandasWithState(
        _update_repo_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
