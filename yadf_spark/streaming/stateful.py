"""Custom stateful streaming operators via ``applyInPandasWithState``.

``dedup_counts_stream`` — the streaming analog of the reference's scan
statistics (G9, src/lib.rs:120-139): per group key (e.g. source/shard),
maintain the set of content hashes seen so far and emit, per
micro-batch, cumulative totals and how many of the batch's rows were
new vs duplicates of anything previously ingested.

State is the per-group seen-hash set, stored as a hash->nothing frame
(bounded by distinct content per group — the same bound the batch
engine's groupBy carries); processing-time timeout expires idle groups
so abandoned shards release state.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "group_key string, batch_rows long, batch_new long, batch_dups long, "
    "total_rows long, total_distinct long"
)
STATE_SCHEMA = "seen array<long>, total_rows long"


def _update(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        state.remove()
        return
    seen: set[int]
    if state.exists:
        seen_list, total_rows = state.get
        seen = set(seen_list)
    else:
        seen, total_rows = set(), 0

    batch_rows = batch_new = 0
    for pdf in pdfs:
        for h in pdf["content_hash_64"]:
            batch_rows += 1
            h = int(h)
            if h not in seen:
                seen.add(h)
                batch_new += 1
    total_rows += batch_rows
    state.update((list(seen), total_rows))
    state.setTimeoutDuration(24 * 3600 * 1000)
    yield pd.DataFrame(
        [
            (
                key[0],
                batch_rows,
                batch_new,
                batch_rows - batch_new,
                total_rows,
                len(seen),
            )
        ],
        columns=[
            "group_key",
            "batch_rows",
            "batch_new",
            "batch_dups",
            "total_rows",
            "total_distinct",
        ],
    )


def dedup_counts_stream(
    stream: DataFrame,
    group_col: str,
    payload_col: str = "bytes",
) -> DataFrame:
    """Streaming per-group dedup statistics. The content hash is
    computed JVM-side (xxhash64 over the payload) BEFORE the stateful
    Python operator, so state holds 8-byte ints, never payload bytes —
    the O6 rule applied to streaming state."""
    keyed = stream.select(
        F.col(group_col).alias("group_key"),
        F.xxhash64(F.col(payload_col)).alias("content_hash_64"),
    )
    return keyed.groupBy("group_key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
