"""Custom stateful streaming operator via ``applyInPandasWithState``
(the preference-order path (b) for operators Spark's built-ins can't
express — here: streaming first-seen dedup with per-key running
counts, the streaming twin of exact dedup).

State per key = (first_seen_event_id, n_occurrences). Each micro-batch
emits one row per key seen in that batch with the updated running
count — an upsert feed for a dedup ledger. State is keyed and bounded
by distinct keys; pair with a TTL/timeout for unbounded key spaces.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, first_event_id long, n_seen long"
STATE_SCHEMA = "first_event_id long, n_seen long"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    first_id, n = state.get if state.exists else (None, 0)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        batch_min = int(pdf["event_id"].min())
        first_id = batch_min if first_id is None else min(first_id, batch_min)
        n += len(pdf)
    state.update((first_id, n))
    yield pd.DataFrame(
        {"key": [key[0]], "first_event_id": [first_id], "n_seen": [n]}
    )


def streaming_first_seen_dedup(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Streaming dedup ledger: per key, the first event id ever seen
    and a running occurrence count, updated each micro-batch."""
    keyed = events.selectExpr(f"{key_col} AS key", "event_id")
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
