"""Custom stateful streaming operator via applyInPandasWithState.

Per-user running statistics (count / mean / max gap between events) carried
across micro-batches with explicit state + processing-time timeout — the
pattern for any bespoke stateful operator Structured Streaming lacks
(sessionized features, online dedup sketches, per-entity counters at
100 TB/day: state is per-key and spills to the state store).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, n_events long, mean_value double, max_gap_us long"
)
STATE_SCHEMA = "count long, sum_value double, last_us long, max_gap_us long"


def running_user_stats(stream: DataFrame) -> DataFrame:
    """stream: (user_id, ts_us, value, ...) -> running per-user stats,
    emitted once per micro-batch per updated user."""

    def fn(
        key: tuple,
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        count, sum_value, last_us, max_gap = (
            state.get if state.exists else (0, 0.0, None, 0)
        )
        # a key's micro-batch data may arrive as SEVERAL Arrow chunks;
        # sorting each chunk independently would compute gaps across an
        # unsorted seam — concatenate first, sort once
        chunks = list(batches)
        pdf = (
            pd.concat(chunks, ignore_index=True).sort_values("ts_us")
            if chunks
            else pd.DataFrame({"ts_us": [], "value": []})
        )
        for us, val in zip(pdf["ts_us"], pdf["value"]):
            if last_us is not None:
                max_gap = max(max_gap, int(us - last_us))
            last_us = int(us)
            count += 1
            sum_value += float(val)
        state.update((count, sum_value, last_us, max_gap))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [count],
                "mean_value": [sum_value / count if count else 0.0],
                "max_gap_us": [max_gap],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
