"""Event-time windowed aggregations with watermarks.

Beyond the reference (it has no event-time concepts — arrival order is
irrelevant because every run recomputes everything, SURVEY.md §2.10),
but required by the streaming north star: tumbling / sliding / session
windows over the ``events`` stream shape, with late-data handling via
watermarks.

Each builder takes any events-shaped DataFrame (batch or streaming) —
the SAME code path serves ``spark.read`` (oracle-checkable batch
semantics, plans/streaming_queries.py) and ``spark.readStream``
(incremental state + watermark eviction, tests/test_streaming.py).
That batch/streaming unification is the core Structured Streaming
design and the reason the operators need no separate batch port.

Scale notes: windowed aggs shuffle on (key, window); state size is
bounded by watermark horizon × key cardinality. Session windows use
the built-in session_window (state merges adjacent sessions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_watermark(events: DataFrame, *, ts_col: str = "ts", delay: str = "10 minutes") -> DataFrame:
    """Late-data bound: rows later than max(event time) - delay are
    dropped from stateful aggregation (streaming only; no-op in batch)."""
    return events.withWatermark(ts_col, delay)


def tumbling_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key: str = "event_type",
    width: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window: one bucket per (key, window)."""
    return (
        events.groupBy(F.col(key), F.window(F.col(ts_col), width).alias("win"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(key, F.col("win.start").alias("ws"), "n", "total_value")
    )


def sliding_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key: str = "event_type",
    width: str = "2 hours",
    slide: str = "1 hour",
) -> DataFrame:
    """Sliding window: each event lands in width/slide buckets."""
    return (
        events.groupBy(F.col(key), F.window(F.col(ts_col), width, slide).alias("win"))
        .agg(F.count("*").alias("n"))
        .select(key, F.col("win.start").alias("ws"), "n")
    )


def session_counts(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key: str = "user_id",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session window: activity runs per key separated by >= gap of
    silence. session_start = first event ts in the session."""
    return (
        events.groupBy(F.col(key), F.session_window(F.col(ts_col), gap).alias("win"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(key, F.col("win.start").alias("session_start"), "n", "total_value")
    )
