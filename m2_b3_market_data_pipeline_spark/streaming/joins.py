"""Stream-stream and stream-static joins with event-time bounds.

Beyond the reference (its only "streaming" is S3-event orchestration,
SURVEY.md §2.10); these are the Structured Streaming join shapes a
market/LLM-data pipeline needs: correlate two event streams within a
time bound (view -> click attribution), enrich a stream against a
static dimension, and deduplicate a stream by key.

Like streaming/windows.py, every builder takes any events-shaped
DataFrame, so the SAME code path runs in batch (oracle-checkable,
plans/streaming_queries.py) and streaming (tests/test_streaming.py).

Scale notes: a stream-stream inner join keeps both sides in state;
the watermark + time-range condition bound state eviction — without
them state grows forever. The join shuffles both sides on the equi-key
(user_id); the range predicate is evaluated post-match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_click_attribution(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    max_lag: str = "30 minutes",
) -> DataFrame:
    """Attribute each click to every prior view by the same user within
    ``max_lag`` (inner stream-stream join, equi-key user_id + time-range
    bound). In streaming mode callers add watermarks on BOTH sides so
    Spark can evict join state (see streaming tests)."""
    views = events.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col(ts_col).alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col(ts_col).alias("click_ts"),
    )
    return views.join(
        clicks,
        (F.col("v_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_lag}")),
    ).select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
    )


def dedup_events(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
) -> DataFrame:
    """Streaming deduplication on a key set (default event_id). In
    streaming mode, state holds one entry per seen key inside the
    watermark horizon; in batch mode this is a plain distinct-by-key.
    The fixture's event_id is unique, so batch output is deterministic
    and oracle-checkable; for replayed/at-least-once sources this is the
    exactly-once projection step."""
    return events.dropDuplicates(keys or ["event_id"])


def dedup_events_bounded(
    events: DataFrame,
    *,
    keys: list[str] | None = None,
    delay: str = "1 day",
) -> DataFrame:
    """Streaming dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``
    evicts a key's entry once the watermark passes its event time, so
    state size tracks the replay horizon instead of the whole stream
    history. Plain ``dropDuplicates`` on a stream retains every key ever
    seen — unbounded state at 100 TB/day; this is the production form
    when duplicates can only arrive within a known lateness window
    (at-least-once sources, retried producers). Batch callers should use
    ``dedup_events`` — the within-watermark form is streaming-only."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
