"""Oracle-checked batch runs of the streaming window builders.

The builders in streaming/windows.py are batch/streaming-unified; here
the driver checks their event-time semantics on the batch path against
plain-SQL formulations (window start arithmetic, gaps-and-islands for
sessions). True incremental behavior (watermark eviction, availableNow
micro-batching) is exercised in tests/test_streaming.py — a streaming
query cannot be hash-compared row-for-row by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..streaming.joins import dedup_events, view_click_attribution
from ..streaming.windows import session_counts, sliding_counts, tumbling_counts
from .registry import load, register


@register(
    "tumbling_window",
    oracle="""
SELECT event_type,
       date_trunc('hour', ts)  AS ws,
       COUNT(*)                AS n,
       ROUND(SUM(value), 6)    AS total_value
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling event-time windows per event_type
    (streaming/windows.py; same code path serves readStream)."""
    return tumbling_counts(load(spark, sf_dir, "events"))


@register(
    "sliding_window",
    oracle="""
WITH starts AS (
    SELECT event_type,
           unnest([date_trunc('hour', ts),
                   date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS ws
    FROM events
    WHERE ts IS NOT NULL
)
SELECT event_type, ws, COUNT(*) AS n
FROM starts
GROUP BY 1, 2
""",
)
def sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour: every event lands in exactly
    two buckets (streaming/windows.py)."""
    return sliding_counts(load(spark, sf_dir, "events"))


@register(
    "session_window",
    oracle="""
WITH ordered AS (
    SELECT user_id, ts, value,
           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
    FROM events
    WHERE ts IS NOT NULL
),
flagged AS (
    SELECT user_id, ts, value,
           CASE WHEN prev_ts IS NULL
                  OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
    FROM ordered
),
sessions AS (
    SELECT user_id, ts, value,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM flagged
)
SELECT user_id,
       MIN(ts)              AS session_start,
       COUNT(*)             AS n,
       ROUND(SUM(value), 6) AS total_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap session windows per user — Spark's session_window
    against a gaps-and-islands SQL oracle (streaming/windows.py)."""
    return session_counts(load(spark, sf_dir, "events"))


@register(
    "stream_stream_join",
    oracle="""
SELECT v.user_id,
       v.event_id AS view_id,
       c.event_id AS click_id,
       v.ts       AS view_ts,
       c.ts       AS click_ts
FROM events v
JOIN events c
  ON c.user_id = v.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
""",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View->click attribution: stream-stream inner join on user_id with
    a 30-minute event-time bound (streaming/joins.py; in streaming mode
    the same builder runs with watermarks on both sides so join state is
    evicted — exercised in tests/test_streaming.py)."""
    return view_click_attribution(load(spark, sf_dir, "events"))


@register(
    "streaming_dedup",
    oracle="""
SELECT event_id, user_id, event_type, ts
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ts) = 1
""",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-based stream deduplication (streaming/joins.py::dedup_events).
    event_id is unique in the fixture so the batch path is deterministic;
    the streaming path (state inside the watermark horizon) is exercised
    in tests/test_streaming.py."""
    return dedup_events(load(spark, sf_dir, "events")).select(
        "event_id", "user_id", "event_type", "ts"
    )
