"""Temporal operators beyond the reference surface: as-of join and
time-bucket resampling.

The reference's Athena surface admits arbitrary SQL but has no as-of
join; for market data (quotes vs trades) it is the canonical extension
(SURVEY.md §2.4 note). Spark has no ASOF JOIN node, so it is composed
from existing operators — the classic union + last-value trick:

1. tag both sides, union by the join/time keys;
2. one window per key ordered by (ts, side) carries the most recent
   right-side value forward (``last(..., ignorenulls=True)``);
3. keep left-side rows.

Physical shape: ONE shuffle on the key (WindowExec), versus the naive
range-join which is O(n*m) per key. This is the same plan a dedicated
as-of operator would pick at 100 TB, and it inherits AQE skew handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    ts: str,
    right_values: list[str],
    direction: str = "backward",
    suffix: str = "",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward'; 'forward' gives the
    next right row with ``right.ts >= left.ts``), matching on ``on`` keys.
    Left rows with no match keep NULLs (left as-of join).

    Tie semantics: a right row at exactly left.ts matches (inclusive),
    consistent with DuckDB's ``ASOF JOIN ... ON t.ts >= q.ts``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    lcols = left.columns
    out_vals = [c + suffix for c in right_values]

    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}") for c in right_values],
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on and c != ts],
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__rv_{c}") for c in right_values],
    ).select(*[F.col(c) for c in lcols], F.col(_SIDE), *[F.col(f"__rv_{c}") for c in right_values])

    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        # right rows sort before left rows at equal ts -> inclusive match
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts).asc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked: list[Column] = [
            F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(w).alias(o)
            for c, o in zip(right_values, out_vals)
        ]
    else:
        w = (
            Window.partitionBy(*on)
            .orderBy(F.col(ts).desc(), F.col(_SIDE).asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        picked = [
            F.last(F.col(f"__rv_{c}"), ignorenulls=True).over(w).alias(o)
            for c, o in zip(right_values, out_vals)
        ]

    return (
        unioned.select(*lcols, F.col(_SIDE), *picked)
        .filter(F.col(_SIDE) == 1)
        .drop(_SIDE)
    )


def resample_bars(
    df: DataFrame,
    *,
    ts: str,
    key: str,
    value: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Time-bucket OHLC resampling: the hypertable-rollup style operator.

    Open/close are picked by min/max struct ordering on (ts, value) —
    deterministic even with duplicate timestamps — and the whole thing is
    a single hash aggregation (one shuffle), no window needed.
    """
    w = F.window(F.col(ts), bucket)
    # A NULL value is not a price observation: open/close are the
    # earliest/latest NON-NULL values in the bucket (min/max skip the
    # NULL-ed struct, matching DuckDB's arg_min/arg_max NULL rule;
    # high/low/count already have the right NULL semantics).
    pair = F.when(F.col(value).isNotNull(), F.struct(F.col(ts), F.col(value)))
    return (
        df.groupBy(F.col(key), w.alias("win"))
        .agg(
            F.min(pair).getField(value).alias("open"),
            F.max(value).alias("high"),
            F.min(value).alias("low"),
            F.max(pair).getField(value).alias("close"),
            F.count("*").alias("n"),
        )
        .select(key, F.col("win.start").alias("bucket_start"), "open", "high", "low", "close", "n")
    )


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_minutes``. Adds a
    ``session_seq`` column (1-based per user, deterministic ordering by
    ``(ts, tiebreak)``).

    The classic web/event-log operator the reference's Athena surface
    leaves to hand-written SQL. Physical shape: ONE shuffle on the user
    key, then two streaming window passes in the same sorted partition
    (lag to flag boundaries, running sum to number them) — Spark fuses
    both into a single WindowExec sort. Gap arithmetic is exact integer
    microseconds (no double truncation).
    """
    # Event-time contract: a NULL ts has no stream position (and sorts
    # NULLS FIRST in Spark vs LAST in DuckDB), so it can neither open
    # nor extend a session — excluded, same as F.window's implicit rule.
    df = df.filter(F.col(ts_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    gap_us = gap_minutes * 60 * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    boundary = (
        F.when(us - F.lag(us).over(w) > gap_us, F.lit(1))
        .otherwise(F.lit(0))
        + F.when(F.lag(us).over(w).isNull(), F.lit(1)).otherwise(F.lit(0))
    )
    return df.withColumn(
        "session_seq",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def session_stats(
    sessions: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Collapse sessionized events to one row per (user, session): start,
    end, event count, summed value. Single hash aggregation — partial
    (map-side) combine does most of the work because sessionize already
    co-located each user's rows."""
    return sessions.groupBy(user_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count("*").alias("n_events"),
        F.round(F.sum(value_col), 6).alias("total_value"),
    )
