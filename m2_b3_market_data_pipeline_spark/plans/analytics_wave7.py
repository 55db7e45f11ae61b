"""Wave 7: time-weighted pricing, forecast backtesting, Markov event
transitions, and algebraic partial-aggregate maintenance.

- twap_daily: tick-level time-weighted average price — weights are
  exact integer microsecond holding times from a lead() window, so the
  only float op is the final weighted mean.
- seasonal_backtest: seasonal-naive forecast (lag-5 close) scored with
  per-asset MAE/MAPE — the rolling-origin backtest shape, expressed as
  one window + one aggregate.
- markov_transitions: per-user event-type transition matrix with
  conditional probabilities — two aggregations, no self-join (the lead
  window pairs consecutive events in place).
- partial_agg_merge: per-batch algebraic partials (count/sum/min/max)
  merged into the exact global aggregate — the incremental
  materialized-view maintenance pattern: at 100 TB you re-aggregate
  yesterday's partials with today's batch instead of rescanning
  history. Oracle = the direct one-shot aggregate, proving the merge is
  lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.normalize import rename_columns
from .ohlcv import OHLCV_SQL, derive_ohlcv, load_events
from .registry import load, register

SEASON_LAG = 5


@register(
    "twap_daily",
    oracle="""
WITH e AS (
    SELECT 'TICK' || CAST(user_id % 8 AS VARCHAR) AS ativo,
           date_trunc('day', ts) AS day, ts, event_id, value
    FROM events
),
w AS (
    SELECT ativo, day, value,
           epoch_us(LEAD(ts) OVER win) - epoch_us(ts) AS dt_us
    FROM e
    WINDOW win AS (PARTITION BY ativo, day ORDER BY ts, event_id)
)
SELECT ativo, day,
       CAST(COUNT(*) AS BIGINT) AS n_ticks,
       ROUND(SUM(value * dt_us) / nullif(SUM(dt_us), 0), 6) AS twap
FROM w
GROUP BY ativo, day
""",
)
def twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per (asset, day): each tick's price
    weighted by its holding time until the next tick (exact integer
    microseconds via unix_micros, so both engines weight identically;
    the day's last tick has no successor and drops out of both sums —
    single-tick days yield NULL twap). One window + one aggregate, both
    partitioned on (ativo, day) — the sort is reused, no extra
    exchange."""
    e = (
        load(spark, sf_dir, "events")
        .withColumn(
            "ativo", F.concat(F.lit("TICK"), (F.col("user_id") % 8).cast("string"))
        )
        .withColumn("day", F.date_trunc("day", F.col("ts")))
    )
    win = Window.partitionBy("ativo", "day").orderBy("ts", "event_id")
    w = e.withColumn(
        "dt_us", F.unix_micros(F.lead("ts").over(win)) - F.unix_micros(F.col("ts"))
    )
    return w.groupBy("ativo", "day").agg(
        F.count("*").alias("n_ticks"),
        F.round(
            F.sum(F.col("value") * F.col("dt_us"))
            / F.nullif(F.sum("dt_us"), F.lit(0).cast("bigint")),
            6,
        ).alias("twap"),
    )


@register(
    "seasonal_backtest",
    oracle=OHLCV_SQL
    + f"""
, f AS (
    SELECT ativo, close_price,
           LAG(close_price, {SEASON_LAG}) OVER (PARTITION BY ativo ORDER BY "date")
               AS forecast
    FROM ohlcv
)
SELECT ativo,
       CAST(COUNT(*) AS BIGINT) AS n_scored,
       ROUND(AVG(ABS(close_price - forecast)), 6) AS mae,
       ROUND(AVG(ABS(close_price - forecast) / nullif(ABS(close_price), 0)), 6) AS mape
FROM f WHERE forecast IS NOT NULL
GROUP BY ativo
""",
)
def seasonal_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the seasonal-naive forecast (predict
    close = close {SEASON_LAG} bars ago): per-asset MAE/MAPE in one
    window + one aggregate. The evaluation harness every forecasting
    pipeline needs — entirely shuffle-shared with the indicator
    windows."""
    bars = rename_columns(derive_ohlcv(load_events(spark, sf_dir)))
    win = Window.partitionBy("ativo").orderBy("date")
    f = bars.withColumn("forecast", F.lag("close_price", SEASON_LAG).over(win)).filter(
        F.col("forecast").isNotNull()
    )
    ae = F.abs(F.col("close_price") - F.col("forecast"))
    close_nz = F.nullif(F.abs(F.col("close_price")), F.lit(0.0))
    return f.groupBy("ativo").agg(
        F.count("*").alias("n_scored"),
        F.round(F.avg(ae), 6).alias("mae"),
        F.round(F.avg(ae / close_nz), 6).alias("mape"),
    )


@register(
    "rolling_median",
    oracle=OHLCV_SQL
    + """
SELECT ativo, "date", close_price,
       CASE WHEN COUNT(close_price) OVER win >= 7
            THEN ROUND(median(close_price) OVER win, 6) END AS med_7d
FROM ohlcv
WINDOW win AS (PARTITION BY ativo ORDER BY "date"
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust trailing smoother: EXACT 7-bar rolling median with
    the same min-periods NULL guard as ``mm_7d`` — the median shrugs off
    a single bad tick that would drag a mean. percentile(0.5) runs as a
    window AGGREGATE over the sorted frame (O(frame) state per row,
    same single shuffle as every per-asset window); with the count
    guard every emitted frame holds exactly 7 values, so the median is
    the 4th order statistic on both engines — no interpolation
    tie-break to diverge on."""
    bars = rename_columns(derive_ohlcv(load_events(spark, sf_dir)))
    win = Window.partitionBy("ativo").orderBy("date").rowsBetween(-6, 0)
    med = F.expr("percentile(close_price, 0.5)").over(win)
    guard = F.count("close_price").over(win) >= 7
    return bars.select(
        "ativo",
        "date",
        "close_price",
        F.when(guard, F.round(med, 6)).alias("med_7d"),
    )


@register(
    "markov_transitions",
    oracle="""
WITH s AS (
    SELECT user_id, event_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_event
    FROM events
    WHERE ts IS NOT NULL
),
c AS (
    SELECT event_type AS cur_event, next_event, COUNT(*) AS n_trans
    FROM s WHERE next_event IS NOT NULL
    GROUP BY 1, 2
)
SELECT cur_event, next_event, CAST(n_trans AS BIGINT) AS n_trans,
       ROUND(CAST(n_trans AS DOUBLE) /
             SUM(n_trans) OVER (PARTITION BY cur_event), 6) AS p
FROM c
""",
)
def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event streams:
    lead() pairs consecutive events in place (no self-join), one count
    aggregate, and the row-normalization is a window over the TINY
    (|event types|^2) transition table — the heavy table is touched
    once. Event-time contract: NULL-ts rows have no stream position and
    are excluded (Spark orders NULLS FIRST, DuckDB LAST)."""
    s = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull()).withColumn(
        "next_event",
        F.lead("event_type").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
        ),
    )
    c = (
        s.filter(F.col("next_event").isNotNull())
        .groupBy(F.col("event_type").alias("cur_event"), "next_event")
        .agg(F.count("*").alias("n_trans"))
    )
    return c.select(
        "cur_event",
        "next_event",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double")
            / F.sum("n_trans").over(Window.partitionBy("cur_event")),
            6,
        ).alias("p"),
    )


@register(
    "partial_agg_merge",
    oracle="""
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       ROUND(SUM(l_quantity), 6) AS sum_qty,
       MIN(l_extendedprice) AS min_price,
       MAX(l_extendedprice) AS max_price,
       ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
FROM lineitem
GROUP BY l_returnflag
""",
)
def partial_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-aggregation algebra: split the fact table into two
    'batches', compute algebraic partials (count/sum/min/max) per
    batch, then MERGE the partials — count+count, sum+sum, min(min),
    max(max), avg re-derived from merged sums. The oracle is the direct
    one-shot aggregate, proving the merge is exact: the pattern that
    lets a 100 TB materialized view absorb a daily batch without
    rescanning history."""
    li = load(spark, sf_dir, "lineitem")
    partials = (
        li.withColumn("batch", F.col("l_orderkey") % 2)
        .groupBy("batch", "l_returnflag")
        .agg(
            F.count("*").alias("p_cnt"),
            F.sum("l_quantity").alias("p_sum_qty"),
            F.min("l_extendedprice").alias("p_min"),
            F.max("l_extendedprice").alias("p_max"),
        )
    )
    return partials.groupBy("l_returnflag").agg(
        F.sum("p_cnt").alias("n_rows"),
        F.round(F.sum("p_sum_qty"), 6).alias("sum_qty"),
        F.min("p_min").alias("min_price"),
        F.max("p_max").alias("max_price"),
        F.round(F.sum("p_sum_qty") / F.sum("p_cnt"), 6).alias("avg_qty"),
    )


@register(
    "realized_volatility",
    oracle="""
WITH e AS (
    SELECT 'TICK' || CAST(user_id % 8 AS VARCHAR) AS ativo,
           date_trunc('day', ts) AS day, ts, event_id, value
    FROM events
),
r AS (
    SELECT ativo, day,
           (value - LAG(value) OVER win) / nullif(LAG(value) OVER win, 0) AS ret
    FROM e
    WINDOW win AS (PARTITION BY ativo, day ORDER BY ts, event_id)
)
SELECT ativo, day,
       CAST(COUNT(ret) AS BIGINT) AS n_returns,
       ROUND(sqrt(SUM(ret * ret)), 6) AS realized_vol
FROM r
GROUP BY ativo, day
""",
)
def realized_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily realized volatility from intraday ticks: sqrt of the sum of
    squared tick-over-tick returns per (asset, day) — the standard
    high-frequency volatility estimator. Same single-exchange shape as
    TWAP: the lag() window and the aggregate share the (ativo, day)
    partitioning. Days with a single tick have no returns and report
    NULL vol over a 0 count, matching SQL COUNT/SUM-over-empty
    semantics on both engines."""
    e = (
        load(spark, sf_dir, "events")
        .withColumn(
            "ativo", F.concat(F.lit("TICK"), (F.col("user_id") % 8).cast("string"))
        )
        .withColumn("day", F.date_trunc("day", F.col("ts")))
    )
    win = Window.partitionBy("ativo", "day").orderBy("ts", "event_id")
    # nullif on the divisor: zero prices exist in the tick stream, and
    # ANSI Spark raises on x/0 where DuckDB yields NULL — make the
    # drop-this-return semantics explicit and identical on both engines.
    prev = F.nullif(F.lag("value").over(win), F.lit(0.0))
    r = e.withColumn("ret", (F.col("value") - prev) / prev)
    return r.groupBy("ativo", "day").agg(
        F.count("ret").alias("n_returns"),
        F.round(F.sqrt(F.sum(F.col("ret") * F.col("ret"))), 6).alias("realized_vol"),
    )
