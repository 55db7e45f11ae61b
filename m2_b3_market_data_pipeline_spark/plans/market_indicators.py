"""Technical-indicator queries over the derived OHLCV bars, each (except
the recursive EWMA) oracle-checked with the identical window arithmetic
in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.indicators import (
    with_bollinger,
    with_drawdown,
    with_ewma,
    with_returns,
    with_rsi,
    with_vwap,
)
from ..operators.normalize import rename_columns
from .ohlcv import OHLCV_SQL, derive_ohlcv, load_events
from .registry import register


def _bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rename_columns(derive_ohlcv(load_events(spark, sf_dir)))


@register(
    "indicator_returns",
    oracle=OHLCV_SQL
    + """
SELECT ativo, "date", close_price,
       ROUND((close_price - nullif(LAG(close_price) OVER w, 0)) / nullif(LAG(close_price) OVER w, 0), 6) AS ret
FROM ohlcv
WINDOW w AS (PARTITION BY ativo ORDER BY "date")
""",
)
def indicator_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period returns via lag (operators/indicators.py)."""
    return with_returns(_bars(spark, sf_dir)).select("ativo", "date", "close_price", "ret")


@register(
    "indicator_bollinger",
    oracle=OHLCV_SQL
    + """
SELECT ativo, "date", close_price,
       ROUND(CASE WHEN COUNT(close_price) OVER w >= 7 THEN AVG(close_price) OVER w END, 6) AS boll_mid,
       ROUND(CASE WHEN COUNT(close_price) OVER w >= 7
             THEN AVG(close_price) OVER w + 2.0 * STDDEV_SAMP(close_price) OVER w END, 6)  AS boll_up,
       ROUND(CASE WHEN COUNT(close_price) OVER w >= 7
             THEN AVG(close_price) OVER w - 2.0 * STDDEV_SAMP(close_price) OVER w END, 6)  AS boll_dn
FROM ohlcv
WINDOW w AS (PARTITION BY ativo ORDER BY "date" ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def indicator_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands: rolling mean ± 2σ, min_periods-guarded."""
    return with_bollinger(_bars(spark, sf_dir)).select(
        "ativo", "date", "close_price", "boll_mid", "boll_up", "boll_dn"
    )


@register(
    "indicator_vwap_drawdown",
    oracle=OHLCV_SQL
    + """
SELECT ativo, "date", close_price,
       ROUND(SUM(close_price * trade_volume) OVER cum / SUM(trade_volume) OVER cum, 6) AS vwap,
       ROUND(close_price / MAX(close_price) OVER cum - 1.0, 6)                         AS drawdown
FROM ohlcv
WINDOW cum AS (PARTITION BY ativo ORDER BY "date" ROWS UNBOUNDED PRECEDING)
""",
)
def indicator_vwap_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative VWAP + drawdown from running peak."""
    out = with_drawdown(with_vwap(_bars(spark, sf_dir)))
    return out.select("ativo", "date", "close_price", "vwap", "drawdown")


@register(
    "indicator_rsi",
    oracle=OHLCV_SQL
    + """
, gl AS (
    SELECT ativo, "date", close_price,
           greatest(close_price - LAG(close_price) OVER (PARTITION BY ativo ORDER BY "date"), 0.0)  AS g,
           greatest(LAG(close_price) OVER (PARTITION BY ativo ORDER BY "date") - close_price, 0.0)  AS l
    FROM ohlcv
)
SELECT ativo, "date", close_price,
       ROUND(CASE WHEN COUNT(g) OVER w < 7 THEN NULL
                  WHEN AVG(l) OVER w = 0.0 THEN 100.0
                  ELSE 100.0 - 100.0 / (1.0 + AVG(g) OVER w / AVG(l) OVER w) END, 6) AS rsi
FROM gl
WINDOW w AS (PARTITION BY ativo ORDER BY "date" ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def indicator_rsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RSI (Cutler's simple-average form), min_periods-guarded."""
    return with_rsi(_bars(spark, sf_dir)).select("ativo", "date", "close_price", "rsi")


@register(
    "indicator_ewma",
    oracle=OHLCV_SQL
    + """
, arr AS (
    SELECT ativo,
           list(close_price ORDER BY "date") AS px,
           list("date" ORDER BY "date") AS ds
    FROM ohlcv GROUP BY ativo
),
idx AS (SELECT ativo, px, ds, unnest(generate_series(1, len(px))) AS t FROM arr)
SELECT ativo, ds[t] AS "date", px[t] AS close_price,
       ROUND(pow(0.7, t - 1) * px[1] +
             0.3 * coalesce(list_sum([px[s] * pow(0.7, t - s) for s in generate_series(2, t)]), 0.0),
             6) AS ewma
FROM idx
""",
)
def indicator_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive EWMA via Arrow-batched applyInPandas grouped map —
    per-asset sequential state (``y_t = a*x_t + (1-a)*y_{t-1}``, pandas
    ``ewm(adjust=False)``). Hash-checked: the recursion has the closed
    form ``y_t = (1-a)^(t-1) x_1 + a * sum_s (1-a)^(t-s) x_s``, which
    the oracle evaluates per (asset, t) over the collected price list —
    O(n^2) per asset is fine oracle-side (n = bars per asset), while the
    Spark path stays the O(n) streaming recursion."""
    return with_ewma(_bars(spark, sf_dir)).select("ativo", "date", "close_price", "ewma")


@register(
    "indicator_macd",
    oracle=OHLCV_SQL
    + """
, arr AS (
    SELECT ativo,
           list(close_price ORDER BY "date") AS px,
           list("date" ORDER BY "date") AS ds
    FROM ohlcv GROUP BY ativo
),
m AS (
    SELECT ativo, ds, px,
           [pow(1.0 - 2.0/13.0, t - 1) * px[1]
              + (2.0/13.0) * coalesce(list_sum([px[s] * pow(1.0 - 2.0/13.0, t - s) for s in generate_series(2, t)]), 0.0)
            - pow(1.0 - 2.0/27.0, t - 1) * px[1]
              - (2.0/27.0) * coalesce(list_sum([px[s] * pow(1.0 - 2.0/27.0, t - s) for s in generate_series(2, t)]), 0.0)
            for t in generate_series(1, len(px))] AS macd
    FROM arr
),
idx AS (SELECT ativo, ds, px, macd, unnest(generate_series(1, len(macd))) AS t FROM m)
SELECT ativo, ds[t] AS "date", px[t] AS close_price,
       ROUND(macd[t], 6) AS macd,
       ROUND(pow(0.8, t - 1) * macd[1]
             + 0.2 * coalesce(list_sum([macd[s] * pow(0.8, t - s) for s in generate_series(2, t)]), 0.0), 6) AS macd_signal,
       ROUND(macd[t] - (pow(0.8, t - 1) * macd[1]
             + 0.2 * coalesce(list_sum([macd[s] * pow(0.8, t - s) for s in generate_series(2, t)]), 0.0)), 6) AS macd_hist
FROM idx
""",
)
def indicator_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MACD 12/26/9 via one Arrow-batched grouped map (three chained
    EMA recursions in a single per-asset pass — operators/indicators.py
    ``with_macd``). Hash-checked: each adjust=False EMA has the closed
    form ``y_t = (1-a)^(t-1) x_1 + a * sum_s (1-a)^(t-s) x_s``; the
    oracle evaluates the fast/slow forms over the price list and the
    signal form over the resulting macd list — O(n^2) per asset
    oracle-side, while the Spark path stays the O(n) recursion."""
    from ..operators.indicators import with_macd

    return with_macd(_bars(spark, sf_dir)).select(
        "ativo", "date", "close_price", "macd", "macd_signal", "macd_hist"
    )
