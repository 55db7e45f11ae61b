"""Technical indicators over OHLCV bars — the market-data extension of
the reference's single mm_7d rolling mean (etl/etl_job.py:126-130).

All but EWMA are pure window expressions (one shuffle on the asset key,
shared across every indicator — same WindowExec property as the core
pipeline). EWMA is inherently recursive (y_t = a*x_t + (1-a)*y_{t-1}),
inexpressible as a SQL window frame, so it uses the Arrow-batched
grouped-map path (``applyInPandas``) — the sanctioned escape hatch for
per-key sequential state, with per-asset data bounded (daily bars).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(key: str, order: str):
    return Window.partitionBy(key).orderBy(order)


def with_returns(df: DataFrame, *, key: str = "ativo", order: str = "date", price: str = "close_price") -> DataFrame:
    """Simple period-over-period returns via lag. nullif on the divisor:
    zero prices occur in the larger fixtures, where ANSI Spark raises on
    x/0 but DuckDB yields NULL — a return off a zero price is undefined
    (NULL) on both engines."""
    prev = F.nullif(F.lag(price).over(_w(key, order)), F.lit(0.0))
    return df.withColumn("ret", F.round((F.col(price) - prev) / prev, 6))


def with_bollinger(
    df: DataFrame,
    *,
    key: str = "ativo",
    order: str = "date",
    price: str = "close_price",
    window_rows: int = 7,
    n_std: float = 2.0,
) -> DataFrame:
    """Bollinger bands: rolling mean ± n·stddev_samp with the same
    min_periods NULL guard as mm_7d (full-window-only values)."""
    frame = _w(key, order).rowsBetween(-(window_rows - 1), 0)
    filled = F.count(price).over(frame) >= window_rows
    mid = F.when(filled, F.avg(price).over(frame))
    sd = F.when(filled, F.stddev_samp(F.col(price)).over(frame))
    return (
        df.withColumn("boll_mid", F.round(mid, 6))
        .withColumn("boll_up", F.round(mid + n_std * sd, 6))
        .withColumn("boll_dn", F.round(mid - n_std * sd, 6))
    )


def with_vwap(
    df: DataFrame,
    *,
    key: str = "ativo",
    order: str = "date",
    price: str = "close_price",
    volume: str = "trade_volume",
) -> DataFrame:
    """Cumulative volume-weighted average price."""
    cum = _w(key, order).rowsBetween(Window.unboundedPreceding, 0)
    num = F.sum(F.col(price) * F.col(volume)).over(cum)
    den = F.sum(volume).over(cum)
    return df.withColumn("vwap", F.round(num / den, 6))


def with_drawdown(
    df: DataFrame, *, key: str = "ativo", order: str = "date", price: str = "close_price"
) -> DataFrame:
    """Drawdown from the running peak (<= 0)."""
    cum = _w(key, order).rowsBetween(Window.unboundedPreceding, 0)
    peak = F.max(price).over(cum)
    return df.withColumn("drawdown", F.round(F.col(price) / peak - 1.0, 6))


def with_rsi(
    df: DataFrame,
    *,
    key: str = "ativo",
    order: str = "date",
    price: str = "close_price",
    window_rows: int = 7,
) -> DataFrame:
    """RSI (simple-average Cutler's form — window-expressible, unlike
    Wilder's recursive smoothing): 100 - 100/(1 + avgGain/avgLoss) over
    the trailing window, NULL until filled, 100 when no losses."""
    delta = F.col(price) - F.lag(price).over(_w(key, order))
    gain = F.greatest(delta, F.lit(0.0))
    loss = F.greatest(-delta, F.lit(0.0))
    with_gl = df.withColumn("__gain", gain).withColumn("__loss", loss)
    frame = _w(key, order).rowsBetween(-(window_rows - 1), 0)
    filled = F.count("__gain").over(frame) >= window_rows
    ag = F.avg("__gain").over(frame)
    al = F.avg("__loss").over(frame)
    rsi = F.when(~filled, F.lit(None).cast("double")).otherwise(
        F.when(al == 0.0, F.lit(100.0)).otherwise(100.0 - 100.0 / (1.0 + ag / al))
    )
    return with_gl.withColumn("rsi", F.round(rsi, 6)).drop("__gain", "__loss")


def with_ewma(
    df: DataFrame,
    *,
    key: str = "ativo",
    order: str = "date",
    price: str = "close_price",
    alpha: float = 0.3,
) -> DataFrame:
    """Recursive EWMA per asset via Arrow-batched grouped map.

    ``y_t = alpha*x_t + (1-alpha)*y_{t-1}`` (pandas ``ewm(alpha,
    adjust=False)`` semantics). Each group is one asset's bars — bounded
    state, sorted in-worker; the shuffle is the same partitionBy(key)
    every other indicator already needs."""
    from pyspark.sql import types as T

    # Build a fresh StructType: StructType.add() MUTATES the instance,
    # and df.schema hands back a cached object — add()-ing to it
    # corrupts the source DataFrame's resolved schema.
    schema = T.StructType(list(df.schema.fields) + [T.StructField("ewma", T.DoubleType())])
    out_cols = [f.name for f in schema.fields]

    def per_asset(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        pdf["ewma"] = pdf[price].ewm(alpha=alpha, adjust=False).mean().round(6)
        return pdf[out_cols]

    return df.groupBy(key).applyInPandas(per_asset, schema)


def with_macd(
    df: DataFrame,
    *,
    key: str = "ativo",
    order: str = "date",
    price: str = "close_price",
    fast: int = 12,
    slow: int = 26,
    signal: int = 9,
) -> DataFrame:
    """MACD (12/26/9): macd = EMA_fast - EMA_slow, signal = EMA of the
    macd line, histogram = macd - signal.

    Three chained recursions -> one Arrow-batched grouped map computes
    all of them in a single pass per asset (same one-shuffle property as
    ``with_ewma``; spans = {fast,slow,signal} periods, alpha = 2/(n+1),
    ``adjust=False`` streaming form). Columns are rounded to 6dp at the
    boundary per the repo determinism contract.
    """
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("macd", T.DoubleType()),
            T.StructField("macd_signal", T.DoubleType()),
            T.StructField("macd_hist", T.DoubleType()),
        ]
    )
    out_cols = [f.name for f in schema.fields]
    a_fast, a_slow, a_sig = 2.0 / (fast + 1), 2.0 / (slow + 1), 2.0 / (signal + 1)

    def per_asset(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order)
        ema_f = pdf[price].ewm(alpha=a_fast, adjust=False).mean()
        ema_s = pdf[price].ewm(alpha=a_slow, adjust=False).mean()
        macd = ema_f - ema_s
        sig = macd.ewm(alpha=a_sig, adjust=False).mean()
        pdf["macd"] = macd.round(6)
        pdf["macd_signal"] = sig.round(6)
        pdf["macd_hist"] = (macd - sig).round(6)
        return pdf[out_cols]

    return df.groupBy(key).applyInPandas(per_asset, schema)
