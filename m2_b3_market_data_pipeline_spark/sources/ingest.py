"""Ingest adapter: the scraper's role, as a DataFrame producer.

The reference's scraper pulls 30 daily OHLCV bars for one ticker from
Yahoo Finance and writes one Parquet file under
``raw/ano=Y/mes=M/dia=D/<ativo>.parquet``
(reference: scraper/scraper_upload.py:35-60). Network ingestion is an
*input adapter*, not an engine operator (SURVEY.md §2.1 S1), so the
engine-facing contract is just "produce a raw-schema DataFrame":

- ``fetch_ohlcv`` is the yfinance stand-in — deterministic synthetic
  bars (seeded per ticker) with the exact yfinance column shape;
- ``write_raw`` lands it Hive-partitioned by ingest date (S5) via
  ``partitionBy`` instead of f-string path construction.

A real deployment swaps ``fetch_ohlcv`` for an HTTP-backed producer;
nothing downstream changes.
"""

from __future__ import annotations

from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def default_asset(ticker: str) -> str:
    """X2: asset id from ticker — ``TICKER.split(".")[0]``
    (reference: scraper/scraper_upload.py:29-30)."""
    return ticker.split(".")[0]


def fetch_ohlcv(
    spark: SparkSession,
    ticker: str,
    *,
    days: int = 30,
    end: date | None = None,
) -> DataFrame:
    """Deterministic synthetic stand-in for
    ``yf.download(ticker, period="30d", interval="1d")``: one row per
    day, yfinance column names, seeded by the ticker text so repeated
    runs are reproducible."""
    end = end or date(2026, 1, 1)
    seed = sum(ord(c) for c in ticker)
    rows = []
    for i in range(days):
        d = end - timedelta(days=days - 1 - i)
        base = 50.0 + (seed % 100) + ((seed * (i + 3)) % 17) - 8
        rows.append(
            (
                d.strftime("%Y-%m-%d"),
                round(base + 0.5, 2),
                round(base + 1.5, 2),
                round(base - 1.5, 2),
                round(base, 2),
                1000 * ((seed + i * 7) % 50 + 1),
            )
        )
    df = spark.createDataFrame(
        rows, "Date string, Open double, High double, Low double, Close double, Volume long"
    )
    # S2 (reset_index) is a no-op in Spark; S3 tags the asset id.
    return df.withColumn("Date", F.to_timestamp("Date")).withColumn(
        "ativo", F.lit(default_asset(ticker))
    )


def write_raw(df: DataFrame, raw_path: str, *, ingest_date: date | None = None) -> None:
    """S5: Hive-partitioned raw landing ``raw/ano=Y/mes=M/dia=D/``
    (reference: scraper/scraper_upload.py:42-47), with zero-padded month
    and day partition values matching the reference's strftime."""
    d = ingest_date or date.today()
    (
        df.withColumn("ano", F.lit(d.strftime("%Y")))
        .withColumn("mes", F.lit(d.strftime("%m")))
        .withColumn("dia", F.lit(d.strftime("%d")))
        .write.mode("append")
        .partitionBy("ano", "mes", "dia")
        .parquet(raw_path)
    )
