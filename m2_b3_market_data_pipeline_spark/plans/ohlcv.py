"""Deterministic OHLCV derivation from the `events` fixture.

The reference's single logical table is daily OHLCV bars per asset
(reference: scraper/scraper_upload.py:35-39). The driver fixtures carry no
OHLCV table, so FIXTURES.md §1 prescribes deriving one from ``events``:
``ativo = 'TICK' || user_id % 8``, one bar per (ativo, day).

Determinism contract (shared with the DuckDB oracle in plans/oracles.py):
- bar aggregates use only min/max/count — exact picks of input doubles and
  integer arithmetic, so Spark and DuckDB agree bit-for-bit regardless of
  aggregation order. Sum-of-double aggregates are rounded downstream.
- output is unique per (ativo, date): window ordering is total.

The derived frame intentionally uses the reference's RAW column names
(Date/Close/Volume) so the normalize step (transformation B) has real work
to do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Shared with the oracle: keep in sync with OHLCV_SQL below.
N_ASSETS = 8


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .registry import load

    return load(spark, sf_dir, "events")


def derive_ohlcv(events: DataFrame) -> DataFrame:
    """events -> raw-shaped daily OHLCV bars (columns named as yfinance
    returns them, pre-normalization: Date/Open/High/Low/Close/Volume/ativo).
    """
    # Event-time contract (adversarial gate, round 8): a bar needs an
    # event time; rows with NULL ts are excluded — the same rule
    # Structured Streaming's F.window applies implicitly. Without it a
    # NULL-date bar joins every downstream ORDER BY "date" window at a
    # different end in Spark (NULLS FIRST) than DuckDB (NULLS LAST).
    return (
        events.filter(F.col("ts").isNotNull())
        .withColumn("ativo", F.concat(F.lit("TICK"), (F.col("user_id") % N_ASSETS).cast("string")))
        .withColumn("Date", F.date_trunc("day", F.col("ts")))
        .groupBy("ativo", "Date")
        .agg(
            F.max("value").alias("Open"),
            F.max("value").alias("High"),
            F.min("value").alias("Low"),
            F.min("value").alias("Close"),
            (F.count("*") * F.lit(1000)).alias("Volume"),
        )
    )


# DuckDB-side equivalent of derive_ohlcv + normalize (rename B), used as a
# CTE prefix by every oracle query that consumes OHLCV bars.
OHLCV_SQL = """
WITH ohlcv AS (
    SELECT
        'TICK' || CAST(user_id % 8 AS VARCHAR)      AS ativo,
        date_trunc('day', ts)                       AS "date",
        max(value)                                  AS "Open",
        max(value)                                  AS "High",
        min(value)                                  AS "Low",
        min(value)                                  AS close_price,
        count(*) * 1000                             AS trade_volume
    FROM events
    WHERE ts IS NOT NULL
    GROUP BY 1, 2
)
"""
