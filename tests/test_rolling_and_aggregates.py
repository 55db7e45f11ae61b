"""Transformation C (rolling mean, min_periods NULL guard) and A/J1
(per-asset aggregates + enrichment) — the correctness-critical semantics
(SURVEY.md §7.4 risks 1 and 3). Golden values computed with pandas
rolling, the same engine the reference uses (etl/etl_job.py:126-130).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.aggregates import (
    enrich_with_aggregates_join,
    enrich_with_aggregates_window,
)
from m2_b3_market_data_pipeline_spark.operators.rolling import with_rolling_mean


def _bars(spark, n=10, assets=("A", "B")):
    rows = [
        (a, f"2024-01-{d + 1:02d}", float((d + 1) * (i + 1)), 100 * (d + 1))
        for i, a in enumerate(assets)
        for d in range(n)
    ]
    return spark.createDataFrame(
        rows, "ativo string, date string, close_price double, trade_volume long"
    ).withColumn("date", F.to_timestamp("date"))


def test_rolling_mean_nulls_until_window_filled(spark):
    out = with_rolling_mean(_bars(spark)).orderBy("ativo", "date").collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r.ativo, []).append(r.mm_7d)
    for vals in by_asset.values():
        assert all(v is None for v in vals[:6]), "first 6 rows must be NULL (min_periods)"
        assert all(v is not None for v in vals[6:])


def test_rolling_mean_matches_pandas_golden(spark):
    out = with_rolling_mean(_bars(spark)).orderBy("ativo", "date").toPandas()
    for ativo, grp in out.groupby("ativo"):
        golden = grp["close_price"].rolling(window=7).mean()
        got = grp["mm_7d"].astype(float)
        assert all(
            (math.isnan(g) and pd.isna(e)) or abs(g - e) < 1e-9
            for g, e in zip(got, golden)
        )


def test_short_partition_all_null(spark):
    df = _bars(spark, n=6, assets=("X",))
    out = with_rolling_mean(df).collect()
    assert all(r.mm_7d is None for r in out)


def test_join_and_window_enrichment_agree(spark):
    bars = _bars(spark)
    via_join = enrich_with_aggregates_join(bars)
    via_window = enrich_with_aggregates_window(bars)
    cols = ["ativo", "date", "close_price", "avg_close_price", "total_volume"]
    a = sorted(map(tuple, via_join.select(cols).collect()))
    b = sorted(map(tuple, via_window.select(cols).collect()))
    assert a == b


def test_avg_constant_within_asset(spark):
    out = enrich_with_aggregates_window(_bars(spark))
    per_asset = out.groupBy("ativo").agg(F.countDistinct("avg_close_price").alias("n")).collect()
    assert all(r.n == 1 for r in per_asset)


def test_aggregates_skip_nulls_like_pandas(spark):
    df = spark.createDataFrame(
        [("A", 1.0, 10), ("A", None, 20), ("A", 3.0, None)],
        "ativo string, close_price double, trade_volume long",
    )
    row = enrich_with_aggregates_join(df).select("avg_close_price", "total_volume").first()
    assert row.avg_close_price == 2.0  # mean skips NULL, like pandas NaN-skip
    assert row.total_volume == 30
