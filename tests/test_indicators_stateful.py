"""Technical indicators (EWMA vs pandas golden) and the custom stateful
streaming operator (cross-batch state accumulation).
"""

from __future__ import annotations

import time

import pandas as pd
from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.indicators import (
    with_bollinger,
    with_drawdown,
    with_ewma,
    with_returns,
    with_rsi,
)


def _bars(spark):
    rows = [("A", d, float(10 + (d * 7) % 5)) for d in range(1, 15)] + [
        ("B", d, float(20 - d)) for d in range(1, 10)
    ]
    return spark.createDataFrame(rows, "ativo string, date int, close_price double")


def test_ewma_matches_pandas(spark):
    out = with_ewma(_bars(spark), alpha=0.3).orderBy("ativo", "date").toPandas()
    for ativo, grp in out.groupby("ativo"):
        golden = grp["close_price"].ewm(alpha=0.3, adjust=False).mean().round(6)
        assert (grp["ewma"].values == golden.values).all()


def test_returns_first_row_null(spark):
    out = with_returns(_bars(spark)).orderBy("ativo", "date").collect()
    per = {}
    for r in out:
        per.setdefault(r.ativo, []).append(r.ret)
    assert all(v[0] is None for v in per.values())


def test_bollinger_band_ordering(spark):
    out = with_bollinger(_bars(spark)).filter(F.col("boll_mid").isNotNull()).collect()
    assert out, "expected filled windows"
    assert all(r.boll_dn <= r.boll_mid <= r.boll_up for r in out)


def test_drawdown_nonpositive_and_monotone_peak(spark):
    out = with_drawdown(_bars(spark)).collect()
    assert all(r.drawdown <= 0.0 for r in out)


def test_rsi_range_and_guard(spark):
    out = with_rsi(_bars(spark)).orderBy("ativo", "date").collect()
    per = {}
    for r in out:
        per.setdefault(r.ativo, []).append(r.rsi)
    for vals in per.values():
        assert all(v is None for v in vals[:6])
        assert all(v is not None and 0.0 <= v <= 100.0 for v in vals[6:])
    # asset B strictly declines -> RSI 0 once window filled
    assert all(v == 0.0 for v in per["B"][6:])


def test_stateful_running_totals_across_batches(spark, tmp_path):
    from m2_b3_market_data_pipeline_spark.streaming.stateful import running_user_totals

    d = tmp_path / "stream_in"
    d.mkdir()
    schema = "user_id bigint, value double"
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 7.0)], schema).write.mode(
        "append"
    ).parquet(str(d / "b1"))
    spark.createDataFrame([(1, 1.0), (2, 100.0)], schema).write.mode("append").parquet(
        str(d / "b2")
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(d))
    )
    name = f"state_{int(time.time())}"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    pdf = spark.sql(f"SELECT * FROM {name}").toPandas()
    # last update per user reflects cross-batch accumulated state
    final = pdf.sort_index().groupby("user_id").last()
    assert final.loc[1, "n"] == 3 and abs(final.loc[1, "total"] - 16.0) < 1e-9
    assert final.loc[2, "n"] == 2 and final.loc[2, "peak"] == 100.0
