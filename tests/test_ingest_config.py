"""Ingest adapter (S1/S5) and run configuration (§2.12)."""

from __future__ import annotations

from datetime import date

from m2_b3_market_data_pipeline_spark.config import RunConfig, parse_job_args
from m2_b3_market_data_pipeline_spark.sources.ingest import default_asset, fetch_ohlcv, write_raw


def test_fetch_ohlcv_shape_and_determinism(spark):
    a = fetch_ohlcv(spark, "VALE3.SA")
    b = fetch_ohlcv(spark, "VALE3.SA")
    assert a.columns == ["Date", "Open", "High", "Low", "Close", "Volume", "ativo"]
    assert a.count() == 30
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    assert a.select("ativo").distinct().collect()[0].ativo == "VALE3"


def test_write_raw_hive_layout(spark, tmp_path):
    df = fetch_ohlcv(spark, "PETR4.SA", days=5)
    write_raw(df, str(tmp_path / "raw"), ingest_date=date(2026, 2, 3))
    files = list((tmp_path / "raw").glob("ano=2026/mes=02/dia=03/*.parquet"))
    assert files, "expected zero-padded ano/mes/dia hive layout"
    back = spark.read.parquet(str(tmp_path / "raw"))
    assert back.count() == 5


def test_parse_job_args_both_forms():
    got = parse_job_args(["--run-date=2026-01-01", "--ticker", "ABC.SA", "--flag"])
    assert got == {"run-date": "2026-01-01", "ticker": "ABC.SA", "flag": ""}


def test_run_config_precedence():
    cfg = RunConfig.from_sources(
        argv=["--run-date=2026-05-05"],
        env={"SPARK_GRAFT_RUN_DATE": "2020-01-01", "TICKER": "XYZ.SA"},
    )
    assert cfg.run_date == "2026-05-05"  # CLI beats env
    assert cfg.ticker == "XYZ.SA"  # env beats default
    assert cfg.raw_path == "data/raw"  # default
