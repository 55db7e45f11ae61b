"""End-to-end reference pipeline: refined output schema, partitioned
write layout (S10), empty-input guard (S9), multi-asset handling (the
documented semantic upgrade over the reference's first-row-asset write,
etl/etl_job.py:147-151).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.plans.ohlcv import derive_ohlcv, load_events
from m2_b3_market_data_pipeline_spark.plans.pipeline import refined, transform
from m2_b3_market_data_pipeline_spark.sources.parquet_io import is_empty, union_by_name, write_refined


def test_refined_schema_matches_fixtures_contract(spark, sf_dir):
    out = transform(derive_ohlcv(load_events(spark, sf_dir)))
    expected = {
        "date",
        "Open",
        "High",
        "Low",
        "close_price",
        "trade_volume",
        "mm_7d",
        "avg_close_price",
        "total_volume",
        "ativo",
    }
    assert expected <= set(out.columns)


def test_partitioned_write_layout(spark, sf_dir, tmp_path):
    out = refined(derive_ohlcv(load_events(spark, sf_dir)), run_date="2026-01-01")
    path = str(tmp_path / "refined")
    write_refined(out, path)
    read_back = spark.read.parquet(path)
    assert read_back.count() == out.count()
    # Hive layout with partition values for every asset, not just row 0's
    dirs = {p.ativo for p in read_back.select("ativo").distinct().collect()}
    assert len(dirs) == 8
    files = list((tmp_path / "refined").glob("ativo=*/data=2026-01-01/*.parquet"))
    assert files, "expected ativo=<a>/data=<date>/ hive layout"
    # partition columns are dropped from the data files (etl_job.py:154-156)
    import pyarrow.parquet as pq

    assert "ativo" not in pq.read_schema(str(files[0])).names


def test_empty_input_guard(spark, tmp_path):
    df = spark.createDataFrame([], "ativo string, data string, v double")
    path = str(tmp_path / "nothing")
    write_refined(df, path)
    assert not (tmp_path / "nothing").exists()
    assert is_empty(df)


def test_union_by_name_tolerates_missing_columns(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2,)], "id int")
    out = union_by_name(a, b).orderBy("id").collect()
    assert out[0].a == "x" and out[1].a is None


def test_run_date_injectable(spark, sf_dir):
    out = refined(derive_ohlcv(load_events(spark, sf_dir)), run_date="1999-12-31")
    assert out.select("data").distinct().collect()[0].data == "1999-12-31"


def test_expire_partitions_retention_sweep(spark, sf_dir, tmp_path):
    """Retention drops only partitions older than the cutoff, as a
    directory-level metadata operation; the surviving data still reads."""
    from m2_b3_market_data_pipeline_spark.plans.ohlcv import derive_ohlcv, load_events
    from m2_b3_market_data_pipeline_spark.plans.pipeline import refined
    from m2_b3_market_data_pipeline_spark.sources.parquet_io import (
        expire_partitions,
        write_refined,
    )

    path = str(tmp_path / "refined")
    for run_date in ("2026-01-01", "2026-01-02", "2026-01-03"):
        out = refined(derive_ohlcv(load_events(spark, sf_dir)), run_date=run_date)
        write_refined(out, path)
    before = spark.read.parquet(path)
    assert before.select("data").distinct().count() == 3

    removed = expire_partitions(path, cutoff="2026-01-03")
    assert sorted(set(removed)) == ["2026-01-01", "2026-01-02"]
    after = spark.read.parquet(path)
    # partition values are inferred as dates on read
    assert {str(r.data) for r in after.select("data").distinct().collect()} == {
        "2026-01-03"
    }


def test_merge_schema_reads_evolved_layout(spark, tmp_path):
    """Schema evolution at the storage layer: two file generations with
    different columns read as one table under mergeSchema (the
    crawler-replacement claim of SURVEY §1.3)."""
    d = str(tmp_path / "evolve")
    spark.createDataFrame([(1, 10.0)], "id long, price double").write.parquet(f"{d}/g1")
    spark.createDataFrame(
        [(2, 20.0, "BRL")], "id long, price double, currency string"
    ).write.parquet(f"{d}/g2")
    df = spark.read.option("mergeSchema", "true").option(
        "recursiveFileLookup", "true"
    ).parquet(d)
    assert set(df.columns) == {"id", "price", "currency"}
    rows = {r.id: r.currency for r in df.collect()}
    assert rows == {1: None, 2: "BRL"}
