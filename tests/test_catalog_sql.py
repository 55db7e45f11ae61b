"""Catalog + spark.sql surface: the Athena-replacement workflow
(reference: README.md:270-296 — SHOW / DESCRIBE / SELECT over cataloged
tables).
"""

from __future__ import annotations

from m2_b3_market_data_pipeline_spark.plans.ohlcv import derive_ohlcv, load_events
from m2_b3_market_data_pipeline_spark.plans.pipeline import refined
from m2_b3_market_data_pipeline_spark.sources.catalog import (
    register_parquet_table,
    register_testdata_views,
    show_tables,
)
from m2_b3_market_data_pipeline_spark.sources.parquet_io import write_refined


def test_athena_replacement_workflow(spark, sf_dir, tmp_path):
    """Write refined -> register table -> repair partitions -> run the
    documented interactive queries via spark.sql."""
    out = refined(derive_ohlcv(load_events(spark, sf_dir)), run_date="2026-01-01")
    path = str(tmp_path / "refined")
    write_refined(out, path)
    register_parquet_table(spark, "refined_quotes", path)
    try:
        # Q4 surface
        tables = {r.tableName for r in show_tables(spark).collect()}
        assert "refined_quotes" in tables
        desc = {r.col_name for r in spark.sql("DESCRIBE refined_quotes").collect()}
        assert {"mm_7d", "avg_close_price", "ativo"} <= desc
        # Q2/Q3 surface: partition-pruned filter + order + limit
        rows = spark.sql(
            """
            SELECT date, close_price, mm_7d FROM refined_quotes
            WHERE ativo = 'TICK3' ORDER BY date DESC LIMIT 30
            """
        ).collect()
        assert 0 < len(rows) <= 30
        assert rows[0].date >= rows[-1].date
        # MSCK discovered every partition (crawler replacement)
        n_parts = spark.sql("SHOW PARTITIONS refined_quotes").count()
        assert n_parts == 8
    finally:
        spark.sql("DROP TABLE IF EXISTS refined_quotes")


def test_testdata_views_queryable(spark, sf_dir):
    register_testdata_views(spark, sf_dir)
    got = spark.sql(
        "SELECT count(*) AS n FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
    ).collect()[0].n
    assert got > 0
