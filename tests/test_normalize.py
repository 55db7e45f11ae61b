"""Normalization guards (reference: etl/etl_job.py:42-61, 67-68, 106-124).

Edge cases from FIXTURES.md §1: duplicate columns coalesce left-to-right
first-non-null; missing ativo defaults; struct flattening; rename map.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.normalize import (
    coalesce_duplicate_columns,
    ensure_column,
    flatten_structs,
    normalize,
    rename_columns,
)


def test_coalesce_keeps_first_non_null_left_to_right(spark):
    df = spark.createDataFrame([(None, 2.0, 3.0), (1.0, None, 3.0), (None, None, None)], ["x", "x", "x"])
    out = coalesce_duplicate_columns(df)
    assert out.columns == ["x"]
    assert [r.x for r in out.collect()] == [2.0, 1.0, None]


def test_coalesce_preserves_first_seen_order_and_single_columns(spark):
    df = spark.createDataFrame(
        [(1, None, "a", 9), (2, 5, "b", None)], "k int, v1 int, w string, v2 int"
    ).toDF("k", "v", "w", "v")
    out = coalesce_duplicate_columns(df)
    assert out.columns == ["k", "v", "w"]
    rows = out.orderBy("k").collect()
    assert (rows[0].k, rows[0].v, rows[0].w) == (1, 9, "a")
    assert (rows[1].k, rows[1].v, rows[1].w) == (2, 5, "b")


def test_coalesce_noop_without_duplicates(spark):
    df = spark.createDataFrame([(1, 2)], ["a", "b"])
    assert coalesce_duplicate_columns(df) is df


def test_flatten_structs(spark):
    df = spark.createDataFrame([(1, (2.0, "x"))], "id int, s struct<a: double, b: string>")
    out = flatten_structs(df)
    assert out.columns == ["id", "s_a", "s_b"]
    assert out.collect()[0].s_a == 2.0


def test_ensure_column_default_and_noop(spark):
    df = spark.createDataFrame([(1,)], ["v"])
    out = ensure_column(df, "ativo", F.lit("VALE3"))
    assert out.collect()[0].ativo == "VALE3"
    again = ensure_column(out, "ativo", F.lit("OTHER"))
    assert again.collect()[0].ativo == "VALE3"


def test_full_normalize_reference_renames(spark):
    df = spark.createDataFrame(
        [("2024-01-02", 10.0, 100, "VALE3")], ["Date", "Close", "Volume", "ativo"]
    )
    out = normalize(df)
    assert set(out.columns) == {"date", "close_price", "trade_volume", "ativo"}
    assert out.schema["date"].dataType.typeName() == "timestamp"


def test_rename_columns_custom_map(spark):
    df = spark.createDataFrame([(1,)], ["a"])
    assert rename_columns(df, {"a": "b"}).columns == ["b"]
