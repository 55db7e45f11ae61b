"""Salted aggregation equivalence + bucketed-join exchange elimination."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.skew import salted_agg, write_bucketed


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_salted_agg_equals_plain_agg(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i % 7), i % 100) for i in range(9000)] + [
        (f"k{i % 50}", float(i), i) for i in range(1000)
    ]
    df = spark.createDataFrame(rows, "key string, v double, w long")
    salted = salted_agg(
        df,
        key="key",
        aggs={
            "total": ("sum", "v"),
            "n": ("count", "v"),
            "lo": ("min", "w"),
            "hi": ("max", "w"),
            "mean_v": ("avg", "v"),
        },
    )
    plain = df.groupBy("key").agg(
        F.sum("v").alias("total"),
        F.count("v").alias("n"),
        F.min("w").alias("lo"),
        F.max("w").alias("hi"),
        F.avg("v").alias("mean_v"),
    )
    cols = ["key", "total", "n", "lo", "hi", "mean_v"]
    a = {r.key: (round(r.total, 6), r.n, r.lo, r.hi, round(r.mean_v, 9)) for r in salted.select(cols).collect()}
    b = {r.key: (round(r.total, 6), r.n, r.lo, r.hi, round(r.mean_v, 9)) for r in plain.select(cols).collect()}
    assert a == b


def test_salted_agg_rejects_non_algebraic(spark):
    df = spark.createDataFrame([("a", 1.0)], "key string, v double")
    import pytest

    with pytest.raises(ValueError, match="not algebraic"):
        salted_agg(df, key="key", aggs={"m": ("median", "v")})


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed(orders, "orders_b", bucket_col="o_orderkey", sort_col="o_orderkey")
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        bucket_col="o_orderkey",
        sort_col="o_orderkey",
    )
    try:
        a = spark.table("orders_b")
        b = spark.table("lineitem_b")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "o_orderkey").groupBy("o_orderstatus").count()
            plan = _plan(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # co-bucketed sort-merge join: the ONLY exchange is the final
        # groupBy's; a non-bucketed plan would have two more feeding the
        # join (one per side)
        assert "SortMergeJoin" in plan, plan
        assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_salted_join_equals_plain_join(spark):
    from m2_b3_market_data_pipeline_spark.operators.skew import salted_join

    facts = spark.createDataFrame(
        [(i, "hot" if i % 10 else "cold", float(i)) for i in range(200)],
        "id int, k string, v double",
    )
    dim = spark.createDataFrame([("hot", 1.0), ("cold", 2.0)], "k string, w double")
    got = sorted(
        (r.id, r.k, r.v, r.w) for r in salted_join(facts, dim, key="k", n_salts=8).collect()
    )
    want = sorted((r.id, r.k, r.v, r.w) for r in facts.join(dim, "k").select("id", "k", "v", "w").collect())
    assert got == want
