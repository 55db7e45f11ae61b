"""merge_upsert / scd2_intervals semantics: latest version wins,
tombstones drop keys, intervals chain with NULL-terminated current row."""

from __future__ import annotations

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.merge import merge_upsert, scd2_intervals


def test_merge_upsert_latest_wins_and_tombstones(spark):
    base = spark.createDataFrame(
        [(1, "a", 0, False), (2, "b", 0, False), (3, "c", 0, False)],
        "k int, v string, version int, is_del boolean",
    )
    upd = spark.createDataFrame(
        [(1, "a2", 1, False), (2, "b2", 1, True), (4, "d", 1, False)],
        "k int, v string, version int, is_del boolean",
    )
    out = {
        r.k: (r.v, r.version)
        for r in merge_upsert(base, upd, keys=["k"], version_col="version", tombstone_col="is_del").collect()
    }
    # 1 updated, 2 deleted, 3 untouched, 4 inserted
    assert out == {1: ("a2", 1), 3: ("c", 0), 4: ("d", 1)}


def test_merge_upsert_single_exchange_plan(spark):
    base = spark.createDataFrame([(1, 0)], "k int, version int")
    upd = spark.createDataFrame([(1, 1)], "k int, version int")
    plan = (
        merge_upsert(base, upd, keys=["k"], version_col="version")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1, plan


def test_scd2_intervals_chain(spark):
    changes = spark.createDataFrame(
        [(1, 10, "x"), (1, 20, "y"), (2, 5, "z")], "k int, ts int, attr string"
    )
    rows = scd2_intervals(changes, key="k", ts_col="ts", attrs=["attr"]).collect()
    got = {(r.k, r.valid_from): (r.valid_to, r.attr) for r in rows}
    assert got == {(1, 10): (20, "x"), (1, 20): (None, "y"), (2, 5): (None, "z")}


def test_scd2_intervals_cover_without_overlap(spark, sf_dir):
    """Adjacent intervals share endpoints exactly: valid_to == next
    valid_from, one NULL-terminated row per key."""
    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES

    out = QUERIES["scd2_user_values"](spark, sf_dir)
    nxt = F.lead("valid_from").over(
        __import__("pyspark.sql.window", fromlist=["Window"]).Window.partitionBy("user_id").orderBy("valid_from")
    )
    bad = out.withColumn("nxt", nxt).filter(
        (F.col("valid_to").isNotNull() | F.col("nxt").isNotNull())
        & (F.col("valid_to") != F.col("nxt"))
    )
    assert bad.count() == 0
    per_key_open = out.filter(F.col("valid_to").isNull()).groupBy("user_id").count()
    assert per_key_open.filter(F.col("count") != 1).count() == 0
