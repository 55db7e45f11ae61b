"""As-of join semantics (inclusive ties, no peek-ahead, unmatched keys)
and OHLC resampling determinism.
"""

from __future__ import annotations

from m2_b3_market_data_pipeline_spark.operators.temporal import asof_join, resample_bars


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 100, "t1"), (1, 200, "t2"), (2, 50, "t3")], "k int, ts int, tid string"
    )
    right = spark.createDataFrame(
        [(1, 100, 10.0), (1, 150, 15.0), (1, 201, 99.0), (3, 1, 1.0)], "k int, ts int, q double"
    )
    return left, right


def test_asof_backward(spark):
    left, right = _sides(spark)
    out = {r.tid: r.q for r in asof_join(left, right, on=["k"], ts="ts", right_values=["q"]).collect()}
    assert out == {"t1": 10.0, "t2": 15.0, "t3": None}


def test_asof_forward(spark):
    left, right = _sides(spark)
    out = {
        r.tid: r.q
        for r in asof_join(
            left, right, on=["k"], ts="ts", right_values=["q"], direction="forward"
        ).collect()
    }
    assert out == {"t1": 10.0, "t2": 99.0, "t3": None}


def test_asof_preserves_all_left_rows(spark, sf_dir):
    from m2_b3_market_data_pipeline_spark.plans.registry import load
    from pyspark.sql import functions as F

    e = load(spark, sf_dir, "events")
    quotes = e.filter(F.col("event_id") % 2 == 0).select("user_id", "ts", F.col("value").alias("qv"))
    trades = e.filter(F.col("event_id") % 2 == 1).select("event_id", "user_id", "ts")
    out = asof_join(trades, quotes, on=["user_id"], ts="ts", right_values=["qv"])
    assert out.count() == trades.count()


def test_resample_open_close_picks(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 10:05:00", 5.0), (1, "2024-01-01 10:20:00", 9.0), (1, "2024-01-01 10:50:00", 2.0)],
        "user_id int, ts string, value double",
    ).selectExpr("user_id", "cast(ts as timestamp) ts", "value")
    row = resample_bars(df, ts="ts", key="user_id", value="value").collect()[0]
    assert (row.open, row.high, row.low, row.close, row.n) == (5.0, 9.0, 2.0, 2.0, 3)


def test_sessionize_gap_boundaries(spark):
    from m2_b3_market_data_pipeline_spark.operators.temporal import session_stats, sessionize

    # user 1: events at 0, 10, 50 min (gap 40 > 30 -> new session);
    # user 2: single event.
    df = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 00:00:00", 1.0),
            (2, 1, "2024-01-01 00:10:00", 2.0),
            (3, 1, "2024-01-01 00:50:00", 4.0),
            (4, 2, "2024-01-01 00:00:00", 8.0),
        ],
        "event_id int, user_id int, ts string, value double",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts", "value")
    seqs = {r.event_id: r.session_seq for r in sessionize(df).collect()}
    assert seqs == {1: 1, 2: 1, 3: 2, 4: 1}
    stats = {
        (r.user_id, r.session_seq): (r.n_events, r.total_value)
        for r in session_stats(sessionize(df)).collect()
    }
    assert stats == {(1, 1): (2, 3.0), (1, 2): (1, 4.0), (2, 1): (1, 8.0)}


def test_sessionize_exact_30min_gap_same_session(spark):
    from m2_b3_market_data_pipeline_spark.operators.temporal import sessionize

    # gap == threshold is NOT a boundary (strictly-greater semantics)
    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", 0.0), (2, 1, "2024-01-01 00:30:00", 0.0)],
        "event_id int, user_id int, ts string, value double",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts", "value")
    assert {r.session_seq for r in sessionize(df).collect()} == {1}


def test_sessionize_single_exchange_plan(spark):
    """sessionize + session_stats must reuse one user_id partitioning:
    exactly ONE shuffle in the whole physical plan."""
    from m2_b3_market_data_pipeline_spark.operators.temporal import session_stats, sessionize

    df = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:00:00", 1.0)],
        "event_id int, user_id int, ts string, value double",
    ).selectExpr("event_id", "user_id", "cast(ts as timestamp) ts", "value")
    plan = session_stats(sessionize(df))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
