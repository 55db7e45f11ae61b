"""Athena-replacement relational surface on the TPC-H-ish fixtures.

The reference's interactive query capability is "arbitrary Presto SQL via
Athena over the cataloged refined table" (reference: README.md:270-296).
``spark.sql`` / DataFrame ops are the drop-in; these queries prove the
full relational surface: multi-way joins (broadcast + shuffle), group
aggregation, window ranking, lead/lag, distinct aggregation, rollup, set
ops, semi/anti joins, top-k, and an as-of join.

Scale notes per query are in docstrings; the common themes:
- dimension tables (region/nation/customer/supplier/part) are broadcast —
  at 100 TB the fact tables shuffle only for their own aggregations;
- every top-k is ORDER BY + LIMIT -> TakeOrderedAndProject (no full sort);
- rounded floating aggregates per the registry determinism contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.temporal import asof_join, resample_bars
from .registry import load, register


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 6)                                    AS sum_qty,
       ROUND(SUM(l_extendedprice), 6)                               AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)            AS sum_disc_price,
       ROUND(AVG(l_quantity), 6)                                    AS avg_qty,
       ROUND(AVG(l_extendedprice), 6)                               AS avg_price,
       ROUND(AVG(l_discount), 6)                                    AS avg_disc,
       COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan + filter + hash agg. The filter reaches the
    parquet scan (PushedFilters) and the agg is partial+final — minimal
    plan, one shuffle on the 6-value grouping key."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
SELECT l.l_orderkey AS orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
       o.o_orderdate AS orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND l.l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
""",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> broadcast join chain ->
    agg -> top-k. customer is broadcast (small after the segment filter);
    lineitem never shuffles for the joins, only for the final agg."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    l = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(l.l_orderkey.alias("orderkey"), o.o_orderdate.alias("orderdate"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
        .select("orderkey", "revenue", "orderdate")
    )


@register(
    "q5_region_revenue",
    oracle="""
SELECT n.n_name AS nation,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name IN ('AMERICA', 'ASIA')
GROUP BY n.n_name
""",
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-table star join. All dimensions broadcast; the
    fact table (lineitem) flows through without a join shuffle."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name").isin("AMERICA", "ASIA"))
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    l = load(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias("revenue"))
    )


@register(
    "top_customers",
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name,
       COUNT(*)                          AS n_orders,
       ROUND(SUM(o.o_totalprice), 6)     AS total_spend
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY total_spend DESC, custkey
LIMIT 20
""",
)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + top-k: aggregate FIRST on the join key, then join the
    (small) aggregate to the dimension — at scale this shuffles orders
    once on o_custkey instead of joining row-level then aggregating."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 6).alias("total_spend")
    )
    return (
        spend.join(c, spend.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "n_orders",
            "total_spend",
        )
        .orderBy(F.desc("total_spend"), F.asc("custkey"))
        .limit(20)
    )


@register(
    "window_rank",
    oracle="""
SELECT * FROM (
    SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK()       OVER (PARTITION BY o_custkey
                              ORDER BY o_orderstatus) AS status_rank
    FROM orders
) WHERE rn <= 3
""",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking windows: row_number + rank per group, filtered — Catalyst
    pushes the rn<=3 predicate into WindowGroupLimit (top-k per key
    without materializing full ranks)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w2).alias("status_rank"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "lead_lag",
    oracle="""
SELECT event_id, user_id, ts, value,
       ROUND(value - LAG(value)  OVER w, 6) AS delta_prev,
       ROUND(LEAD(value) OVER w - value, 6) AS delta_next
FROM events
WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
)
def lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag offsets per key — one shuffle on user_id, both offsets
    share the same WindowExec sort. Event-time contract: a NULL ts has
    no position in the stream (and sorts NULLS FIRST in Spark vs LAST
    in DuckDB), so such rows are excluded."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 6).alias("delta_next"),
    )


@register(
    "distinct_agg",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*)                AS n_events,
       ROUND(SUM(value), 6)    AS total_value
FROM events
GROUP BY event_type
""",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation alongside plain aggregates — Spark
    expands to a two-phase plan automatically."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


@register(
    "rollup_lineitem",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*)                        AS n,
       ROUND(SUM(l_extendedprice), 6)  AS total_price
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
-- empty-input contract: Spark's Expand+aggregate emits ZERO rows on an
-- empty relation (no grand-total row); the SQL standard emits one.
-- HAVING COUNT(*) > 0 is a no-op on any non-empty input (every
-- grouping-set row aggregates >= 1 source row) and drops exactly the
-- standard's empty-input grand total (empty-input gate, round 8).
HAVING COUNT(*) > 0
""",
)
def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total), one pass. On an
    EMPTY relation the engine emits zero rows (no grand total) — the
    oracle mirrors with HAVING COUNT(*) > 0."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 6).alias("total_price")
    )


@register(
    "set_ops",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'purchase'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'error'
""",
)
def set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics)."""
    e = load(spark, sf_dir, "events")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    erroring = e.filter(F.col("event_type") == "error").select("user_id")
    return buyers.intersect(erroring)


@register(
    "except_op",
    oracle="""
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
""",
)
def except_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference)."""
    e = load(spark, sf_dir, "events")
    viewers = e.filter(F.col("event_type") == "view").select("user_id")
    buyers = e.filter(F.col("event_type") == "purchase").select("user_id")
    return viewers.subtract(buyers)


@register(
    "semi_anti_join",
    oracle="""
SELECT c_custkey, c_name,
       EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) AS has_orders
FROM customer c
""",
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface expressed as an existence flag (union of a
    semi and an anti join, so both operators are exercised)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    with_orders = c.join(o, c.c_custkey == o.o_custkey, "left_semi").withColumn(
        "has_orders", F.lit(True)
    )
    without = c.join(o, c.c_custkey == o.o_custkey, "left_anti").withColumn(
        "has_orders", F.lit(False)
    )
    return with_orders.unionByName(without).select("c_custkey", "c_name", "has_orders")


@register(
    "asof_join_quotes",
    oracle="""
WITH quotes AS (
    SELECT user_id, ts, value AS quote_value FROM events WHERE event_id % 2 = 0
),
trades AS (
    SELECT event_id, user_id, ts, value AS trade_value FROM events WHERE event_id % 2 = 1
)
SELECT t.event_id, t.user_id, t.ts, t.trade_value, q.quote_value
FROM trades t
ASOF LEFT JOIN quotes q
  ON t.user_id = q.user_id AND t.ts >= q.ts
""",
)
def asof_join_quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (market-data canonical op, beyond the reference):
    each trade gets the most recent quote at-or-before its timestamp.
    Implemented as union + last-value window — one shuffle, no range
    explosion (operators/temporal.py)."""
    e = load(spark, sf_dir, "events")
    quotes = e.filter(F.col("event_id") % 2 == 0).select(
        "user_id", "ts", F.col("value").alias("quote_value")
    )
    trades = e.filter(F.col("event_id") % 2 == 1).select(
        "event_id", "user_id", "ts", F.col("value").alias("trade_value")
    )
    return asof_join(
        trades, quotes, on=["user_id"], ts="ts", right_values=["quote_value"]
    ).select("event_id", "user_id", "ts", "trade_value", "quote_value")


@register(
    "resample_ohlc",
    oracle="""
SELECT user_id,
       date_trunc('hour', ts)                        AS bucket_start,
       arg_min(value, ts)                            AS open,
       max(value)                                    AS high,
       min(value)                                    AS low,
       arg_max(value, ts)                            AS close,
       count(*)                                      AS n
FROM events
WHERE ts IS NOT NULL
GROUP BY 1, 2
""",
)
def resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket OHLC resampling (hypertable-rollup style): one hash
    aggregation; open/close picked via struct min/max on (ts, value) so
    duplicate timestamps stay deterministic (operators/temporal.py)."""
    e = load(spark, sf_dir, "events")
    return resample_bars(e, ts="ts", key="user_id", value="value", bucket="1 hour")
