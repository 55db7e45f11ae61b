"""Second wave of the relational surface: subqueries, pivot, exact
percentiles, disjunctive predicates, outer joins, HAVING, and more
TPC-H-flavored shapes — the parts of "arbitrary Athena SQL" that stress
the optimizer differently than wave 1 (plans/sql_surface.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load, register
from .sql_fragments import EMB


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1998-01-01'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
""",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS -> left-semi join + agg."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        l, (o.o_orderkey == l.l_orderkey) & (l.l_shipdate > o.o_orderdate), "left_semi"
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 6) AS revenue,
       COUNT(*) AS n
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.02 AND 0.06
  AND l_quantity < 25
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive pushable predicates +
    ungrouped agg — the minimal-plan benchmark (no shuffle at all
    beyond the final single-row agg)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_quantity") < 25)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q14_promo_share",
    oracle="""
SELECT ROUND(
         100.0 * SUM(CASE WHEN p.p_type LIKE 'STANDARD%' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
         / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_share
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01' AND l.l_shipdate < TIMESTAMP '1997-10-01'
""",
)
def q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: LIKE-predicated conditional aggregation over a
    broadcast dimension join."""
    l = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type").like("STANDARD%"), rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
    )


@register(
    "q18_large_orders",
    oracle="""
SELECT o.o_orderkey AS orderkey, o.o_totalprice AS totalprice,
       ROUND(SUM(l.l_quantity), 6) AS total_qty
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderkey, o.o_totalprice
HAVING SUM(l.l_quantity) > 150
ORDER BY totalprice DESC, orderkey
LIMIT 20
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: agg + HAVING + top-k. Aggregates lineitem on its
    natural key before joining order attributes."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    l = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qty = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 150)
    )
    return (
        qty.join(o, qty.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.round(F.col("raw_qty"), 6).alias("total_qty"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(20)
    )


@register(
    "scalar_subquery",
    oracle="""
SELECT o_orderkey, o_totalprice,
       ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM orders), 6) AS vs_avg
FROM orders
WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
""",
)
def scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (global average) used in both predicate and
    projection — Catalyst plans it as a reusable subquery result."""
    o = load(spark, sf_dir, "orders")
    o.createOrReplaceTempView("__orders_ss")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               ROUND(o_totalprice - (SELECT AVG(o_totalprice) FROM __orders_ss), 6) AS vs_avg
        FROM __orders_ss
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM __orders_ss)
        """
    )


@register(
    "correlated_subquery",
    oracle="""
SELECT c.c_custkey, c.c_acctbal
FROM customer c
WHERE c.c_acctbal > (
    SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
)
""",
)
def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above own nation's average) —
    decorrelated by Catalyst into an aggregate + join."""
    c = load(spark, sf_dir, "customer")
    c.createOrReplaceTempView("__cust_cs")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal
        FROM __cust_cs c
        WHERE c.c_acctbal > (
            SELECT AVG(c2.c_acctbal) FROM __cust_cs c2 WHERE c2.c_nationkey = c.c_nationkey
        )
        """
    )


@register(
    "pivot_segments",
    oracle="""
SELECT n.n_name AS nation,
       COUNT(*) FILTER (c.c_mktsegment = 'AUTOMOBILE') AS automobile,
       COUNT(*) FILTER (c.c_mktsegment = 'BUILDING')   AS building,
       COUNT(*) FILTER (c.c_mktsegment = 'FURNITURE')  AS furniture,
       COUNT(*) FILTER (c.c_mktsegment = 'HOUSEHOLD')  AS household,
       COUNT(*) FILTER (c.c_mktsegment = 'MACHINERY')  AS machinery
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
)
def pivot_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: market-segment counts per nation via groupBy().pivot()
    with explicit values (at scale, explicit values skip the extra
    distinct-collect job)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    segments = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    out = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .pivot("c_mktsegment", segments)
        .count()
    )
    renames = {s: s.lower() for s in segments}
    return out.withColumnsRenamed(renames).na.fill(0)


@register(
    "exact_percentiles",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6)  AS p50,
       ROUND(quantile_cont(value, 0.95), 6) AS p95,
       ROUND(min(value), 6)                 AS lo,
       ROUND(max(value), 6)                 AS hi
FROM events
GROUP BY event_type
""",
)
def exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). The approximate sibling for 100 TB is
    approx_percentile/t-digest — kept in approx_quantiles (rows-only)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )


@register("approx_quantiles")  # rows-only: sketch-based, engine-specific by design
def approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch percentiles (the scale path: mergeable, single-pass) plus
    approx distinct (HLL) — values are engine-specific approximations,
    bounded against exact in tests."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_percentile("value", 0.5).alias("p50_approx"),
        F.approx_count_distinct("user_id").alias("users_approx"),
    )


@register(
    "disjunctive_predicates",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_returnflag = 'R' AND l_quantity >= 45)
   OR (l_returnflag = 'A' AND l_discount >= 0.09)
   OR (l_linestatus = 'O' AND l_quantity <= 2 AND l_discount = 0.0)
""",
)
def disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style OR-of-ANDs predicate — stresses predicate
    normalization and partial pushdown."""
    li = load(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("l_returnflag") == "R") & (F.col("l_quantity") >= 45))
        | ((F.col("l_returnflag") == "A") & (F.col("l_discount") >= 0.09))
        | (
            (F.col("l_linestatus") == "O")
            & (F.col("l_quantity") <= 2)
            & (F.col("l_discount") == 0.0)
        )
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "full_outer_join",
    oracle="""
WITH buyers AS (
    SELECT user_id, COUNT(*) AS purchases FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
clickers AS (
    SELECT user_id, COUNT(*) AS clicks FROM events WHERE event_type = 'click' GROUP BY user_id
)
SELECT COALESCE(b.user_id, c.user_id) AS user_id, b.purchases, c.clicks
FROM buyers b FULL OUTER JOIN clickers c ON b.user_id = c.user_id
""",
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join with COALESCE'd key."""
    e = load(spark, sf_dir, "events")
    buyers = (
        e.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(F.count("*").alias("purchases"))
    )
    clickers = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.count("*").alias("clicks"))
        .withColumnRenamed("user_id", "c_user_id")
    )
    return buyers.join(clickers, buyers.user_id == clickers.c_user_id, "full_outer").select(
        F.coalesce("user_id", "c_user_id").alias("user_id"), "purchases", "clicks"
    )


@register(
    "null_scalars",
    oracle="""
SELECT event_id,
       COALESCE(NULLIF(event_type, 'error'), 'recovered')          AS type_or_recovered,
       CASE WHEN value IS NULL THEN -1.0 ELSE value END            AS value_nn,
       IFNULL(NULLIF(user_id, 0), -1)                              AS user_nn,
       (value IS NOT NULL AND event_type IS NOT NULL)              AS fully_present
FROM events
""",
)
def null_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling scalar surface: coalesce/nullif/ifnull/CASE/IS NOT
    NULL (X5 generalized)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("recovered")).alias(
            "type_or_recovered"
        ),
        F.when(F.col("value").isNull(), F.lit(-1.0)).otherwise(F.col("value")).alias("value_nn"),
        F.ifnull(F.nullif("user_id", F.lit(0)), F.lit(-1)).alias("user_nn"),
        (F.col("value").isNotNull() & F.col("event_type").isNotNull()).alias("fully_present"),
    )


@register(
    "predicate_surface",
    oracle="""
SELECT p_partkey, p_name, p_brand, p_size
FROM part
WHERE p_size IN (1, 5, 9, 13)
  AND p_brand LIKE 'Brand%2%'
  AND regexp_matches(p_type, '(STANDARD|SMALL)')
  AND p_retailprice BETWEEN 900 AND 1900
""",
)
def predicate_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / regexp / BETWEEN predicate surface in one scan."""
    p = load(spark, sf_dir, "part")
    return p.filter(
        F.col("p_size").isin(1, 5, 9, 13)
        & F.col("p_brand").like("Brand%2%")
        & F.col("p_type").rlike("(STANDARD|SMALL)")
        & F.col("p_retailprice").between(900, 1900)
    ).select("p_partkey", "p_name", "p_brand", "p_size")


@register(
    "array_functions",
    oracle=f"""
SELECT vec_id,
       len(embedding)                                            AS dim,
       ROUND(list_max(CAST(embedding AS DOUBLE[])), 6)           AS vmax,
       ROUND(list_min(CAST(embedding AS DOUBLE[])), 6)           AS vmin,
       ROUND(list_sum(CAST(embedding AS DOUBLE[])[1:8]), 6)      AS head_sum,
       ROUND(CAST(embedding[1] AS DOUBLE), 6)                    AS first_component
FROM {EMB}
""",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/higher-order function surface: size, min/max, slice +
    aggregate, element access."""
    e = load(spark, sf_dir, "embeddings")
    vec = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.array_max(vec), 6).alias("vmax"),
        F.round(F.array_min(vec), 6).alias("vmin"),
        F.round(
            F.aggregate(F.slice(vec, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("head_sum"),
        F.round(F.element_at(vec, 1), 6).alias("first_component"),
    )


@register(
    "grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
""",
)
def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup_lineitem's ROLLUP)."""
    li = load(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        FROM __li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "window_running_total",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 6) AS running_spend,
       CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS UNBOUNDED PRECEDING) AS BIGINT)   AS order_seq,
       ROUND(o_totalprice - FIRST_VALUE(o_totalprice) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 6) AS vs_first
FROM orders
""",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative window frame: running sum/count + first_value."""
    o = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 6).alias("running_spend"),
        F.count("*").over(w).alias("order_seq"),
        F.round(
            F.col("o_totalprice") - F.first("o_totalprice").over(w), 6
        ).alias("vs_first"),
    )
