"""Literal TPC-H Q2/Q9/Q11/Q16/Q20 join graphs over a derived ``partsupp``.

The fixtures carry no ``partsupp`` table, so earlier waves re-expressed
these four shapes over ``lineitem`` (sql_surface4.py) — faithful to the
operator semantics but not to the literal TPC-H join graph the
reference's Athena surface can run (reference ``README.md:270-296``:
arbitrary SQL over the catalog). This module restores the literal
graphs by DERIVING partsupp deterministically from ``part`` x
``supplier`` with the TPC-H assignment shape (4 suppliers per part,
spread S/4 apart in suppkey space), using pure integer arithmetic that
evaluates identically in Spark and DuckDB:

- ``ps_suppkey   = (p_partkey + i * (S div 4)) % S``  for i in 0..3
- ``ps_availqty  = (p_partkey*37 + ps_suppkey*11) % 9999 + 1``
- ``ps_supplycost_cents = (p_partkey*31 + ps_suppkey*7) % 100000 + 100``

Costs are carried in integer CENTS and divided by 100 only at the
output edge: threshold comparisons (Q11's fraction-of-total HAVING)
stay in exact integer arithmetic, so no float-boundary row can differ
between engines.

Scale posture: partsupp is 4x |part| — a dimension-sized relation that
grows with the data, so it is NOT force-broadcast (AQE's call); the
supplier count attaches as a broadcast 1-row aggregate, never a
driver-side collect. Q20's per-(part,supplier) shipped-quantity
threshold is a map-side-combinable aggregate over the filtered fact
table, joined back on the (partkey, suppkey) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load, register

# Shared oracle prelude: the derived partsupp as a CTE chain. The
# suppkey formula is factored into ps0 so availqty/cost reference it by
# name instead of repeating the expression.
PARTSUPP_CTE = """
WITH sc AS (SELECT COUNT(*) AS s_cnt FROM supplier),
ps0 AS (
    SELECT p_partkey AS ps_partkey,
           (p_partkey + gen.i * (sc.s_cnt // 4)) % sc.s_cnt AS ps_suppkey
    FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS gen(i) CROSS JOIN sc
),
partsupp AS (
    SELECT ps_partkey, ps_suppkey,
           (ps_partkey * 37 + ps_suppkey * 11) % 9999 + 1 AS ps_availqty,
           (ps_partkey * 31 + ps_suppkey * 7) % 100000 + 100 AS ps_cost_cents
    FROM ps0
)
"""


def derived_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark twin of PARTSUPP_CTE: part x {0..3} with the same
    integer formulas. The supplier count rides along as a broadcast
    1-row aggregate so the plan stays lazy and distributed."""
    p = load(spark, sf_dir, "part").select("p_partkey")
    s_cnt = load(spark, sf_dir, "supplier").agg(F.count("*").alias("s_cnt"))
    gen = spark.range(4).select(F.col("id").alias("i"))
    ps0 = (
        p.crossJoin(F.broadcast(gen))
        .crossJoin(F.broadcast(s_cnt))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            (
                (F.col("p_partkey") + F.col("i") * F.expr("s_cnt div 4"))
                % F.col("s_cnt")
            ).alias("ps_suppkey"),
        )
    )
    return ps0.select(
        "ps_partkey",
        "ps_suppkey",
        ((F.col("ps_partkey") * 37 + F.col("ps_suppkey") * 11) % 9999 + 1).alias(
            "ps_availqty"
        ),
        ((F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 7) % 100000 + 100).alias(
            "ps_cost_cents"
        ),
    )


@register(
    "q2_partsupp",
    oracle=PARTSUPP_CTE
    + """
, europe_supp AS (
    SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'EUROPE'
)
SELECT es.s_acctbal AS acctbal, es.s_name AS supplier, es.n_name AS nation,
       p.p_partkey AS partkey, p.p_brand AS brand,
       ROUND(ps.ps_cost_cents / 100.0, 6) AS supplycost
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
JOIN europe_supp es ON es.s_suppkey = ps.ps_suppkey
WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
  AND ps.ps_cost_cents = (
      SELECT MIN(ps2.ps_cost_cents)
      FROM partsupp ps2
      JOIN europe_supp es2 ON es2.s_suppkey = ps2.ps_suppkey
      WHERE ps2.ps_partkey = ps.ps_partkey)
ORDER BY acctbal DESC, nation, supplier, partkey
LIMIT 100
""",
)
def q2_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal TPC-H Q2 over the derived partsupp: for each qualifying
    part, the EUROPE supplier(s) at the minimum supply cost.

    The correlated min is a window over ps_partkey computed AFTER
    restricting to EUROPE suppliers — one shuffle of the dimension-sized
    partsupp, never a re-join of the full relation."""
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    europe_supp = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 15) & (F.col("p_type") == "LARGE")
    )
    w = Window.partitionBy("ps_partkey")
    best = (
        ps.join(europe_supp, ps.ps_suppkey == europe_supp.s_suppkey)
        .withColumn("min_cents", F.min("ps_cost_cents").over(w))
        .filter(F.col("ps_cost_cents") == F.col("min_cents"))
    )
    return (
        best.join(p, best.ps_partkey == p.p_partkey)
        .select(
            F.col("s_acctbal").alias("acctbal"),
            F.col("s_name").alias("supplier"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey").alias("partkey"),
            F.col("p_brand").alias("brand"),
            F.round(F.col("ps_cost_cents") / 100.0, 6).alias("supplycost"),
        )
        .orderBy(F.col("acctbal").desc(), "nation", "supplier", "partkey")
        .limit(100)
    )


@register(
    "q11_partsupp",
    oracle=PARTSUPP_CTE
    + """
, nation_stock AS (
    SELECT ps.ps_partkey, ps.ps_cost_cents * ps.ps_availqty AS line_cents
    FROM partsupp ps
    JOIN supplier s ON ps.ps_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_3'
)
SELECT ps_partkey AS partkey,
       ROUND(CAST(SUM(line_cents) AS BIGINT) / 100.0, 6) AS stock_value
FROM nation_stock
GROUP BY ps_partkey
HAVING CAST(SUM(line_cents) AS BIGINT) * 1000 >
       (SELECT CAST(SUM(line_cents) AS BIGINT) FROM nation_stock)
ORDER BY stock_value DESC, partkey
""",
)
def q11_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal TPC-H Q11: parts whose stock value within one nation
    exceeds 0.1% of that nation's total stock value.

    The fraction-of-total HAVING stays in exact integer cents on both
    engines (value*1000 > total), so no float-boundary row can flip; the
    nation total attaches as a broadcast 1-row aggregate, not a
    collect."""
    ps = derived_partsupp(spark, sf_dir)
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    stock = (
        ps.join(s, ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("line_cents"),
        )
    )
    per_part = stock.groupBy("ps_partkey").agg(
        F.sum("line_cents").alias("value_cents")
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(
            F.col("ps_partkey").alias("partkey"),
            F.round(F.col("value_cents") / 100.0, 6).alias("stock_value"),
        )
        .orderBy(F.col("stock_value").desc(), "partkey")
    )


@register(
    "q16_partsupp",
    oracle=PARTSUPP_CTE
    + """
SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
       COUNT(DISTINCT ps.ps_suppkey) AS supplier_cnt
FROM partsupp ps
JOIN part p ON p.p_partkey = ps.ps_partkey
WHERE p.p_brand <> 'Brand#45' AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 23)
  AND ps.ps_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY brand, type, size
ORDER BY supplier_cnt DESC, brand, type, size
""",
)
def q16_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal TPC-H Q16: supplier diversity per (brand, type, size)
    after excluding flagged suppliers (fixture stand-in for the
    'Customer Complaints' comment filter: negative account balance).

    The NOT IN is a left_anti join against the bounded excluded-supplier
    set; distinct-count shuffles once on the group keys."""
    ps = derived_partsupp(spark, sf_dir)
    p = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin([1, 4, 7, 10, 13, 16, 19, 23])
    )
    excluded = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(F.broadcast(excluded), ps.ps_suppkey == excluded.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "brand", "type", "size")
    )


@register(
    "q20_partsupp",
    oracle=PARTSUPP_CTE
    + """
SELECT s.s_name AS supplier, n.n_name AS nation
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name IN ('NATION_1', 'NATION_6')
  AND s.s_suppkey IN (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      WHERE ps.ps_partkey IN (
              SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND ps.ps_availqty > (
              SELECT 0.5 * COALESCE(SUM(l.l_quantity), 0)
              FROM lineitem l
              WHERE l.l_partkey = ps.ps_partkey
                AND l.l_suppkey = ps.ps_suppkey
                AND l.l_shipdate >= TIMESTAMP '1997-01-01'
                AND l.l_shipdate <  TIMESTAMP '1998-01-01')
  )
ORDER BY supplier
""",
)
def q20_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal TPC-H Q20: suppliers in target nations holding excess
    stock (availqty > half of 1997 shipped quantity) of 'small%' parts.

    The correlated shipped-quantity subquery is a map-side-combinable
    aggregate over the date-filtered fact table, LEFT-joined back on the
    (partkey, suppkey) pair — missing pairs coalesce to 0 shipped, so
    never-shipped stock correctly counts as excess. The final supplier
    membership is a left_semi join (IN semantics, no duplicate blowup
    from multi-part suppliers)."""
    ps = derived_partsupp(spark, sf_dir)
    small_parts = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    shipped = (
        load(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty_1997"))
    )
    excess = (
        ps.join(small_parts, ps.ps_partkey == small_parts.p_partkey, "left_semi")
        .join(
            shipped,
            (F.col("ps_partkey") == shipped.l_partkey)
            & (F.col("ps_suppkey") == shipped.l_suppkey),
            "left",
        )
        .filter(F.col("ps_availqty") > 0.5 * F.coalesce(F.col("qty_1997"), F.lit(0)))
        .select("ps_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin(["NATION_1", "NATION_6"])
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.ps_suppkey, "left_semi")
        .select(F.col("s_name").alias("supplier"), F.col("n_name").alias("nation"))
        .orderBy("supplier")
    )


@register(
    "q9_partsupp",
    oracle=PARTSUPP_CTE
    + """
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                 - (ps.ps_cost_cents / 100.0) * l.l_quantity), 6) AS profit
FROM lineitem l
JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
)
def q9_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Literal TPC-H Q9 over the derived partsupp: product profit —
    revenue NET OF SUPPLY COST — by supplier nation and order year.
    The lineitem-re-expressed sibling (``q9_product_profit``,
    sql_surface4.py) had to omit the cost term; this restores the real
    Q9 measure. The (partkey, suppkey) composite equi-join against the
    dimension-sized partsupp is AQE's call (broadcast while it fits,
    shuffle when it doesn't); only nation is force-broadcast."""
    li = load(spark, sf_dir, "lineitem")
    ps = derived_partsupp(spark, sf_dir)
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - (F.col("ps_cost_cents") / 100.0) * F.col("l_quantity")
    )
    return (
        li.join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 6).alias("profit"))
        .orderBy(F.col("nation"), F.col("o_year").desc())
    )
