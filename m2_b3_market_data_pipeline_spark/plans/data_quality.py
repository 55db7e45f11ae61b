"""Data-quality queries: column profiling, expectation gates, FK audits
(operators/quality.py), each hash-checked against DuckDB.

These are the pre-training corpus QA gates: profile every ingest batch,
fail the run on expectation violations, audit referential integrity
between fact and dimension snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.quality import expectation_counts, fk_orphans, profile_columns
from .registry import load, register

_PROFILE_COLS = ["event_id", "user_id", "event_type", "value", "props"]


@register(
    "profile_events",
    oracle="\nUNION ALL\n".join(
        f"""
SELECT '{c}' AS "column",
       CAST(COUNT(*) AS BIGINT)                                      AS n_rows,
       -- COALESCE: an EMPTY batch has 0 nulls, not NULL nulls (SUM
       -- over zero rows is NULL in SQL; the engine's count-based
       -- profile reports 0 — empty-input gate)
       CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
                                                                     AS n_null,
       CAST(COUNT(DISTINCT {c}) AS BIGINT)                           AS n_distinct
FROM events"""
        for c in _PROFILE_COLS
    ),
)
def profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of the events batch in ONE scan (multi-agg +
    stack unpivot — the oracle's N-subquery UNION is the semantics, not
    the plan)."""
    ev = load(spark, sf_dir, "events")
    return profile_columns(ev, _PROFILE_COLS)


@register(
    "expectation_checks",
    oracle="""
SELECT 'nonneg_value' AS rule,
       CAST(SUM(CASE WHEN value >= 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_violations FROM events
UNION ALL
SELECT 'known_event_type',
       CAST(SUM(CASE WHEN event_type IN ('click','error','purchase','signup','view') THEN 0 ELSE 1 END) AS BIGINT) FROM events
UNION ALL
SELECT 'user_id_not_null',
       CAST(SUM(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) FROM events
UNION ALL
SELECT 'ts_in_2024',
       CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2025-01-01' THEN 0 ELSE 1 END) AS BIGINT) FROM events
""",
)
def expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative batch-gate expectations -> violation counts, single
    scan (NULL predicate = violation, like a NOT-VALIDATED constraint)."""
    ev = load(spark, sf_dir, "events")
    return expectation_counts(
        ev,
        {
            "nonneg_value": F.col("value") >= 0,
            "known_event_type": F.col("event_type").isin(
                "click", "error", "purchase", "signup", "view"
            ),
            "user_id_not_null": F.col("user_id").isNotNull(),
            "ts_in_2024": (F.col("ts") >= F.lit("2024-01-01").cast("timestamp"))
            & (F.col("ts") < F.lit("2025-01-01").cast("timestamp")),
        },
    )


@register(
    "fk_orphans_audit",
    oracle="""
SELECT 'lineitem_orders' AS relationship,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT) AS n_orphans
UNION ALL
SELECT 'orders_customer',
       CAST((SELECT COUNT(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
""",
)
def fk_orphans_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts per FK relationship
    via left-anti joins (parent side pruned to its distinct key column;
    AQE broadcast-converts it when small)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    a = (
        fk_orphans(li, o, child_key="l_orderkey", parent_key="o_orderkey")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("lineitem_orders").alias("relationship"), "n_orphans")
    )
    b = (
        fk_orphans(o, c, child_key="o_custkey", parent_key="c_custkey")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("orders_customer").alias("relationship"), "n_orphans")
    )
    return a.unionByName(b)
