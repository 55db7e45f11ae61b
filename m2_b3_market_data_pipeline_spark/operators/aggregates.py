"""Per-asset aggregation (A) and enrichment join (J1) of the reference.

Reference: etl/etl_job.py:133-142 —
``df.groupby("ativo").agg(avg_close_price=("close_price","mean"),
total_volume=("trade_volume","sum"))`` then a left merge back onto the
detail rows. pandas mean/sum skip NaN, matching Spark ``avg``/``sum``
NULL-skipping exactly (SURVEY.md §2.5).

Two equivalent Spark forms are provided (SURVEY.md §2.4 J1 note):

- ``enrich_with_aggregates_join``: groupBy + broadcast left join. The agg
  side is |distinct assets| rows — tiny relative to the fact table — so
  the join is broadcast-hash: ONE shuffle (the partial/final agg), no
  join shuffle.
- ``enrich_with_aggregates_window``: unbounded window per asset — no join
  node at all; reuses the same single shuffle on ``ativo`` that the
  rolling-mean window already requires, so the whole reference pipeline
  runs with exactly one exchange.

Both are kept and asserted equal in tests; the pipeline uses the window
form (fewer shuffles at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asset_aggregates(df: DataFrame, *, key: str = "ativo") -> DataFrame:
    """Transformation A: per-asset hash aggregation
    (reference: etl/etl_job.py:133-140). Spark runs this as partial
    (map-side) + final hash agg — one shuffle keyed on ``key``.
    """
    return df.groupBy(key).agg(
        F.avg("close_price").alias("avg_close_price"),
        F.sum("trade_volume").alias("total_volume"),
    )


def enrich_with_aggregates_join(df: DataFrame, *, key: str = "ativo") -> DataFrame:
    """J1: left equi-join detail rows with their per-asset aggregates
    (reference: etl/etl_job.py:142). The aggregate side is explicitly
    broadcast — it is one row per asset.
    """
    agg = asset_aggregates(df, key=key)
    return df.join(F.broadcast(agg), on=key, how="left")


def enrich_with_aggregates_window(df: DataFrame, *, key: str = "ativo") -> DataFrame:
    """Join-free form of J1: unbounded window aggregates per asset.

    Same output as the join form; preferred in the pipeline because it
    shares the window shuffle already paid for the rolling mean.
    """
    w = Window.partitionBy(key)
    return df.withColumn("avg_close_price", F.avg("close_price").over(w)).withColumn(
        "total_volume", F.sum("trade_volume").over(w)
    )
