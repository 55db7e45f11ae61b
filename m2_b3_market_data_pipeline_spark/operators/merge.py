"""CDC-style snapshot maintenance: latest-wins merge/upsert and SCD2
validity intervals.

The reference pipeline overwrites its refined table wholesale per run
(reference: etl/etl_job.py:150-166); at 100 TB the standard upgrade is
incremental maintenance — apply a (much smaller) batch of upserts and
tombstones to the previous snapshot. Both operators here are pure
DataFrame compositions: one shuffle on the merge key, no driver-side
state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    *,
    keys: list[str],
    version_col: str,
    tombstone_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge: union base + updates, keep the highest-version
    row per key, then drop keys whose winner is a tombstone.

    ``version_col`` must be a total order per key (CDC sequence number /
    commit LSN — the caller's contract, as in any log-structured merge).
    Physical shape: ONE hash shuffle on ``keys`` feeding a WindowGroupLimit
    (rank-1 prune happens map-side before the final sort at scale), versus
    the join-based MERGE formulation which shuffles both sides twice.
    Updates batches are typically <<1% of the snapshot, and AQE handles
    hot keys; re-partitioning the output by ``keys`` for the next
    incremental round keeps successive merges exchange-free.
    """
    unioned = base.unionByName(updates)
    w = Window.partitionBy(*keys).orderBy(F.col(version_col).desc())
    winners = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if tombstone_col is not None:
        winners = winners.filter(~F.col(tombstone_col)).drop(tombstone_col)
    return winners


def scd2_intervals(
    changes: DataFrame,
    *,
    key: str,
    ts_col: str,
    attrs: list[str],
) -> DataFrame:
    """Slowly-changing-dimension (type 2) intervals from a change log:
    each change row becomes a validity interval ``[valid_from, valid_to)``
    where ``valid_to`` is the next change's timestamp (NULL = current row).

    One window (lead) over the same key shuffle; at scale this is the
    standard log->dimension compaction, and downstream temporal joins
    become as-of joins against ``valid_from``.
    """
    w = Window.partitionBy(key).orderBy(ts_col)
    return changes.select(
        key,
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
        *attrs,
    )
