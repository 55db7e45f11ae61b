"""Skew mitigation + storage-layout operators for 100 TB runs.

- ``salted_agg``: two-phase aggregation for skewed grouping keys — a
  deterministic hash-salt pre-aggregation bounds any single task's
  share of a hot key to 1/n_salts, then a tiny final merge
  re-aggregates per key. Only
  algebraic aggregates (sum/count/min/max, avg via sum+count) can split
  this way. AQE's skew-join handling covers joins; this covers
  aggregations, where AQE cannot split a hot group.
- ``write_bucketed``: bucketed+sorted table layout so repeated joins on
  the bucket key are co-located (zero exchange at read time) — the
  Spark-native replacement for "pre-partition your join tables".
- ``compact``: small-file compaction before a write — the file-count
  hygiene that keeps a 100 TB table scannable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"

_SPLITTABLE = {"sum", "count", "min", "max"}


def _row_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt: xxhash64 over EVERY input column,
    mod n_salts. A seeded rand() is only pseudo-stable — its value
    depends on the row's (partition, position), which task retries,
    speculative duplicates, and AQE re-coalescing can change mid-job;
    a pure row function cannot. For a hot key the non-key columns vary
    row to row, so the hash spreads the key across all salts; the one
    degenerate case is full-row duplicates (identical rows share a
    salt), which a real fact table's unique keys rule out."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)).cast(
        "int"
    )


def salted_agg(
    df: DataFrame,
    *,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    ``aggs`` maps output column -> (function, input column) with
    function in {sum, count, min, max, avg}. Phase 1 groups by
    (key, salt) — the hot key's rows spread over ``n_salts`` tasks —
    phase 2 merges per key (sum of partial sums/counts, min of mins...).
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for out, (fn, col) in aggs.items():
        if fn == "avg":
            partials += [
                F.sum(col).alias(f"__s_{out}"),
                F.count(col).alias(f"__c_{out}"),
            ]
            finals.append(
                (F.sum(f"__s_{out}") / F.sum(f"__c_{out}")).alias(out)
            )
        elif fn in _SPLITTABLE:
            partials.append(getattr(F, fn)(col).alias(f"__p_{out}"))
            merge = F.sum if fn in ("sum", "count") else getattr(F, fn)
            finals.append(merge(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"{fn!r} is not algebraic-splittable")
    salted = df.withColumn(SALT, _row_salt(df, n_salts))
    partial = salted.groupBy(key, SALT).agg(*partials)
    return partial.groupBy(key).agg(*finals)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) table: joins and
    aggregations on ``bucket_col`` between co-bucketed tables need no
    exchange."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def compact(df: DataFrame, *, target_partitions: int) -> DataFrame:
    """Coalesce to a target output-file count before writing (no
    shuffle); use ``repartition`` upstream instead when output skew
    matters more than the shuffle cost."""
    return df.coalesce(target_partitions)


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    *,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the (skewed) fact side, replicate the
    dim side across all salts, join on (key, salt).

    The manual form of AQE's skew-join split, for when the dim side is
    too big to broadcast but small enough to replicate ``n_salts``× —
    a hot fact key's rows land in ``n_salts`` different shuffle
    partitions instead of one straggler task. Replication is an
    ``explode`` of a literal salt array (zero-shuffle projection on the
    dim side). Result equals the plain join exactly; only the physical
    distribution changes.
    """
    salted_facts = facts.withColumn(SALT, _row_salt(facts, n_salts))
    replicated = dim.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_facts.join(replicated, on=[key, SALT], how=how)
    return out.drop(SALT)
