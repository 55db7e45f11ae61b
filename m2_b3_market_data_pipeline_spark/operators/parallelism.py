"""Parallelism floor for fan-out-heavy operator chains.

A single-row-group fixture file scans as ONE partition, and a
zero-shuffle operator chain (broadcast joins, byte-parse explodes,
signature folds) then fuses into one whole-stage-codegen task — 1 of 32
cores doing all the expensive map-side work. Measured on
embedding_near_dups at sf0.1: 4.9s on 1 task vs 1.8s floored.

``ensure_parallelism`` repartitions ONLY when the input's partition
count is below the session's shuffle parallelism: at cluster scale the
source scan already exceeds the floor and the call is a NO-OP — no
exchange enters the 100 TB plan. That conditional is the whole point;
an unconditional repartition would be a full corpus shuffle at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the shuffle-partition floor iff it
    currently has fewer partitions; identity otherwise."""
    target = min_parts or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df
