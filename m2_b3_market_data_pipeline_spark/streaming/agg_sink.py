"""Streaming incremental aggregation: maintain exact per-key aggregates
by merging algebraic partials per micro-batch.

The batch form of this algebra is ``plans/analytics_wave7.py::
partial_agg_merge`` (count/sum/min/max partials merge losslessly); this
sink runs it continuously: each micro-batch is reduced to per-key
partials (count, sum, min, max), merged with the on-disk partial state,
and the state swapped atomically. Derived measures (avg) are computed
from merged sums at read time, never stored — storing them would break
re-mergeability.

Why partials and not Structured Streaming's built-in stateful agg: the
built-in operator keeps state in the state store and emits via
update/complete mode; a PARTIAL-table-on-storage design instead makes
the state itself a queryable table (the materialized-view pattern),
survives checkpoint format changes, and merges offline batches and
streams through one code path. At 100 TB the state table is partitioned
by key range and each batch touches only the partitions its keys hash
to (here: one parquet dir, same plan).

Exactly-once: the file-source checkpoint tracks consumed batches; the
merge is NOT idempotent under replay (counts would double), so the
snapshot directory embeds the last applied batch id and replays of an
already-applied batch are skipped — the standard transactional-sink
dance that a table format's commit log would otherwise provide.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

_APPLIED_MARKER = "_applied_batch_id"


def _partials(df: DataFrame, *, keys: list[str], value_col: str) -> DataFrame:
    return df.groupBy(*keys).agg(
        F.count("*").alias("p_cnt"),
        F.sum(value_col).alias("p_sum"),
        F.min(value_col).alias("p_min"),
        F.max(value_col).alias("p_max"),
    )


def merge_partials(base: DataFrame, delta: DataFrame, *, keys: list[str]) -> DataFrame:
    """Algebraic merge of two partial tables: count+count, sum+sum,
    min(min), max(max). Exact — proven against the one-shot aggregate in
    the batch twin's oracle."""
    return (
        base.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("p_cnt").alias("p_cnt"),
            F.sum("p_sum").alias("p_sum"),
            F.min("p_min").alias("p_min"),
            F.max("p_max").alias("p_max"),
        )
    )


def read_aggregates(spark: SparkSession, state_path: str) -> DataFrame:
    """The queryable materialized view: derived measures from partials."""
    p = spark.read.parquet(state_path)
    return p.select(
        *[c for c in p.columns if not c.startswith("p_")],
        F.col("p_cnt").alias("n_rows"),
        F.col("p_sum").alias("sum_value"),
        F.col("p_min").alias("min_value"),
        F.col("p_max").alias("max_value"),
        (F.col("p_sum") / F.col("p_cnt")).alias("avg_value"),
    )


def _last_applied(state_path: str) -> int:
    marker = os.path.join(state_path, _APPLIED_MARKER)
    if os.path.exists(marker):
        with open(marker) as fh:
            return int(fh.read().strip())
    return -1


def run_incremental_agg_stream(
    spark: SparkSession,
    *,
    updates_path: str,
    state_path: str,
    checkpoint_path: str,
    schema: T.StructType,
    keys: list[str],
    value_col: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the incremental-aggregation stream: file source over
    ``updates_path`` -> per-batch partial merge into ``state_path``."""
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(updates_path)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if _last_applied(state_path) >= batch_id:
            return  # replayed batch after a crash: already merged
        delta = _partials(batch_df, keys=keys, value_col=value_col)
        if os.path.exists(state_path):
            base = spark.read.parquet(state_path)
            merged = merge_partials(base, delta, keys=keys)
        else:
            merged = delta
        staging = f"{state_path}.staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        with open(os.path.join(staging, _APPLIED_MARKER), "w") as fh:
            fh.write(str(batch_id))
        if os.path.exists(state_path):
            shutil.rmtree(state_path)
        os.rename(staging, state_path)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
