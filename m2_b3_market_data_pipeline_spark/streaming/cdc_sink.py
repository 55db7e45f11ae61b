"""Streaming CDC sink: maintain a latest-wins snapshot from a stream of
upsert/tombstone batches.

Each micro-batch is merged into the on-disk snapshot with
``operators/merge.py::merge_upsert`` (one shuffle on the merge key per
batch), then the snapshot is swapped atomically. The file-source
checkpoint gives exactly-once batch tracking, so replays after a crash
re-apply the same merge idempotently (latest-wins is idempotent by
construction).

The plain-parquet directory swap here is the local/posix form; on an
object store at 100 TB the same ``foreachBatch`` body would target a
table format with atomic commit (the merge plan — union + per-key
winner — is identical, only the commit protocol changes).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.merge import merge_upsert


def run_cdc_merge_stream(
    spark: SparkSession,
    *,
    updates_path: str,
    snapshot_path: str,
    checkpoint_path: str,
    schema: T.StructType,
    keys: list[str],
    version_col: str,
    tombstone_col: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the streaming merge: file source over ``updates_path`` ->
    per-batch latest-wins merge into ``snapshot_path``."""
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(updates_path)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if os.path.exists(snapshot_path):
            base = spark.read.parquet(snapshot_path)
            if tombstone_col is not None and tombstone_col not in base.columns:
                # snapshots never carry tombstones (merge drops the
                # column); re-add a false flag so the union lines up
                base = base.withColumn(tombstone_col, F.lit(False))
        else:
            base = batch_df.limit(0)
        merged = merge_upsert(
            base,
            batch_df.select(base.columns),
            keys=keys,
            version_col=version_col,
            tombstone_col=tombstone_col,
        )
        staging = f"{snapshot_path}.staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        if os.path.exists(snapshot_path):
            shutil.rmtree(snapshot_path)
        os.rename(staging, snapshot_path)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
