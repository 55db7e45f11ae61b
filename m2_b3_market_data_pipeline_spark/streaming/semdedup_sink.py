"""Streaming incremental SEMANTIC dedup: continuous-crawl curation in
embedding space.

Each micro-batch of incoming vectors is (1) assigned to its nearest
coarse-codebook cell (broadcast argmin), (2) pruned against the corpus
admitted SO FAR — cell-locally, via the shared
``operators/embeddings.py::semdedup_prune_assigned`` rule (one code
path with the batch operator, the funnel-sink precedent), and (3) the
SURVIVORS merge into the on-disk assigned store. The state is the
(id, centroid_id, vector) store itself — partitioned by centroid_id on
disk, so a future delta's verify join reads only its touched cells.

Per batch:

1. prune decisions (delta vs stored corpus) land under
   ``decisions_path/batch=<id>`` — overwrite per batch directory, so a
   replay is idempotent;
2. the admitted (non-pruned) rows union into the assigned store via the
   same crash-safe swap + (checkpoint id, batch id) marker as
   ``agg_sink`` / ``near_dedup_sink``.

Batch-equivalence contract (pinned in tests): after draining batches
b1..bN, the union of decision outputs equals applying the BATCH
``semdedup_incremental`` of each bi against the survivors of
b1..b(i-1) — within-batch semantic duplicates are intentionally out of
scope (the batch ``semdedup`` owns intra-corpus dedup; this sink owns
cross-batch admission).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.embeddings import assign_with_vector, semdedup_prune_assigned
from .agg_sink import (
    _checkpoint_identity,
    _read_marker,
    _recover_state,
    _write_marker,
)

DECISION_SCHEMA = "vec_id long, centroid_id long, pruned boolean"


def read_assigned(spark: SparkSession, state_path: str) -> DataFrame:
    """The assigned corpus store (assign_with_vector layout:
    id, centroid_id, vector), partition-pruned by centroid_id. The
    partition column comes back through directory inference (which
    narrows in-range values to int) — cast it back to the long the
    assignment produces so unions and joins never coerce."""
    df = spark.read.parquet(state_path)
    return df.withColumn("centroid_id", F.col("centroid_id").cast("long"))


def read_decisions(spark: SparkSession, decisions_path: str) -> DataFrame:
    """All cross-batch admission decisions so far."""
    return (
        spark.read.schema(DECISION_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(decisions_path)
    )


def run_semdedup_stream(
    spark: SparkSession,
    *,
    updates_path: str,
    state_path: str,
    decisions_path: str,
    checkpoint_path: str,
    schema: T.StructType,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    available_now: bool = True,
    assign_fn=None,
) -> StreamingQuery:
    """Start the stream: file source over ``updates_path`` -> per-batch
    cell-local semantic dedup vs the admitted corpus + survivor merge.

    The coarse quantizer is a strategy — exactly one of:

    - ``centroids``: the fixed codebook (centroid_id, centroid), small
      by contract (broadcast inside every assignment), shared by every
      batch so assignment is stable across the stream's life; or
    - ``assign_fn``: any df -> (id, centroid_id, vector) assignment
      with the ``assign_with_vector`` layout — in practice
      ``operators/embeddings.py::lsh_cell_assigner``, the cells-∝-corpus
      posture (SCALE.md §14/§15): the codebook-form drain wall at 10x
      backlog is the delta-vs-cell verify under a codebook whose cells
      do NOT grow with the corpus; the LSH assigner keeps cell
      occupancy bounded by sizing bits to the planned corpus.

    Everything downstream of assignment — the shared prune rule, the
    decisions/survivor writes, the crash-safe swap — is identical, so
    the batch-equivalence and replay contracts hold for both."""
    if (centroids is None) == (assign_fn is None):
        raise ValueError("pass exactly one of centroids / assign_fn")
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(updates_path)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _recover_state(state_path)
        ckpt_id = _checkpoint_identity(checkpoint_path)
        applied, applied_ckpt = _read_marker(state_path)
        if applied >= 0 and applied_ckpt and ckpt_id and applied_ckpt != ckpt_id:
            raise RuntimeError(
                f"assigned store at {state_path} was written under checkpoint "
                f"{applied_ckpt} but this stream runs under {ckpt_id}; "
                "refusing to merge (delete the state dir to rebuild, or "
                "restore the original checkpoint)."
            )
        if applied >= batch_id:
            return  # replayed batch: decisions + survivors already on disk
        if assign_fn is not None:
            assigned = assign_fn(
                batch_df.select(id_col, vec_col), id_col=id_col, vec_col=vec_col
            ).persist()
        else:
            assigned = assign_with_vector(
                batch_df.select(id_col, vec_col),
                centroids,
                id_col=id_col,
                vec_col=vec_col,
            ).persist()
        try:
            has_corpus = os.path.exists(state_path)
            if has_corpus:
                corpus = read_assigned(spark, state_path)
                decisions = semdedup_prune_assigned(
                    assigned, corpus, id_col=id_col, vec_col=vec_col,
                    threshold=threshold,
                )
            else:
                decisions = assigned.select(
                    id_col, "centroid_id", F.lit(False).alias("pruned")
                )
            decisions = decisions.persist()
            # Decisions first (per-batch dir, overwrite => replay-
            # idempotent), then the survivor swap whose marker commits.
            decisions.write.mode("overwrite").parquet(
                os.path.join(decisions_path, f"batch={batch_id}")
            )
            survivors = assigned.join(
                decisions.filter(~F.col("pruned")).select(id_col), id_col
            ).select(id_col, "centroid_id", vec_col)
            merged = (
                read_assigned(spark, state_path).unionByName(survivors)
                if has_corpus
                else survivors
            )
            staging = f"{state_path}.staging-{batch_id}"
            merged.write.mode("overwrite").partitionBy("centroid_id").parquet(staging)
            _write_marker(staging, batch_id=batch_id, checkpoint_id=ckpt_id)
            old = state_path + ".old"
            if os.path.exists(state_path):
                os.rename(state_path, old)
            os.rename(staging, state_path)
            shutil.rmtree(old, ignore_errors=True)
            decisions.unpersist()
        finally:
            # Unconditional: a mid-batch failure must not leak the
            # persisted frame for the life of the session.
            assigned.unpersist()

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
