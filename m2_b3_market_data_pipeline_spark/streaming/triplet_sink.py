"""Streaming triplet mining: contrastive training pairs from a GROWING
corpus.

Each micro-batch of labeled vectors plays two roles: its rows are
first QUERIES mined against the corpus admitted so far (nearest
same-label positive + nearest different-label hard negative, via the
single-pass struct-argmax of ``operators/similarity.py::
hard_negative_mining``), then the whole batch is admitted into the
corpus store for future batches to mine against. Batch 0 seeds the
corpus and mines nothing — exactly the wave semantics of the batch
operator ``wave_triplet_mining`` (candidate.wave < query.wave), which
is the pinned batch-equivalence oracle: feeding the waves as files and
draining reproduces its output with wave = batch id.

Per batch:

1. triplets land under ``triplets_path/batch=<id>`` — overwrite per
   batch directory, so a replay is idempotent;
2. the batch's (id, label, vector) rows union into the corpus store via
   the crash-safe swap + (checkpoint id, batch id) marker shared with
   ``agg_sink`` / ``near_dedup_sink``.

State is the labeled corpus store itself — vectors are read once, in
the batch that admitted them; no raw-text or re-scoring state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.similarity import hard_negative_mining
from .agg_sink import (
    _checkpoint_identity,
    _read_marker,
    _recover_state,
    _write_marker,
)

TRIPLET_SCHEMA = (
    "query_id long, label int, wave long, pos_id long, pos_cos double, "
    "neg_id long, neg_cos double"
)


def read_corpus(spark: SparkSession, state_path: str) -> DataFrame:
    """The labeled corpus store (id, label, vector)."""
    return spark.read.parquet(state_path)


def read_triplets(spark: SparkSession, triplets_path: str) -> DataFrame:
    """All triplets mined so far, with wave = the batch that mined them."""
    return (
        spark.read.schema(TRIPLET_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(triplets_path)
    )


def run_triplet_stream(
    spark: SparkSession,
    *,
    updates_path: str,
    state_path: str,
    triplets_path: str,
    checkpoint_path: str,
    schema: T.StructType,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_predicate: str | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the stream: file source over ``updates_path`` -> per-batch
    triplet mining vs the corpus-so-far + corpus merge.

    ``query_predicate`` (SQL bool expr over the batch's columns)
    optionally restricts which incoming rows mine triplets — the whole
    batch is admitted to the corpus either way. The mining query side
    is broadcast per the ``hard_negative_mining`` contract, so the
    predicate is also the broadcast-size control."""
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
                f"corpus store at {state_path} was written under checkpoint "
                f"{applied_ckpt} but this stream runs under {ckpt_id}; "
                "refusing to merge (delete the state dir to rebuild, or "
                "restore the original checkpoint)."
            )
        if applied >= batch_id:
            return  # replayed batch: triplets + corpus rows already on disk
        batch = batch_df.select(id_col, label_col, vec_col)
        has_corpus = os.path.exists(state_path)
        if has_corpus:
            corpus = read_corpus(spark, state_path)
            queries = (
                batch.filter(F.expr(query_predicate)) if query_predicate else batch
            )
            triplets = hard_negative_mining(
                corpus, queries, id_col=id_col, vec_col=vec_col, label_col=label_col
            ).select(
                F.col("query_id").cast("long"),
                F.col("label"),
                F.lit(batch_id).cast("long").alias("wave"),
                F.col("pos_id").cast("long"),
                "pos_cos",
                F.col("neg_id").cast("long"),
                "neg_cos",
            )
        else:
            triplets = spark.createDataFrame([], TRIPLET_SCHEMA)
        # Triplets first (per-batch dir, overwrite => replay-idempotent),
        # then the corpus swap whose marker commits the batch.
        triplets.write.mode("overwrite").parquet(
            os.path.join(triplets_path, f"batch={batch_id}")
        )
        merged = (
            read_corpus(spark, state_path).unionByName(batch)
            if has_corpus
            else batch
        )
        staging = f"{state_path}.staging-{batch_id}"
        merged.write.mode("overwrite").parquet(staging)
        _write_marker(staging, batch_id=batch_id, checkpoint_id=ckpt_id)
        old = state_path + ".old"
        if os.path.exists(state_path):
            os.rename(state_path, old)
        os.rename(staging, state_path)
        shutil.rmtree(old, ignore_errors=True)

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
