"""Streaming incremental near-dedup: continuous-crawl curation.

Each micro-batch of incoming documents is checked against the corpus
accepted SO FAR via the cross-relation MinHash LSH join
(``operators/dedup.py::minhash_incremental_pairs_presigned``), then its
signatures are merged into the on-disk SIGNATURE TABLE — the state is
the signature store itself (queryable, append-only in content), never
raw text: corpus text is read exactly once, in the batch that admitted
it.

Per batch:

1. near-dup pairs (delta vs stored signatures) land under
   ``pairs_path/batch=<id>`` — overwrite per batch directory, so a
   replay is idempotent;
2. the delta's signatures union into the signature table via the same
   crash-safe swap + (checkpoint id, batch id) marker as
   ``agg_sink`` (set the old aside, promote complete staging, fail
   loudly on a foreign checkpoint).

Batch-equivalence contract (pinned in tests): after draining batches
b1..bN, the union of pair outputs equals running the BATCH incremental
join of each bi against b1..b(i-1) — within-batch duplicates are
intentionally out of scope (the batch dedup operators own intra-batch
dedup; this sink owns cross-batch admission).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    _cross_pairs_from_signed,
    fan_out,
    require_numeric_minhash,
    with_minhash,
)
from .agg_sink import (
    _checkpoint_identity,
    _read_marker,
    _recover_state,
    _write_marker,
)

PAIR_SCHEMA = "delta_id long, corpus_id long, jaccard double"


def read_signatures(spark: SparkSession, state_path: str) -> DataFrame:
    """The signature store (with_minhash layout: id, sh, mh0..mhK)."""
    return spark.read.parquet(state_path)


def read_pairs(spark: SparkSession, pairs_path: str) -> DataFrame:
    """All cross-batch near-dup pairs found so far."""
    return (
        spark.read.schema(PAIR_SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(pairs_path)
    )


def run_incremental_dedup_stream(
    spark: SparkSession,
    *,
    updates_path: str,
    state_path: str,
    pairs_path: str,
    checkpoint_path: str,
    schema: T.StructType,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """Start the stream: file source over ``updates_path`` -> per-batch
    dedup-against-corpus + signature-table merge."""
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
                f"signature store at {state_path} was written under checkpoint "
                f"{applied_ckpt} but this stream runs under {ckpt_id}; "
                "refusing to merge (delete the state dir to rebuild, or "
                "restore the original checkpoint)."
            )
        if applied >= batch_id:
            return  # replayed batch: pairs + signatures already on disk
        d_signed = with_minhash(
            fan_out(batch_df.select(id_col, text_col)),
            text_col=text_col,
            id_col=id_col,
        ).persist()
        try:
            sig_cols = [id_col, "sh"] + [
                c for c in d_signed.columns if c.startswith("mh")
            ]
            has_corpus = os.path.exists(state_path)
            if has_corpus:
                corpus_sigs = read_signatures(spark, state_path)
                # A pre-numeric-hash store would silently NULL out of the
                # banding join under unionByName type coercion — fail loudly.
                require_numeric_minhash(corpus_sigs, where=f"signature store {state_path}")
                pairs = _cross_pairs_from_signed(
                    d_signed, corpus_sigs, id_col=id_col, threshold=threshold
                )
                merged = corpus_sigs.unionByName(d_signed.select(*sig_cols))
            else:
                pairs = spark.createDataFrame([], PAIR_SCHEMA)
                merged = d_signed.select(*sig_cols)
            # Pairs first (per-batch dir, overwrite => replay-idempotent),
            # then the signature swap whose marker commits the batch.
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_path, f"batch={batch_id}")
            )
            staging = f"{state_path}.staging-{batch_id}"
            merged.write.mode("overwrite").parquet(staging)
            _write_marker(staging, batch_id=batch_id, checkpoint_id=ckpt_id)
            old = state_path + ".old"
            if os.path.exists(state_path):
                os.rename(state_path, old)
            os.rename(staging, state_path)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            # Unconditional: a mid-batch failure (write error, foreign
            # checkpoint) must not leak the persisted frame for the life
            # of the session — each retry would persist a fresh copy.
            d_signed.unpersist()

    writer = (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
