"""Streaming incremental near-dedup: continuous-crawl curation.

Each micro-batch of incoming documents is checked against the corpus
accepted SO FAR via the cross-relation MinHash LSH join
(``operators/dedup.py::minhash_incremental_pairs_presigned``), then its
signatures land as an APPEND-ONLY per-batch partition of the on-disk
SIGNATURE TABLE — the state is the signature store itself (queryable,
append-only in content AND now in layout), never raw text: corpus text
is read exactly once, in the batch that admitted it.

Store maintenance is INCREMENTAL (round 11 — the same rewrite the
semdedup sink got, same rationale: §17.1 measured the drain wall owned
by the per-wave whole-store rewrite, and signatures are append-only by
construction). Per batch:

1. near-dup pairs (delta vs stored signatures, EXCLUDING any partial
   write of this same batch id — the replay crash window, where the
   delta would otherwise pair with its own partial copy at jaccard
   1.0) land under ``pairs_path/batch=<id>`` — overwrite per batch
   directory, so a replay is idempotent;
2. the delta's signatures overwrite-write ``state_path/batch=<id>``
   (replay-idempotent for the same exclusion reason), then the
   (checkpoint id, batch id) marker commits — the agg_sink marker
   protocol, with the atomic whole-store swap retired to
   ``_recover_state`` compatibility (a crashed pre-round-11 swap still
   rolls forward, and a PROMOTED pre-round-11 flat store is migrated
   into a ``batch=-1`` partition on first touch — agg_sink
   ``_migrate_flat_store`` — so the old corpus is neither invisible to
   dedup nor unreachable to the readers).

Batch-equivalence contract (pinned in tests): after draining batches
b1..bN, the union of pair outputs equals running the BATCH incremental
join of each bi against b1..b(i-1) — within-batch duplicates are
intentionally out of scope (the batch dedup operators own intra-batch
dedup; this sink owns cross-batch admission).
"""

from __future__ import annotations

import glob as _glob
import os
import re

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
    _migrate_flat_store,
    _read_marker,
    _recover_state,
    _write_marker,
)

PAIR_SCHEMA = "delta_id long, corpus_id long, jaccard double"

_BATCH_DIR = re.compile(r"^batch=(-?\d+)$")


def _batch_dirs(state_path: str, *, below: int | None = None) -> list[str]:
    """Committed per-batch partitions that hold data (a zero-row batch
    writes only _SUCCESS and must not break schema inference), limited
    to ids strictly below ``below`` for the replay crash window."""
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in sorted(os.listdir(state_path)):
        m = _BATCH_DIR.match(name)
        if not m:
            continue
        if below is not None and int(m.group(1)) >= below:
            continue
        d = os.path.join(state_path, name)
        if _glob.glob(os.path.join(d, "*.parquet")):
            out.append(d)
    return out


def read_signatures(
    spark: SparkSession, state_path: str, *, below_batch: int | None = None
) -> DataFrame:
    """The signature store (with_minhash layout: id, sh, mh0..mhK). The
    ``batch`` bookkeeping partition column is dropped on read. A
    pre-round-11 flat store is migrated into ``batch=-1`` first so its
    rows stay reachable (agg_sink._migrate_flat_store)."""
    _migrate_flat_store(state_path)
    paths = _batch_dirs(state_path, below=below_batch)
    if not paths:
        raise FileNotFoundError(f"no committed store data under {state_path}")
    return spark.read.option("basePath", state_path).parquet(*paths).drop("batch")


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
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start the stream: file source over ``updates_path`` -> per-batch
    dedup-against-corpus + append-only signature partition (module doc
    carries the store design and its crash windows).

    ``compact_every``: fold the per-batch partitions into one every N
    committed batches through the agg_sink swap protocol — bounds file
    count at waves x files-per-wave for long-lived streams; None
    (default) never compacts, the right call for bounded drains. Same
    semantics as the semdedup sink's knob."""
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(updates_path)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _recover_state(state_path)
        # Pre-round-11 flat store -> batch=-1, BEFORE the has_corpus
        # check: otherwise the promoted old corpus reads as empty and
        # this batch is admitted without dedup against it.
        _migrate_flat_store(state_path)
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
            # Corpus = committed batches strictly below this one (the
            # replay crash window — see module doc).
            has_corpus = bool(_batch_dirs(state_path, below=batch_id))
            if has_corpus:
                corpus_sigs = read_signatures(
                    spark, state_path, below_batch=batch_id
                )
                # A pre-numeric-hash store would silently NULL out of the
                # banding join under unionByName type coercion — fail loudly.
                require_numeric_minhash(corpus_sigs, where=f"signature store {state_path}")
                pairs = _cross_pairs_from_signed(
                    d_signed, corpus_sigs, id_col=id_col, threshold=threshold
                )
            else:
                pairs = spark.createDataFrame([], PAIR_SCHEMA)
            # Pairs first (per-batch dir, overwrite => replay-idempotent),
            # then the delta's signature partition, then the marker that
            # commits both.
            pairs.write.mode("overwrite").parquet(
                os.path.join(pairs_path, f"batch={batch_id}")
            )
            d_signed.select(*sig_cols).write.mode("overwrite").parquet(
                os.path.join(state_path, f"batch={batch_id}")
            )
            _write_marker(state_path, batch_id=batch_id, checkpoint_id=ckpt_id)
            if compact_every and len(_batch_dirs(state_path)) >= compact_every:
                _compact(spark, state_path, batch_id=batch_id, ckpt_id=ckpt_id)
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


def _compact(
    spark: SparkSession, state_path: str, *, batch_id: int, ckpt_id: str | None
) -> None:
    """Fold every per-batch partition into a single ``batch=<id>`` via
    the agg_sink swap protocol (staging write -> marker -> rename):
    crash-safe at every point, and the staged marker equals the
    already-committed batch id, so a post-compaction replay of the
    same batch is still skipped (the semdedup sink's _compact,
    minus the cell partitioning this flat store does not have)."""
    import shutil

    full = read_signatures(spark, state_path)
    staging = f"{state_path}.staging-{batch_id}"
    full.write.mode("overwrite").parquet(os.path.join(staging, f"batch={batch_id}"))
    _write_marker(staging, batch_id=batch_id, checkpoint_id=ckpt_id)
    old = state_path + ".old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(staging, state_path)
    shutil.rmtree(old, ignore_errors=True)
