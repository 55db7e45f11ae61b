"""Streaming incremental SEMANTIC dedup: continuous-crawl curation in
embedding space.

Each micro-batch of incoming vectors is (1) assigned to its nearest
coarse-codebook cell (broadcast argmin), (2) pruned against the corpus
admitted SO FAR — cell-locally, via the shared
``operators/embeddings.py::semdedup_prune_assigned`` rule (one code
path with the batch operator, the funnel-sink precedent), and (3) the
SURVIVORS land as an APPEND-ONLY per-batch partition of the on-disk
assigned store. The state is the (id, centroid_id, vector) store
itself — laid out as FLAT ``batch=<id>`` partitions with centroid_id
as a plain column (round 12; earlier rounds wrote
``batch=<id>/centroid_id=<c>/`` cell dirs, which the reader still
accepts — the cell layout never helped the verify join, a parquet
directory partition does not co-locate an equi-join, and it cost
|cells| tiny files per wave).

Store maintenance is INCREMENTAL (round 11, r10 verdict item 4): the
r10 30x campaign measured the drain wall dominated not by the verify
join but by the crash-safe swap REWRITING the whole store into
~400-1000 cell directories every wave (SCALE.md §17.1 — 2.2x wall for
3x backlog). Survivors are append-only per cell, so each wave now
writes ONLY its own survivors (one corpus-write total across a drain,
vs ~waves/2 corpus-rewrites under the swap), and the full rewrite
survives as an optional COMPACTION every ``compact_every`` batches
(bounding small-file growth at long stream lifetimes; the amortized
form of "batch the rewrite across waves").

Per batch:

1. prune decisions (delta vs stored corpus, EXCLUDING any partial
   write of this same batch id — the replay crash window) land under
   ``decisions_path/batch=<id>`` — overwrite per batch directory, so a
   replay is idempotent;
2. the admitted (non-pruned) rows overwrite-write
   ``state_path/batch=<id>`` (replay-idempotent for the same reason:
   the decisions they derive from exclude this batch's own partial
   data), then the (checkpoint id, batch id) marker commits — the
   same marker protocol as ``agg_sink`` / ``near_dedup_sink``, with
   the atomic whole-store swap reserved for compaction.

Batch-equivalence contract (pinned in tests): after draining batches
b1..bN, the union of decision outputs equals applying the BATCH
``semdedup_incremental`` of each bi against the survivors of
b1..b(i-1) — within-batch semantic duplicates are intentionally out of
scope (the batch ``semdedup`` owns intra-corpus dedup; this sink owns
cross-batch admission).
"""

from __future__ import annotations

import glob as _glob
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from ..operators.embeddings import assign_with_vector, semdedup_prune_assigned
from .agg_sink import (
    _checkpoint_identity,
    _migrate_flat_store,
    _read_marker,
    _recover_state,
    _write_marker,
)

DECISION_SCHEMA = "vec_id long, centroid_id long, pruned boolean"

_BATCH_DIR = re.compile(r"^batch=(-?\d+)$")


def _batch_dirs(state_path: str, *, below: int | None = None) -> list[str]:
    """The store's committed per-batch partitions that actually hold
    data (a zero-survivor batch writes only _SUCCESS — no parquet
    files — and must not break schema inference), optionally limited
    to batch ids strictly below ``below`` (the replay crash window: a
    reprocessed batch must never see its own partial write as
    corpus)."""
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
        if _glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            out.append(d)
    return out


def read_assigned(
    spark: SparkSession, state_path: str, *, below_batch: int | None = None
) -> DataFrame:
    """The assigned corpus store (assign_with_vector layout:
    id, centroid_id, vector). Since round 12 batches are written FLAT
    (centroid_id as a plain column — see the survivor-write comment);
    batches written by older code carry ``centroid_id=*`` cell dirs
    instead, where the value comes back through directory inference as
    an int. Both layouts are read (split into two scans, since one
    spark.read cannot treat centroid_id as a partition column in some
    files and a data column in others) and unioned with centroid_id
    normalized to the long the assignment produces. The ``batch``
    bookkeeping column is dropped. A pre-round-11 flat store is
    migrated into ``batch=-1`` first so its rows stay reachable
    (agg_sink._migrate_flat_store)."""
    _migrate_flat_store(state_path)
    paths = _batch_dirs(state_path, below=below_batch)
    if not paths:
        raise FileNotFoundError(f"no committed store data under {state_path}")
    celled = [
        p
        for p in paths
        if any(n.startswith("centroid_id=") for n in os.listdir(p))
    ]
    flat = [p for p in paths if p not in set(celled)]
    parts = []
    for group in (flat, celled):
        if group:
            df = spark.read.option("basePath", state_path).parquet(*group)
            parts.append(
                df.drop("batch").withColumn(
                    "centroid_id", F.col("centroid_id").cast("long")
                )
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


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
    compact_every: int | None = None,
) -> StreamingQuery:
    """Start the stream: file source over ``updates_path`` -> per-batch
    cell-local semantic dedup vs the admitted corpus + append-only
    survivor partition (module doc carries the store-maintenance
    design and its crash windows).

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

    ``compact_every``: fold the per-batch partitions into one every N
    committed batches (the atomic swap protocol, amortized) — bounds
    file count at waves x cells for long-lived streams; None (default)
    never compacts, the right call for bounded drains.

    Everything downstream of assignment — the shared prune rule, the
    decisions/survivor writes, the marker — is identical across
    quantizers, so the batch-equivalence and replay contracts hold for
    both."""
    if (centroids is None) == (assign_fn is None):
        raise ValueError("pass exactly one of centroids / assign_fn")
    stream = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
        .parquet(updates_path)
    )

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        _recover_state(state_path)  # roll a crashed compaction swap forward
        # Pre-round-11 flat store (centroid_id=* cells at the root) ->
        # batch=-1, BEFORE the has_corpus check: otherwise the promoted
        # old corpus reads as empty and this batch is admitted without
        # pruning against it.
        _migrate_flat_store(state_path)
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
            # Corpus = committed batches strictly below this one: a
            # replay after a crash between the survivor write and the
            # marker must not see its own partial partition (the
            # delta's vectors would self-match at cos 1.0 and every
            # replayed row would flip to pruned).
            has_corpus = bool(_batch_dirs(state_path, below=batch_id))
            if has_corpus:
                corpus = read_assigned(spark, state_path, below_batch=batch_id)
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
            # idempotent), then the survivor partition, then the marker
            # that commits both.
            decisions.write.mode("overwrite").parquet(
                os.path.join(decisions_path, f"batch={batch_id}")
            )
            survivors = assigned.join(
                decisions.filter(~F.col("pruned")).select(id_col), id_col
            ).select(id_col, "centroid_id", vec_col)
            # FLAT per-batch write (round 12): centroid_id rides as a
            # plain column, NOT a partitionBy directory. The cell-dir
            # layout bought the verify join nothing — a parquet
            # directory partition does not co-locate a join, the
            # centroid_id equi-join shuffles either way — while costing
            # |cells| tiny files per wave (the 12k-task listing wall
            # SCALE.md §21.4 recorded at sf30). One file set per batch
            # is the near_dedup sink's layout, at its per-row cost.
            survivors.write.mode("overwrite").parquet(
                os.path.join(state_path, f"batch={batch_id}")
            )
            _write_marker(state_path, batch_id=batch_id, checkpoint_id=ckpt_id)
            if compact_every and len(_batch_dirs(state_path)) >= compact_every:
                _compact(spark, state_path, batch_id=batch_id, ckpt_id=ckpt_id)
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


def _compact(
    spark: SparkSession, state_path: str, *, batch_id: int, ckpt_id: str | None
) -> None:
    """Fold every per-batch partition into a single ``batch=<id>`` via
    the agg_sink swap protocol (staging write -> marker -> rename):
    crash-safe at every point (_recover_state promotes a complete
    staging or restores the set-aside copy), and the marker it carries
    equals the already-committed batch id, so a post-compaction replay
    of the same batch is still skipped."""
    full = read_assigned(spark, state_path)
    staging = f"{state_path}.staging-{batch_id}"
    full.write.mode("overwrite").parquet(
        os.path.join(staging, f"batch={batch_id}")
    )
    _write_marker(staging, batch_id=batch_id, checkpoint_id=ckpt_id)
    old = state_path + ".old"
    if os.path.exists(state_path):
        os.rename(state_path, old)
    os.rename(staging, state_path)
    shutil.rmtree(old, ignore_errors=True)
