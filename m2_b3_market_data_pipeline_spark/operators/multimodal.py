"""Multimodal column handling: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB (BASELINE.json north star):
content travels as an opaque ``binary`` column with a typed metadata
struct alongside (byte length, content hash, modality, declared mime).
Decode / feature-extraction runs as Arrow-batched ``mapInPandas`` — the
only place Python touches bytes, and it touches them one Arrow batch at
a time, never one row at a time.

The container has no image/audio libraries, so the actual decode is
STUBBED (NotImplementedError behind an import-try) and replaced by a
deterministic byte-level feature extractor; the Spark-side plumbing —
schema, batching, partitioning, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

FEATURE_BINS = 16

FEATURE_SCHEMA = (
    "doc_id bigint, byte_len int, content_md5 string, feature array<double>"
)


def attach_binary(df: DataFrame, *, text_col: str = "text", modality: str = "text") -> DataFrame:
    """Wrap a payload column as (content binary, meta struct). For the
    fixtures the payload is utf-8 text; for real images/audio it is the
    raw file bytes — the schema is identical."""
    content = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("content", content).withColumn(
        "meta",
        F.struct(
            F.length(content).alias("byte_len"),
            F.md5(content).alias("content_md5"),
            F.lit(modality).alias("modality"),
            F.lit("application/octet-stream").alias("mime"),
        ),
    )


def decode_image(data: bytes) -> "object":
    """Real decode — requires an imaging library not present in this
    container. The plumbing around it (extract_features) is real."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
        import io

        return Image.open(io.BytesIO(data))
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "image decode requires PIL; container ships without imaging libs "
            "— byte-level features are used instead (deterministic_features)"
        ) from exc


def deterministic_features(data: bytes, bins: int = FEATURE_BINS) -> list[float]:
    """Deterministic stand-in for a decoded-content featurizer: a
    normalized histogram of byte values. Keeps the full pipeline
    (schema, Arrow batching, downstream similarity) runnable and
    testable without media libraries."""
    if not data:
        return [0.0] * bins
    hist = [0] * bins
    for byte in data:
        hist[byte * bins // 256] += 1
    total = float(len(data))
    return [h / total for h in hist]


def extract_features(df: DataFrame, *, id_col: str = "doc_id", binary_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over binary content via
    mapInPandas: the production shape for decode/resize/frame-sample
    stages. Python cost is per-Arrow-batch, not per-row; partitioning of
    the input carries straight through (no shuffle)."""
    id_name, bin_name = id_col, binary_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            content = pdf[bin_name]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_name],
                    "byte_len": content.str.len().astype("int32"),
                    "content_md5": [
                        __import__("hashlib").md5(b).hexdigest() for b in content
                    ],
                    "feature": [deterministic_features(b) for b in content],
                }
            )

    # Decode contract: a NULL payload cannot be featurized — excluded
    # before the Arrow batches (a NaN byte_len would poison the int
    # cast; a None md5 input would throw mid-batch).
    return (
        df.filter(F.col(binary_col).isNotNull())
        .select(id_col, binary_col)
        .mapInPandas(batches, FEATURE_SCHEMA)
    )


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_hash string"


def sample_frames(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    binary_col: str = "content",
    n_frames: int = 4,
    frame_bytes: int = 16,
) -> DataFrame:
    """Evenly-spaced frame sampling over an opaque binary payload.

    The video-pipeline shape: one input row fans out to ``n_frames``
    rows, each a fixed-size window taken at evenly spaced offsets
    (first frame at 0, last frame ending flush with the payload). A
    real deployment decodes container formats here (stubbed — no codec
    libs in this container); the deterministic stand-in slices the raw
    bytes, which keeps the exact same Spark plumbing: Arrow-batched
    ``mapInPandas``, a 1→N row multiplier, partitioning preserved (no
    shuffle), output hashed so frames dedup downstream by content.
    Payloads shorter than ``n_frames * frame_bytes`` are skipped (a
    real decoder's too-short-to-sample case), as are NULL payloads.

    ``frame_hash`` is md5 over the frame's UPPERCASE HEX encoding (not
    the raw bytes): hex is injective, so identity semantics are
    unchanged, and the digest becomes portable to engines whose md5
    only accepts text (DuckDB) even when a frame boundary falls inside
    a multi-byte codepoint — which removes the previous ASCII-only
    oracle caveat.
    """
    import hashlib

    id_name, bin_name = id_col, binary_col

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            hashes: list[str] = []
            for i, raw in zip(pdf[id_name], pdf[bin_name]):
                if raw is None:
                    continue
                b = bytes(raw)
                if len(b) < n_frames * frame_bytes:
                    continue
                stride = (len(b) - frame_bytes) // (n_frames - 1)
                for k in range(n_frames):
                    frame = b[k * stride : k * stride + frame_bytes]
                    ids.append(int(i))
                    idxs.append(k)
                    hashes.append(hashlib.md5(frame.hex().upper().encode()).hexdigest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                 "frame_hash": hashes}
            )

    return df.select(id_col, binary_col).mapInPandas(batches, FRAME_SCHEMA)


AUDIO_FRAMES = 16


def _bytes_in_segments(
    df: DataFrame, *, id_col: str, binary_col: str, segments: int
) -> DataFrame:
    """(id, __len, __pos, __v, __seg) rows: every byte of the payload
    parsed EXACTLY once (one hex transform + one posexplode) and
    pigeonholed into ``segments`` equal windows — the shared byte-parse
    front end of ``perceptual_hash`` (64 segments) and ``frame_energy``
    (16 frames). Payloads shorter than ``segments`` bytes are skipped
    (too short to sample). The input takes the parallelism floor first:
    the per-byte explode is the most expensive map work in the repo and
    must not fuse into a single-task scan stage (operators/
    parallelism.py; no-op on a real multi-split corpus)."""
    from .parallelism import ensure_parallelism

    return (
        ensure_parallelism(df.select(id_col, binary_col))
        .withColumn("__hx", F.hex(F.col(binary_col)))
        .withColumn("__len", F.length(F.col(binary_col)).cast("bigint"))
        .filter(F.col("__len") >= segments)
        .select(
            id_col,
            "__len",
            F.posexplode(
                F.expr(
                    "transform(sequence(1, cast(__len as int)), "
                    "i -> cast(conv(substr(__hx, (i - 1) * 2 + 1, 2), 16, 10) as bigint))"
                )
            ).alias("__pos", "__v"),
        )
        .withColumn("__seg", F.expr(f"cast(({segments} * __pos) div __len as int)"))
    )


def frame_energy(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    binary_col: str = "content",
    frames: int = AUDIO_FRAMES,
) -> DataFrame:
    """Frame-level energy over an opaque binary payload — the AUDIO
    analog of ``perceptual_hash``'s image path: split the byte stream
    into ``frames`` equal windows (the fixed-frame shape of PCM feature
    extraction) and emit per-frame mean squared deviation from the
    byte midpoint (energy/RMS proxy). For real audio this runs on
    decoded PCM samples; the byte-domain stand-in keeps the
    schema/partitioning/fan-out plumbing identical and — unlike a
    decoder — hash-checkable against DuckDB.

    Shape: one hex transform + one posexplode parses each byte exactly
    once; the (doc, frame) fold is a narrow codegen'd aggregate with
    map-side combine, so shuffle volume is ``frames`` rows per doc
    regardless of payload size. Sums stay integer (squared deviations
    of 0..255 bytes); the single division to mean happens at the
    output edge, identically on both engines. Payloads shorter than
    ``frames`` bytes are skipped (same contract as phash/frame
    sampling)."""
    per_byte = _bytes_in_segments(
        df, id_col=id_col, binary_col=binary_col, segments=frames
    )
    dev = F.col("__v") - 128
    return (
        per_byte.groupBy(id_col, F.col("__seg").alias("frame_idx"))
        .agg(
            F.count("*").alias("n_bytes"),
            F.round(F.sum(dev * dev) / F.count("*"), 6).alias("energy"),
        )
        .orderBy(id_col, "frame_idx")
    )


PHASH_SAMPLES = 64


def perceptual_hash(
    df: DataFrame, *, id_col: str = "doc_id", binary_col: str = "content"
) -> DataFrame:
    """aHash-style 64-bit perceptual signature over an opaque binary
    payload: split the payload into 64 equal segments (the byte-domain
    analog of the aHash 8x8 downscale), set bit j iff segment j's mean
    byte value exceeds the whole-payload mean. All comparisons are
    cross-multiplied integers — no float ties. Packed as two 32-bit
    halves named ``simhash_lo`` / ``simhash_hi`` so
    ``dedup.simhash_near_pairs`` consumes the output as-is for the
    Hamming pigeonhole join (signature family composition, not code
    duplication).

    Shape: parse each byte EXACTLY once (one hex transform + one
    posexplode), reduce to (doc, segment) partials map-side, then pack
    the 64 segment rows per doc into the two bit halves with one small
    aggregate. Two design dead-ends informed this:
    - 64 slice-aggregates over a shared array column: Catalyst inlines
      the shared projection into every consumer, re-parsing all bytes
      64x per row in the interpreted HOF evaluator (~100x slower).
    - one wide aggregate with 128 per-segment conditional sums over the
      exploded bytes: every byte row evaluates 128 CASE branches
      (~4x slower than the two-level form).
    Payloads shorter than 64 bytes are skipped (too short to sample —
    same contract as frame sampling). For real images this runs on
    decoded pixel luma; the byte-domain stand-in keeps identical
    signature/join plumbing.
    """
    per_byte = _bytes_in_segments(
        df, id_col=id_col, binary_col=binary_col, segments=PHASH_SAMPLES
    )
    # Partial aggregation collapses the byte stream to <= 64 rows per doc
    # before the shuffle; the per-doc totals ride a window over those
    # tiny groups and the bit pack is a NARROW declarative aggregate —
    # all stages stay in whole-stage codegen. (The previous form packed
    # via collect_list + a higher-order aggregate(): the collect_list
    # forces an un-codegen'd ObjectHashAggregate and the fold runs in
    # the interpreted HOF evaluator; same round-6 lesson as
    # dedup.simhash_expr — narrow codegen'd beats clever-wide.)
    per_seg = per_byte.groupBy(id_col, "__seg").agg(
        F.sum("__v").alias("__ssum"), F.count("*").alias("__slen")
    )
    w = Window.partitionBy(id_col)
    voted = (
        per_seg.withColumn("__tot", F.sum("__ssum").over(w))
        .withColumn("__n", F.sum("__slen").over(w))
        .withColumn("__bit", F.expr("__ssum * __n > __tot * __slen"))
    )
    bit = (
        "CASE WHEN __bit AND __seg {cmp} "
        "THEN shiftleft(CAST(1 AS BIGINT), __seg {off}) ELSE CAST(0 AS BIGINT) END"
    )
    # groupBy(id) reuses the window's hashpartitioning — no third shuffle.
    return voted.groupBy(id_col).agg(
        F.sum(F.expr(bit.format(cmp="< 32", off=""))).alias("simhash_lo"),
        F.sum(F.expr(bit.format(cmp=">= 32", off="- 32"))).alias("simhash_hi"),
    )


def frame_dedup(
    frames: DataFrame, *, id_col: str = "doc_id", hash_col: str = "frame_hash",
    min_docs: int = 2,
) -> DataFrame:
    """Corpus-wide duplicate-frame detection over the output of
    ``sample_frames``: group the sampled frames by content hash and keep
    hashes seen in >= ``min_docs`` distinct payloads — the video-corpus
    analog of exact text dedup (intro cards, logo stings, and re-uploads
    share identical frames long before whole files match).

    One shuffle on the 16-byte frame hash — at 100 TB the frames
    relation is ``n_frames`` rows per video of a few dozen bytes each,
    so this aggregates orders of magnitude less data than the payloads
    themselves; the count-distinct expands the hash groups 2x (doc-id
    dedup within group), bounded by n_frames x docs. Downstream, the
    surviving hash set joins back to prune or cluster the source videos
    (same composition as exact_dedup -> clusters)."""
    return (
        frames.groupBy(hash_col)
        .agg(
            F.count("*").alias("n_frames"),
            F.countDistinct(id_col).alias("n_docs"),
            F.min(id_col).alias("min_doc_id"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(hash_col)
    )
