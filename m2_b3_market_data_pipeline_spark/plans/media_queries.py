"""Media-modality analytics over binary payloads: per-frame energy
contours (the silence/clipping filter shape) and corpus-wide duplicate
frames over the sampled-frame relation. Real codec decode is stubbed
(operators/multimodal.py policy); the byte-domain stand-in keeps the
frame assignment, fan-out, and aggregate plumbing real AND
hash-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import fan_out
from ..operators.multimodal import attach_binary, frame_dedup, sample_frames
from .expansion_similarity import FRAMES_CTE_SQL
from .registry import load, register

@register(
    "audio_frame_energy",
    oracle="""
WITH sized AS (
    -- byte domain (hex of the utf-8 encoding), mirroring frame_energy
    SELECT doc_id, hex(encode(text)) AS h,
           CAST(octet_length(encode(text)) AS BIGINT) AS L
    FROM documents WHERE octet_length(encode(text)) >= 16
),
v AS (
    SELECT doc_id, L,
           unnest(list_transform(generate_series(1, CAST(L AS INT)),
                  i -> CAST(('0x' || substr(h, 2 * i - 1, 2)) AS BIGINT))) AS val,
           unnest(generate_series(1, CAST(L AS INT))) AS pos
    FROM sized
)
SELECT doc_id, CAST((16 * (pos - 1)) // L AS INT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_bytes,
       ROUND(SUM((val - 128) * (val - 128)) * 1.0 / COUNT(*), 6) AS energy
FROM v
GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
""",
)
def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction shape: 16 fixed frames per
    binary payload, mean squared deviation from the byte midpoint per
    frame (the energy/RMS contour a silence/clipping filter
    thresholds). Real PCM decode is stubbed (same policy as
    multimodal.decode_image); the byte-domain stand-in keeps the frame
    assignment, fan-out, and aggregate plumbing real AND hash-checked —
    integer sums, one division at the output edge
    (operators/multimodal.py::frame_energy)."""
    from ..operators.multimodal import attach_binary, frame_energy

    docs = attach_binary(
        load(spark, sf_dir, "documents").select("doc_id", "text"), modality="audio"
    )
    return frame_energy(docs, id_col="doc_id", binary_col="content")
@register(
    "frame_dedup",
    oracle=f"""
WITH {FRAMES_CTE_SQL}
SELECT frame_hash,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM fr
GROUP BY frame_hash
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY frame_hash
""",
)
def frame_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate frames across the corpus: the ``multimodal_frames``
    sampling pipeline folded by content hash, keeping hashes present in
    >= 2 distinct payloads (operators/multimodal.py::frame_dedup). Same
    byte-window stand-in for the stubbed codec decode, same portable
    hex-domain digest as multimodal_frames (no ASCII caveat)."""
    docs = load(spark, sf_dir, "documents")
    frames = sample_frames(
        fan_out(attach_binary(docs)), n_frames=4, frame_bytes=16
    )
    return frame_dedup(frames)
