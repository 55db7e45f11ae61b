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


# The decode family's pixel-law oracle (shared by decoded_phash_check
# and decoded_rebalanced_check — the rebalance operator is semantics-
# neutral, so BOTH gates must hash to exactly this):
_PHASH_LAW_ORACLE = """
WITH ids AS (
    SELECT doc_id, abs(doc_id) AS hid
    FROM documents WHERE doc_id IS NOT NULL
),
g AS (SELECT unnest(generate_series(0, 15)) AS i),
px AS (
    SELECT d.doc_id, x.i AS x, y.i AS y,
           (d.hid * 31 + 7 * x.i + 13 * y.i) % 256 AS v
    FROM ids d, g x, g y
),
cells AS (
    SELECT doc_id, (y // 2) * 8 + (x // 2) AS cell, SUM(v) AS s
    FROM px GROUP BY doc_id, (y // 2) * 8 + (x // 2)
),
tot AS (SELECT doc_id, SUM(s) AS t FROM cells GROUP BY doc_id),
ph AS (
    SELECT c.doc_id,
           CAST(
             SUM(CASE WHEN c.cell >= 1 AND c.s * 64 > t.t
                      THEN (CAST(1 AS BIGINT) << (63 - c.cell)) ELSE 0 END)
             + CASE WHEN MAX(CASE WHEN c.cell = 0 AND c.s * 64 > t.t
                                 THEN 1 ELSE 0 END) = 1
                    THEN -9223372036854775807 - 1 ELSE 0 END
           AS BIGINT) AS phash64
    FROM cells c JOIN tot t USING (doc_id) GROUP BY c.doc_id
),
hist AS (
    SELECT doc_id,
           COUNT(*) FILTER (v // 16 = 0)  / 256.0 AS hist_0,
           COUNT(*) FILTER (v // 16 = 7)  / 256.0 AS hist_7,
           COUNT(*) FILTER (v // 16 = 15) / 256.0 AS hist_15
    FROM px GROUP BY doc_id
)
SELECT i.doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       ph.phash64, hist.hist_0, hist.hist_7, hist.hist_15
FROM ids i JOIN ph USING (doc_id) JOIN hist USING (doc_id)
ORDER BY i.doc_id
"""


def _phash_law_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gates' shared payload synth: per doc, the 16x16 pixel-law
    raster serialized into the |doc_id| mod 17 format rotation (see
    decoded_phash_check's docstring) via mapInPandas."""
    from ..operators.multimodal import DecodedImage, encode_image

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id").isNotNull())
    )

    def synth(it):
        import numpy as np
        import pandas as pd

        xg, yg = np.meshgrid(np.arange(16), np.arange(16))
        fmts = (
            "bmp", "ppm", "png", "gif", "png-gray", "png-pal", "png-16",
            "bmp-32", "bmp-pal", "tiff", "png-i", "pgm", "ppm-16",
            "webp", "webp-sg", "tiff-lzw", "tiff-pb",
        )
        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                hid = abs(int(i))
                v = ((hid * 31 + 7 * xg + 13 * yg) % 256).astype(np.uint8)
                rgb = np.repeat(v[:, :, None], 3, axis=2)
                img = DecodedImage(16, 16, rgb.tobytes())
                payloads.append(encode_image(img, fmts[hid % 17]))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    return docs.mapInPandas(synth, "doc_id bigint, content binary")


def _phash_feature_columns(feats: DataFrame) -> DataFrame:
    return feats.select(
        "doc_id",
        "width",
        "height",
        "phash64",
        F.col("luma_hist")[0].alias("hist_0"),
        F.col("luma_hist")[7].alias("hist_7"),
        F.col("luma_hist")[15].alias("hist_15"),
    )


@register("decoded_phash_check", oracle=_PHASH_LAW_ORACLE)
def decoded_phash_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode family's DIFFERENTIAL oracle gate (r13; rotation
    widened r14): per doc, a 16x16 gray raster with the analytic
    pixel law v(x, y) = (|doc_id|*31 + 7x + 13y) mod 256 is
    serialized by ``encode_image`` into a format rotating by
    |doc_id| mod 17 (24-bit BMP / PPM / truecolor PNG / GIF /
    grayscale PNG color type 0 / palette PNG color type 3 / 16-bit
    PNG whose v*257 expansion reduces back exactly / 32-bit BGRx BMP
    / 8-bit palettized BMP / baseline TIFF / Adam7-interlaced
    truecolor PNG / P5 grayscale PGM / 16-bit P6 PPM at maxval 65535
    / lossless WebP VP8L plain and with the subtract-green transform
    / LZW TIFF with horizontal-differencing predictor / PackBits TIFF
    — gray rasters are gray- and palette-expressible, so every leg
    is lossless),
    decoded back through the REAL
    ``decode_image`` chain inside ``decoded_image_features``, and the
    production 64-bit average-hash + luma-histogram bins come out.
    The oracle recomputes both straight from the pixel law — never
    seeing a byte of any container — so any encoder/decoder asymmetry,
    row-order flip, channel swap, padding bug, or phash drift breaks
    the hash match. Exactness holds because at 16x16 every division
    the featurizers perform is by a power of two (cell mean /4, grid
    mean /256, histogram /256): both engines compare exact doubles.
    gray pixels make luma == v exactly ((299+587+114)v // 1000)."""
    from ..operators.multimodal import decoded_image_features

    wrapped = _phash_law_payloads(spark, sf_dir)
    return _phash_feature_columns(decoded_image_features(wrapped))


@register("decoded_rebalanced_check", oracle=_PHASH_LAW_ORACLE)
def decoded_rebalanced_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rebalance_for_decode``'s driver-oracle gate (late r14): the
    SAME payload synth and pixel-law oracle as ``decoded_phash_check``,
    but the two-path heavy-tail split runs between synth and decode
    with ``heavy_bytes=700`` — a threshold chosen to genuinely divide
    the rotation's payload population (BMP/TIFF/PPM/png-16 rasters at
    16x16 sit above ~780 bytes, the compressed PNG/GIF legs below), so
    BOTH legs carry real traffic. The operator is semantics-neutral by
    contract (light rows pass through unshuffled, heavy rows
    round-robin into their own partitions, nothing dropped or
    duplicated); any row loss, duplication, or reorder-sensitivity in
    the split breaks this hash against the SAME oracle SQL."""
    from ..operators.multimodal import (
        decoded_image_features,
        rebalance_for_decode,
    )

    wrapped = rebalance_for_decode(
        _phash_law_payloads(spark, sf_dir),
        heavy_bytes=700,
        heavy_partitions=8,
    )
    return _phash_feature_columns(decoded_image_features(wrapped))


@register(
    "decoded_wav_check",
    oracle="""
WITH ids AS (
    SELECT doc_id, abs(doc_id) AS hid
    FROM documents WHERE doc_id IS NOT NULL
),
k AS (SELECT unnest(generate_series(0, 63)) AS i),
law AS (
    SELECT doc_id, hid, i,
           ((hid * 13 + 7 * i) % 201) - 100 AS pcm,
           ((hid * 13 + 7 * i) % 256) AS b
    FROM ids, k
),
cw AS (
    SELECT *,
           255 - (CASE WHEN b = 127 THEN 255 ELSE b END) AS u2,
           xor(b, 85) AS ba
    FROM law
),
ex AS (
    SELECT *,
           ((u2 % 16) * 8 + 132) * (1 << ((u2 // 16) % 8)) AS ut,
           CASE WHEN ((ba // 16) % 8) = 0 THEN (ba % 16) * 16 + 8
                WHEN ((ba // 16) % 8) = 1 THEN (ba % 16) * 16 + 264
                ELSE ((ba % 16) * 16 + 264)
                     * (1 << (((ba // 16) % 8) - 1)) END AS at
    FROM cw
),
s AS (
    SELECT doc_id, i,
           CASE hid % 4
                WHEN 2 THEN CASE WHEN u2 >= 128 THEN 132 - ut
                                 ELSE ut - 132 END
                WHEN 3 THEN CASE WHEN ba >= 128 THEN at ELSE -at END
                ELSE pcm END AS v
    FROM ex
),
fr AS (
    SELECT doc_id, CAST(i // 4 AS INT) AS frame_idx, SUM(v * v) AS ss
    FROM s GROUP BY doc_id, i // 4
)
SELECT doc_id, CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
       CAST(64 AS BIGINT) AS n_samples, frame_idx,
       sqrt(ss / 4.0) AS rms
FROM fr ORDER BY doc_id, frame_idx
""",
)
def decoded_wav_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO leg's differential oracle gate (r14 — image and
    video got theirs in r13; rotation widened to four encodings the
    same round): per doc a 64-sample mono WAV serialized by the
    production ``encode_audio_wav`` writer rotating |doc_id| mod 4 —
    8-bit unsigned PCM (the +-128 recentring pair), 16-bit signed
    PCM, G.711 mu-law (format 7), G.711 A-law (format 6). The PCM
    legs carry the law s(k) = ((hid*13 + 7k) mod 201) - 100; the
    companded legs derive their linear samples from the codeword law
    c(k) = (hid*13 + 7k) mod 256 through the G.711 expansion
    formulas written out INLINE here (and again, independently, in
    the oracle SQL) — because every sample is exactly a codeword
    value, the production compress->expand pair must reproduce it
    bit-exactly (the mu-law negative-zero 0x7F remaps to its
    canonical 0xFF twin on both sides). Decode runs through
    ``_decode_wav`` inside the production ``decoded_frame_energy``,
    emitting 16 per-frame RMS rows. Exactness: 4-sample windows make
    RMS = sqrt(exact-int sum / 4.0) — division by a power of two
    then one IEEE sqrt, bit-identical in both engines. The oracle
    computes everything straight from the laws, never seeing a
    container byte: any fmt-chunk, recentring, companding-table,
    interleave, or window-assignment asymmetry breaks the hash."""
    from ..operators.multimodal import decoded_frame_energy, encode_audio_wav

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id").isNotNull())
    )

    def ulaw_val(c: int) -> int:
        c = 255 if c == 127 else c
        u = 255 - c
        t = ((u % 16) * 8 + 132) << ((u // 16) % 8)
        return 132 - t if u >= 128 else t - 132

    def alaw_val(c: int) -> int:
        a = c ^ 85
        seg, q = (a // 16) % 8, a % 16
        t = (q * 16 + 8) if seg == 0 else (q * 16 + 264) << max(seg - 1, 0)
        return t if a >= 128 else -t

    def synth(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                hid = abs(int(i))
                leg = hid % 4
                if leg in (0, 1):
                    samples = [
                        ((hid * 13 + 7 * k) % 201) - 100 for k in range(64)
                    ]
                    kw = {"bits": 8 if leg == 0 else 16}
                else:
                    law = [(hid * 13 + 7 * k) % 256 for k in range(64)]
                    fn = ulaw_val if leg == 2 else alaw_val
                    samples = [fn(c) for c in law]
                    kw = {"encoding": "ulaw" if leg == 2 else "alaw"}
                payloads.append(
                    encode_audio_wav(
                        samples, sample_rate=8000, channels=1, **kw
                    )
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    wrapped = docs.mapInPandas(synth, "doc_id bigint, content binary")
    return decoded_frame_energy(wrapped, frames=16)


@register(
    "decoded_pjpeg_check",
    oracle="""
WITH ids AS (
    SELECT doc_id, abs(doc_id) AS hid
    FROM documents WHERE doc_id IS NOT NULL
),
law AS (
    SELECT doc_id, 128 + 2 * ((hid * 11 + 5) % 32) AS v FROM ids
)
SELECT doc_id, CAST(16 AS INT) AS width, CAST(16 AS INT) AS height,
       CAST(0 AS BIGINT) AS phash64,
       CAST(CASE WHEN v // 16 = 8  THEN 1.0 ELSE 0.0 END AS DOUBLE) AS hist_8,
       CAST(CASE WHEN v // 16 = 9  THEN 1.0 ELSE 0.0 END AS DOUBLE) AS hist_9,
       CAST(CASE WHEN v // 16 = 10 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS hist_10,
       CAST(CASE WHEN v // 16 = 11 THEN 1.0 ELSE 0.0 END AS DOUBLE) AS hist_11
FROM law ORDER BY doc_id
""",
)
def decoded_pjpeg_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG's differential oracle gate (r14, closing r13
    verdict item 1): per doc a SOLID 16x16 gray raster with the law
    v = 128 + 2*((|doc_id|*11 + 5) mod 32) — every v is even, so the
    quantized DC (8*(v-128)/16 = (v-128)/2) is an exact integer and
    the whole ten-scan successive-approximation ladder (DC first scan
    at Al=1, spectral-selection AC scans, AC refinement with EOB runs,
    the Huffman-free DC refinement) reconstructs every pixel EXACTLY.
    The payload rotates by |doc_id| mod 2 between the single-component
    grayscale script (6 scans, non-interleaved DC) and the 4:2:0 color
    script (10 scans, interleaved DC + per-component AC scans), so
    both Annex G scan-order paths are hash-checked. The oracle
    recomputes width/height, phash64 = 0 (solid frames tie every cell
    to the mean) and the one lit luma-histogram bin (v // 16 in 8..11;
    256/256 = 1.0 is an exact double) straight from the law — it never
    sees a single encoded byte, so any asymmetry anywhere in the
    progressive encode -> multi-scan decode -> IDCT -> color-convert ->
    featurize chain breaks the hash match."""
    import numpy as np

    from ..operators.multimodal import (
        DecodedImage,
        decoded_image_features,
        encode_image,
    )

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id").isNotNull())
    )

    def synth(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                hid = abs(int(i))
                v = 128 + 2 * ((hid * 11 + 5) % 32)
                img = DecodedImage(
                    16, 16, np.full((16, 16, 3), v, np.uint8).tobytes()
                )
                if hid % 2:
                    payloads.append(
                        encode_image(img, "pjpeg", quality=50, subsample=(2, 2))
                    )
                else:
                    payloads.append(
                        encode_image(img, "pjpeg", quality=50, gray=True)
                    )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    wrapped = docs.mapInPandas(synth, "doc_id bigint, content binary")
    feats = decoded_image_features(wrapped)
    return feats.select(
        "doc_id",
        "width",
        "height",
        "phash64",
        F.col("luma_hist")[8].alias("hist_8"),
        F.col("luma_hist")[9].alias("hist_9"),
        F.col("luma_hist")[10].alias("hist_10"),
        F.col("luma_hist")[11].alias("hist_11"),
    )


@register(
    "decoded_video_check",
    oracle="""
WITH ids AS (
    SELECT doc_id, abs(doc_id) AS hid
    FROM documents WHERE doc_id IS NOT NULL
),
fr AS (SELECT unnest(generate_series(0, 3)) AS k)
SELECT i.doc_id,
       CAST(fr.k AS INT)                       AS frame_idx,
       CAST(4 AS INT)                          AS n_frames,
       CAST(16 AS INT)                         AS width,
       CAST(16 AS INT)                         AS height,
       CAST(10.0 AS DOUBLE)                    AS fps,
       CAST(0 AS BIGINT)                       AS phash64,
       CAST(128 + 2 * ((i.hid * 5 + fr.k * 3) % 32) AS DOUBLE) AS mean_luma
FROM ids i, fr
ORDER BY i.doc_id, frame_idx
""",
)
def decoded_video_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VIDEO container + JPEG decoder's differential oracle gate
    (r13; container rotation widened r14): per doc a 4-frame MJPEG
    video whose frame k is SOLID gray
    v(i, k) = 128 + 2*((|doc_id|*5 + 3k) mod 32) — every v is even, so
    the frame's DC (8*(v-128)) is divisible by the Q50 Annex-K quant
    step 16 and the lossy roundtrip is analytically EXACT: decoded
    luma == v on every pixel. The CONTAINER rotates by |doc_id| mod 3
    between RIFF/AVI (``encode_video_mjpeg`` / ``_parse_avi``),
    ISO-BMFF MP4 (``encode_video_mp4`` / ``_parse_mp4`` — the r14 box
    walk: moov/trak/mdia/stbl sample tables to per-sample byte
    extents), and ANIMATED GIF (``encode_video_gif`` / ``_parse_gif``
    — the lossless palette leg: solid frames are 1-color, fps=10 is
    delay 10cs exactly), so all three container walks + the animation
    compositing path are hash-checked. The production
    ``decoded_video_frame_features`` then emits per-frame rows whose
    mean_luma equals the law, phash64 is 0 (solid frames tie every
    cell to the mean), fps/dims/frame-count pin the container walk.
    The oracle computes all of it straight from the law — the whole
    write-container -> parse-container -> entropy-decode -> IDCT ->
    color-convert -> featurize chain is hash-checked driver evidence
    (exact because mean over 256 pixels divides by a power of two)."""
    from ..operators.multimodal import (
        DecodedImage,
        decoded_video_frame_features,
        encode_video_gif,
        encode_video_mjpeg,
        encode_video_mp4,
    )

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id").isNotNull())
    )

    def synth(it):
        import pandas as pd

        for pdf in it:
            payloads = []
            for i in pdf["doc_id"]:
                hid = abs(int(i))
                frames = [
                    DecodedImage(
                        16, 16,
                        bytes([128 + 2 * ((hid * 5 + k * 3) % 32)]) * 768,
                    )
                    for k in range(4)
                ]
                leg = hid % 3
                if leg == 2:  # lossless palette leg, no quality knob
                    payloads.append(encode_video_gif(frames, fps=10.0))
                else:
                    writer = (
                        encode_video_mp4 if leg else encode_video_mjpeg
                    )
                    payloads.append(writer(frames, fps=10.0, quality=50))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "content": payloads})

    wrapped = docs.mapInPandas(synth, "doc_id bigint, content binary")
    return decoded_video_frame_features(wrapped)


@register(
    "webp_meta_check",
    oracle="""
WITH ids AS (
    SELECT doc_id, abs(doc_id) AS hid
    FROM documents WHERE doc_id IS NOT NULL
)
SELECT doc_id,
       CASE hid % 3 WHEN 0 THEN 'lossless' WHEN 1 THEN 'lossy'
            ELSE 'extended' END AS format,
       CAST(1 + hid % 64 AS INT) AS width,
       CAST(1 + (hid // 7) % 64 AS INT) AS height,
       (hid % 3 <> 1 AND hid % 2 = 1) AS has_alpha,
       (hid % 3 = 2) AS animated,
       CAST(CASE WHEN hid % 3 = 2 THEN 1 + hid % 4 ELSE 1 END AS INT)
           AS n_frames
FROM ids ORDER BY doc_id
""",
)
def webp_meta_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WebP CONTAINER walk's differential oracle gate (r15 verdict
    item 1, the ``mp4_video_meta`` pattern): per doc a WebP container
    rotating |doc_id| mod 3 across the three flavors — simple
    lossless (a VP8L chunk whose 14+14+1+3-bit header is packed BY
    HAND here, independently of the production ``_BitWriter``),
    simple lossy (a VP8 keyframe frame-tag + start code + 14-bit
    dims, the bitstream the stdlib chain can NEVER pixel-decode —
    metadata must not depend on decodability), and extended/animated
    (VP8X flags + 24-bit canvas dims + ANIM + a law-determined run
    of ANMF chunks). Dims/alpha/frame-count all derive from the law
    (w = 1 + hid mod 64, h = 1 + (hid//7) mod 64, alpha = hid odd on
    non-lossy legs, frames = 1 + hid mod 4 when animated); the oracle
    recomputes them in SQL without seeing a container byte, so any
    chunk-walk, bit-unpack, flag, or frame-count asymmetry in
    ``operators/webp.py::webp_meta`` breaks the hash."""
    import struct as _struct

    from ..operators.webp import webp_meta

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id").isNotNull())
    )

    def probe(it):
        import pandas as pd

        def chunk(fourcc, body):
            pad = b"\x00" if len(body) & 1 else b""
            return fourcc + _struct.pack("<I", len(body)) + body + pad

        def riff(chunks):
            body = b"WEBP" + chunks
            return b"RIFF" + _struct.pack("<I", len(body)) + body

        for pdf in it:
            rows = []
            for i in pdf["doc_id"]:
                hid = abs(int(i))
                w = 1 + hid % 64
                h = 1 + (hid // 7) % 64
                alpha = hid % 2 == 1
                leg = hid % 3
                if leg == 0:
                    # VP8L header, hand-packed LSB-first:
                    #   sig / w-1:14 / h-1:14 / alpha:1 / version:3
                    bits = (w - 1) | ((h - 1) << 14) | (int(alpha) << 28)
                    payload = riff(
                        chunk(b"VP8L", b"\x2f" + bits.to_bytes(4, "little"))
                    )
                elif leg == 1:
                    # VP8 keyframe header: 3-byte tag (keyframe|show|
                    # partition size), start code, two 14-bit LE dims
                    tag = (1 << 4) | (77 << 5)
                    body = (
                        tag.to_bytes(4, "little")[:3]
                        + b"\x9d\x01\x2a"
                        + _struct.pack("<HH", w, h)
                    )
                    payload = riff(chunk(b"VP8 ", body))
                else:
                    flags = (0x10 if alpha else 0) | 0x02
                    vp8x = (
                        bytes([flags]) + b"\x00" * 3
                        + (w - 1).to_bytes(3, "little")
                        + (h - 1).to_bytes(3, "little")
                    )
                    chunks = chunk(b"VP8X", vp8x) + chunk(b"ANIM", bytes(6))
                    for _ in range(1 + hid % 4):
                        chunks += chunk(b"ANMF", bytes(16))
                    payload = riff(chunks)
                m = webp_meta(payload)
                rows.append(
                    (
                        int(i), m["format"], m["width"], m["height"],
                        m["has_alpha"], m["animated"], m["n_frames"],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "format", "width", "height", "has_alpha",
                    "animated", "n_frames",
                ],
            )

    return docs.mapInPandas(
        probe,
        "doc_id bigint, format string, width int, height int, "
        "has_alpha boolean, animated boolean, n_frames int",
    )
