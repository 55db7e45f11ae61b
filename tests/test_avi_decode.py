"""Round-13 video leg: stdlib RIFF/AVI container parse + per-frame
decoded features. The fixture writer below builds minimal-but-valid
AVI files (hdrl with avih + a 'vids' strl, movi with 00dc/00db
chunks) independently of the parser under test; MJPEG frames come
from the independent JPEG encoder in tests/test_jpeg_decode.py, so
the whole chain — container walk, per-frame JPEG decode, DIB rows —
is cross-checked against known pixels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tests.test_jpeg_decode import _encode_jpeg, _rgb_array, _smooth, _solid


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(subtype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", subtype + body)


def _make_avi(
    frames: list[bytes],
    *,
    width: int,
    height: int,
    compressed: bool = True,
    bpp: int = 24,
    usec_per_frame: int = 100_000,
    rec_wrap: bool = False,
) -> bytes:
    avih = struct.pack(
        "<IIIIIIIIII4I",
        usec_per_frame, 0, 0, 0, len(frames), 0, 1, 0, width, height,
        0, 0, 0, 0,
    )
    handler = b"MJPG" if compressed else b"DIB "
    strh = (
        b"vids" + handler
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0, len(frames), 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    compression = struct.unpack("<I", b"MJPG")[0] if compressed else 0
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, width, height, 1, bpp, compression, 0, 0, 0, 0, 0,
    )
    strl = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    fcc = b"00dc" if compressed else b"00db"
    movi_body = b"".join(_chunk(fcc, f) for f in frames)
    if rec_wrap:
        movi_body = _list(b"rec ", movi_body)
    movi = _list(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _dib_frame(rgb: np.ndarray) -> bytes:
    """Bottom-up BGR rows padded to 4 bytes — the '00db' payload."""
    h, w = rgb.shape[:2]
    row_size = (w * 3 + 3) & ~3
    out = bytearray()
    for y in reversed(range(h)):
        row = rgb[y, :, ::-1].tobytes()
        out += row + b"\x00" * (row_size - len(row))
    return bytes(out)


def test_avi_mjpeg_frames_decode_to_jpeg_pixels():
    """Container transparency: every frame parsed out of the AVI
    decodes to EXACTLY the pixels of decoding that JPEG directly."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_jpeg,
        _parse_avi,
    )

    rgbs = [
        _rgb_array(16, 12, _smooth),
        _rgb_array(16, 12, _solid(160)),
        _rgb_array(16, 12, lambda x, y: (y * 3, x * 4, 200)),
    ]
    jpegs = [_encode_jpeg(a, luma_q=2, chroma_q=2) for a in rgbs]
    fps, frames = _parse_avi(_make_avi(jpegs, width=16, height=12))
    assert fps == pytest.approx(10.0)
    assert len(frames) == 3
    for frame, jpeg in zip(frames, jpegs):
        direct = _decode_jpeg(jpeg)
        assert (frame.width, frame.height) == (16, 12)
        assert frame.pixels == direct.pixels


def test_avi_dib_frames_exact_pixels():
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _parse_avi

    rgbs = [_rgb_array(9, 7, _smooth), _rgb_array(9, 7, _solid(77))]
    data = _make_avi(
        [_dib_frame(a) for a in rgbs], width=9, height=7, compressed=False
    )
    _fps, frames = _parse_avi(data)
    assert len(frames) == 2
    for frame, rgb in zip(frames, rgbs):
        got = np.frombuffer(frame.pixels, dtype=np.uint8).reshape(7, 9, 3)
        assert np.array_equal(got, rgb)


def test_avi_rec_list_wrapping_descended():
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _parse_avi

    jpeg = _encode_jpeg(_rgb_array(16, 8, _smooth), luma_q=2, chroma_q=2)
    plain = _parse_avi(_make_avi([jpeg, jpeg], width=16, height=8))
    wrapped = _parse_avi(
        _make_avi([jpeg, jpeg], width=16, height=8, rec_wrap=True)
    )
    assert [f.pixels for f in plain[1]] == [f.pixels for f in wrapped[1]]


def test_avi_fail_loud_variants():
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _parse_avi

    with pytest.raises(ValueError, match="RIFF/AVI"):
        _parse_avi(b"RIFF\x04\x00\x00\x00WAVE")  # a WAV, not an AVI
    with pytest.raises(ValueError, match="no decodable"):
        _parse_avi(_make_avi([], width=4, height=4))
    # an unsupported codec bitstream in 00dc (not JPEG magic)
    with pytest.raises((ValueError, NotImplementedError)):
        _parse_avi(_make_avi([b"\x00\x00\x00XVID-bitstream"], width=4, height=4))
    # 8-bit palette DIB frames: fail loud
    with pytest.raises(ValueError, match="24-bit"):
        _parse_avi(
            _make_avi([b"\x00" * 64], width=4, height=4, compressed=False, bpp=8)
        )


def test_decoded_video_frame_features_end_to_end(spark):
    """Through Spark mapInPandas: one AVI row fans out to n_frames
    feature rows; an identical frame shipped as MJPEG-in-AVI and as a
    solo JPEG image produces the SAME phash (solid gray roundtrips
    exactly); junk payloads are quarantined, not fatal."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        decoded_image_features,
        decoded_video_frame_features,
    )

    gray = _rgb_array(16, 12, _solid(160))
    grad = _rgb_array(16, 12, _smooth)
    jpeg_gray = _encode_jpeg(gray)
    jpeg_grad = _encode_jpeg(grad, luma_q=2, chroma_q=2)
    avi = _make_avi([jpeg_gray, jpeg_grad], width=16, height=12)
    rows = [(1, avi), (2, b"RIFF junk that is not an AVI"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = decoded_video_frame_features(df).orderBy("frame_idx").collect()
    assert [r["doc_id"] for r in got] == [1, 1]
    assert [r["frame_idx"] for r in got] == [0, 1]
    assert all(r["n_frames"] == 2 for r in got)
    assert all((r["width"], r["height"]) == (16, 12) for r in got)
    assert all(r["fps"] == pytest.approx(10.0) for r in got)

    img_df = spark.createDataFrame(
        [(7, bytes(jpeg_gray))], "doc_id bigint, content binary"
    )
    solo = decoded_image_features(img_df).collect()[0]
    assert got[0]["phash64"] == solo["phash64"]
