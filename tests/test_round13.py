"""Round-13 pins: stdlib PNG decode (r12 verdict item 2), the r12
advice closures (WAV truncated-fmt quarantine, PIL-failure
fallthrough, single luma pass), and the cross-seed fixture generator
(r12 verdict item 1)."""

from __future__ import annotations

import struct
import sys
import zlib

import pytest


# ---------------------------------------------------------------------------
# fixture writers (pure stdlib, in-test — never decoded by the code
# path that wrote them)
# ---------------------------------------------------------------------------


def _chunk(cid: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + cid
        + body
        + struct.pack(">I", zlib.crc32(cid + body) & 0xFFFFFFFF)
    )


def _make_png(width, height, pixel, *, rgba=False, filters=None, depth=8,
              ctype=None, interlace=0):
    """Minimal PNG writer: ``pixel`` is (x, y) -> (r, g, b[, a]) with
    y=0 the TOP row. ``filters`` picks the per-row filter type
    (default cycles 0..4 so every defilter path is exercised)."""
    bpp = 4 if rgba else 3
    if ctype is None:
        ctype = 6 if rgba else 2
    raw = bytearray()
    prior = [0] * (width * bpp)
    for y in range(height):
        line = []
        for x in range(width):
            px = pixel(x, y)
            line.extend(px[:bpp] if len(px) >= bpp else list(px) + [255])
        ftype = (filters[y % len(filters)] if filters else y % 5)
        filt = [0] * len(line)
        for i in range(len(line)):
            a = line[i - bpp] if i >= bpp else 0
            b = prior[i]
            c = prior[i - bpp] if i >= bpp else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[i] = (line[i] - pred) & 0xFF
        raw.append(ftype)
        raw.extend(filt)
        prior = line
    ihdr = struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def _grad(x, y):
    return ((x * 17) % 256, (y * 23) % 256, (x * 5 + y * 7) % 256)


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------


def test_png_decode_exact_pixels_all_filters():
    """The stdlib PNG decoder recovers EXACT RGB pixels through all
    five row filters (None/Sub/Up/Average/Paeth), checked against the
    BMP twin of the same image — two independent encoders, one pixel
    truth."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_bmp,
        _decode_png,
        decode_image,
    )
    from tests.test_round12 import _make_bmp

    w, h = 9, 10  # h=10 cycles filters 0..4 twice
    png = _make_png(w, h, _grad)
    bmp = _make_bmp(w, h, _grad)
    via_chain = decode_image(png)  # in-container: PIL absent -> stdlib
    direct = _decode_png(png)
    ref = _decode_bmp(bmp)
    assert (via_chain.width, via_chain.height) == (w, h)
    assert via_chain.pixels == direct.pixels == ref.pixels

    for ftype in range(5):  # each filter alone, too
        img = _decode_png(_make_png(w, h, _grad, filters=[ftype]))
        assert img.pixels == ref.pixels, f"filter {ftype} mismatch"


def test_png_rgba_drops_alpha_to_rgb():
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_png

    def px(x, y):
        r, g, b = _grad(x, y)
        return (r, g, b, (x + y) % 256)  # varying alpha, must be ignored

    rgb = _decode_png(_make_png(6, 5, _grad))
    rgba = _decode_png(_make_png(6, 5, px, rgba=True))
    assert rgba.pixels == rgb.pixels


def test_png_fail_loud_variants():
    """Interlaced / 16-bit / palette / truncated / corrupt payloads
    raise ValueError — never guessed pixels, and never a non-ValueError
    escaping the featurizers' quarantine net."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_png

    good = _make_png(4, 4, _grad)
    # Adam7 became a real decode leg late in r14 — a header claiming
    # interlace=1 over sequentially-laid-out scanlines (what this
    # helper emits) now fails loud mid-pass (a data byte lands in a
    # filter-type slot, or the stream runs short), never guesses
    with pytest.raises(ValueError):
        _decode_png(_make_png(4, 4, _grad, interlace=1))
    with pytest.raises(ValueError, match="unsupported PNG scheme"):
        _decode_png(_make_png(4, 4, _grad, interlace=2))
    # depth 16 became a real leg in r14 (a 16-claiming header over
    # 8-bit-sized data now fails as truncated); illegal depths still
    # fail on the depth check itself
    with pytest.raises(ValueError, match="truncated"):
        _decode_png(_make_png(4, 4, _grad, depth=16))
    with pytest.raises(ValueError, match="bad PNG depth"):
        _decode_png(_make_png(4, 4, _grad, depth=12))
    # ctype=3 became a real decode leg in r14; a palette stream
    # WITHOUT its PLTE still fails loud, and unknown color types too
    with pytest.raises(ValueError, match="PLTE"):
        _decode_png(_make_png(4, 4, _grad, ctype=3))
    with pytest.raises(ValueError, match="color type"):
        _decode_png(_make_png(4, 4, _grad, ctype=7))
    with pytest.raises(ValueError):
        _decode_png(good[:40])  # truncated mid-chunk
    bad = bytearray(good)
    bad[41] ^= 0xFF  # corrupt the deflate stream
    with pytest.raises(ValueError):
        _decode_png(bytes(bad))


def test_decoded_image_features_png_matches_bmp_twin(spark):
    """End-to-end through Spark mapInPandas: the SAME image shipped as
    PNG and as BMP produces identical decoded-domain features (width,
    height, phash64, luma_hist) — the decode chain is
    format-transparent above the parser."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        decoded_image_features,
    )
    from tests.test_round12 import _make_bmp

    rows = [(1, _make_png(16, 12, _grad)), (2, _make_bmp(16, 12, _grad)),
            (3, b"\x89PNG\r\n\x1a\njunkjunkjunk")]  # undecodable: skipped
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r["doc_id"]: r for r in decoded_image_features(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["phash64"] == got[2]["phash64"]
    assert got[1]["luma_hist"] == got[2]["luma_hist"]
    assert (got[1]["width"], got[1]["height"]) == (16, 12)


# ---------------------------------------------------------------------------
# r12 advice closures
# ---------------------------------------------------------------------------


def test_wav_truncated_fmt_raises_valueerror_and_is_quarantined(spark):
    """A RIFF/WAVE payload whose fmt chunk body is < 16 bytes raises
    ValueError (not struct.error), so one malformed payload skips —
    it must NOT fail the whole decoded_frame_energy job (r12 advice,
    medium)."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_wav,
        decoded_frame_energy,
    )
    from tests.test_round12 import _make_wav

    short_fmt = struct.pack("<HH", 1, 1)  # 4-byte fmt body
    data = b"\x00" * 32
    body = (
        b"fmt " + struct.pack("<I", len(short_fmt)) + short_fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    bad = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="truncated WAV fmt"):
        _decode_wav(bad)

    good = _make_wav([100, -100] * 64)
    df = spark.createDataFrame(
        [(1, good), (2, bad)], "doc_id bigint, content binary"
    )
    out = decoded_frame_energy(df).collect()  # must not raise
    assert {r["doc_id"] for r in out} == {1}


def test_pil_decode_failure_falls_through_to_stdlib(monkeypatch):
    """With a PIL whose Image.open always fails (the
    UnidentifiedImageError shape — an OSError, not a ValueError), BMP
    and PNG payloads still reach the stdlib parsers, and undecodable
    payloads still raise NotImplementedError (r12 advice, low)."""
    import types

    from m2_b3_market_data_pipeline_spark.operators import multimodal
    from tests.test_round12 import _make_bmp

    class _Img:
        @staticmethod
        def open(_fp):
            raise OSError("cannot identify image file")

    fake = types.ModuleType("PIL")
    fake.Image = _Img
    monkeypatch.setitem(sys.modules, "PIL", fake)

    bmp = _make_bmp(5, 4, _grad)
    png = _make_png(5, 4, _grad)
    assert multimodal.decode_image(bmp).pixels == multimodal.decode_image(png).pixels
    with pytest.raises(NotImplementedError):
        # lossy-VP8 WebP: a real format whose PIXEL decode no stdlib
        # path serves even after the r15 WebP leg (webp_meta reads its
        # header; VP8L is the decodable flavor) — a WELL-FORMED
        # container so the fall-through reaches the documented
        # NotImplementedError, not the malformed-input ValueError
        body = b"VP8 " + struct.pack("<I", 10) + bytes(10)
        multimodal.decode_image(
            b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        )


def test_phash_and_histogram_accept_shared_luma():
    """The shared-luma fast path is value-identical to the recompute
    path (r12 advice, low)."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_png,
        luma_histogram,
        pixel_phash,
    )

    img = _decode_png(_make_png(16, 16, _grad))
    luma = img.luma()
    assert pixel_phash(img, luma=luma) == pixel_phash(img)
    assert luma_histogram(img, luma=luma) == luma_histogram(img)


# ---------------------------------------------------------------------------
# cross-seed fixture generator (r12 verdict item 1)
# ---------------------------------------------------------------------------


def test_seed_fixture_schema_and_integrity(tmp_path):
    """The seed-7 twin is physically schema-identical to the driver
    fixture (arrow types, field order), row-count-identical, deterministic,
    referentially intact, and carries the planted dedup/ANN structure
    the non-trivial query paths need."""
    import numpy as np
    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo/tools")
    from make_seed_data import TABLES, build

    src = "/root/testdata/sf0.001"
    dst = str(tmp_path / "seed7")
    build(src, dst, 7)
    for t in TABLES:
        ref = pq.read_table(f"{src}/{t}.parquet")
        got = pq.read_table(f"{dst}/{t}.parquet")
        assert got.schema.remove_metadata() == ref.schema.remove_metadata(), t
        assert got.num_rows == ref.num_rows, t

    # determinism: same (src, seed) -> byte-identical parquet
    dst2 = str(tmp_path / "seed7b")
    build(src, dst2, 7)
    a = (tmp_path / "seed7" / "lineitem.parquet").read_bytes()
    b = (tmp_path / "seed7b" / "lineitem.parquet").read_bytes()
    assert a == b

    # a different seed actually changes the data
    dst3 = str(tmp_path / "seed9")
    build(src, dst3, 9)
    assert (tmp_path / "seed9" / "lineitem.parquet").read_bytes() != a

    # referential integrity
    li = pq.read_table(f"{dst}/lineitem.parquet")
    orders = pq.read_table(f"{dst}/orders.parquet")
    assert set(li["l_orderkey"].to_pylist()) <= set(orders["o_orderkey"].to_pylist())

    # planted structure: near-dup documents, unit-norm embeddings
    docs = pq.read_table(f"{dst}/documents.parquet").to_pydict()
    texts = docs["text"]
    assert all(n == len(t) for n, t in zip(docs["n_chars"], texts))

    def shingles(t):
        w = t.split()
        return {tuple(w[i : i + 5]) for i in range(len(w) - 4)}

    near = 0
    ss = [shingles(t) for t in texts]
    for i in range(len(ss)):
        for j in range(i + 1, len(ss)):
            inter = len(ss[i] & ss[j])
            if inter and inter / len(ss[i] | ss[j]) > 0.5:
                near += 1
    assert near >= 3  # dedup queries exercise a non-trivial path

    emb = pq.read_table(f"{dst}/embeddings.parquet").to_pydict()
    v = np.array(emb["embedding"], dtype=np.float64)
    assert np.allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    sims = vn @ vn.T
    np.fill_diagonal(sims, 0)
    assert sims.max() > 0.9  # planted ANN twins exist


# ---------------------------------------------------------------------------
# RocksDB state store default (r12 verdict item 4)
# ---------------------------------------------------------------------------


def test_session_defaults_to_rocksdb_state_store(spark):
    """Built-in stateful streaming ops (dropDuplicates, stream-stream
    joins, windowed aggs) run on RocksDB by default: the in-heap
    HDFS-backed store keeps every key in executor heap, which 100 TB
    dedup/join state will not fit. The whole streaming suite runs
    under this conf (session-scoped fixture)."""
    assert "RocksDBStateStoreProvider" in spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass"
    )


def test_existing_checkpoint_pins_its_provider(spark, tmp_path):
    """Checkpoint-compat contract (documented in session.py): a
    checkpoint created under one provider KEEPS that provider on
    restart — Spark restores the state-store conf from the offset log,
    so flipping the session default cannot corrupt existing state.
    Pinned by: start under HDFSBacked, restart under the RocksDB
    session default, results stay exact and the state dir never grows
    RocksDB artifacts."""
    import os

    from pyspark.sql import functions as F

    from m2_b3_market_data_pipeline_spark.streaming.joins import dedup_events

    hdfs = (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    )
    rocks = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    rows1 = [(i, "click") for i in range(20)]
    rows2 = [(i, "view") for i in range(15, 30)]  # 5 replayed ids
    df1 = spark.createDataFrame(rows1, "event_id bigint, event_type string")
    df2 = spark.createDataFrame(rows2, "event_id bigint, event_type string")
    updates, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    df1.write.parquet(f"{updates}/b0")

    def drain():
        stream = (
            spark.readStream.schema(df1.schema)
            .option("recursiveFileLookup", "true")
            .parquet(updates)
        )
        q = (
            dedup_events(stream)
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination(120)

    spark.conf.set("spark.sql.streaming.stateStore.providerClass", hdfs)
    try:
        drain()
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", rocks)

    df2.write.parquet(f"{updates}/b1")
    drain()  # session default is RocksDB; checkpoint must stay HDFSBacked

    got = spark.read.parquet(out)
    assert got.count() == 30  # every event_id exactly once
    assert got.filter(F.col("event_id").between(15, 19)).count() == 5
    rocks_files = [
        f
        for root, _, files in os.walk(f"{ckpt}/state")
        for f in files
        if f.endswith((".zip", ".changelog")) or "rocksdb" in f.lower()
    ]
    assert rocks_files == []  # provider pinned by the checkpoint, not the session
