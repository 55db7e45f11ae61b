"""Round-15 advice fixes: MP4 leaf-table bounds, per-trak fallback,
rebalance_for_decode materialize contract.

The MP4 fixtures here use an mdat-FIRST layout (ftyp + mdat + moov)
so sample offsets are independent of moov length — that lets a test
splice extra (broken) traks into moov without re-deriving offsets,
which the moov-first builder in test_mp4_decode can't do."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from m2_b3_market_data_pipeline_spark.operators.multimodal import (
    _parse_mp4,
    _parse_mp4_tables,
)
from tests.test_jpeg_decode import _encode_jpeg, _rgb_array, _solid
from tests.test_mp4_decode import _box, _full, _pixels


def _vide_trak(
    samples: list,
    *,
    w: int,
    h: int,
    offsets: list,
    broken: bool = False,
    bad_stts_count: int | None = None,
) -> bytes:
    """One video trak. broken=True omits the sample tables entirely
    (the 'damaged track' case); bad_stts_count forges an stts entry
    count that overruns the box."""
    n = len(samples)
    timescale, delta = 600, 60
    tkhd = _full(
        b"tkhd", 0x000007,
        struct.pack(">IIIII", 0, 0, 1, 0, n * delta) + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", w << 16, h << 16),
    )
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, n * delta)
        + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"t\x00")
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
        + struct.pack(">HH", w, h) + struct.pack(">II", 0x480000, 0x480000)
        + struct.pack(">IH", 0, 1) + b"\x00" * 32 + struct.pack(">Hh", 24, -1)
    )
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + _box(b"jpeg", entry))
    if broken:
        stbl = _box(b"stbl", stsd)  # no stts/stsz/stsc/stco
    else:
        stts_n = 1 if bad_stts_count is None else bad_stts_count
        stts = _full(b"stts", 0, struct.pack(">III", stts_n, n, delta))
        stsc = _full(b"stsc", 0, struct.pack(">IIII", 1, 1, n, 1))
        stsz = _full(
            b"stsz", 0,
            struct.pack(">II", 0, n)
            + b"".join(struct.pack(">I", len(s)) for s in samples),
        )
        stco = _full(
            b"stco", 0,
            struct.pack(">I", len(offsets))
            + b"".join(struct.pack(">I", o) for o in offsets),
        )
        stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", _full(b"vmhd", 1, b"\x00" * 8) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", tkhd + mdia)


def _mdat_first_mp4(samples, *, w, h, extra_traks=(), **trak_kw) -> bytes:
    """ftyp + mdat + moov: absolute sample offsets depend only on
    len(ftyp), so moov content (incl. spliced broken traks) is free to
    vary. One chunk per sample keeps stsc trivial (1 sample/chunk)."""
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    mdat = _box(b"mdat", b"".join(samples))
    offsets, off = [], len(ftyp) + 8
    for s in samples:
        offsets.append(off)
        off += len(s)
    # the trak builder's stsc declares all n samples in chunk 1 and
    # the samples are contiguous in mdat, so one chunk offset suffices
    n = len(samples)
    good = _vide_trak(samples, w=w, h=h, offsets=[offsets[0]], **trak_kw)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, 600, n * 60)
        + struct.pack(">IH", 0x10000, 0x100) + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24 + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + b"".join(extra_traks) + good)
    return ftyp + mdat + moov


def _frames(n=3, w=16, h=16):
    vals = [100 + 20 * k for k in range(n)]
    return vals, [
        _encode_jpeg(_rgb_array(w, h, _solid(v)), luma_q=16, chroma_q=16)
        for k, v in enumerate(vals)
    ]


def test_mdat_first_layout_parses_and_decodes():
    vals, samples = _frames()
    data = _mdat_first_mp4(samples, w=16, h=16)
    info = _parse_mp4_tables(data)
    assert info["n_samples"] == 3
    fps, frames = _parse_mp4(data)
    assert len(frames) == 3
    for v, img in zip(vals, frames):
        px = _pixels(img)
        assert abs(int(px.mean()) - v) <= 3


def test_broken_first_trak_falls_through_to_good_trak():
    vals, samples = _frames()
    broken = _vide_trak(samples, w=16, h=16, offsets=[0], broken=True)
    data = _mdat_first_mp4(samples, w=16, h=16, extra_traks=(broken,))
    info = _parse_mp4_tables(data)
    assert info["n_samples"] == 3
    assert info["width"] == 16 and info["height"] == 16


def test_all_traks_broken_raises_first_error():
    vals, samples = _frames()
    broken = _vide_trak(samples, w=16, h=16, offsets=[0], broken=True)
    ftyp = _box(b"ftyp", b"mp42" + struct.pack(">I", 0) + b"mp42isom")
    moov = _box(b"moov", broken)
    with pytest.raises(ValueError, match="missing sample tables"):
        _parse_mp4_tables(ftyp + moov)


def test_leaf_table_count_overrun_raises():
    # stts declares 1,000,000 entries but the box holds one: must
    # raise instead of silently unpacking bytes from following boxes
    vals, samples = _frames()
    data = _mdat_first_mp4(samples, w=16, h=16, bad_stts_count=1_000_000)
    with pytest.raises(ValueError, match="overrun|malformed"):
        _parse_mp4_tables(data)


def test_rebalance_materialize_preserves_rows(spark):
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        rebalance_for_decode,
    )
    import pyspark.sql.functions as F

    df = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 37 == 0,
               F.repeat(F.lit("x"), 5000).cast("binary"))
        .otherwise(F.repeat(F.lit("y"), 10).cast("binary"))
        .alias("content"),
    )
    out = rebalance_for_decode(
        df, heavy_bytes=1000, heavy_partitions=4, materialize=True
    )
    assert out.count() == 200
    assert sorted(r.doc_id for r in out.collect()) == list(range(200))
