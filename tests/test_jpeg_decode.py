"""Round-13 baseline JPEG decode: pure-stdlib T.81 sequential DCT.

The fixture writer below is an INDEPENDENT baseline JPEG encoder
(never imported by the code under test), carrying its own zigzag
table (derived from the T.81 Figure 5 matrix, not the module's flat
literal), its own DCT basis construction, and its own canonical
Huffman builder — so a transposition or symmetric bug in the decoder
breaks roundtrip instead of cancelling out. Analytic anchors: a solid
gray image quantizes to a DC-only stream whose reconstruction is
EXACT (DC = 8*(v-128), divisible by the quant step), giving
pixel-exact assertions with no tolerance at all.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

# ---------------------------------------------------------------------------
# independent zigzag: the T.81 Figure 5 matrix (Z[r][c] = stream
# position of coefficient (r, c)), inverted into stream->row-major
# ---------------------------------------------------------------------------

_ZMAT = (
    (0, 1, 5, 6, 14, 15, 27, 28),
    (2, 4, 7, 13, 16, 26, 29, 42),
    (3, 8, 12, 17, 25, 30, 41, 43),
    (9, 11, 18, 24, 31, 40, 44, 53),
    (10, 19, 23, 32, 39, 45, 52, 54),
    (20, 22, 33, 38, 46, 51, 55, 60),
    (21, 34, 37, 47, 50, 56, 59, 61),
    (35, 36, 48, 49, 57, 58, 62, 63),
)


def _zigzag_order() -> list[int]:
    order = [0] * 64
    for r in range(8):
        for c in range(8):
            order[_ZMAT[r][c]] = r * 8 + c
    return order


_ORDER = _zigzag_order()  # stream position k -> row-major index


def _dct_basis() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_A = _dct_basis()


def _category(v: int) -> int:
    t, a = 0, abs(int(v))
    while a:
        t += 1
        a >>= 1
    return t


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, val: int, nbits: int) -> None:
        for i in reversed(range(nbits)):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def marker(self, m: int) -> None:
        self.align()
        self.buf += bytes([0xFF, m])


def _canonical_codes(symbol_lengths: list[tuple[int, int]]):
    """Canonical Huffman assignment from (symbol, length) pairs.
    Returns ({symbol: (length, code)}, counts_by_length, symbols)."""
    ordered = sorted(symbol_lengths, key=lambda sl: sl[1])
    codes = {}
    counts = [0] * 16
    symbols = []
    code = 0
    last_len = ordered[0][1] if ordered else 0
    for sym, length in ordered:
        code <<= length - last_len
        codes[sym] = (length, code)
        counts[length - 1] += 1
        symbols.append(sym)
        code += 1
        last_len = length
    return codes, counts, symbols


_DC_LENGTHS = [(0, 2), (1, 3), (2, 3), (3, 4), (4, 4), (5, 4),
               (6, 5), (7, 5), (8, 5), (9, 6), (10, 6), (11, 6)]


def _ac_lengths(used: list[int]) -> list[tuple[int, int]]:
    """Frequency-tiered lengths for the AC symbols actually emitted:
    top 4 at 4 bits, next 12 at 8 bits, the rest at 12 bits (Kraft
    sum <= 0.25 + 0.047 + 240/4096 < 1 always)."""
    out = []
    for i, sym in enumerate(used):
        out.append((sym, 4 if i < 4 else (8 if i < 16 else 12)))
    return out


def _encode_jpeg(
    rgb: np.ndarray,
    *,
    luma_q: int = 16,
    chroma_q: int = 16,
    subsample: tuple[int, int] = (1, 1),
    gray: bool = False,
    restart: int = 0,
    sof_marker: int = 0xC0,
    precision: int = 8,
) -> bytes:
    h, w = rgb.shape[:2]
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    sh, sv = subsample

    def _pad_to(plane: np.ndarray, ph: int, pw: int) -> np.ndarray:
        return np.pad(
            plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    def _downsample(plane: np.ndarray, fh: int, fv: int) -> np.ndarray:
        if fh == 1 and fv == 1:
            return plane
        ph = -(-plane.shape[0] // fv) * fv
        pw = -(-plane.shape[1] // fh) * fh
        p = _pad_to(plane, ph, pw)
        return p.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))

    if gray:
        comps = [(1, 1, 1, y, 0)]  # (id, h, v, plane, tq)
    else:
        comps = [
            (1, sh, sv, y, 0),
            (2, 1, 1, _downsample(cb, sh, sv), 1),
            (3, 1, 1, _downsample(cr, sh, sv), 1),
        ]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qzz = {0: np.full(64, luma_q, dtype=np.int64),
           1: np.full(64, chroma_q, dtype=np.int64)}
    qrm = {}
    for tq, zz in qzz.items():
        rm = np.zeros(64, dtype=np.float64)
        rm[np.asarray(_ORDER)] = zz
        qrm[tq] = rm.reshape(8, 8)

    # quantized zigzag blocks in interleaved MCU emission order
    padded = [
        _pad_to(plane, mcuy * v * 8, mcux * hh * 8)
        for (_cid, hh, v, plane, _tq) in comps
    ]
    stream: list[tuple[int, np.ndarray]] = []  # (comp_idx, zz64) per block
    per_mcu = []
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        mcu_blocks = []
        for ci, (_cid, hh, v, _plane, tq) in enumerate(comps):
            for by in range(v):
                for bx in range(hh):
                    y0, x0 = (my * v + by) * 8, (mx * hh + bx) * 8
                    block = padded[ci][y0 : y0 + 8, x0 : x0 + 8] - 128.0
                    coeff = _A @ block @ _A.T
                    zrm = np.round(coeff / qrm[tq]).astype(np.int64)
                    mcu_blocks.append((ci, zrm.flatten()[np.asarray(_ORDER)]))
        per_mcu.append(mcu_blocks)
        stream.extend(mcu_blocks)

    # tokenize (mirrors restart-interval DC resets)
    ncomp = len(comps)
    toks: list[tuple] = []  # ('rst', n) | ('dc', tid, t, v) | ('ac', tid, sym, s, v)
    dc_freq: dict[int, dict[int, int]] = {0: {}, 1: {}}
    ac_freq: dict[int, dict[int, int]] = {0: {}, 1: {}}
    preds = [0] * ncomp
    rstn = 0
    for m, mcu_blocks in enumerate(per_mcu):
        if restart and m and m % restart == 0:
            toks.append(("rst", rstn))
            rstn = (rstn + 1) & 7
            preds = [0] * ncomp
        for ci, zz in mcu_blocks:
            tid = 0 if ci == 0 else 1
            diff = int(zz[0]) - preds[ci]
            preds[ci] = int(zz[0])
            t = _category(diff)
            dc_freq[tid][t] = dc_freq[tid].get(t, 0) + 1
            toks.append(("dc", tid, t, diff))
            run = 0
            for k in range(1, 64):
                v = int(zz[k])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:
                    ac_freq[tid][0xF0] = ac_freq[tid].get(0xF0, 0) + 1
                    toks.append(("ac", tid, 0xF0, 0, 0))
                    run -= 16
                s = _category(v)
                sym = (run << 4) | s
                ac_freq[tid][sym] = ac_freq[tid].get(sym, 0) + 1
                toks.append(("ac", tid, sym, s, v))
                run = 0
            if run:
                ac_freq[tid][0x00] = ac_freq[tid].get(0x00, 0) + 1
                toks.append(("ac", tid, 0x00, 0, 0))

    table_ids = [0] if gray else [0, 1]
    dc_tables = {}
    ac_tables = {}
    dht = bytearray()
    for tid in table_ids:
        dc_codes, dc_counts, dc_syms = _canonical_codes(_DC_LENGTHS)
        used = sorted(ac_freq[tid], key=lambda s: (-ac_freq[tid][s], s))
        if not used:
            used = [0x00]
        ac_codes, ac_counts, ac_syms = _canonical_codes(_ac_lengths(used))
        dc_tables[tid] = dc_codes
        ac_tables[tid] = ac_codes
        for cls, counts, syms in ((0, dc_counts, dc_syms), (1, ac_counts, ac_syms)):
            seg = bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms)
            dht += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg

    wtr = _BitWriter()
    for tok in toks:
        if tok[0] == "rst":
            wtr.marker(0xD0 + tok[1])
            continue
        _kind, tid, sym = tok[0], tok[1], tok[2]
        table = dc_tables[tid] if tok[0] == "dc" else ac_tables[tid]
        if tok[0] == "dc":
            t, v = tok[2], tok[3]
            length, code = table[t]
            wtr.put(code, length)
            if t:
                wtr.put(v if v >= 0 else v + (1 << t) - 1, t)
        else:
            _sym, s, v = tok[2], tok[3], tok[4]
            length, code = table[_sym]
            wtr.put(code, length)
            if s:
                wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
    wtr.align()

    out = bytearray(b"\xff\xd8")
    for tq in table_ids:
        out += b"\xff\xdb" + struct.pack(">H", 2 + 65) + bytes([tq])
        out += bytes(int(x) for x in qzz[tq])
    sof = bytearray([precision]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for cid, hh, v, _plane, tq in comps:
        sof += bytes([cid, (hh << 4) | v, tq])
    out += bytes([0xFF, sof_marker]) + struct.pack(">H", 2 + len(sof)) + sof
    out += dht
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", restart)
    sos = bytearray([len(comps)])
    for ci, (cid, _hh, _v, _plane, _tq) in enumerate(comps):
        tid = 0 if ci == 0 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += wtr.buf
    out += b"\xff\xd9"
    return bytes(out)


def _solid(v: int):
    def px(_x, _y):
        return (v, v, v)

    return px


def _smooth(x, y):
    # slowly-varying so 4:2:0 chroma box-mean + replication stays close
    return (80 + x * 2, 100 + y * 2, 120 + ((x + y) // 2))


def _rgb_array(w, h, fn):
    a = np.zeros((h, w, 3), dtype=np.uint8)
    for yy in range(h):
        for xx in range(w):
            a[yy, xx] = fn(xx, yy)
    return a


def _pixels(img) -> np.ndarray:
    return np.frombuffer(img.pixels, dtype=np.uint8).reshape(
        img.height, img.width, 3
    )


# ---------------------------------------------------------------------------
# decoder tests
# ---------------------------------------------------------------------------


def test_jpeg_zigzag_matches_spec_matrix():
    """The module's flat zigzag literal equals the independent
    inversion of the T.81 Figure 5 matrix."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _JPEG_ZIGZAG

    assert list(_JPEG_ZIGZAG) == _ORDER


def test_jpeg_solid_gray_roundtrip_pixel_exact():
    """v=160 gray: DC = 8*(160-128) = 256, exactly divisible by the
    quant step 16; chroma is all-zero after level shift. The decode
    must therefore be EXACT — zero tolerance."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_jpeg,
        decode_image,
    )

    rgb = _rgb_array(16, 16, _solid(160))
    for sub in ((1, 1), (2, 2)):
        data = _encode_jpeg(rgb, subsample=sub, luma_q=16, chroma_q=17)
        img = _decode_jpeg(data)
        assert (img.width, img.height) == (16, 16)
        assert np.array_equal(_pixels(img), rgb), f"subsample {sub}"
    # and via the chain dispatcher
    img = decode_image(_encode_jpeg(rgb))
    assert np.array_equal(_pixels(img), rgb)


def test_jpeg_gradient_roundtrip_close_444():
    """Smooth gradient at quant=1 (near-lossless): per-pixel error is
    bounded by coefficient rounding only."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(32, 24, _smooth)
    img = _decode_jpeg(_encode_jpeg(rgb, luma_q=1, chroma_q=1))
    got = _pixels(img).astype(np.int64)
    err = np.abs(got - rgb.astype(np.int64))
    assert err.max() <= 8, f"max err {err.max()}"
    assert err.mean() <= 2.0, f"mean err {err.mean()}"


def test_jpeg_420_subsampling_close():
    """4:2:0: chroma is box-downsampled at encode and replicated at
    decode — a slowly-varying image stays within a small bound."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(32, 32, _smooth)
    img = _decode_jpeg(_encode_jpeg(rgb, subsample=(2, 2), luma_q=2, chroma_q=2))
    got = _pixels(img).astype(np.int64)
    err = np.abs(got - rgb.astype(np.int64))
    assert err.max() <= 24, f"max err {err.max()}"
    assert err.mean() <= 4.0, f"mean err {err.mean()}"


def test_jpeg_odd_dimensions_and_422():
    """Non-multiple-of-8 dims exercise the pad-then-crop path in
    every sampling layout."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(13, 9, _smooth)
    for sub in ((1, 1), (2, 1), (2, 2)):
        img = _decode_jpeg(_encode_jpeg(rgb, subsample=sub, luma_q=2, chroma_q=2))
        assert (img.width, img.height) == (13, 9), f"subsample {sub}"
        err = np.abs(_pixels(img).astype(np.int64) - rgb.astype(np.int64))
        assert err.max() <= 24, f"subsample {sub}: max err {err.max()}"


def test_jpeg_grayscale_single_component():
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(16, 8, _solid(160))
    img = _decode_jpeg(_encode_jpeg(rgb, gray=True, luma_q=16))
    assert np.array_equal(_pixels(img), rgb)  # exact, same DC argument


def test_jpeg_restart_intervals_match_no_dri():
    """DRI restart markers (with DC-predictor resets and RSTn cycling)
    must decode to the identical pixels of the marker-free stream."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(40, 24, _smooth)  # 5x3 = 15 MCUs at 4:4:4
    plain = _decode_jpeg(_encode_jpeg(rgb, luma_q=2, chroma_q=2))
    with_dri = _decode_jpeg(_encode_jpeg(rgb, luma_q=2, chroma_q=2, restart=2))
    assert plain.pixels == with_dri.pixels


def test_jpeg_extended_sequential_sof1_accepted():
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(16, 16, _solid(160))
    img = _decode_jpeg(_encode_jpeg(rgb, sof_marker=0xC1))
    assert np.array_equal(_pixels(img), rgb)


def test_jpeg_fail_loud_variants():
    """Progressive / 12-bit / truncated / non-JPEG raise ValueError —
    the quarantine net's contract (never a raw struct/KeyError)."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import _decode_jpeg

    rgb = _rgb_array(16, 16, _smooth)
    good = _encode_jpeg(rgb)
    with pytest.raises(ValueError, match="progressive"):
        _decode_jpeg(_encode_jpeg(rgb, sof_marker=0xC2))
    with pytest.raises(ValueError, match="arithmetic"):
        _decode_jpeg(_encode_jpeg(rgb, sof_marker=0xC9))
    with pytest.raises(ValueError, match="precision"):
        _decode_jpeg(_encode_jpeg(rgb, precision=12))
    with pytest.raises(ValueError, match="SOI"):
        _decode_jpeg(b"\x00\x00junk")
    with pytest.raises(ValueError):
        _decode_jpeg(good[: len(good) // 2])  # truncated entropy data
    # SOS before any SOF
    hdrless = b"\xff\xd8" + good[good.index(b"\xff\xda") :]
    with pytest.raises(ValueError, match="SOF"):
        _decode_jpeg(hdrless)


def test_decoded_image_features_jpeg_matches_bmp_twin(spark):
    """End-to-end through Spark mapInPandas: an exact-roundtrip JPEG
    (solid gray, DC divisible by the quant step) produces IDENTICAL
    decoded-domain features to the BMP twin, and an undecodable
    JPEG-magic payload is quarantined, not fatal."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        decoded_image_features,
    )
    from tests.test_round12 import _make_bmp

    rgb_fn = _solid(160)
    jpeg = _encode_jpeg(_rgb_array(16, 12, rgb_fn))
    bmp = _make_bmp(16, 12, rgb_fn)
    rows = [(1, jpeg), (2, bmp), (3, b"\xff\xd8\xff\xe0truncated-junk")]
    df = spark.createDataFrame(rows, "doc_id bigint, content binary")
    got = {r["doc_id"]: r for r in decoded_image_features(df).collect()}
    assert set(got) == {1, 2}
    assert got[1]["phash64"] == got[2]["phash64"]
    assert got[1]["luma_hist"] == got[2]["luma_hist"]
    assert (got[1]["width"], got[1]["height"]) == (16, 12)
