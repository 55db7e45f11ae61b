"""Round-13: the image WRITE path (encode_image) and the decode
family's differential oracle gate (decoded_phash_check)."""

from __future__ import annotations

import numpy as np
import pytest


def _raster(doc_id: int):
    from m2_b3_market_data_pipeline_spark.operators.multimodal import DecodedImage

    xg, yg = np.meshgrid(np.arange(16), np.arange(16))
    v = ((abs(doc_id) * 31 + 7 * xg + 13 * yg) % 256).astype(np.uint8)
    return DecodedImage(16, 16, np.repeat(v[:, :, None], 3, axis=2).tobytes())


def test_encode_image_roundtrips_all_formats():
    """encode_image -> decode_image is pixel-exact for every lossless
    format it writes, including non-multiple-of-4 widths (BMP row
    padding) and non-square rasters."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        DecodedImage,
        decode_image,
        encode_image,
    )

    for w, h in ((16, 16), (9, 7), (5, 12)):
        rng = np.random.default_rng(w * 100 + h)
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        img = DecodedImage(w, h, rgb.tobytes())
        for fmt in ("bmp", "ppm", "png"):
            back = decode_image(encode_image(img, fmt))
            assert (back.width, back.height) == (w, h), fmt
            assert back.pixels == img.pixels, f"{fmt} {w}x{h}"
    with pytest.raises(ValueError, match="encode format"):
        encode_image(_raster(0), "tiff")


def test_decoded_phash_check_matches_analytic_law(spark):
    """The registered differential gate reproduces the oracle's
    analytic phash for hand-computed doc ids, through each of the
    three container formats (|id| mod 3 rotation), and its phash
    values are exactly what pixel_phash computes on the raw raster —
    the encode/decode hop is transparent."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import pixel_phash
    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES

    import pyarrow as pa
    import pyarrow.parquet as pq
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        ids = [0, 1, 2, 5, 17, 100]  # covers all three formats twice
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(["x"] * len(ids)),
                    "lang": pa.array(["en"] * len(ids)),
                    "source": pa.array(["s"] * len(ids)),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        got = {
            r["doc_id"]: r
            for r in QUERIES["decoded_phash_check"](spark, d).collect()
        }
    assert set(got) == set(ids)
    for i in ids:
        expect = pixel_phash(_raster(i))
        expect = expect - (1 << 64) if expect >= (1 << 63) else expect
        assert got[i]["phash64"] == expect, f"doc {i}"
        assert (got[i]["width"], got[i]["height"]) == (16, 16)
        # histogram bins sum constraint: exact /256 doubles
        assert got[i]["hist_0"] * 256 == int(got[i]["hist_0"] * 256)
