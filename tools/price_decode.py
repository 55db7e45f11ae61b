"""Price the stdlib decode family at REALISTIC image sizes (r13
verdict watch item 1: the 3.4k imgs/s decode-probe number is for
16x16 tiles, so the cost of a real 100 TB image corpus couldn't be
priced from it).

Single-core, no Spark: per format (BMP / PPM / PNG / GIF / baseline
JPEG / progressive JPEG) at 256x256 and 512x512, time N pure
``decode_image`` calls on a gradient+noise raster (noise defeats the
degenerate all-one-color LZW/deflate fast paths so the numbers are
honest), and report

  imgs/s-per-core, decoded MPix/s, encoded MB/s, and the derived
  CPU-core-hours to decode 100 TB of that format's ENCODED bytes
  (100e12 / (payload_bytes * imgs_per_sec) / 3600).

These are per-core numbers by construction: the featurizers run the
same code inside Arrow batches with zero cross-payload coordination,
so cluster cost = this number / total cores, and the posture at
100 TB is a pure economics question (see SCALE.md §24) — the plan
shape (scan -> mapInPandas -> agg) is already optimal.

Usage: python tools/price_decode.py [n_images_per_cell]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _raster(side: int, seed: int) -> "np.ndarray":
    rng = np.random.default_rng(seed)
    xg, yg = np.meshgrid(np.arange(side), np.arange(side))
    base = ((7 * xg + 13 * yg) % 256).astype(np.int64)
    noise = rng.integers(-24, 25, size=(side, side))
    v = np.clip(base + noise, 0, 255).astype(np.uint8)
    return np.stack([v, np.roll(v, 3, 0), np.roll(v, 7, 1)], axis=2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        DecodedImage,
        decode_image,
        encode_image,
    )

    fmt_kwargs = {
        "bmp": {},
        "ppm": {},
        "png": {},
        "png-i": {},
        "png-pal": {},
        "gif": {},
        "jpeg": {"quality": 85, "subsample": (2, 2)},
        "pjpeg": {"quality": 85, "subsample": (2, 2)},
    }
    print(f"{'format':8s} {'side':>5s} {'imgs/s':>9s} {'MPix/s':>8s} "
          f"{'enc MB/s':>9s} {'CPU-core-h / 100TB':>19s}")
    for side in (256, 512):
        payloads: dict[str, list[bytes]] = {}
        for fmt, kw in fmt_kwargs.items():
            ps = []
            for i in range(n):
                rgb = _raster(side, seed=i)
                if fmt in ("gif", "png-pal"):
                    # palette formats need <= 256 unique colors: use the
                    # gray version of the raster (still noisy rows)
                    g = rgb[:, :, 0]
                    rgb = np.repeat(g[:, :, None], 3, axis=2)
                img = DecodedImage(side, side, rgb.tobytes())
                ps.append(encode_image(img, fmt, **kw))
            payloads[fmt] = ps
        for fmt, ps in payloads.items():
            # warm-up one decode (numpy allocator, table builds)
            decode_image(ps[0])
            t0 = time.perf_counter()
            for p in ps:
                decode_image(p)
            dt = time.perf_counter() - t0
            ips = len(ps) / dt
            enc_bytes = sum(len(p) for p in ps) / len(ps)
            mpix = ips * side * side / 1e6
            mbs = ips * enc_bytes / 1e6
            hours = 100e12 / (enc_bytes * ips) / 3600
            print(f"{fmt:8s} {side:5d} {ips:9.1f} {mpix:8.1f} "
                  f"{mbs:9.2f} {hours:19,.0f}")


if __name__ == "__main__":
    main()
