"""Scale probe for the REAL media-decode family (r13): BMP / PPM /
PNG / baseline-JPEG image decode through ``decoded_image_features``
and MJPEG-AVI video decode through ``decoded_video_frame_features``.

The probe synthesizes its corpus: per doc a 32x32 gradient raster
serialized in a format rotating by doc_id (all five via the
production ``encode_image``, JPEG at quality 85 / 4:2:0; GIF rides
the gray palette), written to
a scratch parquet and replicated RX times with shifted doc_ids, the
shape a 10x bigger crawl would land in. Then it times the decode +
featurize pass at each scale and reports docs/sec.

Linear docs/sec across RX means the family is scan-bound: decode work
is per-payload inside Arrow batches (no shuffle term at all — the
plan is scan -> mapInPandas -> partial agg), so the 100 TB posture is
"add executors". JPEG is the honest outlier to watch: its entropy
decode is a per-block Python loop, so its per-doc cost dominates the
mix — the probe reports each format alone as well as the mix.

Usage: python tools/scale_probe_decode.py [replications...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402


def _build_payload(doc_id: int, fmt: str) -> bytes:
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        DecodedImage,
        encode_image,
    )

    xg, yg = np.meshgrid(np.arange(32), np.arange(32))
    v = ((doc_id * 31 + 7 * xg + 13 * yg) % 256).astype(np.uint8)
    rgb = np.repeat(v[:, :, None], 3, axis=2)
    img = DecodedImage(32, 32, rgb.tobytes())
    if fmt in ("jpeg", "pjpeg"):
        return encode_image(img, fmt, quality=85, subsample=(2, 2))
    return encode_image(img, fmt)


def main() -> None:
    reps = [int(a) for a in sys.argv[1:]] or [1, 3, 10]
    from pyspark.sql import functions as F

    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        decoded_image_features,
        decoded_video_frame_features,
    )
    from m2_b3_market_data_pipeline_spark.session import get_spark

    spark = get_spark("scale-probe-decode")
    base_n = 5000
    fmts = ("bmp", "ppm", "png", "png-i", "jpeg", "gif", "pjpeg")
    scratch = tempfile.mkdtemp(prefix="decode_probe_")
    try:
        rows = [
            (i, fmts[i % len(fmts)], _build_payload(i, fmts[i % len(fmts)]))
            for i in range(base_n)
        ]
        base = spark.createDataFrame(
            rows, "doc_id bigint, fmt string, content binary"
        )
        base.repartition(32).write.mode("overwrite").parquet(f"{scratch}/imgs")

        for rx in reps:
            src = spark.read.parquet(f"{scratch}/imgs")
            corpus = src
            for k in range(1, rx):
                corpus = corpus.unionByName(
                    src.withColumn(
                        "doc_id", F.col("doc_id") + F.lit(k * base_n)
                    )
                )
            corpus = corpus.repartition(32).persist()
            n = corpus.count()
            # the mix
            t0 = time.time()
            got = (
                decoded_image_features(corpus)
                .agg(
                    F.count("*").alias("n"),
                    # modular checksum: raw sum of ~2^63-magnitude
                    # hashes overflows ANSI BIGINT
                    F.sum(F.pmod(F.col("phash64"), F.lit(1000003))).alias("s"),
                )
                .collect()[0]
            )
            dt = time.time() - t0
            assert got["n"] == n, (got["n"], n)
            print(
                f"RX={rx:3d} mix    : {n:7d} imgs {dt:7.1f}s "
                f"{n / dt:9.0f} imgs/s (checksum {got['s']})"
            )
            # each format alone (same corpus, filtered — scan cost
            # shared, decode cost isolated per parser)
            for fmt in fmts:
                sub = corpus.filter(F.col("fmt") == fmt)
                m = sub.count()
                t0 = time.time()
                decoded_image_features(sub).agg(F.count("*")).collect()
                dt = time.time() - t0
                print(
                    f"          {fmt:5s}: {m:7d} imgs {dt:7.1f}s "
                    f"{m / dt:9.0f} imgs/s"
                )
            corpus.unpersist()

        # video: MJPEG, 4 frames each, 1/10th the doc count — the
        # container rotates AVI/MP4 like the decoded_video_check gate
        from m2_b3_market_data_pipeline_spark.operators.multimodal import (
            DecodedImage,
            encode_video_mjpeg,
            encode_video_mp4,
        )

        xg, yg = np.meshgrid(np.arange(32), np.arange(32))
        vids = []
        for i in range(base_n // 10):
            frames = []
            for k in range(4):
                v = (((i * 4 + k) * 31 + 7 * xg + 13 * yg) % 256).astype(
                    np.uint8
                )
                frames.append(
                    DecodedImage(
                        32, 32, np.repeat(v[:, :, None], 3, axis=2).tobytes()
                    )
                )
            writer = encode_video_mp4 if i % 2 else encode_video_mjpeg
            vids.append((i, writer(frames, quality=85)))
        vdf = spark.createDataFrame(
            vids, "doc_id bigint, content binary"
        ).repartition(32).persist()
        nv = vdf.count()
        t0 = time.time()
        got = (
            decoded_video_frame_features(vdf)
            .agg(F.count("*").alias("n"))
            .collect()[0]
        )
        dt = time.time() - t0
        print(
            f"video avi+mp4: {nv:7d} vids ({got['n']} frames) {dt:7.1f}s "
            f"{got['n'] / dt:9.0f} frames/s"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
