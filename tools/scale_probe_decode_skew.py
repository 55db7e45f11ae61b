"""Heavy-tail decode-skew A/B (r13 verdict item 8).

The decode featurizers inherit upstream partitioning. This probe
plants the adversarial layout a crawl shard produces naturally — a
few GIANT images whose doc_ids cluster into ONE range partition among
thousands of small payloads — and measures ``decoded_image_features``
with and without ``rebalance_for_decode`` in front.

Why giants straggle: decode cost is per-byte (JPEG entropy decode is
the priced wall, SCALE.md §24), a payload can't be split, and
``mapInPandas`` runs one Python worker per partition — so a partition
holding all N giants pays N serial decodes while 63 sibling tasks
finish in milliseconds.

Fixture: N_SMALL 16x16 BMPs (cheap) + N_GIANT noise JPEGs at
GIANT_PX^2 (worst-case entropy: random pixels maximize coded bits).
Giant ids 0..N_GIANT-1, smalls from 1000 up; repartitionByRange(64,
doc_id) then parks every giant in partition 0 — the planted skew.

A: features over the skewed frame as-is.
B: features over rebalance_for_decode(skewed, heavy_bytes=32 KiB).
Both must produce identical rows (order-insensitive); the JSON line
records walls + the straggle ratio.

r15 (verdict item 4): measures BOTH tail layouts x BOTH spread
strategies. --layout spread plants each giant ALONE in its own source
partition (the already-spread tail where round-robin's Random(pid)
start offsets collide with birthday probability); for each strategy
the max-giants-per-task collision count is recorded alongside the
wall.

Usage: python tools/scale_probe_decode_skew.py [N_SMALL] [N_GIANT]
       [GIANT_PX] [--layout clumped|spread|both]
       (defaults 20000, 12, 256, both)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    layout_arg = "both"
    if "--layout" in sys.argv:
        layout_arg = sys.argv[sys.argv.index("--layout") + 1]
    n_small = int(args[0]) if len(args) > 0 else 20000
    n_giant = int(args[1]) if len(args) > 1 else 12
    giant_px = int(args[2]) if len(args) > 2 else 256

    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        DecodedImage,
        decoded_image_features,
        encode_image,
        rebalance_for_decode,
    )
    from m2_b3_market_data_pipeline_spark.session import get_spark

    spark = get_spark("decode-skew-ab")
    spark.sparkContext.setLogLevel("ERROR")

    rng = np.random.RandomState(14)
    rows = []
    for i in range(n_giant):
        px = rng.randint(0, 256, (giant_px, giant_px, 3), dtype=np.uint8)
        rows.append(
            (i, encode_image(DecodedImage(giant_px, giant_px, px.tobytes()),
                             "jpeg", quality=75))
        )
    small = encode_image(
        DecodedImage(16, 16, rng.randint(0, 256, (16, 16, 3),
                                         dtype=np.uint8).tobytes()),
        "bmp",
    )
    rows.extend((1000 + i, small) for i in range(n_small))

    giant_bytes = max(len(r[1]) for r in rows[:n_giant])

    def make_layout(kind):
        if kind == "clumped":
            # repartitionByRange(64, doc_id) parks giants 0..11 together
            return (
                spark.createDataFrame(rows, "doc_id long, content binary")
                .repartitionByRange(64, "doc_id")
                .persist()
            )
        # spread: each giant ALONE in its own source partition, smalls
        # filling the rest — partition key = doc_id for giants (one
        # range each), bucketed smalls after
        return (
            spark.createDataFrame(rows, "doc_id long, content binary")
            .repartition(
                64,
                F.when(F.col("doc_id") < n_giant, F.col("doc_id"))
                .otherwise(n_giant + F.col("doc_id") % (64 - n_giant)),
            )
            .persist()
        )

    def run(frame):
        t0 = time.time()
        out = decoded_image_features(frame)
        got = sorted(
            (r["doc_id"], r["width"], r["phash64"]) for r in out.collect()
        )
        return time.time() - t0, got

    def collisions(frame):
        dist = (
            frame.filter(F.length("content") >= (32 << 10))
            .withColumn("p", F.spark_partition_id())
            .groupBy("p")
            .count()
            .collect()
        )
        return max((r["count"] for r in dist), default=0)

    result = {
        "n_small": n_small,
        "n_giant": n_giant,
        "giant_px": giant_px,
        "giant_payload_bytes": giant_bytes,
    }
    ok = True
    layouts = ("clumped", "spread") if layout_arg == "both" else (layout_arg,)
    for layout in layouts:
        df = make_layout(layout)
        df.count()  # materialize: fixture build stays out of the A/B
        src_coll = collisions(df)
        wall_a, rows_a = run(df)
        wall_a2, _ = run(df)  # warm control
        cell = {
            "giants_max_per_source_partition": src_coll,
            "wall_skewed_s": round(min(wall_a, wall_a2), 2),
        }
        for strategy in ("roundrobin", "range"):
            reb = rebalance_for_decode(
                df, heavy_bytes=32 << 10, spread=strategy
            )
            wall_b, rows_b = run(reb)
            ok = ok and rows_a == rows_b
            cell[strategy] = {
                "wall_s": round(wall_b, 2),
                "straggle_ratio": round(
                    min(wall_a, wall_a2) / max(wall_b, 1e-9), 2
                ),
                "giants_max_per_task": collisions(reb),
                "rows_identical": rows_a == rows_b,
            }
        result[layout] = cell
        df.unpersist()
    print(json.dumps(result))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
