"""Scale probe for the byte-parse-bound family (phash, audio frame
energy) — the two slowest per-byte operators in the bench.

The driver ships no sf1 fixtures, so the probe constructs them: the
sf0.1 documents corpus (5k docs, ~1.5 MB of text bytes) replicated
RX times with shifted doc_ids and written to a scratch parquet with
splits proportional to the replication, i.e. the exact shape a 10x
bigger crawl would land in. Then it times

- ``frame_energy`` (audio stand-in: 16 frames x mean sq deviation), and
- ``perceptual_hash`` + the Hamming pigeonhole self-join (phash dedup)

at each scale and reports docs/sec. Linear scaling across RX means the
operators are scan-bound (partition-parallel, no super-linear shuffle
term); the phash JOIN has a pair-count term that grows with bucket
occupancy, reported separately.

Usage: python tools/scale_probe_byteparse.py [sf_dir] [replications...]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from m2_b3_market_data_pipeline_spark.operators.dedup import simhash_near_pairs  # noqa: E402
from m2_b3_market_data_pipeline_spark.operators.multimodal import (  # noqa: E402
    attach_binary,
    frame_energy,
    perceptual_hash,
)
from m2_b3_market_data_pipeline_spark.plans.registry import load  # noqa: E402
from m2_b3_market_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(a) for a in sys.argv[2:]] or [1, 4, 10]
    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")

    base = load(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()
    scratch = tempfile.mkdtemp(prefix="byteparse_probe_")
    print(f"base corpus: {n_base} docs; scratch: {scratch}")
    results = []
    try:
        for rx in reps:
            path = f"{scratch}/docs_x{rx}"
            scaled = base
            for i in range(1, rx):
                scaled = scaled.unionByName(
                    base.select(
                        (F.col("doc_id") + i * 1_000_000).alias("doc_id"), "text"
                    )
                )
            # splits proportional to volume — the shape a real crawl lands in
            scaled.repartition(4 * rx).write.mode("overwrite").parquet(path)
            docs = spark.read.parquet(path)
            n = docs.count()

            t0 = time.time()
            frame_energy(
                attach_binary(docs, modality="audio"),
                id_col="doc_id",
                binary_col="content",
            ).agg(F.count("*"), F.sum("energy")).collect()
            t_energy = time.time() - t0

            t0 = time.time()
            hashed = perceptual_hash(
                attach_binary(docs, modality="image"),
                id_col="doc_id",
                binary_col="content",
            )
            n_pairs = simhash_near_pairs(
                hashed, id_col="doc_id", max_hamming=3
            ).count()
            t_phash = time.time() - t0

            results.append((rx, n, t_energy, t_phash, n_pairs))
            print(
                f"x{rx}: {n} docs | frame_energy {t_energy:.2f}s "
                f"({n / t_energy:,.0f} docs/s) | phash+join {t_phash:.2f}s "
                f"({n / t_phash:,.0f} docs/s, {n_pairs} pairs)"
            )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    r1 = results[0]
    for r in results[1:]:
        print(
            f"x{r[0]} vs x1: volume {r[1] / r1[1]:.1f}x, "
            f"energy time {r[2] / r1[2]:.2f}x, phash time {r[3] / r1[3]:.2f}x"
        )


if __name__ == "__main__":
    main()
