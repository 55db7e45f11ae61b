"""Idle-window A/B for the r13 bench drifters (r13 verdict item 3).

Seven queries drifted 1.31-1.45x vs r12 inside a window whose control
ratio was 1.454 — consistent with throttle, but `dedup_clusters` was
the set's slowest non-graph entry two rounds running. This tool
re-measures them in ONE session against their best-knowns with the
SAME 3-query window-control set bench.py uses, best-of-N each, so the
drift can be adjudicated: a query whose control-normalized ratio
(ratio / control_ratio) stays near 1 drifted with the window; one
whose normalized ratio stands out regressed for real.

Usage: python tools/ab_bench_drifters.py [rounds_per_query]
Writes nothing; paste the table into BASELINE.md with the verdict.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DRIFTERS = [
    "dedup_clusters",
    "corpus_pipeline",
    "trigram_lm_score",
    "trigram_lm_hashed",
    "decontaminate",
    "incremental_semdedup",
    "streaming_triplets",
]
CONTROLS = ["q1_pricing_summary", "window_rank", "resample_ohlc"]


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached
    from m2_b3_market_data_pipeline_spark.plans import all_queries
    from m2_b3_market_data_pipeline_spark.session import get_spark, sf_dir

    target = sf_dir()
    sf = float(target.rstrip("/").rsplit("sf", 1)[-1])
    spark = get_spark("ab-drifters")
    # same warm-up discipline as bench.py: scans + one untimed query
    spark.read.parquet(f"{target}/lineitem.parquet").count()
    spark.read.parquet(f"{target}/events.parquet").count()
    spark.read.parquet(f"{target}/documents.parquet").count()
    first = all_queries.QUERIES[CONTROLS[0]](spark, target)
    first.write.format("noop").mode("overwrite").save()
    release_cached(first)

    best_known: dict[str, float] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(path) as fh:
                parsed = json.load(fh).get("parsed", {})
        except (OSError, ValueError):
            continue
        if not isinstance(parsed, dict) or parsed.get("sf") != sf:
            continue
        for q, t in parsed.get("queries", {}).items():
            if isinstance(t, (int, float)):
                best_known[q] = min(best_known.get(q, float("inf")), t)
    # same clamp bench.py applies (pre-floor fast-window records)
    for q, floor_t in {"trigram_lm_score": 1.08}.items():
        if q in best_known:
            best_known[q] = max(best_known[q], floor_t)

    results: dict[str, float] = {}
    for name in CONTROLS + DRIFTERS:
        fn = all_queries.QUERIES[name]
        best = float("inf")
        df = None
        for _ in range(rounds):
            t0 = time.time()
            df = fn(spark, target)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        results[name] = round(best, 3)
        release_cached(df)

    ctl = sorted(results[q] / best_known[q] for q in CONTROLS
                 if best_known.get(q))
    control_ratio = ctl[len(ctl) // 2] if ctl else 1.0
    print(f"window control_ratio (median of {CONTROLS}): "
          f"{control_ratio:.3f}")
    print(f"{'query':22s} {'best-of-'+str(rounds):>10s} {'best-known':>11s} "
          f"{'ratio':>6s} {'normalized':>10s}")
    for name in CONTROLS + DRIFTERS:
        bk = best_known.get(name)
        r = results[name] / bk if bk else float("nan")
        tag = " <- control" if name in CONTROLS else ""
        print(f"{name:22s} {results[name]:10.3f} {bk or 0:11.3f} "
              f"{r:6.2f} {r / control_ratio:10.2f}{tag}")


if __name__ == "__main__":
    main()
