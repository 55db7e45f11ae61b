"""Per-query profile of the bench headline set (guide §1: measure first).

For every bench.HEADLINE query, records against the SAME noop-sink
methodology bench.py times:

- build_s: driver-side plan-construction time (the fn() call — includes
  any in-function collects/loops, so loop-shaped queries show their cost
  here),
- run1_s / run2_s: first and second noop execution (bench reports
  best-of-2),
- jobs / stages / tasks: scheduler work per query (delta over the
  session's AppStatusStore),
- shuffle read/write bytes and executor run/CPU time summed over the
  query's stages.

Usage: python tools/profile_bench.py [out.json] [query ...]
Honours SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import HEADLINE  # noqa: E402
from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached  # noqa: E402
from m2_b3_market_data_pipeline_spark.plans import all_queries  # noqa: E402
from m2_b3_market_data_pipeline_spark.session import get_spark, sf_dir  # noqa: E402


def _store_snapshot(spark):
    """Job count + executor metric totals from the core app status
    store (works with spark.ui.enabled=false — the store exists
    regardless; local mode has exactly one executor row)."""
    core = spark.sparkContext._jsc.sc().statusStore()
    njobs = core.jobsList(None).size()
    ex = core.executorList(False)
    tasks = sread = swrite = dur_ms = gc_ms = inp = 0
    for i in range(ex.size()):
        e = ex.apply(i)
        tasks += e.totalTasks()
        sread += e.totalShuffleRead()
        swrite += e.totalShuffleWrite()
        dur_ms += e.totalDuration()
        gc_ms += e.totalGCTime()
        inp += e.totalInputBytes()
    return {
        "jobs": njobs,
        "tasks": tasks,
        "shuffle_read": sread,
        "shuffle_write": swrite,
        "task_time_ms": dur_ms,
        "gc_ms": gc_ms,
        "input_bytes": inp,
    }


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_bench.json"
    only = sys.argv[2:]
    names = [n for n in HEADLINE if not only or n in only]

    target = sf_dir()
    spark = get_spark("profile")
    spark.sparkContext.setLogLevel("ERROR")

    # same warm-up as bench.py
    spark.read.parquet(f"{target}/lineitem.parquet").count()
    spark.read.parquet(f"{target}/events.parquet").count()
    first = all_queries.QUERIES[names[0]](spark, target)
    first.write.format("noop").mode("overwrite").save()
    release_cached(first)

    rows = {}
    for name in names:
        fn = all_queries.QUERIES[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        before = _store_snapshot(spark)
        t0 = time.time()
        df = fn(spark, target)
        t_build = time.time() - t0
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        run1 = time.time() - t1
        release_cached(df)
        t2 = time.time()
        df = fn(spark, target)
        df.write.format("noop").mode("overwrite").save()
        run2 = time.time() - t2
        release_cached(df)
        after = _store_snapshot(spark)
        rows[name] = {
            "build_s": round(t_build, 3),
            "run1_s": round(run1, 3),
            "run2_s": round(run2, 3),
            "best_s": round(min(t_build + run1, run2), 3),
            **{k: after[k] - before[k] for k in before},
        }
        spark.sparkContext.setJobDescription(None)
        r = rows[name]
        print(
            f"{name:38s} build={r['build_s']:6.2f} run1={r['run1_s']:6.2f} "
            f"run2={r['run2_s']:6.2f} jobs={r['jobs']:4d} "
            f"tasks={r['tasks']:5d} shufR={r['shuffle_read'] / 1e6:8.1f}MB "
            f"task={r['task_time_ms'] / 1e3:7.1f}s gc={r['gc_ms'] / 1e3:5.1f}s "
            f"in={r['input_bytes'] / 1e6:7.1f}MB",
            flush=True,
        )
    with open(out_path, "w") as fh:
        json.dump(rows, fh, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
