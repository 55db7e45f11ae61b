"""State-store provider A/B for the BUILT-IN stateful streaming ops
(r12 verdict item 4).

The custom sinks (streaming/*_sink.py) own their parquet state and
never touch Spark's state store; the ops that DO — ``dedup_events`` /
``dedup_events_bounded`` (streaming/joins.py), the windowed aggs
(streaming/windows.py), stream-stream joins — ran on the default
in-heap HDFS-backed provider through round 12. A 100 TB deployment's
dedup/join state will not fit executor heap; round 13 makes
``RocksDBStateStoreProvider`` the session default (session.py) —
native memory + local disk, heap bounded by block cache.

This tool measures the switch: drain an N-wave events backlog through
a genuinely STATEFUL pipeline — watermarked ``dropDuplicates
WithinWatermark`` (one state row per event_id inside the horizon)
feeding a sliding windowed count (window state) — once per provider,
and assert the outputs are IDENTICAL (provider is a storage choice,
never a semantics choice). Each run uses a fresh checkpoint: an
existing checkpoint PINS the provider it was created with — Spark
refuses a mid-checkpoint provider switch — so the A/B is
new-checkpoint vs new-checkpoint, which is also the only migration
path a real deployment has (replay or bootstrap, not in-place
flipping).

Usage: python tools/ab_state_store.py [SF_DIR] [N_WAVES]
       (default /root/repo/.scale/sf1, 4 waves)
Prints one JSON object per provider plus an equality verdict.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

PROVIDERS = {
    "hdfs": (
        "org.apache.spark.sql.execution.streaming.state."
        "HDFSBackedStateStoreProvider"
    ),
    "rocksdb": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def run_provider(spark, provider: str, waves, schema, work: str) -> dict:
    from m2_b3_market_data_pipeline_spark.streaming.joins import (
        dedup_events_bounded,
    )

    updates = os.path.join(work, "in")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", PROVIDERS[provider])

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(updates)
        )
        deduped = dedup_events_bounded(stream, delay="2 days")
        counts = (
            deduped.groupBy(
                F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
            )
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .select("w.start", "w.end", "event_type", "n", "total")
        )
        q = (
            counts.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination(600)

    input_rows = 0
    t0 = time.time()
    for i, w in enumerate(waves):
        w.write.parquet(f"{updates}/b{i}")
        input_rows += w.count()
        drain()
    wall = time.time() - t0
    result = spark.read.parquet(out)
    rows = sorted(
        (str(r["start"]), str(r["end"]), str(r["event_type"]), r["n"],
         round(r["total"] or 0.0, 6))
        for r in result.collect()
    )
    return {
        "provider": provider,
        "input_rows": input_rows,
        "wall_s": round(wall, 1),
        "out_rows": len(rows),
        "_rows": rows,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else f"{REPO}/.scale/sf1"
    n_waves = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    from m2_b3_market_data_pipeline_spark.plans.registry import load
    from m2_b3_market_data_pipeline_spark.session import get_spark

    spark = get_spark("state-store-ab")
    spark.sparkContext.setLogLevel("ERROR")
    src = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    # Plant duplicates so the dedup state actually discriminates:
    # every 10th event replays in the NEXT wave (late, inside the
    # watermark horizon — the at-least-once shape the bounded dedup
    # exists for).
    waves = []
    for w in range(n_waves):
        own = src.filter(F.col("event_id") % n_waves == w)
        if w > 0:
            replay = src.filter(
                (F.col("event_id") % n_waves == w - 1)
                & (F.col("event_id") % 10 == 0)
            )
            own = own.unionByName(replay)
        waves.append(own)
    schema = src.schema

    recs = []
    for provider in PROVIDERS:
        work = tempfile.mkdtemp(prefix=f"ab-state-{provider}-")
        try:
            recs.append(run_provider(spark, provider, waves, schema, work))
        finally:
            shutil.rmtree(work, ignore_errors=True)
    same = recs[0]["_rows"] == recs[1]["_rows"]
    for r in recs:
        r.pop("_rows")
        print(json.dumps(r))
    print(
        json.dumps(
            {"outputs_identical": same, "verdict": "OK" if same else "MISMATCH"}
        )
    )
    sys.exit(0 if same else 1)


if __name__ == "__main__":
    main()
