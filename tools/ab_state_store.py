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

    state_rows = [0, 0]  # dedup rows, window rows (last progress wins)
    state_mem = [0]      # provider-reported memoryUsedBytes, summed

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
        # ladder metrics (r13 verdict item 7): per-operator state rows
        # + the provider's own memory figure from the LAST progress of
        # the wave (numRowsTotal is a point-in-time total, not a sum)
        ops = []
        for p in reversed(q.recentProgress):
            if p and p.get("stateOperators"):
                ops = p["stateOperators"]
                break
        if ops:
            state_rows[0] = ops[0].get("numRowsTotal", 0)
            state_rows[1] = (
                ops[1].get("numRowsTotal", 0) if len(ops) > 1 else 0
            )
            state_mem[0] = sum(o.get("memoryUsedBytes", 0) for o in ops)

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
    state_dir = os.path.join(ckpt, "state")
    disk = 0
    for root, _dirs, files in os.walk(state_dir):
        for f in files:
            try:
                disk += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return {
        "provider": provider,
        "input_rows": input_rows,
        "wall_s": round(wall, 1),
        "out_rows": len(rows),
        "state_rows_dedup": state_rows[0],
        "state_rows_window": state_rows[1],
        "state_memory_bytes": state_mem[0],
        "state_disk_bytes": disk,
        "_rows": rows,
    }


def run_provider_join(spark, provider: str, waves, schema, work: str) -> dict:
    """Same A/B for the third built-in stateful op the ladder needs:
    a watermarked stream-stream INTERVAL join (left = even event_ids,
    right = odd, joined on user_id with r.ts in [l.ts, l.ts + 30 min]
    — the click->conversion shape). Both sides buffer state inside
    the watermark horizon, which is exactly the store pressure a
    100 TB join carries."""
    left_dir = os.path.join(work, "in_l")
    right_dir = os.path.join(work, "in_r")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", PROVIDERS[provider]
    )
    state_mem = [0]
    state_rows = [0]

    def drain():
        l = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(left_dir)
            .withWatermark("ts", "2 days")
            .select(
                F.col("event_id").alias("l_id"),
                F.col("user_id").alias("l_user"),
                F.col("ts").alias("l_ts"),
            )
        )
        r = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(right_dir)
            .withWatermark("ts", "2 days")
            .select(
                F.col("event_id").alias("r_id"),
                F.col("user_id").alias("r_user"),
                F.col("ts").alias("r_ts"),
                F.col("value").alias("r_value"),
            )
        )
        joined = l.join(
            r,
            (F.col("l_user") == F.col("r_user"))
            & (F.col("r_ts") >= F.col("l_ts"))
            & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        q = (
            joined.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", out)
            .start()
        )
        q.awaitTermination(1200)
        for p in reversed(q.recentProgress):
            if p and p.get("stateOperators"):
                ops = p["stateOperators"]
                state_rows[0] = sum(o.get("numRowsTotal", 0) for o in ops)
                state_mem[0] = sum(o.get("memoryUsedBytes", 0) for o in ops)
                break

    input_rows = 0
    t0 = time.time()
    for i, w in enumerate(waves):
        w.filter(F.col("event_id") % 2 == 0).write.parquet(f"{left_dir}/b{i}")
        w.filter(F.col("event_id") % 2 == 1).write.parquet(f"{right_dir}/b{i}")
        input_rows += w.count()
        drain()
    wall = time.time() - t0
    result = spark.read.parquet(out)
    agg = result.agg(
        F.count("*").alias("n"), F.sum("r_value").alias("s")
    ).collect()[0]
    state_dir = os.path.join(ckpt, "state")
    disk = 0
    for root, _dirs, files in os.walk(state_dir):
        for f in files:
            try:
                disk += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return {
        "provider": provider,
        "mode": "stream-stream-join",
        "input_rows": input_rows,
        "wall_s": round(wall, 1),
        "out_rows": agg["n"],
        "state_rows_total": state_rows[0],
        "state_memory_bytes": state_mem[0],
        "state_disk_bytes": disk,
        "_rows": (agg["n"], round(float(agg["s"] or 0.0), 4)),
    }


def main() -> None:
    argv = list(sys.argv[1:])
    join_mode = "--join" in argv
    argv = [a for a in argv if a != "--join"]
    only_provider = None
    if "--provider" in argv:
        i = argv.index("--provider")
        only_provider = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if len(argv) > 0 else f"{REPO}/.scale/sf1"
    n_waves = int(argv[1]) if len(argv) > 1 else 4
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

    runner = run_provider_join if join_mode else run_provider
    recs = []
    for provider in PROVIDERS:
        if only_provider and provider != only_provider:
            continue
        work = tempfile.mkdtemp(prefix=f"ab-state-{provider}-")
        try:
            recs.append(runner(spark, provider, waves, schema, work))
        finally:
            shutil.rmtree(work, ignore_errors=True)
    if len(recs) == 1:  # --provider: a single-sided (e.g. survival) run
        r = recs[0]
        r.pop("_rows")
        print(json.dumps(r))
        sys.exit(0)
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
