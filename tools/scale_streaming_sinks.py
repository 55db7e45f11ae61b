"""Streaming-sink scale step (r8 verdict item 6): drain each stateful
sink against a 10x backlog and verify the state-store invariant.

The sf1/sf3 campaigns covered batch queries only; the four stateful
sinks had never seen more than toy fixtures. This tool builds a
4-wave backlog from a fixture directory (documents for the near-dedup
and count-min sinks, embeddings for the semantic-dedup sink, events for
the incremental-aggregate sink), drains it wave-by-wave under
``availableNow`` — the sinks' contract shape — and records, per sink
and scale:

- input rows and waves drained,
- total drain wall,
- final state-store rows and parquet bytes,
- the STATE INVARIANT that bounds growth at 100 TB:
    near_dedup  : state rows == admitted docs, columns are id+signatures
                  only (raw text never enters the state),
    semdedup    : state rows == surviving vectors (admitted, not seen),
    countmin    : state rows == depth*width COUNTERS — constant in the
                  corpus, identical at every scale,
    agg         : state rows == distinct group keys, not event count,
    funnel      : state == the full-backlog batch funnel recompute,
                  in <= N_GATE_STAGES rows — constant in the corpus,
    postings    : state rows == |distinct vocabulary| + 1 — the BM25
                  statistics follow the vocab, never the doc count.

Usage: python tools/scale_streaming_sinks.py [--sinks a,b]
           [--semdedup-assigner codebook|lsh] [SF_DIR ...]
       (default: all sinks, codebook assigner,
        /root/testdata/sf0.1 /root/repo/.scale/sf1)
Prints one JSON object per (sink, sf_dir) plus an invariant verdict.

Round 10 (r9 verdict item 5): ``--sinks`` scopes a campaign to a
subset (the 30x step targets the two dedup sinks), and
``--semdedup-assigner lsh`` drains the semantic-dedup sink under
``operators/embeddings.py::lsh_cell_assigner`` with cell bits from the
corpus-scaled knob formula over the BACKLOG size — the cells-∝-corpus
posture whose batch form SCALE.md §14 gate-checked; the sf1 drain's
103s under the fixed mod-50 codebook was the cost this retires.
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
from pyspark.sql import types as T  # noqa: E402

N_WAVES = 4
CM_DEPTH, CM_WIDTH = 3, 8
SEM_CENTROID_MOD = 50
SEM_THRESHOLD = 0.45

DOC_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)
EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)
EVT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def _rows(spark, path: str) -> int:
    return spark.read.parquet(path).count()


def run_sink(spark, sink: str, sf_dir: str, work: str, *, semdedup_assigner: str = "codebook") -> dict:
    from m2_b3_market_data_pipeline_spark.plans.registry import load

    updates = os.path.join(work, "in")
    state = os.path.join(work, "state")
    out = os.path.join(work, "out")
    ckpt = os.path.join(work, "ckpt")

    if sink == "near_dedup":
        src = load(spark, sf_dir, "documents").select("doc_id", "text")
        waves = [src.filter(F.col("doc_id") % N_WAVES == w) for w in range(N_WAVES)]
        from m2_b3_market_data_pipeline_spark.streaming.near_dedup_sink import (
            run_incremental_dedup_stream,
        )

        def drain():
            run_incremental_dedup_stream(
                spark,
                updates_path=updates,
                state_path=state,
                pairs_path=out,
                checkpoint_path=ckpt,
                schema=DOC_SCHEMA,
                threshold=0.5,
            ).awaitTermination(600)

    elif sink == "semdedup":
        emb = load(spark, sf_dir, "embeddings")
        src = emb.select("vec_id", "embedding")
        waves = [src.filter(F.col("vec_id") % N_WAVES == w) for w in range(N_WAVES)]
        from m2_b3_market_data_pipeline_spark.streaming.semdedup_sink import (
            run_semdedup_stream,
        )

        quantizer: dict = {}
        if semdedup_assigner == "lsh":
            # Cells ∝ the planned corpus (= this campaign's backlog),
            # bits from the same knob formula the batch scaled variant
            # gate-checked (SCALE.md §14). dim from the fixture layout.
            from m2_b3_market_data_pipeline_spark.operators.embeddings import (
                lsh_cell_assigner,
            )
            from m2_b3_market_data_pipeline_spark.operators.knobs import (
                scaled_cell_bits,
            )

            n = src.count()
            dim = len(src.select("embedding").first()["embedding"])
            quantizer["assign_fn"] = lsh_cell_assigner(
                dim=dim, cell_bits=scaled_cell_bits(n)
            )
        else:
            quantizer["centroids"] = emb.filter(
                F.col("vec_id") % SEM_CENTROID_MOD == 0
            ).select(
                F.col("vec_id").alias("centroid_id"),
                F.col("embedding").alias("centroid"),
            )

        def drain():
            run_semdedup_stream(
                spark,
                updates_path=updates,
                state_path=state,
                decisions_path=out,
                checkpoint_path=ckpt,
                schema=EMB_SCHEMA,
                threshold=SEM_THRESHOLD,
                **quantizer,
            ).awaitTermination(600)

    elif sink == "countmin":
        src = load(spark, sf_dir, "documents").select("doc_id", "text")
        waves = [src.filter(F.col("doc_id") % N_WAVES == w) for w in range(N_WAVES)]
        from m2_b3_market_data_pipeline_spark.streaming.countmin_sink import (
            run_incremental_countmin_stream,
        )

        def drain():
            run_incremental_countmin_stream(
                spark,
                updates_path=updates,
                state_path=state,
                checkpoint_path=ckpt,
                schema=DOC_SCHEMA,
                depth=CM_DEPTH,
                width=CM_WIDTH,
            ).awaitTermination(600)

    elif sink == "postings":
        src = load(spark, sf_dir, "documents").select("doc_id", "text")
        waves = [src.filter(F.col("doc_id") % N_WAVES == w) for w in range(N_WAVES)]
        from m2_b3_market_data_pipeline_spark.streaming.postings_sink import (
            run_bm25_stats_stream,
        )

        def drain():
            run_bm25_stats_stream(
                spark,
                updates_path=updates,
                state_path=state,
                checkpoint_path=ckpt,
                schema=DOC_SCHEMA,
            ).awaitTermination(600)

    elif sink == "funnel":
        src = load(spark, sf_dir, "documents").select("doc_id", "text")
        waves = [src.filter(F.col("doc_id") % N_WAVES == w) for w in range(N_WAVES)]
        from m2_b3_market_data_pipeline_spark.streaming.funnel_sink import (
            run_incremental_funnel_stream,
        )

        def drain():
            run_incremental_funnel_stream(
                spark,
                updates_path=updates,
                state_path=state,
                checkpoint_path=ckpt,
                schema=DOC_SCHEMA,
            ).awaitTermination(600)

    elif sink == "agg":
        src = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
        waves = [src.filter(F.col("user_id") % N_WAVES == w) for w in range(N_WAVES)]
        from m2_b3_market_data_pipeline_spark.streaming.agg_sink import (
            run_incremental_agg_stream,
        )

        def drain():
            run_incremental_agg_stream(
                spark,
                updates_path=updates,
                state_path=state,
                checkpoint_path=ckpt,
                schema=EVT_SCHEMA,
                keys=["user_id", "event_type"],
                value_col="value",
            ).awaitTermination(600)

    else:  # pragma: no cover
        raise ValueError(sink)

    input_rows = 0
    t0 = time.time()
    for i, w in enumerate(waves):
        w.write.parquet(f"{updates}/b{i}")
        input_rows += _rows(spark, f"{updates}/b{i}")
        drain()
    wall = time.time() - t0

    state_df = spark.read.parquet(state)
    state_rows = state_df.count()
    rec = {
        "sink": sink,
        "sf_dir": sf_dir,
        **(
            {"assigner": semdedup_assigner}
            if sink == "semdedup"
            else {}
        ),
        "input_rows": input_rows,
        "waves": N_WAVES,
        "wall_s": round(wall, 1),
        "state_rows": state_rows,
        "state_bytes": _dir_bytes(state),
        "state_cols": [c for c in state_df.columns if not c.startswith("mh")]
        + (["mh0..mhK"] if any(c.startswith("mh") for c in state_df.columns) else []),
    }

    # Invariant verdicts.
    if sink == "near_dedup":
        rec["invariant"] = "state rows == admitted docs; no text column"
        rec["invariant_ok"] = (
            state_rows == input_rows and "text" not in state_df.columns
        )
    elif sink == "semdedup":
        decisions = spark.read.parquet(f"{out}")
        pruned = decisions.filter(F.col("pruned")).count()
        rec["pruned"] = pruned
        rec["invariant"] = "state rows == input - pruned (survivors only)"
        rec["invariant_ok"] = state_rows == input_rows - pruned
    elif sink == "countmin":
        rec["invariant"] = f"state rows == depth*width == {CM_DEPTH * CM_WIDTH}"
        rec["invariant_ok"] = state_rows == CM_DEPTH * CM_WIDTH
    elif sink == "postings":
        from m2_b3_market_data_pipeline_spark.functions.textfns import tokens

        vocab = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(updates)
            .filter(F.col("text").isNotNull())
            .select(F.explode(tokens("text")).alias("t"))
            .distinct()
            .count()
        )
        rec["vocab"] = vocab
        rec["invariant"] = "state rows == |vocab| + 1 (corpus row)"
        rec["invariant_ok"] = state_rows == vocab + 1
    elif sink == "funnel":
        from m2_b3_market_data_pipeline_spark.operators.corpus import N_GATE_STAGES
        from m2_b3_market_data_pipeline_spark.streaming.funnel_sink import (
            _stage_rows,
            read_funnel,
        )

        merged = {
            r["stage"]: (r["docs"], r["tokens"])
            for r in read_funnel(spark, state).collect()
        }
        batch = {
            r["stage"]: (r["docs"], r["tokens"])
            for r in _stage_rows(
                spark.read.option("recursiveFileLookup", "true").parquet(updates)
            )
            .groupBy("stage")
            .agg(F.count("*").alias("docs"), F.sum("n_tok").alias("tokens"))
            .collect()
        }
        batch = {s: batch.get(s, (0, 0)) for s in range(N_GATE_STAGES)}
        rec["funnel"] = {str(s): list(merged[s]) for s in sorted(merged)}
        rec["invariant"] = (
            "merged funnel == full-backlog batch recompute; "
            f"state rows <= {N_GATE_STAGES} stages"
        )
        rec["invariant_ok"] = merged == batch and state_rows <= N_GATE_STAGES
    elif sink == "agg":
        distinct_keys = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(updates)
            .select("user_id", "event_type")
            .distinct()
            .count()
        )
        rec["distinct_keys"] = distinct_keys
        rec["invariant"] = "state rows == distinct (user_id, event_type)"
        rec["invariant_ok"] = state_rows == distinct_keys
    return rec


def main() -> None:
    args = sys.argv[1:]
    sinks = ("countmin", "agg", "funnel", "postings", "semdedup", "near_dedup")
    assigner = "codebook"
    if "--sinks" in args:
        i = args.index("--sinks")
        sinks = tuple(args[i + 1].split(","))
        del args[i : i + 2]
    if "--semdedup-assigner" in args:
        i = args.index("--semdedup-assigner")
        assigner = args[i + 1]
        del args[i : i + 2]
    sf_dirs = args or ["/root/testdata/sf0.1", f"{REPO}/.scale/sf1"]
    from m2_b3_market_data_pipeline_spark.session import get_spark

    spark = get_spark("sink-scale-step")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for sf_dir in sf_dirs:
        for sink in sinks:
            work = tempfile.mkdtemp(prefix=f"sinkscale-{sink}-")
            try:
                rec = run_sink(spark, sink, sf_dir, work, semdedup_assigner=assigner)
            finally:
                shutil.rmtree(work, ignore_errors=True)
            print(json.dumps(rec))
            ok = ok and rec["invariant_ok"]
    print("ALL INVARIANTS OK" if ok else "INVARIANT VIOLATION")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
