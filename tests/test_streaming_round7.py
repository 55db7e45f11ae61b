"""Round-7 streaming sinks: incremental SEMANTIC dedup and growing-
corpus triplet mining. Both are pinned by batch-equivalence — draining
the stream must reproduce the registered batch operators exactly
(`incremental_semdedup` / `streaming_triplets` semantics), and a
checkpoint replay must add nothing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from m2_b3_market_data_pipeline_spark.operators.embeddings import (
    assign_with_vector,
    semdedup_incremental,
)
from m2_b3_market_data_pipeline_spark.plans.contrastive_mining import (
    N_WAVES,
    TRIPLET_QUERY_MOD,
)
from m2_b3_market_data_pipeline_spark.plans.dedup_quality import (
    SEM_CENTROID_MOD,
)
from m2_b3_market_data_pipeline_spark.plans.registry import load

# The registered query's 0.45 threshold prunes nothing across sf0.001's
# wave split (max cross-wave cosine ~0.479, same-cell lower) — the test
# drops it so the prune branch actually executes.
SEM_TEST_THRESHOLD = 0.25

EMB_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _wave_frames(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    return [
        emb.filter(F.col("vec_id") % N_WAVES == w).select(
            "vec_id", "embedding", "label"
        )
        for w in range(N_WAVES)
    ]


def test_streaming_semdedup_matches_batch(spark, sf_dir, tmp_path):
    """Draining wave-by-wave reproduces sequential application of the
    BATCH semdedup_incremental against the survivors admitted so far;
    the state holds exactly the survivors; replay adds nothing."""
    from m2_b3_market_data_pipeline_spark.streaming.semdedup_sink import (
        read_assigned,
        read_decisions,
        run_semdedup_stream,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % SEM_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    waves = _wave_frames(spark, sf_dir)

    updates = str(tmp_path / "vec_in")
    state = str(tmp_path / "assigned_store")
    decisions_out = str(tmp_path / "decisions_out")
    ckpt = str(tmp_path / "sem_ckpt")

    def run():
        run_semdedup_stream(
            spark,
            updates_path=updates,
            state_path=state,
            decisions_path=decisions_out,
            checkpoint_path=ckpt,
            schema=EMB_SCHEMA,
            centroids=centroids,
            threshold=SEM_TEST_THRESHOLD,
        ).awaitTermination(120)

    for i, w in enumerate(waves):
        w.write.parquet(f"{updates}/b{i}")
        run()
    run()  # no new files: replay-safe, nothing double-written

    got = {
        (r.vec_id, r.centroid_id, r.pruned)
        for r in read_decisions(spark, decisions_out).collect()
    }

    # Batch oracle: sequential semdedup_incremental over survivors.
    want = set()
    corpus = None
    for i, w in enumerate(waves):
        assigned = assign_with_vector(w, centroids)
        if i == 0:
            dec = assigned.select(
                "vec_id", "centroid_id", F.lit(False).alias("pruned")
            )
        else:
            dec = semdedup_incremental(w, corpus, centroids, threshold=SEM_TEST_THRESHOLD)
        rows = dec.collect()
        want |= {(r.vec_id, r.centroid_id, r.pruned) for r in rows}
        keep = {r.vec_id for r in rows if not r.pruned}
        survivors = assigned.filter(F.col("vec_id").isin(keep))
        corpus = survivors if corpus is None else corpus.unionByName(survivors)

    assert got == want
    assert any(p for _, _, p in got), "expected at least one pruned vector"
    state_ids = {r.vec_id for r in read_assigned(spark, state).collect()}
    assert state_ids == {v for v, _, p in want if not p}


def test_streaming_triplets_match_wave_batch(spark, sf_dir, tmp_path):
    """Feeding the waves as files reproduces the registered
    `streaming_triplets` batch query exactly (wave = batch id), and
    batch 0 mines nothing."""
    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES
    from m2_b3_market_data_pipeline_spark.streaming.triplet_sink import (
        read_corpus,
        read_triplets,
        run_triplet_stream,
    )

    waves = _wave_frames(spark, sf_dir)
    updates = str(tmp_path / "vec_in")
    state = str(tmp_path / "corpus_store")
    triplets_out = str(tmp_path / "triplets_out")
    ckpt = str(tmp_path / "tri_ckpt")

    def run():
        run_triplet_stream(
            spark,
            updates_path=updates,
            state_path=state,
            triplets_path=triplets_out,
            checkpoint_path=ckpt,
            schema=EMB_SCHEMA,
            query_predicate=f"vec_id % {TRIPLET_QUERY_MOD} = 0",
        ).awaitTermination(120)

    for i, w in enumerate(waves):
        w.write.parquet(f"{updates}/b{i}")
        run()
    run()  # replay-safe

    got = {
        tuple(r)
        for r in read_triplets(spark, triplets_out)
        .select("query_id", "label", "wave", "pos_id", "pos_cos", "neg_id", "neg_cos")
        .collect()
    }
    want = {tuple(r) for r in QUERIES["streaming_triplets"](spark, sf_dir).collect()}
    assert got == want and got, "sink must reproduce the batch wave mining"
    assert not any(w == 0 for _, _, w, _, _, _, _ in got)
    corpus_ids = {r.vec_id for r in read_corpus(spark, state).collect()}
    emb_ids = {r.vec_id for r in load(spark, sf_dir, "embeddings").collect()}
    assert corpus_ids == emb_ids  # every row admitted regardless of mining


def test_semdedup_stream_rejects_foreign_checkpoint(spark, sf_dir, tmp_path):
    """The assigned store refuses to merge under a different checkpoint
    identity — same crash-safety contract as agg/near-dedup sinks."""
    from m2_b3_market_data_pipeline_spark.streaming.semdedup_sink import (
        run_semdedup_stream,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % SEM_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    wave0 = _wave_frames(spark, sf_dir)[0]
    updates = str(tmp_path / "vec_in")
    state = str(tmp_path / "assigned_store")
    decisions_out = str(tmp_path / "decisions_out")
    wave0.write.parquet(f"{updates}/b0")

    def run(ckpt):
        q = run_semdedup_stream(
            spark,
            updates_path=updates,
            state_path=state,
            decisions_path=decisions_out,
            checkpoint_path=ckpt,
            schema=EMB_SCHEMA,
            centroids=centroids,
        )
        q.awaitTermination(120)

    run(str(tmp_path / "ckpt_a"))
    wave0.limit(1).write.mode("append").parquet(f"{updates}/b1")
    with pytest.raises(Exception, match="checkpoint"):
        run(str(tmp_path / "ckpt_b"))


def test_streaming_countmin_matches_batch_table(spark, sf_dir, tmp_path):
    """Draining document batches through the CM sink converges to
    EXACTLY the one-shot countmin_table over the union of all batches
    (counter merge is pure addition — the algebraic-aggregate case the
    partial-agg sink exists for), and estimates from the streamed state
    keep the one-sided error guarantee."""
    from pyspark.sql import types as T

    from m2_b3_market_data_pipeline_spark.operators.sketches import (
        countmin_estimate,
        countmin_table,
    )
    from m2_b3_market_data_pipeline_spark.streaming.countmin_sink import (
        read_countmin,
        run_incremental_countmin_stream,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    updates = str(tmp_path / "cm_updates")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter(F.col("doc_id") % 2 == 1)
    b1.write.parquet(f"{updates}/b1")
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
    )
    state = str(tmp_path / "cm_state")
    ckpt = str(tmp_path / "cm_ckpt")

    def drain():
        run_incremental_countmin_stream(
            spark,
            updates_path=updates,
            state_path=state,
            checkpoint_path=ckpt,
            schema=schema,
        ).awaitTermination(120)

    drain()
    b2.write.parquet(f"{updates}/b2")
    drain()

    streamed = {
        (r.row_id, r.bucket): r.cnt for r in read_countmin(spark, state).collect()
    }
    tok = docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word")).filter(
        F.col("word") != ""
    )
    direct = {
        (r.row_id, r.bucket): r.cnt
        for r in countmin_table(tok, "word", depth=3, width=8).collect()
    }
    assert streamed == direct

    exact = tok.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    est = countmin_estimate(
        read_countmin(spark, state), exact.select("word"), "word", depth=3, width=8
    )
    rows = exact.join(est, "word").collect()
    assert rows and all(r.cm_est >= r.exact_cnt for r in rows)
