"""Round-9 streaming addition: the BM25 postings-stats sink.

Batch equivalence is the load-bearing pin — draining document batches
through the sink and scoring with the streamed statistics must
reproduce the one-shot ``bm25_topk`` over the union row-for-row."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from m2_b3_market_data_pipeline_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_with_stats,
)
from m2_b3_market_data_pipeline_spark.streaming.postings_sink import (
    read_bm25_stats,
    run_bm25_stats_stream,
)

_QUERIES = {"q1": ("spark", "table"), "q2": ("window", "merge", "stream")}

_SCHEMA = T.StructType(
    [T.StructField("doc_id", T.LongType()), T.StructField("text", T.StringType())]
)


def _drain(spark, updates, state, ckpt):
    run_bm25_stats_stream(
        spark,
        updates_path=updates,
        state_path=state,
        checkpoint_path=ckpt,
        schema=_SCHEMA,
    ).awaitTermination(120)


def test_streamed_stats_match_batch_and_score_identically(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    updates = str(tmp_path / "updates")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{updates}/b1")
    _drain(spark, updates, state, ckpt)
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{updates}/b2")
    _drain(spark, updates, state, ckpt)

    term_stats, corpus_stats = read_bm25_stats(spark, state)

    # statistics equivalence: df per term, N, avgdl
    toks = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.filter(
            F.split(F.lower(F.trim("text")), r"\s+"), lambda x: x != F.lit("")
        ).alias("t"),
    )
    direct_df = {
        r["t"]: r["c"]
        for r in toks.select(F.explode(F.array_distinct("t")).alias("t"))
        .groupBy("t")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    streamed_df = {r["term"]: r["__df"] for r in term_stats.collect()}
    assert streamed_df == direct_df

    cs = corpus_stats.collect()[0]
    n_docs = toks.count()
    assert cs["__n_docs"] == n_docs
    total_dl = toks.select(F.sum(F.size("t")).alias("s")).collect()[0]["s"]
    assert cs["__avgdl"] == total_dl / n_docs

    # end-to-end: scoring with streamed stats == the one-shot batch query
    got = bm25_topk_with_stats(docs, _QUERIES, term_stats, corpus_stats).collect()
    want = bm25_topk(docs, _QUERIES).collect()
    assert got == want


def test_state_is_vocab_bounded_not_corpus_bounded(spark, tmp_path):
    """Re-landing the SAME vocabulary in new docs must grow doc counts
    but NOT the state row count — the |vocab| + 1 invariant."""
    rows1 = [(i, "alpha beta gamma") for i in range(10)]
    rows2 = [(100 + i, "alpha beta gamma") for i in range(50)]
    updates = str(tmp_path / "updates")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows1, _SCHEMA).write.parquet(f"{updates}/b1")
    _drain(spark, updates, state, ckpt)
    n1 = spark.read.parquet(state).count()
    spark.createDataFrame(rows2, _SCHEMA).write.parquet(f"{updates}/b2")
    _drain(spark, updates, state, ckpt)
    n2 = spark.read.parquet(state).count()
    assert n1 == n2 == 4  # 3 vocab terms + 1 corpus row
    term_stats, corpus_stats = read_bm25_stats(spark, state)
    assert {r["__df"] for r in term_stats.collect()} == {60}
    assert corpus_stats.collect()[0]["__n_docs"] == 60


def test_null_text_docs_do_not_enter_the_stats(spark, tmp_path):
    rows = [(1, "x y"), (2, None)]
    updates = str(tmp_path / "updates")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(rows, _SCHEMA).write.parquet(f"{updates}/b1")
    _drain(spark, updates, state, ckpt)
    _, corpus_stats = read_bm25_stats(spark, state)
    assert corpus_stats.collect()[0]["__n_docs"] == 1
