"""Round-6 second wave: SemDeDup, duplicated-span coverage, frame dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.dedup import (
    dup_ngram_coverage,
    fan_out,
    release_cached,
)
from m2_b3_market_data_pipeline_spark.operators.embeddings import semdedup
from m2_b3_market_data_pipeline_spark.operators.multimodal import (
    attach_binary,
    frame_dedup,
    sample_frames,
)


def _vec(seed: float, dim: int = 8) -> list[float]:
    # deterministic, pairwise-dissimilar unless identical seed
    return [((seed * (i + 3)) % 7.0) - 3.0 for i in range(dim)]


def test_semdedup_prunes_duplicate_within_cluster(spark):
    # vec 10 duplicates vec 5 exactly (cosine 1.0); everything else is
    # pairwise dissimilar. The duplicate must be pruned, its lower-id
    # twin kept, and every vector must appear exactly once.
    rows = [(i, _vec(float(i) + 0.5)) for i in range(10)] + [(10, _vec(5.5))]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semdedup(emb, k=2, iters=1, threshold=0.99).collect()
    assert len(out) == 11
    by_id = {r.vec_id: r for r in out}
    assert by_id[10].pruned, "exact duplicate with a lower-id twin must prune"
    assert not by_id[5].pruned, "the lower-id representative must survive"
    # same cluster (identical vectors cannot land in different cells)
    assert by_id[10].centroid_id == by_id[5].centroid_id


def test_semdedup_does_not_prune_across_clusters(spark):
    # Two identical PAIRS seeded far apart; with k=2 each pair lands in
    # its own cluster and only the higher id of each pair prunes.
    a, b = [10.0] * 4, [-10.0] * 4
    emb = spark.createDataFrame(
        [(0, a), (1, b), (2, a), (3, b)],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r.pruned for r in semdedup(emb, k=2, iters=1, threshold=0.99).collect()}
    assert out == {0: False, 1: False, 2: True, 3: True}


def test_dup_ngram_coverage_interval_union(spark):
    # Docs 1 and 2 share a 6-token run => two overlapping 5-gram
    # positions, covering 6 distinct token indices (union, not 10).
    shared = "alpha beta gamma delta epsilon zeta"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} unique one two"),
            (2, f"other start {shared}"),
            (3, "nothing in common with anybody else at all"),
            (4, "tiny doc"),  # < n tokens
        ],
        "doc_id long, text string",
    )
    out = dup_ngram_coverage(docs, n=5, min_df=2)
    got = {r.doc_id: r for r in out.collect()}
    release_cached(out)
    assert got[1].dup_positions == 2 and got[1].covered_tokens == 6
    assert got[2].dup_positions == 2 and got[2].covered_tokens == 6
    assert got[1].n_tok == 9
    assert abs(got[1].dup_frac - round(6 / 9, 6)) < 1e-9
    assert got[3].dup_positions == 0 and got[3].covered_tokens == 0
    assert got[3].dup_frac == 0.0
    # short doc still reports a row, all zeros
    assert got[4].n_tok == 2 and got[4].covered_tokens == 0


def test_dup_ngram_coverage_within_doc_repeat_not_counted(spark):
    # A 5-gram repeated twice INSIDE one doc but appearing in no other
    # doc has document frequency 1 — not a cross-doc duplicate.
    phrase = "one two three four five"
    docs = spark.createDataFrame(
        [(1, f"{phrase} filler {phrase}"), (2, "entirely different words here now")],
        "doc_id long, text string",
    )
    out = dup_ngram_coverage(docs, n=5, min_df=2)
    got = {r.doc_id: r for r in out.collect()}
    release_cached(out)
    assert got[1].dup_positions == 0 and got[1].covered_tokens == 0


def test_frame_dedup_finds_planted_duplicate_payloads(spark):
    # Two identical 64-byte payloads share all 4 frames; the unique
    # payload contributes none.
    dup_text = "x" * 16 + "y" * 16 + "z" * 16 + "w" * 16
    docs = spark.createDataFrame(
        [(1, dup_text), (2, dup_text), (3, "q" * 70)],
        "doc_id long, text string",
    )
    frames = sample_frames(fan_out(attach_binary(docs)), n_frames=4, frame_bytes=16)
    out = frame_dedup(frames).collect()
    # the 4 shared frames (xxxx/yyyy/zzzz/wwww windows may collide if
    # stride aligns equal content — count hashes, assert each spans docs 1+2)
    assert out, "planted duplicate payloads must surface"
    for r in out:
        assert r.n_docs == 2 and r.min_doc_id == 1 and r.n_frames == 2
