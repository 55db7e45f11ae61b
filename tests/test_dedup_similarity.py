"""Dedup + similarity operators: known near-dups found, disjoint docs
not found, approximate methods bounded by the exact baselines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
    simhash_signatures,
)
from m2_b3_market_data_pipeline_spark.operators.similarity import (
    brute_force_topk,
    cosine,
    cosine_pairs_above,
    ivf_topk,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = "the quick brown fox jumps over the lazy dog near the river bank yesterday"
    far = "completely different words about spark partitions shuffles and catalyst optimizer internals"
    return spark.createDataFrame(
        [(1, base), (2, near), (3, far), (4, base)], "doc_id long, text string"
    )


def test_exact_dedup_deterministic_winner(spark):
    out = exact_dedup(_docs(spark), keys=["text"], tiebreak=["doc_id"])
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 2, 3]  # doc 4 (dup of 1) dropped, min doc_id kept


def test_minhash_finds_near_dup_and_skips_far(spark):
    pairs = {(r.id_a, r.id_b) for r in minhash_dedup_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 4) in pairs  # identical
    assert (1, 2) in pairs  # one-token difference
    assert not any(3 in p for p in pairs)


def test_incremental_pairs_delta_vs_corpus_only(spark):
    """The cross-relation join must surface delta->corpus near-dups and
    NEVER corpus-internal pairs (docs 1 and 4 are identical in the
    corpus but no (1,4) row may appear — that is the batch dedup's
    job)."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        minhash_incremental_pairs,
        release_cached,
    )

    corpus = _docs(spark)
    delta = spark.createDataFrame(
        [
            (101, "the quick brown fox jumps over the lazy dog near the river bank today indeed"),
            (102, "an entirely unrelated incoming document about gradient descent and tokenizers"),
        ],
        "doc_id long, text string",
    )
    out = minhash_incremental_pairs(delta, corpus, threshold=0.5)
    rows = out.collect()
    release_cached(out)
    got = {(r.delta_id, r.corpus_id) for r in rows}
    assert (101, 1) in got and (101, 4) in got  # near-copy of both twins
    assert not any(d == 102 for d, _ in got)    # unrelated delta stays out
    assert all(d >= 100 for d, _ in got)        # no corpus-internal pairs


def test_ngram_jaccard_exact_values(spark):
    out = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(_docs(spark), threshold=0.1).collect()}
    assert out[(1, 4)] == 1.0
    assert 0.5 < out[(1, 2)] < 1.0
    assert not any(3 in k for k in out)


def test_simhash_identical_docs_same_signature(spark):
    sigs = {
        r.doc_id: (r.simhash_lo, r.simhash_hi)
        for r in simhash_signatures(_docs(spark)).collect()
    }
    assert sigs[1] == sigs[4]
    assert sigs[1] != sigs[3]
    # both halves carry information and stay inside 32 unsigned bits
    for lo, hi in sigs.values():
        assert 0 <= lo < 2**32 and 0 <= hi < 2**32


def test_simhash_pigeonhole_matches_bruteforce(spark):
    sigs = simhash_signatures(_docs(spark))
    rows = sigs.collect()

    def ham(a, b):
        return (
            bin(a.simhash_lo ^ b.simhash_lo).count("1")
            + bin(a.simhash_hi ^ b.simhash_hi).count("1")
        )

    for max_hamming in (3, 7):  # 16-bit and 8-bit chunk layouts
        via_chunks = {
            (r.id_a, r.id_b)
            for r in simhash_near_pairs(sigs, max_hamming=max_hamming).collect()
        }
        brute = {
            (a.doc_id, b.doc_id)
            for a in rows
            for b in rows
            if a.doc_id < b.doc_id and ham(a, b) <= max_hamming
        }
        assert via_chunks == brute


def _vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
        (4, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_values(spark):
    df = _vecs(spark)
    a = df.filter("vec_id = 1").select(F.col("embedding").alias("a"))
    pairs = a.crossJoin(df.select(F.col("vec_id"), F.col("embedding").alias("b")))
    got = {
        r.vec_id: r.c
        for r in pairs.select(
            "vec_id",
            F.round(cosine(F.transform("a", lambda x: x.cast("double")),
                           F.transform("b", lambda x: x.cast("double"))), 4).alias("c"),
        ).collect()
    }
    assert got[1] == 1.0 and got[4] == -1.0 and got[3] == 0.0
    assert 0.99 < got[2] < 1.0


def test_brute_force_topk_order_and_exclusion(spark):
    df = _vecs(spark)
    out = brute_force_topk(df, df.filter("vec_id = 1"), k=2).collect()
    assert [r.neighbor_id for r in out] == [2, 3]  # self excluded, ranked by cosine
    assert [r.rn for r in out] == [1, 2]


def test_cosine_pairs_threshold(spark):
    pairs = {(r.id_a, r.id_b) for r in cosine_pairs_above(_vecs(spark), threshold=0.9).collect()}
    assert pairs == {(1, 2)}


def test_ivf_probing_all_cells_equals_exact(spark, sf_dir):
    """Equivalence: with nprobe = |cells| the IVF path degenerates to
    brute force — same pairs, same cosines, same ranks. Pins that the
    cell routing only *restricts* the candidate set, never corrupts
    scoring."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 50 == 0)
    n_cells = centroids.count()
    exact = {
        (r.query_id, r.rn): (r.neighbor_id, r.cos)
        for r in brute_force_topk(emb, queries, k=3).collect()
    }
    full_probe = {
        (r.query_id, r.rn): (r.neighbor_id, r.cos)
        for r in ivf_topk(emb, queries, centroids, k=3, nprobe=n_cells).collect()
    }
    assert full_probe == exact


def test_ivf_recall_against_exact(spark, sf_dir):
    """IVF probe of 2 cells must recover most of the exact top-5 — and
    every IVF hit must carry the same cosine the exact path computes."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    centroids = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r.query_id, r.neighbor_id): r.cos
        for r in brute_force_topk(emb, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id): r.cos
        for r in ivf_topk(emb, queries, centroids, k=5, nprobe=2).collect()
    }
    hits = set(exact) & set(approx)
    recall = len(hits) / len(exact)
    assert recall >= 0.5, f"IVF recall {recall:.2f} below floor"
    for key in hits:
        assert exact[key] == approx[key]


def test_lsh_near_dups_subset_of_exact_with_recall(spark, sf_dir):
    """The registered embedding_near_dups path (LSH candidates + exact
    verify) must be a SUBSET of the quadratic ground truth with identical
    cosines (precision 1.0 — the verify step guarantees it), and recall
    above a floor at the registered band layout."""
    from m2_b3_market_data_pipeline_spark.operators.similarity import lsh_near_dup_pairs

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_pairs_above(emb, threshold=0.45).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.cos
        for r in lsh_near_dup_pairs(emb, dim=64, threshold=0.45).collect()
    }
    assert set(approx) <= set(exact)
    for key, cos in approx.items():
        assert exact[key] == cos
    assert exact, "vacuous fixture: no exact pairs at threshold"
    recall = len(approx) / len(exact)
    assert recall >= 0.4, f"LSH recall {recall:.2f} below floor"


def test_minhash_cache_released(spark):
    """The persisted signature frame is scoped to the result: after the
    consuming action + release_cached, no cached RDDs linger."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached

    # Check the scoped frame's own storage level rather than counting
    # session-wide persistent RDDs: other operators legitimately hold
    # session-lifetime entries (connected_components' localCheckpoint)
    # and the ContextCleaner drops them asynchronously, so global counts
    # are racy.
    result = minhash_dedup_pairs(_docs(spark), threshold=0.5)
    result.count()
    (signed,) = result._cached_frames
    assert signed.storageLevel.useMemory or signed.storageLevel.useDisk
    release_cached(result)
    assert not (signed.storageLevel.useMemory or signed.storageLevel.useDisk)


def test_pq_codes_centroids_self_code(spark, sf_dir):
    """A vector that IS a codebook entry quantizes to itself at dist 0
    in every subspace."""
    from pyspark.sql import functions as F

    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES
    from m2_b3_market_data_pipeline_spark.plans.expansion_similarity import CENTROID_MOD, PQ_SUB

    out = QUERIES["pq_codes"](spark, sf_dir)
    cent_rows = out.filter(F.col("vec_id") % CENTROID_MOD == 0)
    assert cent_rows.filter(F.col("dist") != 0.0).count() == 0
    # every vector gets exactly PQ_SUB codes
    bad = out.groupBy("vec_id").count().filter(F.col("count") != PQ_SUB)
    assert bad.count() == 0


def test_pq_codes_single_exchange_plan(spark, sf_dir):
    """r16 projection form: the code argmin is a map pass against the
    one-row broadcast codebook array — the CORPUS never shuffles at all
    (the r15 form shuffled |corpus| x n_sub partial-argmin rows into a
    SortAggregate), and the codebook gather's scan is coalesce(1)-folded
    into its single final task (the one-row merge is single-task either
    way — the broadcast bound), so there is NO non-broadcast exchange
    anywhere in the plan: no hashpartitioning, no SinglePartition, no
    SortMergeJoin, no sort-based aggregate."""
    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES

    plan = QUERIES["pq_codes"](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange SinglePartition" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "SortAggregate" not in plan, plan


def test_pq_ann_topk_invariants(spark, sf_dir):
    """ADC search: exactly k neighbors per query, non-negative distances,
    ranks total-ordered, and no self-matches."""
    from pyspark.sql import functions as F

    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES
    from m2_b3_market_data_pipeline_spark.plans.expansion_similarity import TOP_K

    out = QUERIES["pq_ann_topk"](spark, sf_dir).cache()
    try:
        per_q = out.groupBy("query_id").agg(
            F.count("*").alias("n"), F.collect_set("rn").alias("rns")
        )
        assert per_q.filter(F.col("n") != TOP_K).count() == 0
        assert out.filter(F.col("adist") < 0).count() == 0
        assert out.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
        # adist is non-decreasing in rank within each query
        from pyspark.sql import Window as W

        prev = F.lag("adist").over(W.partitionBy("query_id").orderBy("rn"))
        assert out.withColumn("p", prev).filter(F.col("p") > F.col("adist")).count() == 0
    finally:
        out.unpersist()
