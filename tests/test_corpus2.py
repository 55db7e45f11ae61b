"""Wave-2 corpus curation: connected components, chunking, entropy,
decontamination, and embedding hygiene, on small known inputs.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.corpus import (
    chunk_documents,
    contamination_overlap,
    with_char_entropy,
)
from m2_b3_market_data_pipeline_spark.operators.embeddings import (
    assign_centroids,
    l2_normalize,
    quantize_int8,
)
from m2_b3_market_data_pipeline_spark.operators.graph import connected_components


def test_connected_components_chain_and_singleton(spark):
    # chain 1-2-3-4 plus disjoint pair 10-11 plus isolated 99
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    nodes = spark.createDataFrame([(n,) for n in [1, 2, 3, 4, 10, 11, 99]], "node long")
    out = {r.node: r.cluster_id for r in connected_components(pairs, nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_connected_components_direction_agnostic(spark):
    # min id on the *right* side of an edge must still win the component
    pairs = spark.createDataFrame([(5, 1), (5, 9)], "id_a long, id_b long")
    nodes = spark.createDataFrame([(1,), (5,), (9,)], "node long")
    out = {r.node: r.cluster_id for r in connected_components(pairs, nodes).collect()}
    assert out == {1: 1, 5: 1, 9: 1}


def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    # starts 1,4,7,10 -> lens 4,4,4,1
    assert [r.start_token for r in rows] == [1, 4, 7, 10]
    assert [r.chunk_len for r in rows] == [4, 4, 4, 1]
    assert rows[0].chunk_md5 != rows[1].chunk_md5


def test_char_entropy_known_values(spark):
    df = spark.createDataFrame(
        [(1, "aabb"), (2, "aaaa"), (3, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r.char_entropy for r in with_char_entropy(df).collect()}
    assert out[1] == 1.0  # two symbols, uniform -> 1 bit
    assert out[2] == 0.0  # single symbol -> 0 bits
    assert out[3] is None  # empty text -> null, not NaN
    # uniform over 4 symbols -> 2 bits
    df2 = spark.createDataFrame([(4, "abcd")], "doc_id long, text string")
    assert with_char_entropy(df2).collect()[0].char_entropy == round(
        math.log2(4), 6
    )


def test_contamination_overlap_flags(spark):
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma zeta"),  # shares 3-gram 'alpha beta gamma'
            (2, "unrelated words entirely here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in contamination_overlap(train, bench, ngram=3).collect()}
    assert out[1].contaminated and out[1].n_overlap_grams == 1
    assert out[1].n_bench_docs == 1
    assert not out[2].contaminated and out[2].n_overlap_grams == 0


def test_l2_normalize_unit_norm(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])], "vec_id long, embedding array<double>"
    )
    out = {r.vec_id: r for r in l2_normalize(df).collect()}
    assert out[1].l2_norm == 5.0
    assert out[1].unit == [0.6, 0.8]
    assert out[2].unit is None  # zero vector -> null, not NaN


def test_quantize_int8_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, [1.27, -1.27, 0.635, 0.0])], "vec_id long, embedding array<double>"
    )
    r = quantize_int8(df).collect()[0]
    assert r.q_vec == [127, -127, 64, 0]  # scale = 0.01, 0.635/0.01 -> 63.5 -> 64
    assert abs(r.q_scale - 0.01) < 1e-12
    # reconstruction error only from the one rounded component:
    # (0.635 - 64*0.01)^2 / 4 = 0.005^2 / 4
    assert abs(r.q_mse - 0.005**2 / 4) < 1e-12


def test_assign_centroids_argmin_and_tiebreak(spark):
    emb = spark.createDataFrame(
        [(10, [0.9, 0.0]), (11, [0.0, 1.1]), (12, [5.0, 5.0])],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [5.0, 5.0])],
        "centroid_id int, centroid array<double>",
    )
    out = {r.vec_id: r.centroid_id for r in assign_centroids(emb, cents).collect()}
    assert out == {10: 0, 11: 1, 12: 2}
    # exact tie -> lowest centroid id wins
    tie = spark.createDataFrame([(7, [0.5, 0.5])], "vec_id long, embedding array<double>")
    out2 = assign_centroids(
        tie,
        spark.createDataFrame(
            [(3, [0.0, 0.0]), (1, [1.0, 1.0])], "centroid_id int, centroid array<double>"
        ),
    ).collect()[0]
    assert out2.centroid_id == 1


def test_kmeans_iterate_converges_on_separated_clusters(spark):
    """Two well-separated blobs, k=2, seeds both in blob A (ids 0,1):
    after one Lloyd iteration the centroid update must pull one cluster
    onto blob B and the final assignment must split the blobs exactly."""
    from m2_b3_market_data_pipeline_spark.operators.embeddings import kmeans_iterate

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.4, 0.0]),
        (2, [0.0, 0.4]),
        (3, [10.0, 10.0]),
        (4, [10.4, 10.0]),
        (5, [10.0, 10.4]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r.vec_id: r for r in kmeans_iterate(df, k=2, iters=2).collect()}
    assert len(out) == len(rows)  # every vector assigned exactly once
    blob_a = {out[i].centroid_id for i in (0, 1, 2)}
    blob_b = {out[i].centroid_id for i in (3, 4, 5)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    # converged centroid for blob A is its mean (0.4/3, 0.4/3) -> the
    # squared distance for vec 0 is 2 * (0.4/3)^2
    assert abs(out[0].sq_dist - 2 * (0.4 / 3) ** 2) < 1e-4
    # determinism: a second run yields identical assignments and distances
    again = {r.vec_id: r for r in kmeans_iterate(df, k=2, iters=2).collect()}
    assert {k: (v.centroid_id, v.sq_dist) for k, v in out.items()} == {
        k: (v.centroid_id, v.sq_dist) for k, v in again.items()
    }


def test_twophase_cc_matches_label_prop_on_random_graph(spark):
    """Both CC algorithms must label identically on a random graph."""
    import random

    from m2_b3_market_data_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )

    rng = random.Random(7)
    n = 200
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges if a != b], "id_a long, id_b long"
    )
    nodes = spark.range(n).withColumnRenamed("id", "node")
    a = {
        r.node: r.cluster_id
        for r in connected_components(pairs, nodes, max_iter=250).collect()
    }
    b = {
        r.node: r.cluster_id
        for r in connected_components_twophase(pairs, nodes).collect()
    }
    assert a == b


def test_twophase_cc_converges_on_long_chain(spark):
    """A 400-node chain has diameter 400: label propagation needs ~400
    rounds (it raises at its cap), while the two-phase algorithm
    converges in O(log^2 n) rounds and labels the whole chain 0."""
    import pytest

    from m2_b3_market_data_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )

    n = 400
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    nodes = spark.range(n).withColumnRenamed("id", "node")
    out = connected_components_twophase(pairs, nodes).collect()
    assert {r.cluster_id for r in out} == {0}
    assert len(out) == n
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, nodes, max_iter=5).collect()


def test_cc_converges_fast_on_near_dup_fixture(spark, sf_dir):
    """Rounds-to-convergence telemetry on the REAL dedup graph (MinHash
    pairs over the documents fixture): near-dup components are
    small-diameter clouds, so label propagation must converge in <= 5
    rounds and the two-phase variant in <= 6 — a fixture or algorithm
    change that degrades convergence (and thus per-query shuffle count)
    trips this before it shows up as bench regression."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        minhash_dedup_pairs,
        release_cached,
    )
    from m2_b3_market_data_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_twophase,
    )
    from m2_b3_market_data_pipeline_spark.plans.expansion_dedup import (
        JACCARD_THRESHOLD,
    )
    from m2_b3_market_data_pipeline_spark.plans.registry import load

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_dedup_pairs(docs, threshold=JACCARD_THRESHOLD)
    lp_stats: dict = {}
    ts_stats: dict = {}
    lp = connected_components(
        pairs, docs.select("doc_id"), node_col="doc_id", stats=lp_stats
    ).collect()
    ts = connected_components_twophase(
        pairs, docs.select("doc_id"), node_col="doc_id", stats=ts_stats
    ).collect()
    release_cached(pairs)
    assert {(r.doc_id, r.cluster_id) for r in lp} == {
        (r.doc_id, r.cluster_id) for r in ts
    }
    assert 1 <= lp_stats["rounds"] <= 5, lp_stats
    assert 1 <= ts_stats["rounds"] <= 6, ts_stats
