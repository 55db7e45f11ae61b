"""Round-10 additions: the hashed-feature NB variant (bounded model
broadcast at open vocabulary) and the MMR shortlist recall gate.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bucket(tok: str, n_buckets: int, seed: int) -> int:
    """Python twin of seeded_hash60(tok, seed) % n_buckets."""
    return int(hashlib.md5(f"{seed}|{tok}".encode()).hexdigest()[:15], 16) % n_buckets


@_slow
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", None]),
            st.lists(
                st.sampled_from(["u", "v", "w", "x", "yy", "zz", "qq"]),
                min_size=0,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    n_buckets=st.sampled_from([2, 3, 5]),
)
def test_nb_hashed_golden_recompute_property(spark, docs, n_buckets):
    """The hashed-feature NB (n_buckets set) matches a plain-Python
    recompute of the SAME alpha=1 multinomial definition run over
    bucket ids instead of tokens: vocabulary = occupied training
    buckets, smoothing denominator = that bucket-vocab size, OOV drop
    = docs whose buckets are all unoccupied. n_buckets is chosen well
    below the 7-token alphabet so collisions actually fold features."""
    from m2_b3_market_data_pipeline_spark.operators.text import (
        NB_HASH_SEED,
        nb_lang_scores,
    )

    rows = [(i, lab, " ".join(toks)) for i, (lab, toks) in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r
        for r in nb_lang_scores(sdf, n_buckets=n_buckets).collect()
    }

    from collections import Counter

    bdocs = [
        (lab, [_bucket(t, n_buckets, NB_HASH_SEED) for t in toks])
        for lab, toks in docs
    ]
    labeled = [(lab, bs) for lab, bs in bdocs if lab is not None]
    counts: dict[str, Counter] = {}
    for lab, bs in labeled:
        counts.setdefault(lab, Counter()).update(bs)
    vocab = sorted({b for c in counts.values() for b in c})
    labels = sorted(counts)
    if not labels or not vocab:
        assert got == {}
        return
    n_train = len(labeled)
    prior = {
        l: math.log(sum(1 for la, _ in labeled if la == l) / n_train)
        for l in labels
    }
    tot = {l: sum(counts[l].values()) for l in labels}
    lp = {
        (b, l): math.log((counts[l].get(b, 0) + 1.0) / (tot[l] + len(vocab)))
        for b in vocab
        for l in labels
    }
    vset = set(vocab)
    for i, (lab, bs) in enumerate(bdocs):
        known = [b for b in bs if b in vset]
        if not known:
            assert i not in got
            continue
        posts = {
            l: round(prior[l] + sum(lp[(b, l)] for b in known), 6) + 0.0
            for l in labels
        }
        best = sorted(posts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[i]["pred_lang"] == best[0], (i, posts, got[i])
        assert abs(got[i]["log_post"] - best[1]) < 1e-9


def test_nb_hashed_model_bounded_by_buckets(spark):
    """The broadcast-size invariant the variant exists for: with a
    corpus vocabulary far wider than n_buckets, the scored relation
    still behaves (every non-empty doc scores — no OOV drops once all
    buckets are occupied) and the internal feature space is the bucket
    range, not the vocabulary. Checked from the outside: 200 distinct
    tokens, n_buckets=4, every labeled doc present in the output."""
    from m2_b3_market_data_pipeline_spark.operators.text import nb_lang_scores

    rows = [
        (i, "aa" if i % 2 == 0 else "bb", f"tok{i} tok{i + 100} shared")
        for i in range(100)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = nb_lang_scores(sdf, n_buckets=4).collect()
    assert len(out) == 100  # 300 distinct tokens all fold into 4 buckets
    # And the dense form on the same corpus carries a 300-token vocab —
    # the hashed model's feature space is 75x smaller by contract.
    dense = nb_lang_scores(sdf).collect()
    assert len(dense) == 100


def test_triangle_subgraph_sample_pushes_below_edge_build(spark, sf_dir):
    """The md5 part sample must filter the (order, part) pairs BEFORE
    the co-purchase self-join — sampling after edge build would cost
    the full quadratic pairing at 100 TB (the pagerank-witness pin,
    applied to the triangle witness). Logical plans print root-first,
    so a filter BELOW the join appears AFTER the first Join line."""
    from m2_b3_market_data_pipeline_spark.plans.graph_queries import (
        triangle_coparts_subgraph,
    )

    df = triangle_coparts_subgraph(spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    for f in getattr(df, "_cached_frames", []):
        f.unpersist()
    first_md5 = plan.find("md5")
    first_join = plan.find("Join")
    assert first_md5 != -1 and first_join != -1
    assert first_md5 > first_join, plan[:2000]


def test_dedup_clusters_sample_filters_before_shingling(spark, sf_dir):
    """The doc sample must reach the scan side of the signature
    pipeline, so 15/16 of docs are never shingled or hashed. The final
    clusters frame is a LogicalRDD (connected_components
    localCheckpoints each round), so the pin inspects the PAIRS stage
    the query builds — the same sampled relation
    (plans/expansion_corpus2.py::dedup_clusters_sample): the
    md5(doc_id) sample filter prints BELOW (after, in root-first
    order) the signature work, i.e. it feeds the scan, not the pair
    output."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        minhash_dedup_pairs,
        release_cached,
    )
    from m2_b3_market_data_pipeline_spark.plans.expansion_corpus2 import (
        _DOC_SAMPLE_SQL,
        JACCARD_THRESHOLD,
    )
    from m2_b3_market_data_pipeline_spark.plans.registry import load

    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.expr(_DOC_SAMPLE_SQL))
    )
    pairs = minhash_dedup_pairs(docs, threshold=JACCARD_THRESHOLD)
    # The pair frame's own plan hides the scan behind the persisted
    # signature frame (InMemoryRelation leaf), so inspect THAT frame:
    # the sample predicate must appear in the file scan's DataFilters —
    # evaluated per row AT the scan, before any shingle/min-hash work.
    sig_plan = pairs._cached_frames[0]._jdf.queryExecution().optimizedPlan().toString()
    release_cached(pairs)
    scan_filters = sig_plan.find("DataFilters: [")
    assert scan_filters != -1, sig_plan[:2000]
    assert "substr(md5(cast(cast(doc_id" in sig_plan[scan_filters : scan_filters + 300], (
        sig_plan[scan_filters : scan_filters + 300]
    )


def test_mmr_recall_overlap_bounds(spark, sf_dir):
    """Structural invariants of the recall sweep: one row per swept
    shortlist, n_selected <= k, overlap_frac = n_overlap / n_selected
    exactly. Overlap is deliberately NOT asserted monotone in the
    shortlist: a larger pool can reroute the greedy trajectory away
    from exact-selection members — measured immediately at sf0.001
    (shortlist 8 -> 0.875 but 16 -> 0.75 before 32 -> 1.0), the same
    lesson as the corpus-decay curve in SCALE.md §18."""
    from m2_b3_market_data_pipeline_spark.plans import all_queries

    rows = {
        r["shortlist"]: r
        for r in all_queries.QUERIES["mmr_recall_check"](spark, sf_dir).collect()
    }
    # Round 11 extends the sweep with the shortlist=0 sentinel (the
    # reachable-band rule, r10 verdict item 5) — and the band THEOREM
    # says that row's overlap is exactly 1.0.
    assert sorted(rows) == [0, 8, 16, 32]
    for s in (0, 8, 16, 32):
        r = rows[s]
        assert 0 < r["n_selected"] <= 8
        assert 0 <= r["n_overlap"] <= r["n_selected"]
        assert abs(r["overlap_frac"] - round(r["n_overlap"] / r["n_selected"], 6)) < 1e-9
    assert rows[0]["overlap_frac"] == 1.0


def test_minhash_join_strategy_sizing_rule(spark, sf_dir):
    """The sf30 finding's rule, pinned both ways: at fixture scale the
    minhash pair path keeps the estimator's broadcasts (zero
    SortMergeJoin — the same-window A/B showed forced-merge costing
    +27%/+87% where broadcast fits), while force_shuffle pins every
    corpus-derived join to sort-merge (the shape that survived sf30
    where the auto-broadcast died). The threshold constant carries the
    measured boundary."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        SHUFFLE_JOIN_MIN_DOCS,
        jaccard_verify,
        lsh_candidate_pairs,
        release_cached,
        with_minhash,
    )
    from m2_b3_market_data_pipeline_spark.plans import all_queries
    from m2_b3_market_data_pipeline_spark.plans.registry import load

    assert 438_350 < SHUFFLE_JOIN_MIN_DOCS < 1_059_006  # the measured boundary

    # Small corpus -> the registered query keeps the broadcast plan.
    df = all_queries.QUERIES["minhash_dedup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    release_cached(df)
    assert "SortMergeJoin" not in plan, plan[:1500]

    # force_shuffle -> every pair-path join is sort-merge, none broadcast.
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    signed = with_minhash(docs).persist()
    try:
        pairs = lsh_candidate_pairs(signed, force_shuffle=True)
        out = jaccard_verify(
            pairs, signed.select("doc_id", "sh"), threshold=0.5, force_shuffle=True
        )
        forced = out._jdf.queryExecution().executedPlan().toString()
    finally:
        signed.unpersist()
    # >= 3 sort-merge joins = the banded self-join + both verify joins.
    # with_minhash's internal signature left-join stays
    # estimator-decided (NOT hinted): its build side is an AGGREGATE
    # output whose runtime size AQE measures accurately — at sf30 it
    # chose sort-merge by itself (the probe recorded 11 SMJ / 0 BHJ),
    # while at fixture scale its broadcast is correct and cheap.
    assert forced.count("SortMergeJoin") >= 3, forced[:1500]
