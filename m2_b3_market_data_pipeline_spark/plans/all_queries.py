"""Aggregates every query module into the central registry.

Importing this module populates ``QUERIES`` / ``ORACLES`` with the full
operator inventory. Split by area to keep modules reviewable:

- reference_queries: SURVEY.md §2 reference-surface operators
- sql_surface:       Athena-replacement relational surface (joins, windows,
                     set ops, rollup, top-k) on the TPC-H-ish fixtures
- expansion_*:       LLM-data-pipeline operators (dedup, similarity, text,
                     multimodal) per the BASELINE.json north star
"""

from __future__ import annotations

from . import (  # noqa: F401
    analytics_wave7,
    cdc_merge,
    contrastive_mining,
    corpus_quality,
    data_quality,
    dedup_quality,
    expansion_corpus,
    expansion_corpus2,
    expansion_dedup,
    expansion_embeddings,
    expansion_similarity,
    expansion_text,
    expansion_text2,
    expansion_wave6,
    expansion_wave8,
    events_analytics,
    formats_queries,
    graph_queries,
    market_indicators,
    media_queries,
    partsupp_tpch,  # noqa: F401 (registers via decorator)
    reference_queries,
    retrieval_quality,
    scaled_knobs,
    sketch_queries,
    sql_surface,
    sql_surface2,
    sql_surface3,
    sql_surface4,
    sql_surface5,
    stats_analytics,
    streaming_queries,
    tokenizer_queries,
)
from .registry import ORACLES, QUERIES

# The correctness driver hash-checks only the FIRST 50 registered queries,
# in insertion order. Import order alone is too coarse (order within a
# module is fixed), so re-order QUERIES explicitly, rotating per round so
# every registered query accumulates a hash-checked driver row:
#
# - round 1 (original order) evidenced 26 queries (CORRECTNESS_r01.json);
# - rounds 2-3 front-loaded the reference surface + indicators + TPC-H
#   q2..q22 + wave 5 — all 50 PASS (CORRECTNESS_r02/r03.json);
# - round 4 front-loaded the 55 queries with no driver row in any prior
#   round (CDC/SCD2, data quality, corpus prep, embedding hygiene/PQ,
#   events/stats analytics, remaining relational surface, streaming
#   windows) — all 50 window slots PASS (CORRECTNESS_r04.json);
# - round 5 front-loaded the final 23 queries with no driver row in
#   r01-r04 (completing cumulative coverage) + a reference-surface and
#   dedup/text/similarity re-proof — all 48 oracle slots PASS
#   (CORRECTNESS_r05.json; the 2 non-green were no_oracle sketches);
# - round 6 (this order): the 8 round-5 additions landed BEHIND the
#   window and have no driver row yet — they go first, with the 18 new
#   round-6 queries (literal partsupp TPC-H graphs incl. the real Q9
#   profit measure, sketch accuracy checks replacing the no_oracle
#   rows, ANN + LSH recall evidence, mixture enforcement, boilerplate,
#   fertility, funnel, ORC round trip, audio frame energy). Then the
#   stalest
#   evidence: the 14 queries whose only green row is round 1, the
#   rotation-due indicator, the streaming windows (last green r4), the
#   PQ/k-means family (last green r3), the anchor, and the TPC-H
#   relational core (last green r2/r3).
#
# Queries already green in a prior round rotate past slot 50 — their
# evidence is on record in those CORRECTNESS files.
#
# Round 7: the 7 queries that landed after the r6 window
# filled go FIRST (their only verification so far is local + the r6
# judge's independent re-run; the driver row is the hard evidence).
# Then the two ANN queries whose PHYSICAL PLAN changed this round (the
# exploded-band equi-join rewrite of ann_topk) — plan changes get a
# fresh driver row on principle, even though r6 rows exist. Then the
# stalest evidence: all 33 queries whose newest green row is r3
# (TPC-H relational core q2/q4/q6..q22, as-of/band joins, indicators,
# resampling, skew/salting, splits), keeping max row age <= 3 rounds.
# The remaining slots take the oldest r4-era rows alphabetically; new
# round-7 queries displace those fills as they land (the round-5
# lesson: new queries go in the window the round they are born). The
# fills ran out before the round-7 wave did, so bloom_decontaminate_-
# check displaces set_ops from the r3-stale block (except_op keeps the
# set-operations family in-window; set_ops' r3 row stands and it
# front-loads in r8), and triangle_coparts displaces distinct_agg
# (whose r2-era row stands; aggregation stays covered by the TPC-H
# block and salted_skew_agg), and ivfpq_rerank_topk displaces lead_lag
# (window-function family stays covered by rolling_mean_time_range and
# resample_ohlc), dup_span_removal displaces band_join_revenue
# (range-join family stays covered by asof_join_quotes), and
# copurchase_reach displaces indicator_ewma (indicator family stays
# covered by indicator_bollinger).
# Round 8 (this order): the new-born queries go first
# (bpe_apply_check — tokenizer inference under the frozen golden merge
# table, closing the BPE family's last evidence gap; and
# copurchase_reach_iter — the frontier-BFS scale path registered after
# the sf1 sweep showed the recursive-CTE form tripping the recursion
# row limit at 10x data, same oracle, cross-form equality pinned;
# token_pack yields its fill slot to it and rolls to r9). Then the 5
# queries whose PHYSICAL PLAN or semantics changed this round and
# re-prove on principle: countmin_check (left-join + coalesce-0
# estimates), pagerank_cosuppliers (node universe = union(src, dst)),
# dup_span_removal (NULL-text degrade), triangle_coparts (rank-pack id
# guard in the plan), tfidf_top_terms (parallelism floor scoped off its
# chain), the two salting queries (rand salt replaced by the
# deterministic row-hash salt — salted_skew_join rides the r4-era fill,
# salted_skew_agg displaces the last fill), and dsir_weights (the sf1
# differential sweep exposed an IEEE -0.0 vs +0.0 hash divergence on a
# cancelled log-ratio sum; both edges now fold to +0.0, displacing
# sliding_window to the r9 front-load). Then the 5 r3-stale rows
# the r7 rotation explicitly queued (README "Correctness evidence
# across rounds"): set_ops, distinct_agg, lead_lag, band_join_revenue,
# indicator_ewma. The remaining slots take the oldest (r4-era) rows
# alphabetically; 5 r4-era rows (trending_daily, value_histogram,
# window_distribution, window_running_total, zscore_anomalies) roll to
# the r9 front-load. New queries registered later this round displace
# fills from the END, as always: gopher_rules and
# source_temperature_weights, and c4_line_filters (born round 8, after
# the adversarial sweep closed) displace scd2_user_values,
# sessionize_stats, and scalar_subquery to the r9 front-load.
#
# Round 9 onward: the window is GENERATED, not transcribed —
# ``python tools/evidence_age.py --limit 50`` derives it from the
# CORRECTNESS record (newborns first, then green rows oldest-first
# alphabetical-within-round, anchor last), and
# tests/test_driver_contract.py::test_check_priority_is_generated pins
# that this list equals the generator's output, so the queue can never
# drift from the evidence again (the r8 verdict found the hand-kept
# bookkeeping had already drifted 5-vs-10). This round's window: the 10
# r9 newborns (the three corpus-scaled-knob variants closing the r8
# verdict's top order, the sf1-scale PageRank witness, the retrieval/
# classifier wave — NB, source-KL, BM25, MMR — and the JL projection +
# training-shard manifest), the 10 r4-era stale rows the r8 rotation
# queued, then the oldest (r5-era) remainder.
#
# Round 10: regenerated against the r9 record (the r9 verdict's item
# 1 — the 17 r5-era hash rows front-load right behind the two
# newborns; then the oldest r6-era remainder fills the window).
#
# BASIS ROUND: the newest CORRECTNESS file this list was generated
# against. The equality pin computes front_load over files <= this
# round, so the DRIVER landing the current round's file mid-round does
# not fail the suite; regenerating the list next round bumps it.
CHECK_PRIORITY_BASIS_ROUND = 14
CHECK_PRIORITY: list[str] = [
    # --- Round 15 window, regenerated after registering
    # webp_meta_check (the round's one newborn — the WebP
    # container-walk gate — leads), then pure oldest-first
    # rotation over the rows at age 4, alphabetical-within-
    # round, anchor last.
    "webp_meta_check",
    "bloom_decontaminate_check",
    "bpe_pair_counts",
    "copurchase_reach",
    "embedding_near_dups_bands_scaled",
    "except_op",
    "gap_fill_locf",
    "hard_negatives",
    "incremental_semdedup",
    "indicator_bollinger",
    "ivfpq_ann_topk",
    "ivfpq_recall_check",
    "ivfpq_rerank_topk",
    "knn_label_accuracy",
    "lang_segments",
    "lm_quality_buckets",
    "mmr_select_scaled",
    "q10_returned_revenue",
    "q12_priority_by_status",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q2_partsupp",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q9_partsupp",
    "quality_gate_funnel",
    "rolling_median",
    "rollup_lineitem",
    "semdedup_prune",
    "semi_anti_join",
    "session_window",
    "stream_stream_join",
    "streaming_dedup",
    "text_canonicalize",
    "token_count_bpe",
    "token_fertility",
    "top_customers",
    "trigram_lm_hashed",
    "tumbling_window",
    "vocabulary_stats",
    "window_rank",
    "array_functions",
    "band_join_revenue",
    "bpe_apply_check",
    "bpe_learn_merges",
    "c4_line_filters",
    "cdc_merge_upsert",
    "refined_pipeline",
]


_missing = [n for n in CHECK_PRIORITY if n not in QUERIES]
if _missing:  # pragma: no cover - registration bug tripwire
    raise RuntimeError(f"CHECK_PRIORITY names not registered: {_missing}")

_reordered = {n: QUERIES[n] for n in CHECK_PRIORITY}
_reordered.update((n, q) for n, q in QUERIES.items() if n not in _reordered)
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES", "CHECK_PRIORITY"]
