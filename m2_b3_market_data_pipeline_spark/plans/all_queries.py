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
    data_quality,
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
    market_indicators,
    reference_queries,
    sql_surface,
    sql_surface2,
    sql_surface3,
    sql_surface4,
    sql_surface5,
    stats_analytics,
    streaming_queries,
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
# - round 4 (this order) front-loads the 55 queries with no driver row in
#   any prior round: CDC/SCD2, data quality, corpus prep, embedding
#   hygiene/clustering/PQ, events analytics, stats analytics, the
#   remaining relational surface (subqueries, pivot, cube/grouping sets,
#   percentiles, regex/array/null scalars), and the streaming windows.
#
# Queries already green in r02/r03 rotate past slot 50 — their evidence
# is on record in those files.
#
# Round-5 rotation TODO (the queries still without any driver row after
# round 4): top_bigram_frac, weighted_sample, percentile_binning,
# null_scalars, approx_quantiles, approx_distinct_users (rows-only by
# nature), plus everything added in round 4 — trigram_lm_score,
# containment_pairs, zorder_keys, correlation_matrix, unpivot_metrics,
# phash_near_dups, twap_daily, seasonal_backtest, markov_transitions,
# partial_agg_merge, realized_volatility, fuzzy_name_match,
# json_parse_audit, dedup_clusters_twophase, snapshot_diff, leakage_safe_split, corpus_mixture. That is ~23 slots; the rest
# of the round-5 window should re-prove the reference surface.
CHECK_PRIORITY: list[str] = [
    # CDC / merge (streaming sink semantics, batch-checkable).
    "cdc_merge_upsert",
    "scd2_user_values",
    # Data-quality gates.
    "profile_events",
    "expectation_checks",
    "fk_orphans_audit",
    # Corpus preparation (LLM-training data path).
    "repetition_stats",
    "pii_scrub",
    "token_pack",
    "corpus_pipeline",
    "dedup_clusters",
    "doc_chunks",
    "char_entropy",
    "decontaminate",
    # Embedding hygiene / clustering / PQ.
    "embed_normalize",
    "embed_quantize",
    "kmeans_clusters",
    "centroid_assign",
    "pq_codes",
    "pq_ann_topk",
    # Events analytics.
    "sessionize_stats",
    "funnel_stages",
    "retention_cohorts",
    "zscore_anomalies",
    "value_histogram",
    "trending_daily",
    "indicator_macd",
    # Relational surface without a prior driver row.
    "scalar_subquery",
    "correlated_subquery",
    "pivot_segments",
    "exact_percentiles",
    "disjunctive_predicates",
    "full_outer_join",
    "predicate_surface",
    "array_functions",
    "grouping_sets",
    "window_running_total",
    "cube_lineitem",
    "window_distribution",
    "regex_functions",
    "sample_per_group",
    "salted_skew_join",
    # Stats analytics.
    "groupwise_regression",
    "quantile_binning",
    "event_cooccurrence",
    "mad_outliers",
    # Streaming windows (batch-mode equivalence oracles).
    "sliding_window",
    "session_window",
    "stream_stream_join",
    "streaming_dedup",
    # One re-proof anchor: the flagship reference pipeline stays in the
    # window every round (its row also re-validates the events loader
    # against whatever ts layout the current testdata carries).
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
