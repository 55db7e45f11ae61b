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
    formats_queries,
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
# - round 4 front-loaded the 55 queries with no driver row in any prior
#   round (CDC/SCD2, data quality, corpus prep, embedding hygiene/PQ,
#   events/stats analytics, remaining relational surface, streaming
#   windows) — all 50 window slots PASS (CORRECTNESS_r04.json);
# - round 5 (this order) front-loads the final 23 queries with no driver
#   row in r01-r04, completing cumulative driver coverage at 147/147;
#   the remaining slots re-prove the SURVEY §2 reference surface (last
#   rows r03) and the dedup/text/similarity families (last rows r02/r03)
#   so no operator's evidence goes stale beyond two rounds.
#
# Queries already green in a prior round rotate past slot 50 — their
# evidence is on record in those CORRECTNESS files.
CHECK_PRIORITY: list[str] = [
    # --- The 23 queries with no driver row in any prior round. ---
    # Market/time-series analytics (added round 4).
    "twap_daily",
    "seasonal_backtest",
    "markov_transitions",
    "partial_agg_merge",
    "realized_volatility",
    # Text / dedup additions (round 4).
    "trigram_lm_score",
    "containment_pairs",
    "phash_near_dups",
    "dedup_clusters_twophase",
    "leakage_safe_split",
    "corpus_mixture",
    "top_bigram_frac",
    # Layout / relational additions (round 4).
    "zorder_keys",
    "correlation_matrix",
    "unpivot_metrics",
    "fuzzy_name_match",
    "json_parse_audit",
    "snapshot_diff",
    # Earlier additions that never reached the window.
    "weighted_sample",
    "percentile_binning",
    "null_scalars",
    # Approx sketches: rows-only checks by nature (sketch internals
    # differ across engines); accuracy is bounded in pytest.
    "approx_quantiles",
    "approx_distinct_users",
    # --- Anchor: flagship reference pipeline, in the window every round
    # (its row also re-validates the events loader against whatever ts
    # layout the current testdata carries). ---
    "refined_pipeline",
    # --- SURVEY §2 reference surface re-proof (last driver rows r03),
    # plus the new write-path round-trip giving S10/S5 a driver row. ---
    "refined_write_roundtrip",
    "rolling_mean_7",
    "asset_aggregates",
    "enrich_join",
    "coalesce_duplicates",
    "union_all",
    "filter_sort_limit",
    "select_limit",
    "date_functions",
    "string_functions",
    "json_extract",
    # --- Dedup family re-proof (last rows r02/r03). ---
    "dedup_exact",
    "minhash_dedup",
    "ngram_jaccard",
    "simhash_signatures",
    "simhash_near_dups",
    # --- Text family re-proof. ---
    "text_stats",
    "lang_id",
    "quality_score",
    "doc_fingerprint",
    # --- Similarity / ANN re-proof. ---
    "cosine_topk",
    "embedding_near_dups",
    "ann_topk_lsh",
    "ivf_ann_topk",
    # --- Indicators re-proof (vwap_drawdown rotates out: its r02 row
    # stands, and the write-roundtrip slot is higher-leverage). ---
    "indicator_returns",
    "indicator_rsi",
]


_missing = [n for n in CHECK_PRIORITY if n not in QUERIES]
if _missing:  # pragma: no cover - registration bug tripwire
    raise RuntimeError(f"CHECK_PRIORITY names not registered: {_missing}")

_reordered = {n: QUERIES[n] for n in CHECK_PRIORITY}
_reordered.update((n, q) for n, q in QUERIES.items() if n not in _reordered)
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES", "CHECK_PRIORITY"]
