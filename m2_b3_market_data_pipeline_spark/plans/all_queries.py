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
    cdc_merge,
    data_quality,
    expansion_corpus,
    expansion_corpus2,
    expansion_dedup,
    expansion_embeddings,
    expansion_similarity,
    expansion_text,
    expansion_text2,
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
# module is fixed), so re-order QUERIES explicitly: the reference surface
# and every query family that still lacks a green driver row go first;
# queries that already earned a hash-checked PASS in round 1
# (CORRECTNESS_r01.json: the expansion dedup/similarity/text families,
# q1/q3/q5, top_customers, window_rank, rollup, semi_anti_join, ...)
# rotate past slot 50 — their evidence is already on record.
CHECK_PRIORITY: list[str] = [
    # Reference pipeline surface (SURVEY §2) — errored in r1 on the
    # events.parquet nanos read, fixed in registry.load(); these rows
    # prove the fix.
    "refined_pipeline",
    "rolling_mean_7",
    "asset_aggregates",
    "enrich_join",
    "filter_sort_limit",
    "select_limit",
    "union_all",
    "coalesce_duplicates",
    "json_extract",
    "date_functions",
    # (string_functions already hash-passed in r1; rotated past slot 50.)
    # Market indicators (same nanos root cause in r1).
    "indicator_returns",
    "indicator_bollinger",
    "indicator_vwap_drawdown",
    "indicator_rsi",
    "indicator_ewma",
    # events-reading relational ops (same root cause in r1).
    "lead_lag",
    "distinct_agg",
    "set_ops",
    "except_op",
    "asof_join_quotes",
    "resample_ohlc",
    # TPC-H shapes with no driver row yet (q1/q3/q5 passed in r1).
    "q2_min_cost_supplier",
    "q4_order_priority",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue",
    "q11_important_value",
    "q12_priority_by_status",
    "q13_order_distribution",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_count",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_excess_suppliers",
    "q21_sole_returned_supplier",
    "q22_idle_customers",
    # Wave 5 (skew/sampling/gap-fill) — registered after slot 50 in r1.
    "rolling_mean_time_range",
    "band_join_revenue",
    "gap_fill_locf",
    "train_test_split",
    "salted_skew_agg",
    # Queries whose round-2 rework graduated them from rows-only (or
    # from a quadratic plan) to hash-checked — fresh evidence needed.
    "embedding_near_dups",
    "ann_topk_lsh",
    "simhash_near_dups",
    "multimodal_features",
    # Streaming-window representative (oracle-checked via batch-mode
    # equivalence).
    "tumbling_window",
]

_missing = [n for n in CHECK_PRIORITY if n not in QUERIES]
if _missing:  # pragma: no cover - registration bug tripwire
    raise RuntimeError(f"CHECK_PRIORITY names not registered: {_missing}")

_reordered = {n: QUERIES[n] for n in CHECK_PRIORITY}
_reordered.update((n, q) for n, q in QUERIES.items() if n not in _reordered)
QUERIES.clear()
QUERIES.update(_reordered)

__all__ = ["QUERIES", "ORACLES", "CHECK_PRIORITY"]
