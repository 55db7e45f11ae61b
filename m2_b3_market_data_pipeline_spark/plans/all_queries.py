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
    expansion_dedup,
    expansion_similarity,
    expansion_text,
    expansion_text2,
    market_indicators,
    reference_queries,
    sql_surface,
    sql_surface2,
    sql_surface3,
    sql_surface4,
    sql_surface5,
    streaming_queries,
)
from .registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
