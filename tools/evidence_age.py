"""Evidence-age ledger: generate the next round's CHECK_PRIORITY
front-load from the CORRECTNESS record instead of transcribing it.

Round 8's verdict (item 7): the stale-row bookkeeping lived in three
hand-maintained places (README, all_queries.py comment, judge verdicts)
and drifted (the r7 note said 5 stale rows; the true count was 10).
This tool derives it: read every CORRECTNESS_r*.json, compute each
registered query's NEWEST green round (green = rows+schema+hash all
true; for no-oracle queries, rows_match), and print

- the age table (query, newest green round, age in rounds),
- the front-load list for the NEXT window: never-evidenced queries
  first (newborns), then green rows oldest-first (alphabetical within
  a round), which is exactly the rotation rule every round since r5
  has applied by hand.

``--limit N`` trims the list to the window size (default 50).
``--check`` exits 1 if any hash-checkable query's newest green row is
older than MAX_AGE rounds (the freshness invariant the r8 verdict
graded; wired into tests/test_driver_contract.py).

Usage: python tools/evidence_age.py [--limit N] [--check]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MAX_AGE = 4  # newest green row must be <= this many rounds old

# Queries with no green hash row BY DESIGN. Empty since round 12: the
# BPE trainer gained a real unrolled-CTE oracle (tokenizer_queries.
# _bpe_learn_oracle) and the two rows-only sketches moved to the
# TEST_PINNED tier below. Kept as a set so the green computation and
# skip logic stay uniform if a future genuinely-unorable query lands.
DELIBERATE_NO_HASH: set[str] = set()

# The evidence-consolidation tier (round 12, r11 verdict item 1). The
# freshness arithmetic was mechanically broken: 213 hash-checkable
# queries rotating through 49 non-anchor driver slots is a 4.3-round
# cycle, past MAX_AGE=4. Fix: near-duplicate family members demote to
# TEST-PINNED status — still REGISTERED (the judge's coverage view and
# the per-round in-suite sf0.001 differential parity in
# tests/test_oracle_parity.py::test_query_matches_oracle are
# unchanged; that parity run is their standing per-round evidence),
# but out of the driver-window rotation and the staleness gate, which
# their named STRONGEST REPRESENTATIVE carries instead.
#
# Membership rules (pinned in tests/test_driver_contract.py):
#  - every entry maps to a representative that itself still rotates
#    (registered, oracle-backed, not test-pinned);
#  - every entry either has at least one historical green driver row
#    (nothing enters this tier unevidenced) or is a rows-only sketch
#    whose representative is its hash-checked accuracy companion.
#
# Budget after demotion: 215 oracle queries - 27 oracle-backed pinned
# entries - 1 anchor = 187 rotating through 49 slots/round = a
# 3.8-round cycle, inside MAX_AGE=4 with 9 slots/cycle of newborn
# headroom (BASELINE.md round-12 window-budget note).
TEST_PINNED: dict[str, str] = {
    # rows-only sketches: the *_check twins are the hash evidence
    "approx_distinct_users": "approx_distinct_check",
    "approx_quantiles": "approx_quantile_check",
    # dense / judged-baseline twins superseded by rotating scale forms
    "nb_lang_classifier": "nb_hashed",
    "trigram_lm_score": "trigram_lm_hashed",
    "embedding_near_dups_bits_scaled": "embedding_near_dups_bands_scaled",
    "embedding_near_dups": "embedding_near_dups_bands_scaled",
    "mmr_select": "mmr_select_scaled",
    # sub-steps / alternate forms of a rotating composite
    "simhash_signatures": "simhash_near_dups",
    "centroid_assign": "kmeans_clusters",
    "pq_codes": "ivfpq_rerank_topk",
    "pq_ann_topk": "ivfpq_rerank_topk",
    "ivf_ann_topk": "ivfpq_rerank_topk",
    "ivfpq_cells_scaled": "ivfpq_ann_topk",
    "cosine_topk": "ann_recall_check",  # the exact baseline is recomputed inside the check
    "lsh_recall_check": "ann_recall_check",
    "dedup_clusters_twophase": "dedup_clusters",
    "copurchase_reach_iter": "copurchase_reach",
    # witness-sampling twins: same code path on an md5 sample; the full
    # forms rotate, the witness posture is exercised at scale (SCALE.md)
    "pagerank_cosuppliers_subgraph": "pagerank_cosuppliers",
    "triangle_coparts_subgraph": "triangle_coparts",
    "dedup_clusters_sample": "dedup_clusters",  # r13: budget for the two
    # media-decode newborns (same md5-sample-below-signatures path; the
    # sf10/sf100 witness evidence stands in SCALE.md §18/§22)
    # sub-step of the rotating frame_dedup composite (r13, same budget
    # move): sample_frames feeds frame_dedup's fold directly
    "multimodal_frames": "frame_dedup",
    # family-duplicate market indicators (window/ratio variants)
    "indicator_returns": "indicator_bollinger",
    "indicator_rsi": "indicator_bollinger",
    "twap_daily": "indicator_vwap_drawdown",
    # TPC-H shapes registered twice (adapted form vs literal-partsupp
    # form): the literal forms exercise more tables and keep rotating
    "q2_min_cost_supplier": "q2_partsupp",
    "q9_product_profit": "q9_partsupp",
    "q11_important_value": "q11_partsupp",
    "q16_supplier_count": "q16_partsupp",
    "q20_excess_suppliers": "q20_partsupp",
    # text-format roundtrips: the columnar roundtrip rotates; the csv/
    # jsonl parser paths are additionally pinned by tests/test_formats.py
    "csv_roundtrip": "orc_roundtrip",
    "jsonl_roundtrip": "orc_roundtrip",
    # byte-domain feature stand-in (r14: budget for the progressive-
    # JPEG newborn decoded_pjpeg_check): same mapInPandas plumbing as
    # the decoded-domain gate that rotates; the byte-level fallback
    # math stays pinned by tests/test_text_multimodal.py
    "multimodal_features": "decoded_rebalanced_check",
    # r15 (budget for the webp_meta_check newborn — the flip the late-
    # r14 window note scheduled): decoded_rebalanced_check is the
    # oracle-identical SUPERSET gate (same 17-format phash rotation
    # THROUGH the heavy-tail rebalance operator), earned its first
    # direct driver row in r14, and rotates from here; the plain-path
    # twin pins behind it. multimodal_features re-maps to the same
    # rotating superset (a rep must itself rotate).
    "decoded_phash_check": "decoded_rebalanced_check",
    # byte-domain audio stand-in (r14: budget for the decoded_wav_check
    # newborn — the audio leg's real-decode gate with the same
    # frame-window assignment and fan-out shape on DECODED samples).
    # Rep = frame_dedup, the rotating composite over the same
    # byte-window stand-in machinery (attach_binary + fixed windows);
    # the decoded-domain twin rotates from r14 on its own row.
    "audio_frame_energy": "frame_dedup",
}

# Flagship reference pipeline: in the window EVERY round, last slot (its
# row also re-validates the events loader against the current testdata's
# ts layout) — the standing policy since round 3.
ANCHOR = "refined_pipeline"


def newest_green(through_round: int | None = None) -> tuple[dict[str, int], int]:
    """(query -> newest green round, latest round number considered).

    ``through_round`` caps which CORRECTNESS files count — the queue in
    all_queries.py records the basis round it was generated against
    (CHECK_PRIORITY_BASIS_ROUND), so the equality pin stays green when
    the NEXT round's CORRECTNESS file lands mid-round; the next
    builder regenerates and bumps the basis."""
    newest: dict[str, int] = {}
    latest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        latest = max(latest, rnd)
        for name, row in json.load(open(path)).items():
            green = row.get("rows_match") and row.get("schema_match") and (
                row.get("hash_match") or name in DELIBERATE_NO_HASH
            )
            if green:
                newest[name] = max(newest.get(name, 0), rnd)
    return newest, latest


def first_seen(through_round: int | None = None) -> dict[str, int]:
    """query -> FIRST round it appeared in any CORRECTNESS file (green
    or not). Bounds the newborn waiver (r10 ADVICE): a query that was
    scheduled, driver-ran, and chronically failed must not be waived
    forever just because the generator keeps front-loading it."""
    seen: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        rnd = int(m.group(1))
        if through_round is not None and rnd > through_round:
            continue
        for name in json.load(open(path)):
            seen[name] = min(seen.get(name, rnd), rnd)
    return seen


def front_load(limit: int = 50, through_round: int | None = None) -> list[str]:
    """The next driver window, fully generated: newborns (no green row
    anywhere) first, then green rows oldest-round-first (alphabetical
    within a round), with the anchor pinned to the final slot."""
    from m2_b3_market_data_pipeline_spark.plans import all_queries

    newest, _ = newest_green(through_round)
    names = list(all_queries.QUERIES)
    skip = DELIBERATE_NO_HASH | set(TEST_PINNED) | {ANCHOR}
    newborn = [n for n in names if n not in newest and n not in skip]
    aged = sorted(
        (n for n in names if n in newest and n not in skip),
        key=lambda n: (newest[n], n),
    )
    return (newborn + aged)[: limit - 1] + [ANCHOR]


def main() -> None:
    args = sys.argv[1:]
    limit = 50
    if "--limit" in args:
        limit = int(args[args.index("--limit") + 1])
    newest, latest = newest_green()

    from m2_b3_market_data_pipeline_spark.plans import all_queries

    names = list(all_queries.QUERIES)
    print(f"# {len(names)} registered; latest CORRECTNESS round: r{latest:02d}")
    print(f"{'query':40s} newest_green age")
    stale = []
    for n in sorted(names, key=lambda n: (newest.get(n, 0), n)):
        if n in DELIBERATE_NO_HASH:
            print(f"{n:40s} no-hash-by-design")
            continue
        if n in TEST_PINNED:
            print(f"{n:40s} test-pinned (rep: {TEST_PINNED[n]})")
            continue
        g = newest.get(n)
        age = latest - g if g else None
        print(f"{n:40s} {('r%02d' % g) if g else 'NEVER':11s}  {age if age is not None else '-'}")
        if g is None or age > MAX_AGE:
            stale.append(n)

    print(f"\n# front-load for the r{latest + 1:02d} window (limit {limit}):")
    for n in front_load(limit):
        print(f'    "{n}",')

    if "--check" in args:
        # Mid-round state is legitimate: a query with NO green row yet
        # whose slot is already in the CURRENT front-load window is a
        # scheduled newborn, not a freshness violation — the next
        # driver run produces its row. Anything never-evidenced AND
        # not scheduled, or with a genuinely old newest row, fails.
        # r10 ADVICE bound: the newborn waiver is TIME-LIMITED — a
        # query that first appeared in a CORRECTNESS file more than
        # MAX_AGE rounds ago and STILL has no green row is a chronic
        # failure, not a newborn, and fails --check even if the
        # generator keeps scheduling it.
        scheduled = set(all_queries.CHECK_PRIORITY)
        debut = first_seen()
        violations = [
            n
            for n in stale
            if not (
                newest.get(n) is None
                and n in scheduled
                and (n not in debut or latest - debut[n] <= MAX_AGE)
            )
        ]
        if violations:
            print(
                f"\nFRESHNESS VIOLATION (> {MAX_AGE} rounds): {violations}",
                file=sys.stderr,
            )
            sys.exit(1)
        waived = sorted(set(stale) - set(violations))
        suffix = f" (newborns scheduled in-window: {waived})" if waived else ""
        print(f"\nfreshness OK: every hash row <= {MAX_AGE} rounds old{suffix}")


if __name__ == "__main__":
    main()
