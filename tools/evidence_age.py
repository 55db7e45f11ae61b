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

# Queries with no green hash row BY DESIGN (rows-only sketches whose
# accuracy companions are hash-checked; the iterative BPE trainer whose
# inference twin bpe_apply_check is). They never enter the stale list.
DELIBERATE_NO_HASH = {"approx_distinct_users", "approx_quantiles", "bpe_learn_merges"}

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
    skip = DELIBERATE_NO_HASH | {ANCHOR}
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
            tag = "no-hash-by-design"
            print(f"{n:40s} {tag}")
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
