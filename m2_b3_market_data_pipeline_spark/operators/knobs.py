"""Corpus-size-scaled quantization knobs.

Round 8's sf1→sf3 campaign (SCALE.md §13) showed that every superlinear
slope in the engine traces to a quantization knob pinned for oracle
determinism: fixed SemDeDup cell count (in-cell pairs ∝ n²/k), fixed
LSH band width (bucket occupancy ∝ n), fixed IVF cell count (probed-set
size ∝ n). The production posture is the knob growing with the corpus;
this module is that posture as code — one deterministic, engine-neutral
formula per knob, mirrored verbatim by the DuckDB oracles
(plans/scaled_knobs.py::knob_sql) so the scaled variants stay
hash-checked.

Engine-parity note: the formulas use ceil(log2(x)) over IEEE doubles.
``x = max(n, 2) / occupancy`` is exactly representable (integer n,
power-of-two divisor), and log2's value can only straddle an integer
when x IS a power of two — where log2 is exact in every libm — so ceil
agrees bit-for-bit between CPython's math.log2 and DuckDB's log2.

The corpus cardinality ``n`` is read once at plan-build time (a single
count() over the validity-filtered scan). At production scale the same
number comes from catalog/table statistics — it is the one scalar a
self-tuning index build genuinely needs before laying out the plan
(the number of hyperplanes is plan STRUCTURE, not data, so it cannot
ride a column).
"""

from __future__ import annotations

import math


def _clamped_log2_knob(n: int, *, occupancy: int, lo: int, hi: int) -> int:
    return min(hi, max(lo, math.ceil(math.log2(max(n, 2) / occupancy))))


def scaled_cell_bits(n: int, *, target_occupancy: int = 64, lo: int = 2, hi: int = 20) -> int:
    """LSH-cell coarse-quantizer width: 2^bits cells sized so expected
    occupancy stays near ``target_occupancy`` as the corpus grows —
    cells ∝ n, the SemDeDup/IVF "k ∝ n" production posture. With
    occupancy pinned, in-cell pair enumeration and probed-set scans are
    Θ(n), and assignment is Θ(n·bits) = Θ(n log n) — unlike exact
    nearest-centroid assignment with k ∝ n, which is itself Θ(n²/occ)."""
    return _clamped_log2_knob(n, occupancy=target_occupancy, lo=lo, hi=hi)


def scaled_band_bits(n: int, *, target_occupancy: int = 4, lo: int = 4, hi: int = 15) -> int:
    """LSH band width for near-dup banding with a FIXED band count:
    per-band buckets number 2^bits, so bucket occupancy — and with it
    candidate-pair volume, the r8 7.7× slope — stays ~constant as n
    grows. hi=15 keeps a 4-band signature inside 60 bits (one BIGINT);
    past n ≈ 2^15·occ the band COUNT is the next lever (more bands at
    fixed width trades shuffle volume for recall, not correctness)."""
    return _clamped_log2_knob(n, occupancy=target_occupancy, lo=lo, hi=hi)


def knob_sql(*, occupancy: int, lo: int, hi: int, count_from: str) -> str:
    """The DuckDB twin of ``_clamped_log2_knob`` as a scalar expression
    over ``SELECT COUNT(*) FROM {count_from}`` — keep in lockstep with
    the Python formula above (engine-parity note in the module doc)."""
    return (
        f"(SELECT CAST(least({hi}, greatest({lo}, "
        f"ceil(log2(greatest(COUNT(*), 2) / {occupancy}.0)))) AS INT) "
        f"FROM {count_from})"
    )
