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


def scaled_band_layout(
    n: int,
    *,
    occupancy: int = 4,
    lo: int = 4,
    base_bands: int = 4,
    width_cap: int = 15,
    hard_cap: int = 20,
) -> tuple[int, int]:
    """(band_bits, n_bands) for near-dup banding PAST the one-BIGINT
    cap — the lever the sf30 decade exposed (SCALE.md §20, r10 verdict
    item 2).

    Physics of the two knobs: band WIDTH is the candidate-volume lever
    (per-band buckets number 2^w, so random-pair collisions ∝ n²/2^w —
    the only thing that keeps the verify join linear as n grows); band
    COUNT is the recall lever (a true pair surfaces iff some band
    agrees on all w bits, P = 1-(1-s^w)^b). ``scaled_band_bits`` grows
    w with log n but clamps at ``width_cap`` = 15 because its four
    band values slice ONE 60-bit BIGINT signature. This layout removes
    that representation limit — each band's value is computed from its
    OWN hyperplane family (operators/similarity.py::
    banded_near_dup_pairs), so w keeps absorbing the corpus residual
    past 15 bits — and grows the band count to HOLD the LSH threshold
    t = (1/b)^(1/w) at the width-cap operating point t0 =
    (1/base_bands)^(1/width_cap): b = max(base_bands,
    ceil(base_bands^(w/width_cap))), i.e. the bits_scaled LAYOUT
    PARAMETERS verbatim below the cap (the floor — an unfloored ceil
    gave b=2 at fixture widths, a strictly sharper threshold curve
    than the judged baseline's; realized recall on individual
    near-threshold pairs still varies with the plane family, which is
    why the recall evidence is the large-population ladder: sf30 pair
    counts within ~1% of the capped form, SCALE.md §21.1) and bands ∝
    base^(residual/width_cap) once the cap binds (w=15→4 bands, 18→6,
    20→7). Wider bands alone would sharpen the threshold past t0 and
    shed true near-dups; the extra bands buy the recall back at a
    LINEAR candidate cost (b·n rows) instead of the quadratic cost
    (n²/2^w) of leaving the width capped.

    ``hard_cap`` = 20 bounds the static plan/oracle layout (the
    hyperplane families are plan literals on both engines): occupancy
    stays ≤ target through n ≈ 4·2^20 ≈ 4M vectors (~sf200 on the
    fixture ladder).

    Engine parity (module-doc note applies): ceil(log2(·)) is exact as
    proven above; ceil(base^(w/width_cap)) can only straddle an
    integer when base^(w/15) is one, i.e. when 2w/15 is an integer —
    w=15 (4.0) and w=30 (16.0), both of which every libm pow computes
    exactly (integral result of an exactly-representable exponent);
    every other w in [4, 20] lands safely between integers."""
    wanted = math.ceil(math.log2(max(n, 2) / occupancy))
    w = min(hard_cap, max(lo, wanted))
    b = max(base_bands, math.ceil(base_bands ** (w / width_cap)))
    return w, b


def knob_sql(*, occupancy: int, lo: int, hi: int, count_from: str) -> str:
    """The DuckDB twin of ``_clamped_log2_knob`` as a scalar expression
    over ``SELECT COUNT(*) FROM {count_from}`` — keep in lockstep with
    the Python formula above (engine-parity note in the module doc)."""
    return (
        f"(SELECT CAST(least({hi}, greatest({lo}, "
        f"ceil(log2(greatest(COUNT(*), 2) / {occupancy}.0)))) AS INT) "
        f"FROM {count_from})"
    )


def band_layout_sql(
    *,
    occupancy: int = 4,
    lo: int = 4,
    base_bands: int = 4,
    width_cap: int = 15,
    hard_cap: int = 20,
    count_from: str,
) -> tuple[str, str]:
    """DuckDB twins of ``scaled_band_layout`` — (width_expr,
    bands_expr) scalar subqueries; keep in lockstep with the Python
    formula (parity argument in its docstring)."""
    w = (
        f"(SELECT CAST(least({hard_cap}, greatest({lo}, "
        f"ceil(log2(greatest(COUNT(*), 2) / {occupancy}.0)))) AS INT) "
        f"FROM {count_from})"
    )
    b = (
        f"(SELECT CAST(greatest({base_bands}, ceil(pow({base_bands}, "
        f"least({hard_cap}, greatest({lo}, "
        f"ceil(log2(greatest(COUNT(*), 2) / {occupancy}.0)))) "
        f"/ {width_cap}.0))) AS INT) FROM {count_from})"
    )
    return w, b
