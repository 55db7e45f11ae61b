"""Same-window A/B of the two near-dup band layouts at a chosen scale
— the reproduction script for SCALE.md §21.6 (the sf100 kill test).

Measures, Spark-side only (the single-node oracle is out-scaled well
before these corpus sizes — §20's ivfpq precedent):

1. the band-count-scaled layout (knobs.scaled_band_layout over the
   corpus cardinality, independent per-band hyperplane families) run
   to VERIFIED pairs — the production path;
2. the width-capped layout (w=15, b=4 — the one-BIGINT
   bits_scaled ceiling) run to CANDIDATE count first (the intrinsic
   n²/2^15 volume term), then to verified pairs.

At sf100 (2M vectors) step 2's verify died exhausting ~79 GB of spill
on this machine while step 1 finished in ~8.3 min on local[32]; the
numbers and the reading are in SCALE.md §21.6.

Usage: python tools/scale_band_ab.py [SF_DIR] [--skip-capped-verify]
       (default SF_DIR /root/repo/.scale/sf100; the flag stops after
        the capped layout's candidate count — the measurement that
        matters — instead of letting the verify fill the spill disk)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from m2_b3_market_data_pipeline_spark.operators.knobs import (  # noqa: E402
    scaled_band_layout,
)
from m2_b3_market_data_pipeline_spark.operators.similarity import (  # noqa: E402
    banded_near_dup_pairs,
    ensure_parallelism,
    lsh_candidates,
    lsh_near_dup_pairs,
    lsh_signatures,
)
from m2_b3_market_data_pipeline_spark.plans.registry import load  # noqa: E402
from m2_b3_market_data_pipeline_spark.plans.scaled_knobs import (  # noqa: E402
    BL_HARD_CAP,
)
from m2_b3_market_data_pipeline_spark.session import get_spark  # noqa: E402

THRESHOLD = 0.45  # NEAR_DUP_THRESHOLD, plans/expansion_similarity.py
DIM = 64


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    skip_capped_verify = "--skip-capped-verify" in sys.argv
    sf_dir = args[0] if args else f"{REPO}/.scale/sf100"

    spark = get_spark("band-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load(spark, sf_dir, "embeddings")
    n = emb.count()
    w, b = scaled_band_layout(n)
    print(json.dumps({"n": n, "bands_layout": [w, b]}), flush=True)

    t0 = time.time()
    pairs = banded_near_dup_pairs(
        emb, dim=DIM, threshold=THRESHOLD,
        band_bits=w, n_bands=b, plane_stride=BL_HARD_CAP,
    )
    print(
        json.dumps(
            {"layout": f"bands ({w},{b})", "verified_pairs": pairs.count(),
             "wall_s": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    t0 = time.time()
    signed = lsh_signatures(ensure_parallelism(emb), dim=DIM, n_bits=60)
    cands = lsh_candidates(signed, n_bits=60, band_bits=15)
    print(
        json.dumps(
            {"layout": "capped (15,4)", "candidate_pairs": cands.count(),
             "wall_s": round(time.time() - t0, 1)}
        ),
        flush=True,
    )

    if skip_capped_verify:
        return
    t0 = time.time()
    full = lsh_near_dup_pairs(
        emb, dim=DIM, threshold=THRESHOLD, n_bits=60, band_bits=15
    )
    print(
        json.dumps(
            {"layout": "capped (15,4)", "verified_pairs": full.count(),
             "wall_s": round(time.time() - t0, 1)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
