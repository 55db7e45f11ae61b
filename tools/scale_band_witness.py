"""Fifth-decade witness check for the band-count near-dup layout
(r11 verdict item 4).

Runs the md5-seeded ~1/16 sampled witness — BOTH relations — at a
given sf dir, Spark vs DuckDB, and reports row-count + order-
insensitive value-hash agreement:

- ``embedding_bands_witness`` (registered): every sampled vector's
  per-band hyperplane value, the relation the candidate join keys on;
- the derived PAIR set (plans/scaled_knobs.py::BANDS_WITNESS_PAIRS_SQL
  vs the Spark ``banded_near_dup_pairs`` on the same sample) — not
  registered because it is empty below sf1, but at sf100 it is the
  pair-level tooth §21.6's engine-only numbers lacked.

Usage: python tools/scale_band_witness.py [SF_DIR ...]
       (default /root/repo/.scale/sf100)
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _hash(cols, rows) -> str:
    h = hashlib.sha256()
    h.update(("|".join(cols)).encode())
    for r in rows:
        h.update(("\x1f".join(r) + "\x1e").encode())
    return h.hexdigest()[:16]


def main() -> int:
    from check_oracle import _rowset

    import duckdb

    from m2_b3_market_data_pipeline_spark.operators.knobs import (
        scaled_band_layout,
    )
    from m2_b3_market_data_pipeline_spark.operators.similarity import (
        banded_near_dup_pairs,
    )
    from m2_b3_market_data_pipeline_spark.plans import all_queries
    from m2_b3_market_data_pipeline_spark.plans.registry import load
    from m2_b3_market_data_pipeline_spark.plans.scaled_knobs import (
        BANDS_WITNESS_PAIRS_SQL,
        BAND_HI,
        BAND_LO,
        BAND_OCC,
        BL_HARD_CAP,
        ND_BANDS,
        _VEC_SAMPLE_SQL,
    )
    from m2_b3_market_data_pipeline_spark.plans.expansion_similarity import (
        EMBED_DIM,
        NEAR_DUP_THRESHOLD,
    )
    from m2_b3_market_data_pipeline_spark.session import get_spark
    from pyspark.sql import functions as F

    sf_dirs = sys.argv[1:] or [os.path.join(REPO, ".scale", "sf100")]
    spark = get_spark("band-witness")
    spark.sparkContext.setLogLevel("ERROR")
    ok = True
    for sf_dir in sf_dirs:
        con = duckdb.connect()
        src = f"{sf_dir}/embeddings.parquet"
        if os.path.isdir(src):  # Spark directory-style parquet
            src = f"{src}/*.parquet"
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{src}'")

        rec: dict = {"sf_dir": sf_dir}
        for name, spark_fn, sql in (
            (
                "bands_witness",
                lambda: all_queries.QUERIES["embedding_bands_witness"](
                    spark, sf_dir
                ),
                all_queries.ORACLES["embedding_bands_witness"],
            ),
            (
                "pairs_witness",
                lambda: _pairs(
                    spark, sf_dir, load, F, _VEC_SAMPLE_SQL,
                    scaled_band_layout, banded_near_dup_pairs,
                    EMBED_DIM, NEAR_DUP_THRESHOLD,
                    BAND_OCC, BAND_LO, ND_BANDS, BAND_HI, BL_HARD_CAP,
                ),
                BANDS_WITNESS_PAIRS_SQL,
            ),
        ):
            t0 = time.time()
            scols, srows = _rowset(spark_fn().toPandas())
            t_spark = round(time.time() - t0, 1)
            t0 = time.time()
            ocols, orows = _rowset(con.execute(sql).df())
            t_duck = round(time.time() - t0, 1)
            match = scols == ocols and srows == orows
            ok = ok and match
            rec[name] = {
                "rows": len(srows),
                "oracle_rows": len(orows),
                "schema_match": scols == ocols,
                "hash_match": match,
                "value_hash": _hash(scols, srows),
                "spark_s": t_spark,
                "duckdb_s": t_duck,
            }
        con.close()
        print(json.dumps(rec))
    print("WITNESS OK" if ok else "WITNESS MISMATCH")
    return 0 if ok else 1


def _pairs(
    spark, sf_dir, load, F, sample_sql, scaled_band_layout,
    banded_near_dup_pairs, dim, threshold, occ, lo, base_bands,
    width_cap, hard_cap,
):
    emb = load(spark, sf_dir, "embeddings").filter(F.expr(sample_sql))
    n = emb.count()
    w, b = scaled_band_layout(
        n, occupancy=occ, lo=lo, base_bands=base_bands,
        width_cap=width_cap, hard_cap=hard_cap,
    )
    return banded_near_dup_pairs(
        emb, dim=dim, threshold=threshold, band_bits=w, n_bands=b,
        plane_stride=hard_cap,
    )


if __name__ == "__main__":
    sys.exit(main())
