"""Capture .explain("formatted") output for named queries.

Usage: python tools/capture_plans.py <out_dir> <suffix> <query> [query ...]

Writes <out_dir>/<query>_<suffix>.txt per query. Runs against
$SPARK_GRAFT_SF_DIR (default sf0.1) so plan sizing actions (e.g. the
triangle wedge estimate) see bench-scale inputs. Loop-shaped queries
(bpe/mmr/connected-components) return a driver-assembled final frame;
their file notes that the optimization evidence lives in job counts,
and the captured plan is the final frame's.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached  # noqa: E402
from m2_b3_market_data_pipeline_spark.plans import all_queries  # noqa: E402
from m2_b3_market_data_pipeline_spark.session import get_spark, sf_dir  # noqa: E402


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    target = sf_dir()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = all_queries.QUERIES[name](spark, target)
        text = df._jdf.queryExecution().explainString(mode)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"-- {name} @ {target} ({suffix})\n")
            fh.write(text)
        release_cached(df)
        print("captured", name, flush=True)


if __name__ == "__main__":
    main()
