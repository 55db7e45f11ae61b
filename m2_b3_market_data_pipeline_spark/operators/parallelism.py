"""Parallelism floor for fan-out-heavy operator chains.

A single-row-group fixture file scans as ONE partition, and a
zero-shuffle operator chain (broadcast joins, byte-parse explodes,
signature folds) then fuses into one whole-stage-codegen task — 1 of 32
cores doing all the expensive map-side work. Measured on
embedding_near_dups at sf0.1: 4.9s on 1 task vs 1.8s floored.

``ensure_parallelism`` repartitions ONLY when the input's partition
count is below the session's shuffle parallelism: at cluster scale the
source scan already exceeds the floor and the call is a NO-OP — no
exchange enters the 100 TB plan. That conditional is the whole point;
an unconditional repartition would be a full corpus shuffle at scale.

SCOPE RULE (which chains get the floor): apply it only when EXPENSIVE
map-side work sits between the scan and the first wide dependency —
shingle fan-outs, per-band signature folds, byte parses, broadcast-join
cosines. Skip it (``load(..., floor=False)``) when the chain's first
exchange arrives within the first stage and the pre-shuffle work is a
single light tokenize/explode: the chain's own shuffle already
redistributes, and the floor's repartition is a pure extra exchange.
Both halves are measured, same-window A/B (BASELINE.md round-7
adjudication): heavy-map chains WIN floored (boilerplate_frac 1.84s vs
2.29s, dsir_weights 1.43s vs 1.99s), the light-map shuffle-first
tfidf_top_terms LOSES floored (1.21s vs 0.82s) and is exempt.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the shuffle-partition floor iff it
    currently has fewer partitions; identity otherwise."""
    target = min_parts or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    return df.repartition(target) if df.rdd.getNumPartitions() < target else df
