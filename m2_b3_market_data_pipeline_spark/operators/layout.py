"""Z-order (Morton) clustering keys for data-skipping file layout.

The reference's only layout tool is Hive partitioning on one column
(reference: etl/etl_job.py:152). At 100 TB a table is typically filtered
on MORE than one column (e.g. part AND supplier); partitioning can only
serve one of them. The standard lakehouse answer is Z-ordering: map each
row's (x, y) key pair onto one integer by interleaving their bits, then
range-partition + sort files by that integer. Rows close in BOTH
dimensions land in the same files, so parquet min/max stats prune scans
for predicates on either column — without a second partition tree.

Everything here is plain integer bit arithmetic inside whole-stage
codegen: no UDF, no shuffle beyond the final range-repartition of the
write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: str | Column, y: str | Column, *, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into one Morton code (x takes even bit positions, y odd).

    ``bits=16`` covers keys up to 65535 per dimension and yields a
    32-bit code; raise to 32 for a 64-bit code on wider domains. Values
    above the covered range fold via masking, which only degrades
    clustering locality, never correctness.
    """
    xc = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yc = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    terms: list[Column] = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(xc, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(yc, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def zorder_key_sql(x: str, y: str, *, bits: int = 16) -> str:
    """The identical Morton-code arithmetic as ANSI SQL (oracle side)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    *,
    zcol: str = "zval",
    num_files: int | None = None,
) -> None:
    """Cluster files by the Morton code: range-repartition (each output
    file owns a contiguous z-range) and sort within partitions (tight
    per-rowgroup min/max stats). One shuffle, then a streaming sort —
    the same cost profile as any global sort, amortized once at write
    time against every future pruned scan.
    """
    parts = num_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(parts, F.col(zcol))
        .sortWithinPartitions(zcol)
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_key_n(cols: list[str | Column], *, bits: int = 16) -> Column:
    """N-column Morton code: bit i of column j lands at interleaved
    position ``i * len(cols) + j`` (round-robin) — the general form of
    ``zorder_key`` for ZORDER BY (a, b, c, ...) layouts. Code width is
    ``bits * len(cols)``; keep it <= 63 (e.g. 3 cols x 16 bits = 48,
    4 cols x 15 bits = 60). Same masking-folds-overflow contract as the
    two-column form: out-of-range values degrade locality, never
    correctness.
    """
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns")
    if bits * n > 63:
        raise ValueError(f"{bits} bits x {n} cols exceeds a signed 64-bit code")
    out: Column | None = None
    for j, c in enumerate(cols):
        cc = (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(cc, i).bitwiseAND(F.lit(1)), i * n + j
            )
            out = term if out is None else out.bitwiseOR(term)
    return out


def training_shards(
    docs,
    *,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 777,
):
    """Deterministic training-delivery manifest: every non-NULL-text doc
    is assigned a shard by keyed md5 hash (`pmod(hash60(md5(seed|id)),
    n_shards)` — the same keyed-admission family mixture_rebalance and
    leakage_safe_split use), and each shard reports the counts a trainer
    needs to validate its input: docs, tokens, an ORDER-INSENSITIVE
    bit_xor checksum of the member key hashes, and the first/last doc in
    md5-key order (the epoch read order).

    Scale shape: ONE shuffle (groupBy shard); every aggregate is a
    fixed-width codegen buffer (sum/xor/min_by) — no per-shard list
    materialization, no global sort. bit_xor instead of sum: hash60
    values are ~2^60, so a sum overflows BIGINT after ~2^3 rows under
    ANSI; xor is order-insensitive, overflow-free, and equally
    collision-resistant for a manifest checksum. min_by/max_by order on
    the NUMERIC hash, not the md5 string: a var-length ordering key
    kicks the whole aggregate to SortAggregate (the seeded_hash60
    lesson; caught by the surface-wide plan lint), and hash60 orders
    identically to the hex string up to 60-bit ties.

    Known tie behavior (r9 ADVICE, kept deliberately): on an exact
    60-bit hash collision between two member ids, the min_by/max_by
    winner is engine/partition-order arbitrary (Spark min_by and DuckDB
    arg_min both pick any tied row). Probability is ~n_shard_pairs/2^61
    — negligible at any realistic shard size — and the in-key fix was
    probed and REJECTED on measurement: a struct(__h, id) ordering key
    demotes the whole aggregate to SortAggregate on Spark (the exact
    regression this function avoids), and DuckDB's arg_min does not
    accept a composite ordering argument at all, so the oracle could
    not mirror it. A collision would surface as a first/last_doc_id
    hash mismatch against the oracle, never silently.

    Returns (shard_id, n_docs, n_tokens, id_checksum, first_doc_id,
    last_doc_id) ordered by shard_id.
    """
    from pyspark.sql import functions as F

    from ..functions.textfns import seeded_hash60, token_count

    h = seeded_hash60(F.col(id_col).cast("string"), seed)
    staged = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        h.alias("__h"),
        token_count(text_col).alias("__nt"),
    )
    return (
        staged.groupBy(F.pmod("__h", F.lit(n_shards)).cast("int").alias("shard_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.bit_xor("__h").alias("id_checksum"),
            F.min_by(id_col, F.col("__h")).alias("first_doc_id"),
            F.max_by(id_col, F.col("__h")).alias("last_doc_id"),
        )
        .orderBy("shard_id")
    )
