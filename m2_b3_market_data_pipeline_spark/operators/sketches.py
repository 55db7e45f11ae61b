"""Count-min sketch: sub-linear frequency estimation (Cormode &
Muthukrishnan 2005) — the frequency-sketch sibling of the HLL
(approx_distinct_*) and quantile (approx_quantile_*) paths.

At 100 TB you cannot hold per-key exact counts for an unbounded key
domain; the CM table is ``depth x width`` counters TOTAL, regardless of
input size. Build is one bounded shuffle: each record explodes into
``depth`` (row, bucket) coordinates (a zero-shuffle projection), and the
groupBy partial-aggregates map-side down to at most depth*width rows.
Estimation broadcasts the finished table against any candidate stream:
``est(key) = min over rows of table[row][hash_row(key) % width]`` —
never an underestimate (each counter only ever adds other keys'
collisions on top), which the check query surfaces as a hash-checked
boolean column.

Hashes are the portable seeded-md5 family (functions/textfns.py::
seeded_hash60, seed = base + row index) so DuckDB reproduces the exact
bucket layout — the sketch itself is deterministic and hash-checkable,
unlike Spark's built-in stat.countMinSketch whose serialized table
lives driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import seeded_hash60

CM_SEED = 11


def _coords(key: Column, *, depth: int, width: int, seed: int) -> Column:
    """Array of the key's ``depth`` (row_id, bucket) coordinates."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row_id"),
                (seeded_hash60(key, seed + i) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def countmin_table(
    df: DataFrame,
    key_col: str,
    *,
    depth: int = 3,
    width: int = 8,
    seed: int = CM_SEED,
) -> DataFrame:
    """Build the CM counter table: (row_id, bucket, cnt), at most
    depth * width rows — the sketch's entire state."""
    return (
        df.select(
            F.explode(
                _coords(F.col(key_col), depth=depth, width=width, seed=seed)
            ).alias("c")
        )
        .groupBy(F.col("c.row_id").alias("row_id"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    cm: DataFrame,
    candidates: DataFrame,
    key_col: str,
    *,
    depth: int = 3,
    width: int = 8,
    seed: int = CM_SEED,
) -> DataFrame:
    """Estimate each candidate key's frequency from the broadcast CM
    table: explode the candidate's coordinates, hash-join the (tiny)
    table, take the min counter. The candidate stream can be any size —
    the sketch side is depth*width rows and always broadcasts.

    LEFT join + coalesce-to-0, not inner: the counter table only stores
    non-empty buckets, so a probe key that was never inserted may hit
    an absent (zero) bucket. An inner join would take the min over only
    the non-empty rows (inflating the estimate) and would drop a
    key whose buckets are ALL empty from the output entirely — the true
    sketch estimate in both cases involves the 0 counters, and a key
    with any empty bucket estimates exactly 0."""
    coords = candidates.select(
        F.col(key_col),
        F.explode(
            _coords(F.col(key_col), depth=depth, width=width, seed=seed)
        ).alias("c"),
    ).select(key_col, F.col("c.row_id").alias("row_id"), F.col("c.bucket").alias("bucket"))
    return (
        coords.join(F.broadcast(cm), ["row_id", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("cm_est"))
    )


BLOOM_SEED = 29
BLOOM_BITS_PER_WORD = 60  # 60 usable bits/word: shifts never reach the
# BIGINT sign bit, so both engines' shift/or arithmetic stays positive
# and overflow-free (DuckDB errors on signed overflow; Spark wraps).


def _bloom_coords(key: Column, *, n_words: int, k: int, seed: int) -> Column:
    """Array of the key's ``k`` (word, bit) coordinates over an
    m = n_words * 60 bit space — portable seeded-md5, like count-min."""
    m = n_words * BLOOM_BITS_PER_WORD
    positions = F.array(*[seeded_hash60(key, seed + i) % m for i in range(k)])
    return F.transform(
        positions,
        lambda p: F.struct(
            F.floor(p / BLOOM_BITS_PER_WORD).cast("bigint").alias("w"),
            (p % BLOOM_BITS_PER_WORD).cast("int").alias("b"),
        ),
    )


def bloom_build(
    items: DataFrame,
    key_col: str,
    *,
    n_words: int,
    k: int = 3,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Build a Bloom filter as a (w, word) table of at most ``n_words``
    rows — the membership sketch completing the trio (HLL = distinct,
    count-min = frequency, Bloom = membership). One bounded shuffle:
    coordinates explode map-side, bit_or partial-aggregates to at most
    n_words rows regardless of item count. At 100 TB this replaces
    broadcasting the full benchmark n-gram set with broadcasting a
    fixed-size bitmap."""
    coords = items.select(
        F.explode(
            _bloom_coords(F.col(key_col), n_words=n_words, k=k, seed=seed)
        ).alias("c")
    )
    return (
        coords.select(F.col("c.w").alias("w"), F.col("c.b").alias("b"))
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("word"))
    )


def bloom_might_contain(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str,
    *,
    n_words: int,
    k: int = 3,
    seed: int = BLOOM_SEED,
) -> DataFrame:
    """Probe the (broadcast) Bloom table: a key might be a member iff
    ALL ``k`` of its bits are set. Probe rows must be distinct (the
    groupBy restores the input grain). One-sided by construction —
    false positives possible, false negatives impossible — which the
    check query surfaces as a hash-checked column."""
    cols = probes.columns
    coords = probes.select(
        "*",
        F.explode(
            _bloom_coords(F.col(key_col), n_words=n_words, k=k, seed=seed)
        ).alias("c"),
    ).select(*cols, F.col("c.w").alias("w"), F.col("c.b").alias("b"))
    probed = coords.join(F.broadcast(bloom), "w", "left").withColumn(
        "__set",
        F.expr("word IS NOT NULL AND ((shiftright(word, b) & 1) = 1)"),
    )
    return probed.groupBy(*cols).agg(
        (F.sum(F.col("__set").cast("int")) == k).alias("might_contain")
    )
