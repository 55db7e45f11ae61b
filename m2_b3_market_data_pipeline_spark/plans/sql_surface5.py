"""Fifth wave: time-range windows, non-equi band joins, and sketches.

Fills the remaining window/join frame variants SURVEY.md calls out:

- SURVEY.md §2.6 W1 notes the reference's ``mm_7d`` is ROW-based
  (`/root/reference/etl/etl_job.py:126-130`) and that "a time-based
  variant would use ``rangeBetween`` over a unix-ts column" — that
  variant lands here as ``rolling_mean_time_range``.
- SURVEY.md §2.4 notes the reference has no range joins but the Athena
  SQL surface (`/root/reference/README.md:270-296`) admits arbitrary
  theta joins — ``band_join_revenue`` pins a canonical interval/band
  join shape.
- ``approx_distinct_users`` adds the HLL sketch path (approximate
  distinct at 100 TB is a sketch, never an exact shuffle-distinct).

Scale notes (100 TB posture): the time-range window shuffles once on
its partition key, identical cost profile to the row-frame form. The
band dim is schema-bounded (a handful of rows) so the non-equi join is
an explicit ``F.broadcast`` nested-loop — each probe row scans ≤|bands|
entries, no shuffle, no cartesian blow-up. HLL aggregation carries a
fixed-size sketch through partial aggregation instead of shuffling
every distinct key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load, register

_WEEK_MICROS = 7 * 24 * 3600 * 1_000_000


@register(
    "rolling_mean_time_range",
    oracle="""
SELECT event_id, user_id, ts, value,
       CAST((SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) OVER w * 100)
            // COUNT(*) OVER w AS BIGINT) AS avg_7d_e4
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY ts
    RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW
)
""",
)
def rolling_mean_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based trailing mean: RANGE frame over microsecond event time.

    The calendar-time sibling of the reference's row-based ``mm_7d``
    (SURVEY.md §2.6 W1): the frame is [t - 7 days, t] regardless of how
    many rows fall inside it. ``rangeBetween`` needs a numeric ordering
    key, so we order by ``unix_micros(ts)`` — exact integer µs, no
    double truncation — and bound the frame in µs. One shuffle on
    user_id; the frame is evaluated streamingly within each sorted
    partition.

    The mean itself is computed in EXACT integer arithmetic (cents in,
    1e-4-dollar units out): tick values are 2dp, so their frame
    averages land exactly on round-half boundaries where Spark's
    incremental frame sum and DuckDB's recomputed sum tie-break
    differently — no ROUND precision fixes that. Integer division of
    integer cents is bit-deterministic on both engines (the same
    micro-unit idiom the embedding oracles use).
    """
    e = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-_WEEK_MICROS, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    # `div` = integral division truncating toward zero — and DuckDB's
    # `//` ALSO truncates when both operands are integers (it floors
    # only in float mode), so the engines agree for ANY sign of the
    # frame sum; tests/test_sql_surface5.py pins this with negative
    # sums so the fixture never has to guarantee non-negative values.
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (F.sum(cents).over(w) * 100).alias("__sum_e4"),
        F.count("*").over(w).alias("__n"),
    ).select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.expr("__sum_e4 div __n").alias("avg_7d_e4"),
    )


_BANDS = [
    (0.0, 20_000.0),
    (20_000.0, 40_000.0),
    (40_000.0, 60_000.0),
    (60_000.0, 1.0e12),
]


@register(
    "band_join_revenue",
    oracle="""
WITH bands(band_lo, band_hi) AS (VALUES
    (0.0, 20000.0), (20000.0, 40000.0), (40000.0, 60000.0),
    (60000.0, 1e12))
SELECT band_lo,
       CAST(COUNT(*) AS BIGINT)                                  AS n,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 6)         AS revenue
FROM lineitem
JOIN bands
  ON l_extendedprice >= band_lo AND l_extendedprice < band_hi
GROUP BY band_lo
""",
)
def band_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band/interval join: price rows matched to their band.

    The band dim is bounded by schema (4 rows here), so the right
    strategy at any scale is a broadcast nested-loop join — each fact
    row tests a handful of intervals locally, no shuffle. A shuffled
    theta join here would be a cross-product disaster at 100 TB; the
    explicit ``F.broadcast`` pins the safe plan.
    """
    li = load(spark, sf_dir, "lineitem")
    bands = spark.createDataFrame(_BANDS, "band_lo double, band_hi double")
    joined = li.join(
        F.broadcast(bands),
        (F.col("l_extendedprice") >= F.col("band_lo"))
        & (F.col("l_extendedprice") < F.col("band_hi")),
    )
    return joined.groupBy("band_lo").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6
        ).alias("revenue"),
    )


@register(
    "gap_fill_locf",
    oracle="""
WITH daily AS (
    SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
           MAX(value) AS day_value
    FROM events GROUP BY 1, 2
),
bounds AS (SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1),
spine AS (
    SELECT user_id,
           CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                       CAST(d1 AS TIMESTAMP),
                                       INTERVAL 1 DAY)) AS DATE) AS day
    FROM bounds
)
SELECT s.user_id, s.day,
       ROUND(LAST_VALUE(d.day_value IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day), 6) AS value_ff
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
""",
)
def gap_fill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + LOCF forward fill (hypertable-rollup staple).

    Builds a continuous daily spine per user with ``sequence`` +
    ``explode`` (distributed — each user's spine is generated on its own
    executor, no driver-side date loop), left-joins the observed daily
    value, and carries the last observation forward with
    ``last(ignorenulls=True)`` over an unbounded-preceding row frame.
    Two shuffles (daily agg, spine join on the same key); the LOCF
    window reuses the join's user_id partitioning. Day values use
    ``MAX`` so duplicate timestamps stay deterministic.
    """
    e = load(spark, sf_dir, "events")
    daily = e.groupBy(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).agg(F.max("value").alias("day_value"))
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id",
        F.explode(
            F.sequence(F.col("d0"), F.col("d1"), F.expr("interval 1 day"))
        ).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            # DATE comes back from DuckDB's pandas bridge as a midnight
            # timestamp; emit the same type so the driver's isoformat
            # hash agrees.
            "user_id",
            F.col("day").cast("timestamp").alias("day"),
            F.round(F.last("day_value", ignorenulls=True).over(w), 6).alias(
                "value_ff"
            ),
        )
    )


@register(
    "regex_functions",
    oracle="""
SELECT doc_id,
       CASE WHEN text IS NOT NULL
            THEN COALESCE(regexp_extract(text, '([A-Za-z]+)', 1), '')
       END                                                         AS first_word,
       CAST(length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
                                                                   AS len_no_digits,
       regexp_matches(text, '[.!?]$')                              AS ends_sentence
FROM documents
""",
)
def regex_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar surface: extract / replace / match predicate.

    The reference's Athena layer implies the full Presto regex library
    (SURVEY.md §2.9); this pins Spark's ``regexp_extract`` /
    ``regexp_replace`` / ``rlike`` against DuckDB on patterns restricted
    to the Java-regex ∩ RE2 common subset (char classes + anchors —
    no lookaround, no engine-specific escapes). Pure projection: no
    shuffle, whole-stage codegen, pushdown-friendly.
    """
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"([A-Za-z]+)", 1).alias("first_word"),
        F.length(F.regexp_replace(F.col("text"), r"[0-9]", "")).cast("long").alias(
            "len_no_digits"
        ),
        F.col("text").rlike(r"[.!?]$").alias("ends_sentence"),
    )


@register(
    "train_test_split",
    oracle="""
WITH assigned AS (
    SELECT doc_id, lang,
           CAST(('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS bucket
    FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'valid'
            ELSE 'test' END                       AS split,
       lang,
       CAST(COUNT(*) AS BIGINT)                   AS n_docs
FROM assigned
GROUP BY 1, 2
""",
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split (training-data staple).

    Assignment is a pure function of the row key — ``md5('split|'||id)``
    bucketed mod 100 — so the split is reproducible across runs, engines,
    and cluster sizes (unlike ``df.randomSplit``, whose outcome depends
    on partitioning). No shuffle for the assignment itself; one hash
    aggregation for the per-split counts. At 100 TB the same expression
    is a partition-local projection.
    """
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("split|"), F.col("doc_id").cast("string"))), 1, 8),
            16,
            10,
        ).cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "valid").otherwise("test")
    )
    return (
        d.select(split.alias("split"), "lang")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "sample_per_group",
    oracle="""
WITH ranked AS (
    SELECT doc_id, lang,
           ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('sample|' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
SELECT doc_id, lang FROM ranked WHERE rn <= 10
""",
)
def sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic uniform sample of k=10 docs per group.

    Orders each group by a keyed md5 — a reproducible stand-in for a
    random shuffle — and keeps the first k by row_number. The
    hash-order + unique-key tiebreak makes the sample stable across
    engines and partitionings (a seeded ``sampleBy`` is engine-specific
    and only approximates the per-group fraction). One shuffle on the
    group key; with heavy group skew the rank prune still caps output
    at k rows per group.
    """
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("sample|"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 10)
        .select("doc_id", "lang")
    )


@register(
    "salted_skew_agg",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_quantity), 6)            AS sum_qty,
       CAST(COUNT(l_quantity) AS BIGINT)    AS n,
       ROUND(AVG(l_extendedprice), 6)       AS avg_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation on a maximally skewed key.

    ``l_returnflag`` has 3 values over the whole table — a plain
    groupBy funnels everything through 3 reducer tasks, the classic
    hot-key stall at 100 TB. ``operators/skew.py::salted_agg`` spreads
    each key over 16 salts in phase 1 (partial sums/counts) and merges
    in phase 2, so the widest task is ~1/16th of the hot key. The
    result is algebraically identical to the unsalted GROUP BY, which
    is exactly what the oracle checks.
    """
    from ..operators.skew import salted_agg

    li = load(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key="l_returnflag",
        aggs={
            "sum_qty": ("sum", "l_quantity"),
            "n": ("count", "l_quantity"),
            "avg_price": ("avg", "l_extendedprice"),
        },
    )
    return out.select(
        "l_returnflag",
        F.round("sum_qty", 6).alias("sum_qty"),
        "n",
        F.round("avg_price", 6).alias("avg_price"),
    )


@register("approx_distinct_users")  # rows-only: HLL sketch, engine-specific
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count per event_type.

    At 100 TB an exact COUNT(DISTINCT) shuffles every distinct key;
    the HLL sketch carries a fixed ~KB state through map-side partial
    aggregation instead. Engines' sketches differ bit-for-bit, so this
    is rows-only; `tests/test_sql_surface5.py` bounds the estimate
    against the exact count (rsd=0.01 → well within 5 %).
    """
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users")
    )


@register(
    "approx_distinct_check",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def approx_distinct_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable accuracy bound for the HLL sketch: per group,
    the EXACT distinct count (hash-compared against DuckDB) plus
    ``within_5pct`` = |HLL - exact| / exact <= 0.05, which the oracle
    asserts is literally TRUE. Turns the rows-only ``approx_distinct_
    users`` evidence into a hash-checked row: if the sketch ever drifts
    past its bound, the boolean flips and the driver sees a mismatch.

    The two aggregates run as SEPARATE subplans joined on the group key
    (r15 optimization, guide §2.3): fusing a distinct aggregate with a
    non-distinct one triggers the Expand rewrite, whose first-phase
    hash aggregate is keyed (event_type, user_id, gid) — and every one
    of those fine-grained groups carries the FULL aggregation buffer
    row, including the HLL's 2^14-register sketch (rsd=0.01 -> ~12 KB).
    At 100 TB that allocates a multi-KB buffer per distinct user;
    split, the HLL leg keeps one buffer per event_type and the exact
    leg shuffles bare (event_type, user_id) pairs with map-side
    partial dedup. Same-window A/B at sf0.1: 1.64s vs 2.98s, values
    identical (the join is a 5-row broadcast).

    The join is NULL-SAFE (r16 correctness fix, flagged by the r15
    advisor): a plain equi-join drops the event_type IS NULL group that
    both legs (and the DuckDB oracle's GROUP BY) keep — the adversarial
    fixture plants event_type=None. ``eqNullSafe`` plans as the same
    broadcast hash join (<=> is a valid hash key)."""
    e = load(spark, sf_dir, "events")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    hll = e.groupBy(F.col("event_type").alias("__et_hll")).agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll_users")
    )
    return (
        exact.join(hll, exact["event_type"].eqNullSafe(hll["__et_hll"]))
        .select(
            "event_type",
            "exact_users",
            # multiplication form (|hll-exact|*20 <= exact): exact
            # integer arithmetic AND well-defined for exact=0 (an
            # all-NULL-user group) where the division form yields NULL
            # against the oracle's literal TRUE
            (
                F.abs(F.col("hll_users") - F.col("exact_users")) * 20
                <= F.col("exact_users")
            ).alias("within_5pct"),
        )
        .orderBy("event_type")
    )


@register(
    "approx_quantile_check",
    oracle="""
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS exact_p50,
       TRUE AS within_envelope
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def approx_quantile_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable accuracy bound for the quantile sketch: per
    group, the EXACT interpolated median (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, hash-compared) plus ``within_envelope`` =
    sketch-p50 lies inside the exact [p45, p55] value envelope — far
    looser than approx_percentile's default 1e-4 rank error, so only a
    genuinely broken sketch flips it, while the driver finally records
    a hash row for the sketch path (previously rows-only)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("exact_p50"),
            F.expr("percentile(value, 0.45)").alias("lo"),
            F.expr("percentile(value, 0.55)").alias("hi"),
            F.approx_percentile("value", 0.5).alias("sketch_p50"),
        )
        .select(
            "event_type",
            "exact_p50",
            (
                (F.col("sketch_p50") >= F.col("lo"))
                & (F.col("sketch_p50") <= F.col("hi"))
            ).alias("within_envelope"),
        )
        .orderBy("event_type")
    )


@register(
    "salted_skew_join",
    oracle="""
WITH dim AS (
    SELECT o_orderpriority, ROUND(AVG(o_totalprice), 6) AS prio_avg
    FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT)                      AS n,
       ROUND(MIN(o.o_totalprice - d.prio_avg), 6)    AS min_dev,
       ROUND(MAX(o.o_totalprice - d.prio_avg), 6)    AS max_dev
FROM orders o JOIN dim d ON o.o_orderpriority = d.o_orderpriority
GROUP BY o.o_orderpriority
""",
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof equi-join on a 5-value key (operators/skew.py::
    salted_join): the fact side is salted 16 ways and the per-priority
    dim is replicated across salts, so a hot key's rows spread over 16
    shuffle partitions instead of one straggler. For when the dim is too
    big to broadcast but fine to replicate; result is algebraically
    identical to the plain join, which is what the oracle checks
    (deviations from the per-priority mean, min/max = exact picks).
    """
    from ..operators.skew import salted_join

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority", "o_totalprice")
    dim = o.groupBy("o_orderpriority").agg(F.round(F.avg("o_totalprice"), 6).alias("prio_avg"))
    joined = salted_join(o, dim, key="o_orderpriority", n_salts=16)
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min(F.col("o_totalprice") - F.col("prio_avg")), 6).alias("min_dev"),
        F.round(F.max(F.col("o_totalprice") - F.col("prio_avg")), 6).alias("max_dev"),
    )
