"""Bounded-state sketch queries: count-min frequency estimation with
its one-sided error guarantee, and Bloom-filter decontamination with
its never-false-negative invariant — the accuracy-companion pattern of
approx_distinct_check / approx_quantile_check, completing the sketch
trio (HLL = distinct, count-min = frequency, Bloom = membership).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import load, register

CM_DEPTH = 3
CM_WIDTH = 8  # deliberately tight so buckets collide and the min matters


def _cm_bucket_sql(word_expr: str, row_expr: str) -> str:
    """DuckDB twin of sketches.py::_coords' bucket: seeded-md5 60-bit
    hash mod width, seed = CM_SEED + row index."""
    from ..operators.sketches import CM_SEED

    return (
        f"CAST(('0x' || substr(md5(CAST({CM_SEED} + {row_expr} AS VARCHAR) "
        f"|| '|' || {word_expr}), 1, 15)) AS BIGINT) % {CM_WIDTH}"
    )


@register(
    "countmin_check",
    oracle=f"""
WITH tok AS (
    SELECT w AS word FROM (
        SELECT unnest(string_split_regex(text, '\\s+')) AS w FROM documents)
    WHERE w <> ''),
exact AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS exact_cnt FROM tok GROUP BY word),
r AS (SELECT unnest(generate_series(0, {CM_DEPTH} - 1)) AS row_id),
hashed AS (
    SELECT t.word, r.row_id, {_cm_bucket_sql("t.word", "r.row_id")} AS bucket
    FROM tok t, r),
cm AS (SELECT row_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
       FROM hashed GROUP BY row_id, bucket),
est AS (
    SELECT e.word, MIN(COALESCE(cm.cnt, 0)) AS cm_est
    FROM exact e CROSS JOIN r
    LEFT JOIN cm ON cm.row_id = r.row_id
           AND cm.bucket = {_cm_bucket_sql("e.word", "r.row_id")}
    GROUP BY e.word)
SELECT x.word, x.exact_cnt, e.cm_est, (e.cm_est >= x.exact_cnt) AS never_under
FROM exact x JOIN est e ON e.word = x.word
""",
)
def countmin_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch vs exact counts (operators/
    sketches.py): build the {CM_DEPTH}x{CM_WIDTH} counter table over the
    corpus word stream in one bounded shuffle, estimate every distinct
    word from the BROADCAST table, and surface the sketch's one-sided
    error guarantee (cm_est >= exact, always) as a hash-checked column —
    the accuracy-companion pattern of approx_distinct_check /
    approx_quantile_check, completing the sketch family with frequency
    estimation. Width is deliberately tight so buckets genuinely collide
    on the fixture and the row-min does real work."""
    from ..operators.sketches import countmin_estimate, countmin_table

    docs = load(spark, sf_dir, "documents")
    tok = (
        docs.select(F.explode(F.split(F.col("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
    )
    exact = tok.groupBy("word").agg(F.count("*").alias("exact_cnt"))
    cm = countmin_table(tok, "word", depth=CM_DEPTH, width=CM_WIDTH)
    est = countmin_estimate(cm, exact.select("word"), "word", depth=CM_DEPTH, width=CM_WIDTH)
    return exact.join(est, "word").select(
        "word",
        "exact_cnt",
        "cm_est",
        (F.col("cm_est") >= F.col("exact_cnt")).alias("never_under"),
    )

BLOOM_WORDS = 1100  # ~66k bits: real false positives at sf0.1, few at sf0.01
BLOOM_K = 3


def _bloom_pos_sql(gram_expr: str, i: int) -> str:
    from ..operators.sketches import BLOOM_BITS_PER_WORD, BLOOM_SEED

    m = BLOOM_WORDS * BLOOM_BITS_PER_WORD
    return (
        f"CAST(('0x' || substr(md5('{BLOOM_SEED + i}|' || {gram_expr}), 1, 15)) "
        f"AS BIGINT) % {m}"
    )


def _bloom_coords_sql(source: str, extra_cols: str) -> str:
    """UNION ALL of the k per-hash (w, b) coordinate rows for a CTE with
    a ``gram`` column."""
    from ..operators.sketches import BLOOM_BITS_PER_WORD

    selects = [
        f"SELECT {extra_cols}({_bloom_pos_sql('gram', i)}) // {BLOOM_BITS_PER_WORD} AS w, "
        f"({_bloom_pos_sql('gram', i)}) % {BLOOM_BITS_PER_WORD} AS b FROM {source}"
        for i in range(BLOOM_K)
    ]
    return " UNION ALL ".join(selects)


from .expansion_corpus2 import BENCH_MOD, DECONTAM_NGRAM, _GRAMS  # noqa: E402
from .expansion_text import _TK  # noqa: E402


@register(
    "bloom_decontaminate_check",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TK} AS tk FROM documents),
g AS (SELECT doc_id, unnest({_GRAMS}) AS gram FROM t),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {BENCH_MOD} = 0),
train AS (SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % {BENCH_MOD} <> 0),
bcoords AS ({_bloom_coords_sql('bench', '')}),
bloom AS (SELECT w, bit_or(CAST(1 AS BIGINT) << b) AS word FROM bcoords GROUP BY w),
tcoords AS ({_bloom_coords_sql('train', 'doc_id, gram, ')}),
probed AS (
    SELECT t.doc_id, t.gram,
           (bl.word IS NOT NULL AND ((bl.word >> t.b) & 1) = 1) AS bit_set
    FROM tcoords t LEFT JOIN bloom bl ON bl.w = t.w),
gram_hits AS (
    SELECT doc_id, gram,
           (SUM(CASE WHEN bit_set THEN 1 ELSE 0 END) = {BLOOM_K}) AS might
    FROM probed GROUP BY doc_id, gram),
per_doc AS (
    SELECT gh.doc_id, BOOL_OR(gh.might) AS bloom_hit,
           BOOL_OR(gh.might AND b.gram IS NOT NULL) AS exact_hit
    FROM gram_hits gh
    LEFT JOIN bench b ON b.gram = gh.gram
    GROUP BY gh.doc_id)
SELECT doc_id, exact_hit, bloom_hit,
       (bloom_hit AND NOT exact_hit) AS false_positive
FROM per_doc
""",
)
def bloom_decontaminate_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination vs the exact n-gram rule — the
    100 TB shape: instead of broadcasting the full benchmark n-gram set
    (`decontaminate`'s exact join), broadcast a fixed {BLOOM_WORDS}-word
    bitmap (operators/sketches.py::bloom_build) and verify ONLY the
    grams the filter admits against the exact set. The one-sided
    guarantee — a Bloom filter never false-negatives — makes
    exact_hit => bloom_hit a per-row hash-checked invariant, and
    false_positive quantifies the admit-rate cost of the compression.
    Same tokenizer/trigram contract as `decontaminate`; output grain is
    every train doc that has at least one trigram."""
    from ..functions.textfns import shingles, tokens
    from ..operators.dedup import fan_out
    from ..operators.sketches import bloom_build, bloom_might_contain

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    g = fan_out(docs).select(
        "doc_id", F.explode(shingles(tokens("text"), DECONTAM_NGRAM)).alias("gram")
    )
    bench = g.filter(F.col("doc_id") % BENCH_MOD == 0).select("gram").distinct()
    train = (
        g.filter(F.col("doc_id") % BENCH_MOD != 0).select("doc_id", "gram").distinct()
    )
    bloom = bloom_build(bench, "gram", n_words=BLOOM_WORDS, k=BLOOM_K)
    might = bloom_might_contain(train, bloom, "gram", n_words=BLOOM_WORDS, k=BLOOM_K)
    verified = might.join(
        F.broadcast(bench.select("gram", F.lit(True).alias("__exact"))), "gram", "left"
    )
    return (
        verified.groupBy("doc_id")
        .agg(
            F.max(
                F.coalesce(F.col("might_contain") & F.col("__exact"), F.lit(False))
            ).alias("exact_hit"),
            F.max("might_contain").alias("bloom_hit"),
        )
        .select(
            "doc_id",
            "exact_hit",
            "bloom_hit",
            (F.col("bloom_hit") & ~F.col("exact_hit")).alias("false_positive"),
        )
    )
