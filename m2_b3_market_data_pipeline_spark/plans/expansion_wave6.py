"""Wave 6: corpus LM-scoring, containment dedup, Z-order layout keys,
single-pass correlation, and wide->long unpivot.

Five capability gaps closed, each with a DuckDB hash oracle:

- trigram_lm_score: char-trigram LM quality scoring (perplexity proxy)
  with a broadcast-bounded model (operators/text.py).
- containment_pairs: directed shingle containment — the quote/subset
  near-dup case Jaccard misses (operators/dedup.py).
- zorder_keys: Morton-code clustering keys for two-column data skipping
  (operators/layout.py; the write path is pytest-verified).
- correlation_matrix: all pairwise Pearson correlations of the lineitem
  measures in ONE aggregation pass (no per-pair rescans).
- unpivot_metrics: wide->long melt of a grouped aggregate (Spark
  DataFrame.unpivot; the relational dual of pivot_segments).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import containment_pairs
from ..operators.layout import zorder_key, zorder_key_sql
from ..operators.text import PRE_HASH_SEED, TRI_HASH_SEED, trigram_lm_scores
from .registry import load, register
from .sql_fragments import NTOK, TK

CONTAIN_NGRAM = 5
CONTAIN_THRESHOLD = 0.6
ZBITS = 16
CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


@register(
    "trigram_lm_score",
    oracle="""
WITH t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
g AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(length(s) - 2, 0)),
                                 i -> substr(s, i, 3))) AS gram
    FROM t
),
c3 AS (SELECT gram, COUNT(*) AS n3 FROM g GROUP BY gram),
c2 AS (SELECT substr(gram, 1, 2) AS pre, COUNT(*) AS n2 FROM g GROUP BY 1),
model AS (
    SELECT gram, log2(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS logp
    FROM c3 JOIN c2 ON substr(c3.gram, 1, 2) = c2.pre
)
SELECT g.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       ROUND(AVG(logp), 6) AS avg_logp
FROM g JOIN model ON g.gram = model.gram
GROUP BY g.doc_id
""",
)
def trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-trained char-trigram LM scoring (operators/text.py). The
    model is bounded by |charset|^3 so it broadcasts; the corpus side
    never shuffles on model keys — the KenLM-style quality filter at
    100 TB."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return trigram_lm_scores(docs)


# Hashed-bucket twin (r10 verdict item 3): grams and prefixes fold to
# seeded-hash buckets BEFORE both count passes. 64 buckets over the
# fixture's ~2-4k observed trigrams forces real collisions, so the
# differential gate exercises the fold itself (the nb_hashed posture).
TRI_BUCKETS = 64


@register(
    "trigram_lm_hashed",
    oracle=f"""
WITH t AS (SELECT doc_id, lower(trim(text)) AS s FROM documents),
g AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, greatest(length(s) - 2, 0)),
                                 i -> substr(s, i, 3))) AS gram
    FROM t
),
h AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5('{TRI_HASH_SEED}|' || gram), 1, 15)) AS BIGINT)
               % {TRI_BUCKETS} AS tb,
           CAST(('0x' || substr(md5('{PRE_HASH_SEED}|' || substr(gram, 1, 2)), 1, 15)) AS BIGINT)
               % {TRI_BUCKETS} AS pb
    FROM g
),
c3 AS (SELECT tb, COUNT(*) AS n3 FROM h GROUP BY tb),
c2 AS (SELECT pb, COUNT(*) AS n2 FROM h GROUP BY pb)
SELECT h.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       ROUND(AVG(log2(CAST(n3 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6) AS avg_logp
FROM h JOIN c3 USING (tb) JOIN c2 USING (pb)
GROUP BY h.doc_id
""",
)
def trigram_lm_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-bucket trigram LM scoring — the scale-safe twin of
    ``trigram_lm_score`` for OPEN charsets (SCALE.md §19.3): both
    model tables are <= {TRI_BUCKETS} rows BY CONTRACT (a knob, not
    the |charset|^3 alphabet assumption a CJK-bearing corpus breaks at
    ~1e8 observed trigrams), the same seeded-hash fold nb_hashed and
    dsir_log_weights ship, applied AT the explode projection so train
    and score cannot drift. The dense form stays registered as the
    judged baseline (operators/text.py::trigram_lm_scores)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return trigram_lm_scores(docs, n_buckets=TRI_BUCKETS)


@register(
    "containment_pairs",
    oracle=f"""
WITH t AS (
    SELECT doc_id,
           {TK} AS tk
    FROM documents
),
sh AS (
    SELECT doc_id,
           list_distinct([array_to_string(tk[i:i+{CONTAIN_NGRAM - 1}], ' ')
                          for i in generate_series(1, len(tk) - {CONTAIN_NGRAM - 1})]) AS s
    FROM t
),
e AS (SELECT doc_id, len(s) AS set_size, unnest(s) AS shingle FROM sh),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.set_size AS size_a,
           COUNT(*) AS n_inter
    FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
    GROUP BY 1, 2, 3
)
SELECT id_a, id_b,
       ROUND(CAST(n_inter AS DOUBLE) / CAST(size_a AS DOUBLE), 6) AS containment
FROM inter
WHERE CAST(n_inter AS DOUBLE) / CAST(size_a AS DOUBLE) >= {CONTAIN_THRESHOLD}
""",
)
def containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed shingle-containment join (operators/dedup.py): catches
    short-doc-inside-long-doc reuse that Jaccard under-scores."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return containment_pairs(docs, n=CONTAIN_NGRAM, threshold=CONTAIN_THRESHOLD)


@register(
    "zorder_keys",
    oracle=f"""
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       CAST({zorder_key_sql('l_partkey', 'l_suppkey', bits=ZBITS)} AS BIGINT) AS zval
FROM lineitem
""",
)
def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton-code clustering key over (l_partkey, l_suppkey)
    (operators/layout.py): pure bit arithmetic in codegen; the write
    path range-partitions + sorts on it so parquet min/max stats prune
    scans filtered on EITHER column."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zorder_key("l_partkey", "l_suppkey", bits=ZBITS).alias("zval"),
    )


def _corr_oracle() -> str:
    pairs = [
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, ROUND(corr({a}, {b}), 6) AS pearson FROM lineitem"
        for a, b in combinations(CORR_COLS, 2)
    ]
    return "\nUNION ALL\n".join(pairs)


@register("correlation_matrix", oracle=_corr_oracle())
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairwise Pearson correlations of the lineitem measures in a
    SINGLE aggregation pass: every F.corr lands in one partial+final
    hash aggregate, so the 100 TB table is scanned once for the whole
    matrix (vs once per pair). Long-form output via unpivot-style
    literal rows."""
    li = load(spark, sf_dir, "lineitem")
    pairs = list(combinations(CORR_COLS, 2))
    wide = li.agg(
        *[
            F.round(F.corr(a, b), 6).alias(f"{a}__{b}")
            for a, b in pairs
        ]
    )
    long = wide.unpivot([], [f"{a}__{b}" for a, b in pairs], "pair", "pearson")
    return long.select(
        F.split("pair", "__")[0].alias("col_a"),
        F.split("pair", "__")[1].alias("col_b"),
        "pearson",
    )


@register(
    "unpivot_metrics",
    oracle="""
WITH g AS (
    SELECT l_returnflag,
           ROUND(SUM(l_quantity), 6) AS sum_qty,
           ROUND(SUM(l_extendedprice), 6) AS sum_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price
    FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM g
UNION ALL
SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM g
UNION ALL
SELECT l_returnflag, 'sum_disc_price' AS metric, sum_disc_price AS value FROM g
""",
)
def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long melt (DataFrame.unpivot, the relational dual of
    pivot_segments): grouped aggregate first (3 rows x 3 measures), then
    unpivot — the melt runs on the tiny aggregate, never on the fact
    table."""
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 6).alias("sum_price"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 6).alias(
            "sum_disc_price"
        ),
    )
    return g.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price", "sum_disc_price"], "metric", "value"
    )


PHASH_PERTURB_MOD = 10  # every 10th doc gets a perturbed twin planted
PHASH_MAX_HAMMING = 3


@register(
    "phash_near_dups",
    oracle="""
WITH corpus AS (
    -- length()/substr() are CHARACTER-based in both engines, matching
    -- the Spark side's substr/length perturbation exactly.
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id,
           concat(substr(text, 1, length(text) - 5), 'XXXXX') AS text
    FROM documents WHERE doc_id % 10 = 0
),
-- From here on the domain is explicit BYTES (hex of the utf-8
-- encoding), mirroring perceptual_hash's byte-level signature — char
-- functions like ord()/substr(text,...) would diverge from Spark on
-- any non-ASCII document.
sized AS (
    SELECT doc_id, hex(encode(text)) AS h,
           CAST(octet_length(encode(text)) AS BIGINT) AS L
    FROM corpus WHERE octet_length(encode(text)) >= 64
),
v AS (
    SELECT doc_id, L,
           unnest(list_transform(generate_series(1, CAST(L AS INT)),
                                 i -> CAST(('0x' || substr(h, 2 * i - 1, 2)) AS BIGINT))) AS val,
           unnest(generate_series(1, CAST(L AS INT))) AS pos
    FROM sized
),
sg AS (
    SELECT doc_id, (64 * (pos - 1)) // L AS seg,
           SUM(val) AS ssum, COUNT(*) AS slen
    FROM v GROUP BY 1, 2
),
tots AS (SELECT doc_id, SUM(ssum) AS tot, SUM(slen) AS n FROM sg GROUP BY 1),
sig AS (
    SELECT sg.doc_id,
           SUM(CASE WHEN seg < 32 AND ssum * n > tot * slen
                    THEN CAST(1 AS BIGINT) << CAST(seg AS INT) ELSE 0 END) AS lo,
           SUM(CASE WHEN seg >= 32 AND ssum * n > tot * slen
                    THEN CAST(1 AS BIGINT) << CAST(seg - 32 AS INT) ELSE 0 END) AS hi
    FROM sg JOIN tots ON sg.doc_id = tots.doc_id
    GROUP BY 1
),
banded AS (SELECT doc_id, lo, hi, unnest([0, 1, 2, 3]) AS c FROM sig),
b2 AS (
    SELECT doc_id, lo, hi, c,
           CASE WHEN c < 2 THEN (lo >> (c * 16)) & 65535
                ELSE (hi >> ((c - 2) * 16)) & 65535 END AS cv
    FROM banded
),
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT)
               AS hamming
    FROM b2 a JOIN b2 b
      ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= 3
""",
)
def phash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash near-dup join for multimodal payloads: aHash-style
    segment-mean signatures (operators/multimodal.py::perceptual_hash)
    fed straight into the SimHash Hamming pigeonhole join
    (operators/dedup.py::simhash_near_pairs) — signature families
    compose, the join machinery is shared. The fixture corpus has no
    organic byte-level near-dups, so every 10th doc gets a PLANTED
    length-preserving perturbed twin (last 5 bytes replaced) standing in
    for a re-encoded image; both engines construct the same corpus, so
    the planted pairs are hash-checked, not hand-waved."""
    from ..operators.dedup import simhash_near_pairs
    from ..operators.multimodal import attach_binary, perceptual_hash

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    pert = docs.filter(F.col("doc_id") % PHASH_PERTURB_MOD == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.expr("concat(substr(text, 1, length(text) - 5), 'XXXXX')").alias("text"),
    )
    corpus = docs.unionByName(pert)
    sigs = perceptual_hash(attach_binary(corpus))
    return simhash_near_pairs(sigs, max_hamming=PHASH_MAX_HAMMING)


# --- Training-delivery shard manifest ---------------------------------------

from ..operators.layout import training_shards  # noqa: E402

SHARD_N = 16
SHARD_SEED = 777

_SHARD_KEY = f"md5('{SHARD_SEED}|' || CAST(doc_id AS VARCHAR))"
_SHARD_H = f"CAST(('0x' || substr({_SHARD_KEY}, 1, 15)) AS BIGINT)"

_SHARDS_ORACLE = f"""
WITH staged AS (
    SELECT doc_id, {_SHARD_H} AS h, {NTOK} AS nt
    FROM documents WHERE text IS NOT NULL
)
SELECT CAST(h % {SHARD_N} AS INT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS n_tokens,
       bit_xor(h) AS id_checksum,
       arg_min(doc_id, h) AS first_doc_id,
       arg_max(doc_id, h) AS last_doc_id
FROM staged
GROUP BY 1
ORDER BY 1
"""


@register("training_shards", oracle=_SHARDS_ORACLE)
def training_shards_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-delivery manifest
    (operators/layout.py::training_shards): every usable doc lands in a
    keyed-md5 shard; per shard the manifest reports docs, tokens, an
    order-insensitive bit_xor checksum of member key hashes, and the
    first/last doc in epoch read order. One shuffle, every aggregate a
    fixed-width codegen buffer — the manifest a trainer validates its
    input against without listing members."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return training_shards(docs, n_shards=SHARD_N, seed=SHARD_SEED)
