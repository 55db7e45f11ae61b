"""Training-corpus preparation queries: repetition signals, PII scrub,
sequence packing, and the composed filter -> dedup -> near-dedup
pipeline (operators/corpus.py). Every query is hash-checked; the
composed pipeline's oracle chains the SAME CTE building blocks the
stage-level oracles use (quality formula, fingerprint, MinHash pair
SQL), so the composition is verified end-to-end, not just per stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.corpus import (
    EMAIL_RE,
    PHONE_RE,
    pack_sequences,
    prepare_corpus,
    scrub_pii,
    top_bigram_fraction,
    with_repetition_stats,
)
from ..operators.text import ENGLISH_STOPWORDS
from .sql_fragments import token_in_count
from .expansion_dedup import minhash_pairs_sql
from .expansion_text import _TK
from .registry import load, register

_BG = "[tk[i] || ' ' || tk[i+1] for i in generate_series(1, len(tk) - 1)]"


@register(
    "repetition_stats",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TK} AS tk FROM documents),
b AS (SELECT doc_id, tk, {_BG} AS bg FROM t)
SELECT doc_id,
       CAST(len(tk) AS BIGINT) AS n_tokens,
       CASE WHEN len(tk) > 0 THEN
         ROUND(1.0 - CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE), 6)
       END AS dup_token_frac,
       CASE WHEN len(bg) > 0 THEN
         ROUND(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE) / CAST(len(bg) AS DOUBLE), 6)
       END AS dup_bigram_frac
FROM b
""",
)
def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition fractions (duplicate tokens / bigrams per
    document) as pure projections — no shuffle (operators/corpus.py)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return with_repetition_stats(docs).select(
        "doc_id", "n_tokens", "dup_token_frac", "dup_bigram_frac"
    )


@register(
    "top_bigram_frac",
    oracle=f"""
WITH t AS (SELECT doc_id, {_TK} AS tk FROM documents),
b AS (SELECT doc_id, unnest({_BG}) AS bg FROM t),
c AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM b GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
       ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6) AS top_bigram_frac
FROM c GROUP BY doc_id
""",
)
def top_bigram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent-bigram share per document (the Gopher top-2-gram
    filter): explode + two-level aggregation with map-side partials
    (operators/corpus.py)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return top_bigram_fraction(docs)


# The fixture corpus contains no real PII, so the query synthesizes a
# deterministic contact string per document from fixture columns — the
# scrub regexes are exercised on every row, and the oracle rebuilds the
# same string.
_CONTACT = (
    "' reach ' || source || CAST(doc_id AS VARCHAR) || '@example.org'"
    " || ' or +55-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555'"
)


@register(
    "pii_scrub",
    oracle=f"""
WITH t AS (SELECT doc_id, text || {_CONTACT} AS raw FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(raw, '{EMAIL_RE}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(raw, '{PHONE_RE}')) AS INT) AS n_phones,
       md5(regexp_replace(regexp_replace(raw, '{EMAIL_RE}', '<EMAIL>', 'g'),
                          '{PHONE_RE}', '<PHONE>', 'g')) AS scrubbed_md5
FROM t
""",
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails, phone numbers) as one codegen'd
    regexp_replace chain — counts found + md5 of the scrubbed text so
    the full redacted output is value-checked (operators/corpus.py)."""
    docs = load(spark, sf_dir, "documents")
    raw = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" reach "),
            F.col("source"),
            F.col("doc_id").cast("string"),
            F.lit("@example.org"),
            F.lit(" or +55-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-555"),
        ).alias("raw"),
    )
    scrubbed = scrub_pii(raw, text_col="raw", out_col="scrubbed")
    return scrubbed.select(
        "doc_id",
        F.regexp_count("raw", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("raw", F.lit(PHONE_RE)).alias("n_phones"),
        F.md5(F.col("scrubbed")).alias("scrubbed_md5"),
    )


PACK_BUDGET = 512


@register(
    "token_pack",
    oracle=f"""
WITH t AS (SELECT doc_id, source, CAST(len({_TK}) AS BIGINT) AS n_tokens FROM documents),
c AS (
    SELECT *,
           COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
    FROM t
)
SELECT doc_id, source, n_tokens,
       CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS shard_id,
       CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS shard_offset
FROM c
""",
)
def token_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing per source: deterministic doc order,
    integer cumulative sums, shard = the training pack the document's
    first token lands in (operators/corpus.py). One window per pack
    key — the key bounds window state at scale."""
    docs = load(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=PACK_BUDGET)


CORPUS_MIN_QUALITY = 0.55
CORPUS_NEAR_DUP = 0.5

_QUALITY_SQL = f"""
ROUND(
  (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 1.0 ELSE 0.5 END)
  * (0.5 + 0.5 * least((n_stop / greatest(n_tok, 1.0)) * 2, 1.0))
  * (1.0 - least((n_punct / greatest(n_char, 1.0)) * 4, 0.8)),
6)"""


@register(
    "corpus_pipeline",
    oracle=f"""
WITH q0 AS (
  SELECT doc_id, source, text,
         CAST(len({_TK}) AS DOUBLE)                                  AS n_tok,
         CAST(length(text) AS DOUBLE)                                AS n_char,
         CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)  AS n_punct,
         CAST({token_in_count(ENGLISH_STOPWORDS)} AS DOUBLE)                 AS n_stop
  FROM documents
),
scored AS (SELECT doc_id, source, text, {_QUALITY_SQL} AS quality_score FROM q0),
kept AS (SELECT * FROM scored WHERE quality_score >= {CORPUS_MIN_QUALITY}),
ded AS (
  SELECT doc_id, source, text, quality_score
  FROM (SELECT *, md5(array_to_string({_TK}, ' ')) AS fp_md5 FROM kept)
  QUALIFY ROW_NUMBER() OVER (PARTITION BY fp_md5 ORDER BY doc_id) = 1
),
{minhash_pairs_sql(source="ded", threshold=CORPUS_NEAR_DUP)},
losers AS (SELECT DISTINCT id_b FROM mh_pairs)
SELECT d.doc_id, d.source,
       CAST(len({_TK.replace("text", "d.text")}) AS BIGINT) AS n_tokens,
       d.quality_score
FROM ded d LEFT JOIN losers l ON d.doc_id = l.id_b
WHERE l.id_b IS NULL
""",
)
def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-corpus pipeline: quality gate -> exact
    dedup on normalized fingerprint -> MinHash near-dedup among the
    survivors -> kept docs with token counts (operators/corpus.py::
    prepare_corpus). The oracle chains the same CTE blocks the
    stage-level oracles use, verifying the composition end-to-end."""
    docs = load(spark, sf_dir, "documents")
    return prepare_corpus(
        docs,
        min_quality=CORPUS_MIN_QUALITY,
        near_dup_threshold=CORPUS_NEAR_DUP,
    )
