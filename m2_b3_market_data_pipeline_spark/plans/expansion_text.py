"""Text-analysis expansion queries over the ``documents`` fixture.

Oracle portability: the DuckDB SQL strings below are generated from the
same constants (marker word sets, stopword list, score formula) as the
Spark operators in operators/text.py — tokenization, regex counts, and
arithmetic are defined once and rendered for both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import (
    ENGLISH_STOPWORDS,
    LANG_MARKERS,
    quality_score,
    with_fingerprint,
    with_text_stats,
)
from .registry import load, register

# DuckDB token-array expression (twin of functions.textfns.tokens)
from .sql_fragments import TK as _TK  # single SQL-side tokenizer definition
from .sql_fragments import token_in_count

# oracle twin of operators/text.py::stopword_count (exact token
# membership — see the LANG_MARKERS portability note there)
_NSTOP = token_in_count(ENGLISH_STOPWORDS)


@register(
    "text_stats",
    oracle=f"""
WITH t AS (SELECT doc_id, text, {_TK} AS tk FROM documents)
SELECT doc_id,
       len(tk)                                                   AS n_tokens,
       CAST(length(text) AS INT)                                 AS n_chars_m,
       CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS INT)   AS n_punct,
       CAST(len(regexp_extract_all(text, '[0-9]')) AS INT)       AS n_digits,
       CASE WHEN len(tk) > 0 THEN
         ROUND(CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE)
               / CAST(len(tk) AS DOUBLE), 6) END                 AS avg_token_len,
       CAST({_NSTOP} AS INT)                                     AS n_stopwords
FROM t
""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality-signal statistics: one codegen'd
    projection per document, no shuffle (operators/text.py)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    out = with_text_stats(docs)
    return out.select(
        "doc_id",
        "n_tokens",
        "n_chars_m",
        "n_punct",
        "n_digits",
        "avg_token_len",
        "n_stopwords",
    )


def lang_vote_sql(prefix: str = "s_") -> tuple[str, str]:
    """(greatest_expr, when_chain) of the marker-vote argmax — the SQL
    twin of ``operators/text.py::vote_argmax``, defined ONCE and shared
    with the ``lang_segments`` oracle (corpus_quality.py) so the
    vote contract cannot drift between queries."""
    greatest = "greatest(" + ", ".join(f"{prefix}{lang}" for lang in LANG_MARKERS) + ")"
    whens = " ".join(
        f"WHEN {prefix}{lang} = best AND best > 0 THEN '{lang}'"
        for lang in LANG_MARKERS
    )
    return greatest, whens


def _lang_case_sql() -> str:
    score_cols = ", ".join(
        f"CAST({token_in_count(words)} AS INT) AS s_{lang}"
        for lang, words in LANG_MARKERS.items()
    )
    greatest, whens = lang_vote_sql()
    return f"""
WITH s AS (SELECT doc_id, lang, {score_cols} FROM documents),
b AS (SELECT *, {greatest} AS best FROM s)
SELECT doc_id, lang AS labeled_lang,
       CASE {whens} ELSE 'und' END AS predicted_lang,
       {", ".join(f"s_{lang}" for lang in LANG_MARKERS)}
FROM b
"""


@register("lang_id", oracle=_lang_case_sql())
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: vectorized marker-token voting with a
    deterministic argmax (operators/text.py). The fixture's ``lang``
    column is random, so this demonstrates the operator, not accuracy.

    Staged in three projections so the token array is built ONCE per
    row and the vote reads materialized score COLUMNS: HOF lambdas are
    CodegenFallback, so an inline vote expression re-evaluates the
    tokenization per reference (~35x/row, measured 3x wall). Catalyst
    keeps the stages separate — CollapseProject declines to inline a
    non-cheap alias referenced more than once."""
    from ..operators.text import marker_count_tokens, vote_argmax
    from ..functions.textfns import tokens

    docs = load(spark, sf_dir, "documents")
    toked = docs.select("doc_id", "lang", tokens("text").alias("__tk"))
    scored = toked.select(
        "doc_id",
        "lang",
        *[
            marker_count_tokens(F.col("__tk"), words).alias(f"s_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    return scored.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        vote_argmax({lang: F.col(f"s_{lang}") for lang in LANG_MARKERS}).alias(
            "predicted_lang"
        ),
        *[F.col(f"s_{lang}") for lang in LANG_MARKERS],
    )


@register(
    "quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         CAST(len({_TK}) AS DOUBLE)                               AS n_tok,
         CAST(length(text) AS DOUBLE)                             AS n_char,
         CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)  AS n_punct,
         CAST({_NSTOP} AS DOUBLE)                                 AS n_stop
  FROM documents
)
SELECT doc_id,
       ROUND(
         (CASE WHEN n_tok >= 10 AND n_tok <= 1000 THEN 1.0 ELSE 0.5 END)
         * (0.5 + 0.5 * least((n_stop / greatest(n_tok, 1.0)) * 2, 1.0))
         * (1.0 - least((n_punct / greatest(n_char, 1.0)) * 4, 0.8)),
       6) AS quality_score
FROM t
""",
)
def quality_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite document quality score (length/stopword/punctuation
    signals), pure column arithmetic (operators/text.py)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_score(docs).select("doc_id", "quality_score")


@register(
    "doc_fingerprint",
    oracle=f"""
WITH t AS (SELECT doc_id,
                  COALESCE(array_to_string({_TK}, ' '), '') AS norm
           FROM documents)
SELECT doc_id, md5(norm) AS fp_md5, sha256(norm) AS fp_sha256
FROM t
""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting over whitespace-normalized text — the
    exact-dedup / provenance primitive (operators/text.py).

    NULL contract: ``concat_ws`` never returns NULL, so a NULL/empty/
    whitespace-only document fingerprints as hash('') — all content-free
    docs land in one dedup bucket by design. DuckDB's
    ``array_to_string`` returns NULL for both NULL and empty lists, so
    the oracle coalesces to '' to mirror the engine."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return with_fingerprint(docs).select("doc_id", "fp_md5", "fp_sha256")
