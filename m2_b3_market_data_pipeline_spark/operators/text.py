"""Text-analysis operators for LLM training-data pipelines.

Beyond the reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, and document fingerprinting over the
``documents`` table. All built-in Spark SQL expressions — one codegen'd
projection per document, no shuffle, no UDFs — so throughput at 100 TB is
bounded by parquet scan speed, not Python.

Each operator has a DuckDB oracle twin in plans/expansion_text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfns import normalized_text, token_count, tokens

# Marker stopwords per language for the n-gram/stopword-voting heuristic.
# Deliberately tiny and transparent: the point is the *operator shape*
# (vectorized regex counting + deterministic argmax), not model quality.
LANG_MARKERS: dict[str, str] = {
    "en": r"\b(the|and|of|to|a|in|is|it)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein)\b",
    "fr": r"\b(le|la|les|et|est|un|une|des)\b",
    "es": r"\b(el|la|los|las|y|es|un|una|de)\b",
    "pt": r"\b(o|a|os|as|e|um|uma|não|de|que)\b",
}

ENGLISH_STOPWORDS = r"\b(the|and|of|to|a|in|is|it|for|on|with|as|at|by)\b"


def marker_count(text: str | Column, pattern: str) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(F.lower(col), F.lit(pattern))


def lang_scores(text: str | Column) -> dict[str, Column]:
    return {lang: marker_count(text, pat) for lang, pat in LANG_MARKERS.items()}


def predict_lang(text: str | Column) -> Column:
    """Deterministic argmax over marker counts: first language (in
    LANG_MARKERS order) with the strictly-highest vote; 'und' when all
    votes are zero. Integer comparisons only — bit-stable across engines.
    """
    scores = lang_scores(text)
    langs = list(scores)
    best = F.greatest(*scores.values())
    expr: Column = F.lit("und")
    for lang in reversed(langs):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def with_text_stats(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Token count, char counts, punctuation/digit/whitespace ratios,
    average token length — the standard quality-signal bundle."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_char = F.length(t)
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_chars_m", n_char)
        .withColumn("n_punct", F.regexp_count(t, F.lit(r"[^\w\s]")))
        .withColumn("n_digits", F.regexp_count(t, F.lit(r"[0-9]")))
        .withColumn(
            "avg_token_len",
            F.when(
                n_tok > 0,
                F.round(
                    F.aggregate(
                        toks, F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
                    ).cast("double")
                    / n_tok.cast("double"),
                    6,
                ),
            ),
        )
        .withColumn("n_stopwords", F.regexp_count(F.lower(t), F.lit(ENGLISH_STOPWORDS)))
    )


def quality_score(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Composite quality score in [0,1]: rewards stopword presence and
    moderate token length, penalizes punctuation/digit noise. The exact
    formula is arbitrary-but-fixed; what matters is that it is pure
    column arithmetic (rounded for cross-engine stability)."""
    t = F.col(text_col)
    n_tok = token_count(t).cast("double")
    n_char = F.length(t).cast("double")
    punct_ratio = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double") / F.greatest(n_char, F.lit(1.0))
    stop_ratio = F.regexp_count(F.lower(t), F.lit(ENGLISH_STOPWORDS)).cast("double") / F.greatest(
        n_tok, F.lit(1.0)
    )
    length_ok = F.when((n_tok >= 10) & (n_tok <= 1000), F.lit(1.0)).otherwise(F.lit(0.5))
    score = length_ok * (F.lit(0.5) + F.lit(0.5) * F.least(stop_ratio * 2, F.lit(1.0))) * (
        F.lit(1.0) - F.least(punct_ratio * 4, F.lit(0.8))
    )
    return df.withColumn("quality_score", F.round(score, 6))


def with_fingerprint(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Content fingerprints: md5 + sha256 of the whitespace-normalized
    text. The exact-dedup / provenance primitive."""
    norm = normalized_text(text_col)
    return df.withColumn("fp_md5", F.md5(norm)).withColumn("fp_sha256", F.sha2(norm, 256))
