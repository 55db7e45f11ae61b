"""Round-6 second curation wave: semantic dedup, duplicated-span
coverage, and duplicate-frame detection.

- ``semdedup_prune``: SemDeDup (Abbas et al. 2023) — k-means cluster the
  embedding space, prune vectors cosine-close to a lower-id cluster-mate
  WITHIN their cluster only (pairs are n²/k, never n²). The oracle
  unrolls the same deterministic k-means iterations as
  ``kmeans_clusters`` and replays the in-cluster prune rule.
- ``dup_ngram_spans``: cross-document duplicated-span coverage at
  n-gram granularity (the Lee et al. 2022 exact-substring-dedup signal):
  per doc, how many gram positions — and how much of the token stream,
  interval-unioned — sit inside a span repeated verbatim in other docs.
- ``frame_dedup``: corpus-wide duplicate frames over the sampled-frame
  relation (multimodal family): frame hashes seen in >= 2 distinct
  payloads, with occurrence counts and a deterministic representative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import dup_ngram_coverage, fan_out
from ..operators.embeddings import semdedup
from ..operators.multimodal import attach_binary, frame_dedup, sample_frames
from .expansion_embeddings import (
    KMEANS_ITERS,
    N_CENTROIDS,
    _km_assign_cte,
    _km_update_cte,
)
from .registry import load, register
from .sql_fragments import TK

# Fixture max pairwise cosine is ~0.51 (sf0.01) / ~0.60 (sf0.1) — same
# rationale as expansion_similarity.NEAR_DUP_THRESHOLD: a small
# non-empty prune set at both SFs, so the operator is exercised.
SEM_THRESHOLD = 0.45
DUP_NGRAM_N = 5
DUP_NGRAM_MIN_DF = 2

_SEMCOS = (
    "ROUND(list_inner_product(a.v, b.v) / "
    "(sqrt(list_inner_product(a.v, a.v)) * sqrt(list_inner_product(b.v, b.v))), 6)"
)


def _semdedup_oracle() -> str:
    """The kmeans_clusters CTE chain (same deterministic seeding and
    6dp-rounded updates) + the in-cluster lower-id prune rule."""
    ctes = [
        "e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS centroid_id, v AS cv FROM e "
        f"WHERE vec_id < {N_CENTROIDS})",
    ]
    for i in range(KMEANS_ITERS):
        ctes.append(_km_assign_cte(f"c{i}", f"a{i}"))
        ctes.append(_km_update_cte(f"a{i}", f"c{i + 1}"))
    ctes.append(_km_assign_cte(f"c{KMEANS_ITERS}", "af"))
    ctes.append(
        f"""pr AS (
    SELECT b.vec_id, TRUE AS pruned
    FROM af a JOIN af b
      ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id
    WHERE {_SEMCOS} >= {SEM_THRESHOLD}
    GROUP BY b.vec_id)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT w.vec_id, w.centroid_id, COALESCE(p.pruned, FALSE) AS pruned
FROM af w LEFT JOIN pr p ON p.vec_id = w.vec_id
ORDER BY w.vec_id"""
    )


@register("semdedup_prune", oracle=_semdedup_oracle())
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup): k-means clusters bound the pairwise
    cosine to n²/k in-cluster pairs; a vector is pruned iff a lower-id
    cluster-mate is cosine >= {τ} to it (deterministic representative
    rule). Composes the oracle-checked ``kmeans_clusters`` iterate with
    an in-cluster self-join on centroid_id
    (operators/embeddings.py::semdedup)."""
    emb = load(spark, sf_dir, "embeddings")
    return semdedup(
        emb, k=N_CENTROIDS, iters=KMEANS_ITERS, threshold=SEM_THRESHOLD
    )


_K = DUP_NGRAM_N


@register(
    "dup_ngram_spans",
    oracle=f"""
WITH t AS (SELECT doc_id, {TK} AS tk FROM documents),
base AS (SELECT doc_id, CAST(COALESCE(len(tk), 0) AS BIGINT) AS n_tok, tk FROM t),
g AS (
    SELECT doc_id, pos,
           array_to_string(list_slice(tk, pos, pos + {_K - 1}), ' ') AS gram
    FROM (SELECT doc_id, tk,
                 unnest(generate_series(1, CAST(len(tk) - {_K - 1} AS INT))) AS pos
          FROM base WHERE n_tok >= {_K})),
dup AS (
    SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
    GROUP BY gram HAVING COUNT(*) >= {DUP_NGRAM_MIN_DF}),
occ AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
cov AS (
    SELECT doc_id,
           CAST(COUNT(DISTINCT pos) AS BIGINT) AS dup_positions,
           CAST(COUNT(DISTINCT idx) AS BIGINT) AS covered_tokens
    FROM (SELECT doc_id, pos,
                 unnest(generate_series(pos, pos + {_K - 1})) AS idx
          FROM occ)
    GROUP BY doc_id)
SELECT b.doc_id, b.n_tok,
       COALESCE(c.dup_positions, 0) AS dup_positions,
       COALESCE(c.covered_tokens, 0) AS covered_tokens,
       CASE WHEN b.n_tok > 0
            THEN ROUND(COALESCE(c.covered_tokens, 0) * 1.0 / b.n_tok, 6)
            ELSE 0.0 END AS dup_frac
FROM base b LEFT JOIN cov c ON c.doc_id = b.doc_id
ORDER BY b.doc_id
""",
)
def dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span coverage per document: {_K}-token grams repeated
    verbatim across >= {DUP_NGRAM_MIN_DF} docs, with the covered token
    indices interval-unioned (overlapping windows count once) — the
    position-aware dedup signal of Lee et al. 2022
    (operators/dedup.py::dup_ngram_coverage)."""
    docs = load(spark, sf_dir, "documents")
    return dup_ngram_coverage(docs, n=DUP_NGRAM_N, min_df=DUP_NGRAM_MIN_DF)


@register(
    "frame_dedup",
    oracle="""
WITH sized AS (
    SELECT doc_id, text, length(text) AS len
    FROM documents WHERE length(text) >= 64
),
f AS (SELECT doc_id, len, text, unnest([0, 1, 2, 3]) AS frame_idx FROM sized),
fr AS (
    SELECT doc_id, frame_idx,
           md5(substring(text, frame_idx * ((len - 16) // 3) + 1, 16)) AS frame_hash
    FROM f)
SELECT frame_hash,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       MIN(doc_id) AS min_doc_id
FROM fr
GROUP BY frame_hash
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY frame_hash
""",
)
def frame_dedup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate frames across the corpus: the ``multimodal_frames``
    sampling pipeline folded by content hash, keeping hashes present in
    >= 2 distinct payloads (operators/multimodal.py::frame_dedup). Same
    byte-window stand-in for the stubbed codec decode, same
    ASCII-fixture oracle caveat as multimodal_frames."""
    docs = load(spark, sf_dir, "documents")
    frames = sample_frames(
        fan_out(attach_binary(docs)), n_frames=4, frame_bytes=16
    )
    return frame_dedup(frames)
