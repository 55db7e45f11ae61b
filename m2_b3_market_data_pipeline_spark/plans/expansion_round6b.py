"""Round-6 second curation wave.

In the driver window this round:
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

Landed post-window (round-7 front-load due; all locally hash-checked at
sf0.01 AND sf0.1):
- ``dsir_weights``: DSIR hashed-n-gram importance weights (Xie et al.
  2023) — broadcast-sized smoothed multinomials, per-doc log2
  likelihood-ratio sums.
- ``lm_quality_buckets``: CCNet-style LM-score deciles via ONE exact-
  percentile aggregate + broadcast boundaries (no global sort/NTILE).
- ``bigram_pmi``: PMI collocation mining (BPE-merge candidates).
- ``source_overlap_matrix``: pairwise cross-source near-dup provenance
  over the banded MinHash pair set.
- ``lang_segments``: code-switch detection — fixed token segments vote
  through the predict_lang marker contract.
- ``hard_negatives``: contrastive triplet mining (nearest same-label
  positive + nearest different-label HARD negative, single-pass
  struct-argmax).
- ``knn_label_accuracy``: k-NN label-agreement probe of embedding
  quality (the gate before semantic dedup / retrieval mining trusts
  the cosine structure).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.dedup import dup_ngram_coverage, fan_out
from ..operators.embeddings import semdedup
from ..operators.multimodal import attach_binary, frame_dedup, sample_frames
from .expansion_dedup import minhash_pairs_sql
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


from .expansion_similarity import (  # noqa: E402  (shared fragments/constants)
    FRAMES_CTE_SQL,
    QUERY_MOD,
)


@register(
    "frame_dedup",
    oracle=f"""
WITH {FRAMES_CTE_SQL}
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


from ..operators.corpus import DSIR_SEED  # noqa: E402  (oracle must hash with the operator's seed)

DSIR_BUCKETS = 256


@register(
    "dsir_weights",
    oracle=f"""
WITH t AS (SELECT doc_id, lang = 'en' AS is_t, {TK} AS tk FROM documents),
f AS (
    SELECT doc_id, is_t,
           unnest(tk || list_transform(range(len(tk) - 1),
                  i -> tk[i+1] || ' ' || tk[i+2])) AS feat
    FROM t),
fb AS (
    SELECT doc_id, is_t,
           CAST(('0x' || substr(md5('{DSIR_SEED}|' || feat), 1, 15)) AS BIGINT)
             % {DSIR_BUCKETS} AS b
    FROM f),
bk AS (
    SELECT b, SUM(CASE WHEN is_t THEN 1 ELSE 0 END) AS nt, COUNT(*) AS nr
    FROM fb GROUP BY b),
tot AS (SELECT CAST(SUM(nt) AS BIGINT) AS tt, CAST(SUM(nr) AS BIGINT) AS tr FROM bk),
m AS (
    SELECT b, log2((nt + 1.0) / (tt + {DSIR_BUCKETS}))
            - log2((nr + 1.0) / (tr + {DSIR_BUCKETS})) AS lr
    FROM bk CROSS JOIN tot)
SELECT fb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
       ROUND(SUM(m.lr), 6) AS log_weight
FROM fb JOIN m USING (b)
GROUP BY fb.doc_id
ORDER BY fb.doc_id
""",
)
def dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023) with lang='en' as the
    target distribution: hashed unigram+bigram multinomials
    (Laplace-smoothed, {DSIR_BUCKETS} buckets — the hashing trick that
    keeps the model broadcast-sized at any corpus scale), per-doc
    summed log2 likelihood ratio. Exact integer counts; the only
    floats are the final log2s, rounded at the edge
    (operators/corpus.py::dsir_log_weights)."""
    from ..operators.corpus import dsir_log_weights

    docs = load(spark, sf_dir, "documents")
    return dsir_log_weights(
        docs, target=F.col("lang") == "en", n_buckets=DSIR_BUCKETS
    )


# Decile boundaries as exact interpolated percentiles of the ROUNDED
# score: rounding first makes the multiset engine-identical (the
# trigram_lm_score hash-match is the proof), so the boundaries agree.
LM_DECILES = [round(0.1 * i, 1) for i in range(1, 10)]


def _trigram_oracle() -> str:
    from . import expansion_wave6  # noqa: F401  (registers trigram_lm_score)
    from .registry import ORACLES

    return ORACLES["trigram_lm_score"]


@register(
    "lm_quality_buckets",
    oracle=f"""
WITH sc AS ({_trigram_oracle()}),
b AS (SELECT quantile_cont(avg_logp, {LM_DECILES}) AS bs FROM sc),
a AS (
    SELECT sc.doc_id, sc.n_trigrams, sc.avg_logp,
           CAST(len(list_filter(b.bs, x -> sc.avg_logp > x)) AS BIGINT) AS bucket
    FROM sc CROSS JOIN b)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(avg_logp), 6) AS avg_score,
       ROUND(MIN(avg_logp), 6) AS min_score,
       ROUND(MAX(avg_logp), 6) AS max_score,
       CAST(SUM(n_trigrams) AS BIGINT) AS total_trigrams
FROM a GROUP BY bucket ORDER BY bucket
""",
)
def lm_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing: split the corpus into deciles
    of the char-trigram LM score (head/middle/tail quality tiers a
    curation run keeps, down-weights, or drops). Scale-honest global
    quantiles: decile boundaries come from ONE exact-percentile
    aggregate (the TypedImperativeAggregate sketch family — at 100 TB
    swap in approx_percentile, same shape), broadcast back as 9 values;
    bucket assignment is a codegen'd fold per row — NO global sort, NO
    single-partition NTILE window. Spark ``percentile`` interpolates
    identically to DuckDB ``quantile_cont`` (exact_percentiles is the
    standing proof)."""
    from ..operators.text import trigram_lm_scores

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # The scores frame feeds TWO consumers (the percentile bounds and
    # the bucket assignment); without its own persist the broadcast-
    # model scoring join and per-doc fold replay per consumer (the
    # semdedup lesson) — only the gram explode inside trigram_lm_scores
    # is persisted by the operator itself.
    scores = trigram_lm_scores(docs).persist()
    qs = ", ".join(str(q) for q in LM_DECILES)
    bounds = scores.agg(
        F.expr(f"percentile(avg_logp, array({qs}))").alias("bs")
    )
    assigned = scores.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.expr(
            "CAST(aggregate(bs, 0, (acc, x) -> acc + "
            "CASE WHEN avg_logp > x THEN 1 ELSE 0 END) AS BIGINT)"
        ),
    )
    out = (
        assigned.groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("avg_logp"), 6).alias("avg_score"),
            F.round(F.min("avg_logp"), 6).alias("min_score"),
            F.round(F.max("avg_logp"), 6).alias("max_score"),
            F.sum("n_trigrams").alias("total_trigrams"),
        )
        .orderBy("bucket")
    )
    out._cached_frames = [scores, *getattr(scores, "_cached_frames", [])]
    return out


PMI_MIN_COUNT = 5
PMI_TOP_K = 50


@register(
    "bigram_pmi",
    oracle=f"""
WITH t AS (SELECT {TK} AS tk FROM documents),
uni AS (SELECT tok AS w, COUNT(*) AS n_w
        FROM (SELECT unnest(tk) AS tok FROM t) GROUP BY tok),
bic AS (SELECT bg, COUNT(*) AS n_pair FROM (
            SELECT unnest(list_transform(range(len(tk) - 1),
                          i -> tk[i+1] || ' ' || tk[i+2])) AS bg
            FROM t) GROUP BY bg),
tot AS (SELECT (SELECT SUM(n_w) FROM uni) AS n_tok,
               (SELECT SUM(n_pair) FROM bic) AS n_bi),
scored AS (
    SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
           CAST(n_pair AS BIGINT) AS n_pair,
           ROUND(log2(n_pair * 1.0 / n_bi)
                 - log2(u1.n_w * 1.0 / n_tok)
                 - log2(u2.n_w * 1.0 / n_tok), 6) AS pmi
    FROM bic CROSS JOIN tot
    JOIN uni u1 ON u1.w = split_part(bg, ' ', 1)
    JOIN uni u2 ON u2.w = split_part(bg, ' ', 2)
    WHERE n_pair >= {PMI_MIN_COUNT})
SELECT w1, w2, n_pair, pmi FROM scored
ORDER BY pmi DESC, w1, w2 LIMIT {PMI_TOP_K}
""",
)
def bigram_pmi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{PMI_TOP_K} collocations by pointwise mutual information —
    multi-word-expression / BPE-merge-candidate mining over the corpus
    (operators/corpus.py::bigram_pmi). Marginal lookups are equi-joins
    on the token (vocabulary scales with the corpus; never broadcast),
    totals are 1-row broadcasts, top-k compiles to
    TakeOrderedAndProject."""
    from ..operators.corpus import bigram_pmi

    docs = load(spark, sf_dir, "documents")
    return bigram_pmi(docs, min_count=PMI_MIN_COUNT, k=PMI_TOP_K)


@register(
    "source_overlap_matrix",
    oracle=f"""
WITH {minhash_pairs_sql()}
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(p.jaccard), 6) AS avg_jaccard
FROM mh_pairs p
JOIN documents da ON da.doc_id = p.id_a
JOIN documents db ON db.doc_id = p.id_b
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source near-dup provenance matrix: verified MinHash+LSH
    pairs folded by (source, source) with canonical ordering — the
    table that answers 'which crawls/feeds duplicate each other', the
    input to licensing and mixture decisions. Complements
    ``dedup_rate_by_source`` (per-source rate) with the PAIRWISE view.
    Costs two corpus-keyed equi-joins (doc -> source lookup) over the
    already-banded pair set plus a source²-bounded fold — nothing
    quadratic in docs."""
    docs = load(spark, sf_dir, "documents")
    from ..operators.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(docs)
    src = docs.select("doc_id", "source")
    sa = src.select(F.col("doc_id").alias("id_a"), F.col("source").alias("__sa"))
    sb = src.select(F.col("doc_id").alias("id_b"), F.col("source").alias("__sb"))
    out = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .groupBy(
            F.least("__sa", "__sb").alias("source_a"),
            F.greatest("__sa", "__sb").alias("source_b"),
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.round(F.avg("jaccard"), 6).alias("avg_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )
    out._cached_frames = getattr(pairs, "_cached_frames", [])
    return out


from ..operators.text import LANG_MARKERS, LANG_SEG_TOKENS  # noqa: E402


def _lang_segments_oracle(seg_tokens: int = LANG_SEG_TOKENS) -> str:
    """The segment-voting chain rendered from the SAME marker constants
    as operators/text.py::lang_segments (one definition, two engines —
    the expansion_text.py::_lang_case_sql pattern)."""
    from .expansion_text import lang_vote_sql

    sums = ", ".join(
        f"CAST(SUM(len(regexp_extract_all(tok, '{pat}'))) AS BIGINT) AS s_{lang}"
        for lang, pat in LANG_MARKERS.items()
    )
    greatest, whens = lang_vote_sql()
    return f"""
WITH t AS (SELECT doc_id, {TK} AS tk FROM documents),
p AS (
    SELECT doc_id, pos, tk[pos] AS tok
    FROM (SELECT doc_id, tk,
                 unnest(generate_series(1, CAST(len(tk) AS INT))) AS pos
          FROM t WHERE len(tk) >= 1)),
v AS (SELECT doc_id, (pos - 1) // {seg_tokens} AS seg, {sums}
      FROM p GROUP BY doc_id, seg),
b AS (SELECT *, {greatest} AS best FROM v),
sl AS (SELECT doc_id, seg, CASE {whens} ELSE 'und' END AS lang FROM b),
sw AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN prev IS NOT NULL AND prev <> lang
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_switches
    FROM (SELECT doc_id, lang,
                 LAG(lang) OVER (PARTITION BY doc_id ORDER BY seg) AS prev
          FROM sl)
    GROUP BY doc_id),
mc AS (SELECT doc_id, lang, COUNT(*) AS cnt FROM sl GROUP BY 1, 2),
mj AS (
    SELECT doc_id, lang AS majority_lang, cnt FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, lang) AS rn
        FROM mc) WHERE rn = 1)
SELECT s.doc_id, s.n_segments, m.majority_lang,
       ROUND(m.cnt * 1.0 / s.n_segments, 6) AS agree_frac, s.n_switches
FROM sw s JOIN mj m ON m.doc_id = s.doc_id
ORDER BY s.doc_id
"""


@register("lang_segments", oracle=_lang_segments_oracle())
def lang_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching detection: {LANG_SEG_TOKENS}-token segments each
    vote a language through the predict_lang marker contract; docs
    report segment count, majority language, agreement fraction, and
    adjacent-segment switch count — the mixed-language curation signal
    per-doc lang-ID cannot see (operators/text.py::lang_segments)."""
    from ..operators.text import lang_segments

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return lang_segments(docs)


@register(
    "hard_negatives",
    oracle=f"""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM c
      WHERE vec_id % {QUERY_MOD} = 0),
s AS (
    SELECT q.query_id, q.qlabel, c.vec_id AS cid, c.label AS clabel,
           ROUND(list_inner_product(q.qv, c.v) /
                 (sqrt(list_inner_product(q.qv, q.qv)) *
                  sqrt(list_inner_product(c.v, c.v))), 6) AS cos
    FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id),
pos AS (
    SELECT query_id, qlabel AS label, cid AS pos_id, cos AS pos_cos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cid) AS rn
        FROM s WHERE clabel = qlabel) WHERE rn = 1),
neg AS (
    SELECT query_id, cid AS neg_id, cos AS neg_cos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cid) AS rn
        FROM s WHERE clabel <> qlabel) WHERE rn = 1)
SELECT p.query_id, p.label, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
FROM pos p JOIN neg n ON n.query_id = p.query_id
ORDER BY p.query_id
""",
)
def hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive triplet mining over the labeled embedding corpus:
    per query, the nearest same-label positive and the nearest
    different-label HARD negative — the close-but-wrong examples
    retrieval/contrastive training needs (random negatives carry no
    gradient). Broadcast-query shape, corpus never shuffles
    (operators/similarity.py::hard_negative_mining)."""
    from ..operators.similarity import hard_negative_mining

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    return hard_negative_mining(emb, queries)


KNN_K = 5
KNN_QUERY_MOD = 10  # evaluation sample: every 10th vector


@register(
    "knn_label_accuracy",
    oracle=f"""
WITH c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM c
      WHERE vec_id % {KNN_QUERY_MOD} = 0),
nn AS (
    SELECT query_id, qlabel, clabel FROM (
        SELECT q.query_id, q.qlabel, c.label AS clabel,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                   ROUND(list_inner_product(q.qv, c.v) /
                         (sqrt(list_inner_product(q.qv, q.qv)) *
                          sqrt(list_inner_product(c.v, c.v))), 6) DESC,
                   c.vec_id) AS rn
        FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id
    ) WHERE rn <= {KNN_K}),
votes AS (
    SELECT query_id, qlabel, clabel, COUNT(*) AS cnt
    FROM nn GROUP BY 1, 2, 3),
pred AS (
    SELECT query_id, qlabel, clabel AS predicted FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cnt DESC, clabel) AS rn
        FROM votes) WHERE rn = 1)
SELECT qlabel AS label,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(COUNT(*) FILTER (predicted = qlabel) AS BIGINT) AS n_correct,
       ROUND(COUNT(*) FILTER (predicted = qlabel) * 1.0 / COUNT(*), 6) AS accuracy
FROM pred GROUP BY qlabel ORDER BY qlabel
""",
)
def knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality probe: k-NN label agreement — for every
    {KNN_QUERY_MOD}-th vector, the majority label among its {KNN_K}
    nearest neighbors (deterministic tiebreak: vote count desc, label
    asc) versus its own label, reported per label class. THE standard
    cheap evaluation of an embedding table before it drives semantic
    dedup or retrieval mining — if k-NN can't recover labels, cosine
    structure is noise and SemDeDup/ANN decisions built on it are too.

    Scale shape: broadcast evaluation sample, corpus never shuffles
    (brute_force_topk posture — swap in IVF/LSH candidates at scale);
    the vote and accuracy folds run on the k-rows-per-query relation.
    """
    from ..operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % KNN_QUERY_MOD == 0)
    nn = brute_force_topk(emb, queries, k=KNN_K).select("query_id", "neighbor_id")
    labels = emb.select("vec_id", "label")
    nn_lab = (
        nn.join(
            labels.select(
                F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
            ),
            "query_id",
        )
        .join(
            labels.select(
                F.col("vec_id").alias("neighbor_id"), F.col("label").alias("clabel")
            ),
            "neighbor_id",
        )
    )
    votes = nn_lab.groupBy("query_id", "qlabel", "clabel").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cnt").desc(), F.col("clabel"))
    pred = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", "qlabel", F.col("clabel").alias("predicted"))
    )
    return (
        pred.groupBy(F.col("qlabel").alias("label"))
        .agg(
            F.count("*").alias("n_queries"),
            F.count(F.when(F.col("predicted") == F.col("qlabel"), 1)).alias(
                "n_correct"
            ),
        )
        .withColumn(
            "accuracy", F.round(F.col("n_correct") / F.col("n_queries"), 6)
        )
        .orderBy("label")
    )
