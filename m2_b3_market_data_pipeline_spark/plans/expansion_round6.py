"""Round-6 curation wave: approximate-quality evidence and mixture
enforcement.

- ``ann_recall_check``: per-query recall@k of the hyperplane-LSH ANN
  path against the exact brute-force top-k. Both sides are
  deterministic, so the TRUE recall values hash-check against DuckDB —
  the driver record now covers not just what the approximate path
  returns but how good it is.
- ``mixture_rebalance``: token-budget enforcement — cap every source at
  an equal share of a corpus-wide token budget by admitting docs in
  keyed-md5 order until the source's running token total crosses its
  waterline. The comparison stays in exact integer arithmetic
  (cum * n_sources * 2 <= total), so no float-boundary doc can differ
  between engines. The admission complement of ``corpus_mixture``
  (which only reports shares) and ``balanced_sample`` (doc-count, not
  token-count, balancing).
- ``boilerplate_frac``: corpus-level boilerplate detection — 3-token
  shingles appearing in >= BP_MIN_DF distinct docs are 'boilerplate';
  each doc reports the fraction of its distinct shingles that are
  boilerplate (the MassiveText/CCNet-style repeated-template signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.textfns import shingles, token_count, tokens
from ..operators.corpus import GATE_COLS, N_GATE_STAGES
from ..operators.similarity import ann_topk, brute_force_topk
from .expansion_similarity import (
    EMBED_DIM,
    LSH_BAND_BITS,
    LSH_BITS,
    QUERY_MOD,
    TOP_K,
    _ANN_BAND_MATCH,
    _lsh_sig_sql,
    _QCOS,
)
from .expansion_dedup import minhash_pairs_sql
from .registry import load, register
from .sql_fragments import NTOK, TK

# Fraction of the corpus token total admitted by mixture_rebalance,
# expressed as a ratio of integers so the waterline comparison is exact.
BUDGET_NUM, BUDGET_DEN = 1, 2  # admit ~50% of total tokens
BP_MIN_DF = 5  # shingle document-frequency threshold for 'boilerplate'

_NTOK = NTOK  # shared SQL-side tokenizer contract (sql_fragments.py)


@register(
    "ann_recall_check",
    oracle=f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sigs AS (SELECT vec_id, v, {_lsh_sig_sql("v")} AS sig FROM c),
q AS (SELECT * FROM sigs WHERE vec_id % {QUERY_MOD} = 0),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_QCOS} DESC, c.vec_id) AS rn
        FROM c CROSS JOIN q WHERE q.vec_id <> c.vec_id
    ) WHERE rn <= {TOP_K}),
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_QCOS} DESC, c.vec_id) AS rn
        FROM sigs c JOIN q ON ({_ANN_BAND_MATCH}) AND q.vec_id <> c.vec_id
    ) WHERE rn <= {TOP_K})
SELECT e.query_id,
       ROUND(COUNT(a.neighbor_id) * 1.0 / {TOP_K}, 6) AS recall_at_k
FROM exact e
LEFT JOIN approx a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
""",
)
def ann_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the LSH ANN path vs the exact brute-force top-k, per
    query — hash-checked TRUE recall, since both sides are
    deterministic (the LCG hyperplanes embed in the oracle as
    literals). The exact side broadcasts the query set so the corpus
    never shuffles; the approximate side is the banded candidate join.
    Recall evidence previously lived only in pytest; this puts it in
    the driver's correctness record."""
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    exact = brute_force_topk(emb, queries, k=TOP_K).select("query_id", "neighbor_id")
    approx = (
        ann_topk(
            emb, queries, dim=EMBED_DIM, k=TOP_K,
            n_bits=LSH_BITS, band_bits=LSH_BAND_BITS,
        )
        .select("query_id", "neighbor_id")
        .withColumn("hit", F.lit(1))
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.round(F.sum(F.coalesce(F.col("hit"), F.lit(0))) / TOP_K, 6).alias(
                "recall_at_k"
            )
        )
        .orderBy("query_id")
    )


@register(
    "mixture_rebalance",
    oracle=f"""
WITH t AS (SELECT doc_id, source, {_NTOK} AS n_tok FROM documents),
tot AS (
    SELECT CAST(SUM(n_tok) AS BIGINT) AS total_tok,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_src
    FROM t),
ranked AS (
    SELECT doc_id, source, n_tok,
           SUM(n_tok) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || ':mix'), doc_id
               ROWS UNBOUNDED PRECEDING) AS cum_tok
    FROM t)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS docs_kept,
       CAST(SUM(n_tok) AS BIGINT) AS tokens_kept
FROM ranked CROSS JOIN tot
WHERE cum_tok * n_src * {BUDGET_DEN} <= total_tok * {BUDGET_NUM}
GROUP BY source
ORDER BY source
""",
)
def mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture enforcement: every source gets an equal
    share of a {BUDGET_NUM}/{BUDGET_DEN}-of-corpus token budget; docs
    are admitted in keyed-md5 order until the source's running token
    total crosses the waterline. Sources under their cap keep
    everything; dominant sources are truncated deterministically
    (reproducible across engines, partitionings, retries — unlike
    rand()-based sampling). One window shuffle on source ranks the
    corpus; the (total, n_sources) pair rides along as a broadcast
    1-row aggregate; the admission test is exact integer arithmetic so
    no float-boundary doc flips between engines."""
    return mixture_rebalance_df(load(spark, sf_dir, "documents"))


def mixture_rebalance_df(docs: DataFrame) -> DataFrame:
    """DataFrame form of ``mixture_rebalance`` (docs needs doc_id,
    source, text), so tests can run it on planted corpora.

    Shuffle accounting: the corpus crosses the wire ONCE, for the
    running-sum window on source. The (total, n_sources) pair comes
    from a per-source SUM aggregate whose exchange moves only map-side
    partials (n_partitions x n_sources rows — metadata-sized at any
    scale; a countDistinct formulation would instead expand and shuffle
    twice), folded to one broadcast row. The per-source fold after the
    waterline filter reuses the window's partitioning — no third
    exchange on source. Pinned in test_plan_quality.py."""
    d = docs.select("doc_id", "source", token_count(F.col("text")).alias("n_tok"))
    src_tot = d.groupBy("source").agg(F.sum("n_tok").alias("src_tok"))
    tot = src_tot.agg(
        F.sum("src_tok").alias("total_tok"),
        F.count("*").alias("n_src"),
    )
    order_key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":mix")))
    w = (
        Window.partitionBy("source")
        .orderBy(order_key, "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = d.withColumn("cum_tok", F.sum("n_tok").over(w))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .filter(
            F.col("cum_tok") * F.col("n_src") * BUDGET_DEN
            <= F.col("total_tok") * BUDGET_NUM
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("docs_kept"),
            F.sum("n_tok").alias("tokens_kept"),
        )
        .orderBy("source")
    )


_TK = TK  # shared SQL-side tokenizer contract (sql_fragments.py)
_SH3 = (
    "list_distinct(list_transform(range(len(tk) - 2), "
    "i -> tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3]))"
)


@register(
    "boilerplate_frac",
    oracle=f"""
WITH tk AS (SELECT doc_id, {_TK} AS tk FROM documents),
sh AS (SELECT doc_id, {_SH3} AS shl FROM tk WHERE len(tk) >= 3),
ex AS (SELECT doc_id, len(shl) AS n_shingles, unnest(shl) AS shingle FROM sh),
bp AS (
    SELECT shingle FROM ex GROUP BY shingle
    HAVING COUNT(*) >= {BP_MIN_DF})
SELECT e.doc_id,
       CAST(MIN(e.n_shingles) AS BIGINT) AS n_shingles,
       ROUND(COUNT(b.shingle) * 1.0 / MIN(e.n_shingles), 6) AS bp_frac
FROM ex e
LEFT JOIN bp b ON b.shingle = e.shingle
GROUP BY e.doc_id
ORDER BY e.doc_id
""",
)
def boilerplate_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate signal: 3-token shingles present in
    >= {BP_MIN_DF} distinct docs are 'boilerplate' (shingles are
    distinct per doc, so a plain count IS document frequency); each doc
    reports the fraction of its distinct shingles that are boilerplate
    — the repeated-template/navigation-chrome score quality filters
    threshold on.

    Scale shape: one explode + one shuffle builds the shingle
    document-frequency table; the boilerplate subset (df >= threshold)
    is corpus-chrome-sized — orders smaller than the shingle table — so
    it BROADCASTS back onto the exploded shingles; the per-doc fold is
    the second and final shuffle. No self-join of the corpus."""
    return boilerplate_frac_df(load(spark, sf_dir, "documents"))


def boilerplate_frac_df(docs: DataFrame, *, min_df: int = BP_MIN_DF) -> DataFrame:
    """DataFrame form of ``boilerplate_frac`` (docs needs doc_id, text),
    so tests can plant template phrases and assert they score.

    The exploded shingle stream feeds TWO consumers (the df table and
    the membership join), so it is persisted for the life of this plan
    — without it Spark re-runs the tokenize+shingle+explode subtree per
    consumer (measured ~1.7x at sf0.1). Same cache-scoping contract as
    the minhash pipeline: the frame rides on the result as
    ``_cached_frames``; loops must call ``release_cached``. At 100 TB
    the same role is played by materializing the shingle table once."""
    sh = docs.select(
        "doc_id", F.array_distinct(shingles(tokens("text"), 3)).alias("shl")
    ).filter(F.size("shl") >= 1)
    ex = sh.select(
        "doc_id",
        F.size("shl").alias("n_shingles"),
        F.explode("shl").alias("shingle"),
    ).persist()
    bp = (
        ex.groupBy("shingle")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .select("shingle", F.lit(1).alias("is_bp"))
    )
    out = (
        ex.join(F.broadcast(bp), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.min("n_shingles").alias("n_shingles"),
            F.round(
                F.sum(F.coalesce(F.col("is_bp"), F.lit(0))) / F.min("n_shingles"), 6
            ).alias("bp_frac"),
        )
        .orderBy("doc_id")
    )
    out._cached_frames = [ex]  # type: ignore[attr-defined]
    return out


@register(
    "token_fertility",
    oracle=f"""
WITH t AS (
    SELECT lang, n_chars, {_NTOK} AS n_tok FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(CAST(n_chars AS DOUBLE) / n_tok), 6) AS chars_per_token,
       ROUND(AVG(CAST(n_tok AS DOUBLE)), 6) AS tokens_per_doc
FROM t
WHERE n_tok >= 1
GROUP BY lang
ORDER BY lang
""",
)
def token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer fertility: chars per (whitespace) token and
    tokens per doc — the standard multilingual curation signal for
    weighting sources by how expensive their text is to tokenize (a
    language averaging 2x chars/token consumes 2x context per
    information unit under a byte-level tokenizer). One scan, one
    metadata-sized aggregate."""
    d = load(spark, sf_dir, "documents").select(
        "lang", "n_chars", token_count(F.col("text")).alias("n_tok")
    )
    return (
        d.filter(F.col("n_tok") >= 1)
        .groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(
                F.avg(F.col("n_chars").cast("double") / F.col("n_tok")), 6
            ).alias("chars_per_token"),
            F.round(F.avg(F.col("n_tok").cast("double")), 6).alias("tokens_per_doc"),
        )
        .orderBy("lang")
    )


# The stage fan-out of the funnel derives from GATE_COLS on BOTH
# engines — adding a gate to quality_gate_stats (and its SQL twin in
# the `gated` CTE below, which IS the gate semantics and must be edited
# in lockstep) automatically grows the report, the stack, and the
# oracle's union by one stage.
_FUNNEL_STAGES_SQL = "\nUNION ALL\n".join(
    [
        "SELECT 0 AS stage, CAST(COUNT(*) AS BIGINT) AS docs,\n"
        "       CAST(SUM(n_tok) AS BIGINT) AS tokens FROM gated"
    ]
    + [
        f"SELECT {i}, CAST(COUNT(*) FILTER ({g}) AS BIGINT),\n"
        f"       CAST(COALESCE(SUM(n_tok) FILTER ({g}), 0) AS BIGINT) FROM gated"
        for i, g in enumerate(GATE_COLS, start=1)
    ]
)


@register(
    "quality_gate_funnel",
    oracle=f"""
WITH t AS (
    SELECT doc_id, {_TK} AS tk FROM documents
),
-- COALESCE keeps zero-token and NULL-text docs in stage 0 with
-- n_tok = 0 (they then fail every gate) instead of dropping them.
per_doc AS (
    SELECT doc_id, COALESCE(len(tk), 0) AS n_tok,
           COALESCE((SELECT MAX(cnt) FROM (
               SELECT COUNT(*) AS cnt FROM unnest(tk) AS u(tok) GROUP BY tok)), 0)
           AS top_tok_cnt,
           COALESCE(len(list_filter(tk, x -> len(x) BETWEEN 2 AND 12)), 0)
           AS ok_len_toks
    FROM t
),
gated AS (
    SELECT n_tok,
           n_tok >= 20 AS g1,
           n_tok >= 20 AND ok_len_toks * 10 >= n_tok * 9 AS g2,
           n_tok >= 20 AND ok_len_toks * 10 >= n_tok * 9
               AND top_tok_cnt * 5 <= n_tok AS g3
    FROM per_doc
)
{_FUNNEL_STAGES_SQL}
ORDER BY stage
""",
)
def quality_gate_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel report: how many docs (and tokens) survive each
    successive quality gate — (1) length >= 20 tokens, (2) >= 90% of
    tokens with sane length 2-12 chars, (3) most-frequent token <= 20%
    of the doc (repetition gate). The table a curation run publishes so
    mixture decisions see what each filter costs. All thresholds
    compare in exact integer arithmetic (cross-multiplied), so no
    float-boundary doc flips between engines. One explode + one per-doc
    fold + one metadata-sized aggregate; gates are CUMULATIVE, matching
    how real filter chains compose.

    Zero-token and NULL-text docs MUST still count in stage 0 (they
    fail every gate, but a funnel whose input row count is wrong is
    useless): explode drops empty arrays, so those docs re-enter via
    the union branch with all-zero stats.

    The per-doc gate computation is the SHARED
    ``operators/corpus.py::quality_gate_stats`` — the streaming funnel
    sink (streaming/funnel_sink.py) gates through the same code, so the
    continuously-maintained funnel cannot drift from this oracle-checked
    batch form."""
    from ..operators.corpus import quality_gate_stats

    gated = quality_gate_stats(load(spark, sf_dir, "documents")).select(
        "n_tok", *GATE_COLS
    )
    aggs = [F.count("*").alias("d0"), F.sum("n_tok").alias("t0")]
    for i, g in enumerate(GATE_COLS, start=1):
        aggs.append(F.count(F.when(F.col(g), 1)).alias(f"d{i}"))
        aggs.append(
            F.coalesce(F.sum(F.when(F.col(g), F.col("n_tok"))), F.lit(0)).alias(
                f"t{i}"
            )
        )
    agg = gated.agg(*aggs)
    stack_args = ", ".join(f"{i}L, d{i}, t{i}" for i in range(N_GATE_STAGES))
    return agg.selectExpr(
        f"stack({N_GATE_STAGES}, {stack_args}) AS (stage, docs, tokens)"
    ).orderBy("stage")


@register(
    "audio_frame_energy",
    oracle="""
WITH sized AS (
    -- byte domain (hex of the utf-8 encoding), mirroring frame_energy
    SELECT doc_id, hex(encode(text)) AS h,
           CAST(octet_length(encode(text)) AS BIGINT) AS L
    FROM documents WHERE octet_length(encode(text)) >= 16
),
v AS (
    SELECT doc_id, L,
           unnest(list_transform(generate_series(1, CAST(L AS INT)),
                  i -> CAST(('0x' || substr(h, 2 * i - 1, 2)) AS BIGINT))) AS val,
           unnest(generate_series(1, CAST(L AS INT))) AS pos
    FROM sized
)
SELECT doc_id, CAST((16 * (pos - 1)) // L AS INT) AS frame_idx,
       CAST(COUNT(*) AS BIGINT) AS n_bytes,
       ROUND(SUM((val - 128) * (val - 128)) * 1.0 / COUNT(*), 6) AS energy
FROM v
GROUP BY doc_id, frame_idx
ORDER BY doc_id, frame_idx
""",
)
def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction shape: 16 fixed frames per
    binary payload, mean squared deviation from the byte midpoint per
    frame (the energy/RMS contour a silence/clipping filter
    thresholds). Real PCM decode is stubbed (same policy as
    multimodal.decode_image); the byte-domain stand-in keeps the frame
    assignment, fan-out, and aggregate plumbing real AND hash-checked —
    integer sums, one division at the output edge
    (operators/multimodal.py::frame_energy)."""
    from ..operators.multimodal import attach_binary, frame_energy

    docs = attach_binary(
        load(spark, sf_dir, "documents").select("doc_id", "text"), modality="audio"
    )
    return frame_energy(docs, id_col="doc_id", binary_col="content")


LSH_RECALL_THRESHOLD = 0.5


@register(
    "lsh_recall_check",
    oracle=f"""
WITH {minhash_pairs_sql(threshold=LSH_RECALL_THRESHOLD)},
exact_ex AS (
    SELECT doc_id, len(sh) AS set_size, unnest(sh) AS shingle FROM sigs),
exact_inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.set_size AS size_a, b.set_size AS size_b, COUNT(*) AS inter
    FROM exact_ex a JOIN exact_ex b
      ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4),
exact_pairs AS (
    SELECT id_a, id_b FROM exact_inter
    WHERE ROUND(CAST(inter AS DOUBLE) / CAST(size_a + size_b - inter AS DOUBLE), 6)
          >= {LSH_RECALL_THRESHOLD})
SELECT CAST((SELECT COUNT(*) FROM exact_pairs) AS BIGINT) AS n_true_pairs,
       CAST((SELECT COUNT(*) FROM mh_pairs) AS BIGINT) AS n_found_pairs,
       ROUND((SELECT COUNT(*) FROM mh_pairs) * 1.0 /
             (SELECT COUNT(*) FROM exact_pairs), 6) AS recall
""",
)
def lsh_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of MinHash+LSH near-dedup against the EXACT n-gram
    Jaccard ground truth at the same threshold — the dedup-family twin
    of ``ann_recall_check``. The LSH path's Jaccard verify is exact on
    candidates, so found pairs are a subset of the truth set and the
    single recall number is the banding's candidate-recall. Both sides
    are deterministic, so the TRUE recall hash-checks against DuckDB —
    banded-LSH quality evidence in the driver's correctness record, not
    just pytest. The shingle sets are computed once (the signature
    chain's own sh CTE feeds the exact side too)."""
    from ..operators.dedup import ngram_jaccard_pairs

    docs = load(spark, sf_dir, "documents")
    found = minhash_dedup_pairs_shared(docs)
    truth = ngram_jaccard_pairs(docs, threshold=LSH_RECALL_THRESHOLD)
    f_cnt = found.agg(F.count("*").alias("n_found_pairs"))
    t_cnt = truth.agg(F.count("*").alias("n_true_pairs"))
    out = t_cnt.crossJoin(F.broadcast(f_cnt)).select(
        "n_true_pairs",
        "n_found_pairs",
        F.round(F.col("n_found_pairs") / F.col("n_true_pairs"), 6).alias("recall"),
    )
    out._cached_frames = getattr(found, "_cached_frames", [])
    return out


def minhash_dedup_pairs_shared(docs: DataFrame) -> DataFrame:
    """minhash_dedup_pairs at the recall threshold, cache handles
    propagated (see operators/dedup.py cache-scoping contract)."""
    from ..operators.dedup import minhash_dedup_pairs

    return minhash_dedup_pairs(docs, threshold=LSH_RECALL_THRESHOLD)
