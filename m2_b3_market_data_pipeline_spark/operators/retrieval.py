"""Lexical retrieval and diversity selection over the documents /
embeddings tables.

Two operators the reference's users need for corpus curation and
eval-set construction that no existing module covers:

- **BM25 top-k** (Robertson-Sparck Jones / Lucene practical form):
  keyword search over the corpus. The plan is the inverted-index shape
  re-expressed relationally: per-(doc, term) frequencies for the QUERY
  TERMS ONLY (tokens are intersected with the broadcast term set
  *before* the explode, so the exploded relation is |occurrences of
  query terms|, not |corpus tokens|), document frequencies and IDF as a
  vocab-bounded broadcast, and a WindowGroupLimit top-k. One shuffle
  for the tf aggregate — scan-bound at 100 TB.

- **MMR (maximal marginal relevance) selection** (Carbonell &
  Goldstein 1998): greedy diverse top-k in embedding space. Production
  MMR is always shortlist-then-rerank — the greedy step is inherently
  sequential, so the distributed stage is the relevance shortlist
  (broadcast query, corpus never shuffles, TakeOrdered M rows) and the
  greedy loop runs over the M-row shortlist only. The argmax arithmetic
  stays IN SPARK (literal selected-vector arrays, same F.round) so the
  scores hash-match the oracle's unrolled CTE chain bit-for-bit; the
  driver only ever holds M <= 32 rows (the bpe.py one-row-argmax
  precedent, bounded by the shortlist knob, never by corpus size).

Both are deterministic end-to-end (6dp rounding before every argmax /
ordering, unique-id tiebreaks) so they hash-check against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.textfns import tokens
from .similarity import as_double, cosine

# BM25 free parameters: the Robertson et al. defaults used by Lucene.
BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    queries: dict[str, tuple[str, ...]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents per query by BM25, Lucene's non-negative IDF form:

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
        s(d, q) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    Corpus contract: documents with non-NULL text (a NULL text has no
    tokens to match; empty text participates with dl = 0). Only docs
    matching >= 1 query term score (BM25 of a no-match doc is 0 — the
    inverted index never surfaces it).

    Returns (query_id, rank, doc_id, score) with rank 1..k per query,
    scores 6dp-rounded, ties broken by doc_id.
    """
    spark = docs.sparkSession
    terms = sorted({t for ts in queries.values() for t in ts})
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in queries.items() for t in ts],
        schema="query_id string, term string",
    )

    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .withColumn("__dl", F.size("__toks"))
    )
    # N and avgdl: one-row aggregate, broadcast (the scalar-subquery idiom).
    stats = base.agg(
        F.count("*").alias("__n_docs"), F.avg("__dl").alias("__avgdl")
    )
    # tf per (doc, query term): intersect with the term set BEFORE
    # exploding, so the shuffle carries query-term occurrences only.
    tf = (
        base.select(
            id_col,
            "__dl",
            F.explode(F.filter("__toks", lambda x: x.isin(*terms))).alias("term"),
        )
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("__tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("__df"))
    idf = dfreq.crossJoin(F.broadcast(stats))
    contrib = tf.join(F.broadcast(idf), "term").join(F.broadcast(qt), "term")
    scored = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum(bm25_contrib(k1, b)), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score")
        .orderBy("query_id", "rank")
    )


_MMR_SCHEMA = T.StructType(
    [
        T.StructField("rank", T.IntegerType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("mmr_score", T.DoubleType(), True),
    ]
)


def mmr_select(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    lam: float = 0.7,
    shortlist: int = 32,
) -> DataFrame:
    """Greedy MMR diverse top-k against the query vector = the valid
    vector with the MINIMUM id (deterministic on both engines).

    Contract, pinned 6dp on both engines:

        rel(d)   = round6(cos(q, d))
        pen_i(d) = max over selected s of round6(cos(d, s)), 0 when none
        mmr_i(d) = round6(lam * rel(d) - (1 - lam) * pen_i(d))

    pick argmax (tiebreak: id ASC) from the top-``shortlist`` relevance
    candidates; k rows out (fewer when the corpus is smaller).

    Scale shape: the relevance pass broadcasts the single query row, so
    the corpus never shuffles; TakeOrdered keeps ``shortlist`` rows;
    the k-step greedy loop touches only those rows (selected vectors
    ride back in as literals so the scoring arithmetic — and its
    rounding — is Spark's on every step, never the driver's).

    Shortlist semantics and sizing (measured, not argued — the knob's
    recall curve is the hash-checked ``mmr_recall_check`` sweep): the
    selection is EXACT greedy MMR over the top-``shortlist`` relevance
    pool — the production reranking definition, where the shortlist IS
    the retrieval depth. Against the FULL-corpus greedy (the sweep's
    reference) the pool bound costs more as the corpus grows: the
    penalty term can promote a candidate up to 2*(1-lam)/lam relevance
    units below the top (pen and rel both span [-1, 1]), and the number
    of candidates inside that band grows with the corpus. Measured at
    lam=0.7, k=8, shortlist=32: exact-set reproduction at <= 2k
    vectors, 0.75 overlap at 60k, 0.50 at 200k. So this knob is NOT
    corpus-free either: when full-corpus-greedy parity is the goal the
    shortlist must cover the relevance band the penalty can reach
    (size it from the measured near-top relevance density), and the
    registered sweep is the gate that says whether a chosen depth does.
    """
    short = (
        mmr_relevance(emb, id_col=id_col, vec_col=vec_col)
        .orderBy(F.desc("rel"), "vec_id")
        .limit(shortlist)
        .cache()
    )
    try:
        return mmr_greedy(short, k=k, lam=lam)
    finally:
        short.unpersist()


def mmr_reach_band(lam: float) -> float:
    """The relevance band the MMR penalty term can reach: a candidate
    more than 2(1-lam)/lam relevance units below the current max-rel
    remaining candidate can NEVER be the greedy argmax (its score is at
    most lam*rel + (1-lam), the max-rel candidate's at least
    lam*rel_max - (1-lam); rel and pen both span [-1, 1]), so the pool
    {rel >= rel_k - band} provably reproduces the full-corpus greedy's
    k selections. One Python float expression, embedded verbatim as the
    oracle's double literal (repr round-trips IEEE doubles), so both
    engines subtract the identical value."""
    return 2.0 * (1.0 - lam) / lam


def mmr_select_scaled(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR with the shortlist SIZED FROM THE REACHABLE BAND
    instead of a fixed depth — the r10 gate's own sizing rule as code
    (r10 verdict item 5). ``mmr_select``'s fixed 32-row shortlist
    measured overlap 1.0 / 0.75 / 0.50 vs the full-corpus greedy at
    200 / 60k / 200k vectors; this variant keeps every candidate whose
    relevance is within ``mmr_reach_band(lam)`` of the k-th highest, a
    pool the band theorem (see mmr_reach_band) proves sufficient for
    EXACT full-greedy parity — so its overlap curve is 1.0 at every
    corpus size by construction, and the hash-checked oracle (the
    full-candidate greedy chain, band-parameterized identically) is
    the proof rather than an argument.

    Cost honesty: on diffuse relevance distributions (the synthetic
    fixture embeddings: cosine mass near 0, band 0.857 at lam=0.7) the
    reachable band covers most of the corpus, i.e. exact parity is
    inherently near-linear-in-n — exactly the decay the r10 gate
    measured for any fixed depth. The greedy cost model tolerates it:
    k TakeOrdered(1) scans over a cached (id, v, rel) pool — linear,
    no shuffle, ~100 MB per million vectors. On production reranking
    pools (relevance concentrated near the query) the same rule yields
    small shortlists. rel_k comes from one TakeOrdered(k) job at
    plan-build time (the scaled_knobs posture: a knob read from the
    data, mirrored as a scalar subquery in the oracle)."""
    pool = mmr_relevance(emb, id_col=id_col, vec_col=vec_col)
    rk = (
        pool.orderBy(F.desc("rel"), "vec_id")
        .limit(k)
        .agg(F.min("rel").alias("rk"))
        .collect()[0]["rk"]
    )
    if rk is not None:
        pool = pool.filter(F.col("rel") >= rk - mmr_reach_band(lam))
    pool = pool.cache()
    try:
        return mmr_greedy(pool, k=k, lam=lam)
    finally:
        pool.unpersist()


def mmr_relevance(
    emb: DataFrame, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """The MMR candidate relation (vec_id, v, rel): every valid vector
    except the min-id query, with its 6dp-rounded cosine relevance to
    that query. One broadcast-query corpus pass, no shuffle — split out
    so a caller running SEVERAL greedy variants (the recall sweep)
    computes it ONCE instead of once per variant (4 corpus scans -> 1
    at any scale)."""
    q = (
        emb.orderBy(id_col)
        .limit(1)
        .select(
            F.col(id_col).alias("__qid"), as_double(vec_col).alias("__qv")
        )
    )
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("__qid"))
        .select(
            F.col(id_col).cast("long").alias("vec_id"),
            as_double(vec_col).alias("v"),
            F.round(cosine(as_double(vec_col), F.col("__qv")), 6).alias("rel"),
        )
    )


def mmr_greedy(pool: DataFrame, *, k: int, lam: float) -> DataFrame:
    """The inherently-sequential greedy MMR loop over an
    already-CACHED candidate pool (mmr_relevance layout). The caller
    owns the pool's persist/unpersist; each of the k steps is one
    TakeOrdered(1) Spark job over the pool — scores stay IN SPARK
    (selected vectors ride back as literals) so rounding matches the
    oracle bit-for-bit."""
    spark = pool.sparkSession
    picked: list[tuple[int, int, float]] = []
    sel_vecs: list[list[float]] = []
    remaining = pool
    for i in range(1, k + 1):
        if sel_vecs:
            sel_lit = F.array(
                *[
                    F.array(*[F.lit(float(x)) for x in v])
                    for v in sel_vecs
                ]
            )
            pen = F.array_max(
                F.transform(
                    sel_lit, lambda s: F.round(cosine(F.col("v"), s), 6)
                )
            )
        else:
            pen = F.lit(0.0)
        rows = (
            remaining.select(
                "vec_id",
                "v",
                # + 0.0 folds IEEE -0.0 (lam*rel and the penalty can
                # cancel exactly) to +0.0, matching the oracle edge.
                (
                    F.round(
                        F.lit(lam) * F.col("rel")
                        - F.lit(1.0 - lam) * pen,
                        6,
                    )
                    + F.lit(0.0)
                ).alias("sc"),
            )
            .orderBy(F.desc("sc"), "vec_id")
            .limit(1)
            .collect()
        )
        if not rows:
            break
        r = rows[0]
        picked.append((i, r["vec_id"], r["sc"]))
        sel_vecs.append(list(r["v"]))
        remaining = remaining.filter(F.col("vec_id") != r["vec_id"])
    return spark.createDataFrame(picked, schema=_MMR_SCHEMA)


def mmr_greedy_multi(
    pools: dict[str, DataFrame], *, k: int, lam: float
) -> dict[str, list]:
    """N independent greedy MMR chains folded into ONE Spark job per
    step (round 12, r11 verdict item 5): union the chains' candidate
    pools under a chain tag; each step left-joins the tagged pool to a
    tiny broadcast relation of ONE row per chain —
    (chain, array-of-selected-vectors) — so the penalty is a fixed-size
    expression over a column value (array_max of 6dp cosines, exactly
    ``mmr_greedy``'s pen) with no per-literal plan growth and no row
    explosion; the per-chain argmax is one
    ``max_by(candidate, struct(score, -vec_id))`` partial aggregate
    (map-side combine, a ~|partitions x chains|-row shuffle). k jobs
    total. Measured same-session vs N concurrent ``mmr_greedy``
    chains at sf0.1: faster and far less wall variance (the
    concurrent form's N*k tiny jobs contend on the scheduler).

    The scoring arithmetic (6dp rounds, +0.0 fold, lam weighting) and
    the (desc score, vec_id asc) tiebreak are ``mmr_greedy``'s exactly
    — selected vectors round-trip driver<->Spark as IEEE doubles
    either way — so every chain's picks are IDENTICAL to running it
    alone, pinned by test and by the unchanged unrolled-CTE oracle.

    Plan hygiene, both measured at sf0.1: the tagged union
    localCheckpoints (re-analyzing the union-of-pools lineage cost
    ~1.5s/step; the bpe.learn_merges precedent) behind a coalesce that
    bounds the per-step task count (the raw union inherits the SUM of
    the pools' partitioning — 128 source tasks/step of pure overhead).

    Returns, per chain, the list of Row(rank, vec_id, mmr_score) picks
    (driver-resident, <= k rows per chain — the bpe one-row-argmax
    bound); ``rows_to_frame`` rebuilds a DataFrame when one is needed.
    """
    tags = list(pools)
    spark = pools[tags[0]].sparkSession
    tagged = None
    for tag in tags:
        t = pools[tag].select(
            F.lit(tag).alias("__chain"), "vec_id", "v", "rel"
        )
        tagged = t if tagged is None else tagged.unionByName(t)
    tagged = tagged.coalesce(8).localCheckpoint(eager=False)  # step 1 materializes
    picked: dict[str, list[tuple[int, int, float]]] = {t: [] for t in tags}
    sel_vecs: dict[str, list[list[float]]] = {t: [] for t in tags}
    done: set[str] = set()
    for i in range(1, k + 1):
        live = [t for t in tags if t not in done]
        if not live:
            break
        keep = F.col("__chain").isin(live)
        for tag in tags:
            ids = [p[1] for p in picked[tag]]
            if ids:
                keep = keep & ~(
                    (F.col("__chain") == tag) & F.col("vec_id").isin(ids)
                )
        cand = tagged.filter(keep)
        sel_rows = [(tag, sel_vecs[tag]) for tag in live if sel_vecs[tag]]
        if sel_rows:
            sel_df = spark.createDataFrame(
                sel_rows, schema="__chain string, __svs array<array<double>>"
            )
            pen_src = cand.join(F.broadcast(sel_df), "__chain", "left")
            pen = F.array_max(
                F.transform(
                    F.col("__svs"),
                    lambda s: F.round(cosine(F.col("v"), s), 6),
                )
            )
        else:
            pen_src = cand
            pen = F.lit(None).cast("double")
        rows = (
            pen_src.select(
                "__chain",
                "vec_id",
                "v",
                # + 0.0 folds IEEE -0.0 to +0.0 — mmr_greedy's edge.
                (
                    F.round(
                        F.lit(lam) * F.col("rel")
                        - F.lit(1.0 - lam)
                        * F.coalesce(pen, F.lit(0.0)),
                        6,
                    )
                    + F.lit(0.0)
                ).alias("sc"),
            )
            .groupBy("__chain")
            .agg(
                F.max_by(
                    F.struct("vec_id", "v", "sc"),
                    # max (sc, -vec_id) == (desc sc, asc vec_id)
                    F.struct(F.col("sc"), (-F.col("vec_id")).alias("nv")),
                ).alias("b")
            )
            .select("__chain", "b.vec_id", "b.v", "b.sc")
            .collect()
        )
        got = {r["__chain"]: r for r in rows}
        for tag in live:
            r = got.get(tag)
            if r is None:
                done.add(tag)  # pool exhausted for this chain
                continue
            picked[tag].append((i, r["vec_id"], r["sc"]))
            sel_vecs[tag].append(list(r["v"]))
    return picked


def rows_to_frame(spark: SparkSession, picks: list) -> DataFrame:
    """(rank, vec_id, mmr_score) pick list -> the _MMR_SCHEMA frame."""
    return spark.createDataFrame(picks, schema=_MMR_SCHEMA)


def bm25_contrib(k1: float = BM25_K1, b: float = BM25_B):
    """THE BM25 per-(doc, term) contribution, defined once so the batch
    query and the streamed-stats scoring path cannot drift: expects
    columns __tf, __df, __n_docs, __avgdl, __dl."""

    def expr():
        idf = F.log(
            (F.col("__n_docs") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1.0
        )
        return idf * (F.col("__tf") * (k1 + 1.0)) / (
            F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / F.col("__avgdl"))
        )

    return expr()


def bm25_topk_with_stats(
    docs: DataFrame,
    queries: dict[str, tuple[str, ...]],
    term_stats: DataFrame,
    corpus_stats: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 top-k against EXTERNALLY MAINTAINED index statistics — the
    serving shape of the streaming postings sink: ``term_stats`` is
    (term, __df) and ``corpus_stats`` a single row (__n_docs, __avgdl),
    e.g. from streaming/postings_sink.read_bm25_stats. Scoring recomputes
    per-doc tf from the docs relation (the postings themselves live in
    the landed parquet; only vocab-bounded statistics are state).

    Identical contract to ``bm25_topk`` — when the stats are computed
    over the same corpus, outputs match row-for-row (pinned in
    tests/test_streaming_round9.py)."""
    spark = docs.sparkSession
    terms = sorted({t for ts in queries.values() for t in ts})
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in queries.items() for t in ts],
        schema="query_id string, term string",
    )
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens(text_col).alias("__toks"))
        .withColumn("__dl", F.size("__toks"))
    )
    tf = (
        base.select(
            id_col,
            "__dl",
            F.explode(F.filter("__toks", lambda x: x.isin(*terms))).alias("term"),
        )
        .groupBy(id_col, "__dl", "term")
        .agg(F.count("*").alias("__tf"))
    )
    # Restrict the maintained stats to the QUERY terms before the
    # broadcast (round-10 audit): term_stats follows the index
    # vocabulary — |vocab|+1 rows in the postings sink's state, which
    # on an open web-scale vocabulary grows with corpus content and
    # would outgrow a broadcast; the query-term slice is
    # request-bounded forever. isin over the sorted term list is the
    # same fused filter shape the tf explode uses above.
    contrib = (
        tf.join(F.broadcast(term_stats.filter(F.col("term").isin(*terms))), "term")
        .crossJoin(F.broadcast(corpus_stats))
        .join(F.broadcast(qt), "term")
    )
    scored = contrib.groupBy("query_id", id_col).agg(
        F.round(F.sum(bm25_contrib(k1, b)), 6).alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", id_col, "score")
        .orderBy("query_id", "rank")
    )
