"""Round-7 expansion: incremental (delta-vs-corpus) SEMANTIC dedup and
growing-corpus triplet mining — the batch semantics behind the two new
streaming sinks (streaming/semdedup_sink.py, streaming/triplet_sink.py).

Both are deterministic end-to-end (fixed coarse codebook, 6dp-rounded
cosines, explicit tiebreaks), so even these "streaming" semantics are
hash-checked against DuckDB. The sinks themselves are pinned by
batch-equivalence tests: draining the stream reproduces these exact
frames (tests/test_streaming_round7.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.embeddings import assign_with_vector, semdedup_incremental
from ..operators.similarity import ivfpq_topk, wave_triplet_mining
from .expansion_similarity import (
    _CCOS_C,
    _CCOS_Q,
    _PQ_LEN,
    CENTROID_MOD,
    EMBED_DIM,
    NPROBE,
    PQ_SUB,
    QUERY_MOD,
    TOP_K,
)
from .registry import load, register

DELTA_MOD = 4  # delta = every 4th vector; corpus = the rest
SEM_CENTROID_MOD = 50  # deterministic coarse codebook: every 50th vector
SEM_THRESHOLD = 0.45
N_WAVES = 3  # ingestion waves: wave = vec_id % 3
TRIPLET_QUERY_MOD = 20  # mining queries: every 20th vector

_SEM_DIST = (
    "list_inner_product({a}, {a}) - 2 * list_inner_product({a}, {b})"
    " + list_inner_product({b}, {b})"
)
_SEM_COS = (
    "ROUND(list_inner_product({a}, {b}) / "
    "(sqrt(list_inner_product({a}, {a})) * sqrt(list_inner_product({b}, {b}))), 6)"
)


@register(
    "incremental_semdedup",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % {SEM_CENTROID_MOD} = 0),
corp AS (SELECT vec_id, v FROM e WHERE vec_id % {DELTA_MOD} <> 0),
delta AS (SELECT vec_id, v FROM e WHERE vec_id % {DELTA_MOD} = 0),
casg AS (
    SELECT vec_id, v, cid FROM (
        SELECT c.vec_id, c.v, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                   ORDER BY {_SEM_DIST.format(a="c.v", b="cent.cv")}, cent.cid) AS rn
        FROM corp c CROSS JOIN cent) WHERE rn = 1),
dasg AS (
    SELECT vec_id, v, cid FROM (
        SELECT d.vec_id, d.v, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY d.vec_id
                   ORDER BY {_SEM_DIST.format(a="d.v", b="cent.cv")}, cent.cid) AS rn
        FROM delta d CROSS JOIN cent) WHERE rn = 1),
hits AS (
    SELECT DISTINCT d.vec_id
    FROM dasg d JOIN casg c ON c.cid = d.cid AND c.vec_id <> d.vec_id
    WHERE {_SEM_COS.format(a="d.v", b="c.v")} >= {SEM_THRESHOLD})
SELECT d.vec_id, d.cid AS centroid_id, (h.vec_id IS NOT NULL) AS pruned
FROM dasg d LEFT JOIN hits h ON h.vec_id = d.vec_id
ORDER BY d.vec_id
""",
)
def incremental_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-vs-corpus semantic dedup (operators/embeddings.py::
    semdedup_incremental): every {DELTA_MOD}-th vector arrives as the
    delta and is pruned iff cosine-similar (>= {SEM_THRESHOLD}) to an
    already-admitted corpus vector in its coarse cell. The fixed
    every-{SEM_CENTROID_MOD}-th-vector codebook keeps the whole path
    deterministic, hence hash-checked — unlike trained k-means. Corpus
    never pairs with itself; the verify join is cell-local."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % SEM_CENTROID_MOD == 0).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    corpus = assign_with_vector(
        emb.filter(F.col("vec_id") % DELTA_MOD != 0), centroids
    )
    delta = emb.filter(F.col("vec_id") % DELTA_MOD == 0)
    return semdedup_incremental(
        delta, corpus, centroids, threshold=SEM_THRESHOLD
    ).orderBy("vec_id")


@register(
    "streaming_triplets",
    oracle=f"""
WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
                  vec_id % {N_WAVES} AS wave
           FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv, wave AS qwave
      FROM e WHERE vec_id % {TRIPLET_QUERY_MOD} = 0 AND wave >= 1),
s AS (
    SELECT q.query_id, q.qlabel, q.qwave, c.vec_id AS cid, c.label AS clabel,
           {_SEM_COS.format(a="q.qv", b="c.v")} AS cos
    FROM e c JOIN q ON c.wave < q.qwave AND c.vec_id <> q.query_id),
pos AS (
    SELECT query_id, qlabel AS label, qwave AS wave, cid AS pos_id, cos AS pos_cos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cid) AS rn
        FROM s WHERE clabel = qlabel) WHERE rn = 1),
neg AS (
    SELECT query_id, cid AS neg_id, cos AS neg_cos FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                     ORDER BY cos DESC, cid) AS rn
        FROM s WHERE clabel <> qlabel) WHERE rn = 1)
SELECT p.query_id, p.label, p.wave, p.pos_id, p.pos_cos, n.neg_id, n.neg_cos
FROM pos p JOIN neg n ON n.query_id = p.query_id
ORDER BY p.query_id
""",
)
def streaming_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growing-corpus triplet mining (operators/similarity.py::
    wave_triplet_mining): the corpus arrives in {N_WAVES} ingestion
    waves (wave = vec_id % {N_WAVES}); every {TRIPLET_QUERY_MOD}-th
    vector mines its nearest same-label positive and nearest
    different-label hard negative against ONLY the waves admitted
    before its own — what a continuous mining job actually sees. The
    non-equi wave predicate is rewritten as explode-admitted-waves +
    hash equi-join (the ann_topk lesson); the streaming sink replays
    these exact semantics batch-by-batch."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "wave", F.col("vec_id") % N_WAVES
    )
    queries = emb.filter(
        (F.col("vec_id") % TRIPLET_QUERY_MOD == 0) & (F.col("wave") >= 1)
    )
    return wave_triplet_mining(emb, queries, n_waves=N_WAVES)


_PQ_DIST_P = (
    "ROUND(list_sum([ (s.sv[i] - pcent.cv[i]) * (s.sv[i] - pcent.cv[i]) "
    f"for i in generate_series(1, {_PQ_LEN}) ]), 6)"
)


# Shared oracle CTE chain: corpus, coarse cells, probes, PQ codes,
# ADC tables, and the probed-cell partial sums — consumed by both the
# top-k query and the recall check.
_IVFPQ_CHAIN = f"""c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM c WHERE vec_id % {CENTROID_MOD} = 0),
asg AS (
    SELECT vec_id, cid FROM (
        SELECT c.vec_id, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY c.vec_id
                                  ORDER BY {_CCOS_C} DESC, cent.cid) AS rn
        FROM c CROSS JOIN cent) WHERE rn = 1),
q AS (SELECT vec_id AS query_id, v AS qv FROM c WHERE vec_id % {QUERY_MOD} = 0),
probe AS (
    SELECT query_id, cid FROM (
        SELECT q.query_id, cent.cid,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {_CCOS_Q} DESC, cent.cid) AS rn
        FROM q CROSS JOIN cent) WHERE rn <= {NPROBE}),
m AS (SELECT unnest(generate_series(1, {PQ_SUB})) AS m),
sub AS (
    SELECT vec_id, m, list_slice(v, (m - 1) * {_PQ_LEN} + 1, m * {_PQ_LEN}) AS sv
    FROM c, m),
pcent AS (
    SELECT vec_id AS code, m, list_slice(v, (m - 1) * {_PQ_LEN} + 1, m * {_PQ_LEN}) AS cv
    FROM c, m WHERE vec_id % {CENTROID_MOD} = 0),
codes AS (
    SELECT vec_id, m, code FROM (
        SELECT s.vec_id, s.m, pcent.code,
               ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.m
                                  ORDER BY {_PQ_DIST_P} ASC, pcent.code) AS rn
        FROM sub s JOIN pcent ON s.m = pcent.m) WHERE rn = 1),
qs AS (SELECT vec_id AS query_id, m, sv AS qv2 FROM sub WHERE vec_id % {QUERY_MOD} = 0),
tbl AS (
    SELECT qs.query_id, qs.m, pcent.code,
           list_sum([ (qs.qv2[i] - pcent.cv[i]) * (qs.qv2[i] - pcent.cv[i])
                      for i in generate_series(1, {_PQ_LEN}) ]) AS part
    FROM qs JOIN pcent ON qs.m = pcent.m),
summed AS (
    SELECT t.query_id, k.vec_id AS neighbor_id, ROUND(SUM(t.part), 6) AS adist
    FROM codes k
    JOIN asg a ON a.vec_id = k.vec_id
    JOIN probe p ON p.cid = a.cid
    JOIN tbl t ON t.query_id = p.query_id AND t.m = k.m AND t.code = k.code
    WHERE k.vec_id <> p.query_id
    GROUP BY t.query_id, k.vec_id)"""


@register(
    "ivfpq_ann_topk",
    oracle=f"""
WITH {_IVFPQ_CHAIN}
SELECT query_id, neighbor_id, adist, rn FROM (
    SELECT query_id, neighbor_id, adist,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY adist ASC, neighbor_id) AS rn
    FROM summed) WHERE rn <= {TOP_K}
""",
)
def ivfpq_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ composite ANN (operators/similarity.py::ivfpq_topk): the
    billion-scale layout — coarse cells bound WHICH corpus vectors are
    scored (queries probe their NPROBE nearest cells), PQ asymmetric
    distance bounds HOW (broadcast per-query distance tables over the
    compressed codes; full vectors are never touched at search time).
    Same deterministic every-{CENTROID_MOD}-th-vector codebook as the
    standalone IVF and PQ paths, so the whole composite is
    hash-checked; with nprobe >= |cells| it degenerates to exactly
    pq_ann_topk (pinned in tests)."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % CENTROID_MOD == 0)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    return ivfpq_topk(
        emb, queries, centroids, centroids,
        dim=EMBED_DIM, n_sub=PQ_SUB, k=TOP_K, nprobe=NPROBE,
    )


BPE_MERGES = 16


@register(
    "bpe_pair_counts",
    oracle=r"""
WITH w AS (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents),
wc AS (SELECT word, COUNT(*) AS cnt FROM w WHERE word <> '' GROUP BY word),
p AS (
    SELECT substring(word, i, 1) AS l, substring(word, i + 1, 1) AS r, cnt
    FROM wc, unnest(generate_series(1, length(word) - 1)) AS t(i)
)
SELECT l AS "left", r AS "right", CAST(SUM(cnt) AS BIGINT) AS pair_count
FROM p GROUP BY l, r
""",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-0 BPE pair statistics (operators/bpe.py::pair_counts over
    the character symbolization): the adjacent-pair frequency table the
    first merge argmax reads, hash-checked end-to-end — the anchor for
    the iterative trainer, whose later rounds depend on learned merges
    and are therefore golden-recompute-pinned instead."""
    from ..operators.bpe import pair_counts, word_frequencies

    docs = load(spark, sf_dir, "documents")
    return pair_counts(word_frequencies(docs))


@register("bpe_learn_merges")  # rows-only: merge-dependent iteration, not SQL-expressible
def bpe_learn_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE tokenizer training (operators/bpe.py::
    learn_merges): {BPE_MERGES} merge rules learned from the
    word-frequency table — pair-count, one-row argmax collect, map-side
    greedy merge fold per round. Deterministic (count desc, lexicographic
    pair tiebreak) and pinned against a pure-Python golden recompute
    (tests/test_golden_recompute.py); rows-only here because each
    round's input depends on the previous round's learned rule."""
    from ..operators.bpe import learn_merges

    docs = load(spark, sf_dir, "documents")
    return learn_merges(spark, docs, n_merges=BPE_MERGES)


# The golden fixture's first 8 learned rules (operators/bpe.py::
# learn_merges on the sf0.01 documents corpus; deterministic — count
# desc, lexicographic tiebreak), FROZEN as literals so bpe_apply_check
# is the pure inference path: no training inside the query, the merge
# table rides the plan as constants exactly as a deployed tokenizer's
# would. Rule 6's right side ('er') is itself rule 1's output, so the
# rank-ordered fold composition is genuinely exercised.
BPE_FIXED_MERGES: list[tuple[int, str, str]] = [
    (1, "e", "r"),
    (2, "i", "n"),
    (3, "o", "w"),
    (4, "o", "r"),
    (5, "s", "t"),
    (6, "m", "er"),
    (7, "a", "t"),
    (8, "l", "u"),
]


def _bpe_apply_oracle() -> str:
    """DuckDB twin of the greedy left-to-right merge fold, via the
    delimiter-encoded string-replace identity: encode a symbol array as
    ``chr(1)||sym||chr(1)`` tokens joined by spaces, then one rule
    (l, r) applied greedily IS ``replace(enc, enc(l)||' '||enc(r),
    enc(l||r))`` — plain replace scans left-to-right over
    non-overlapping matches of the ORIGINAL string, which matches the
    fold exactly because a replacement can never create a new match
    (that would need l||r == l or l||r == r, impossible for non-empty
    halves). The chr(1) guards stop matches from spanning symbol
    boundaries (e.g. rule (l, r) must not fire on symbols ['xl', 'r']);
    chr(1) never occurs in the corpus (charset probed: space + a-y)."""

    def enc(sym: str) -> str:
        return f"chr(1) || '{sym}' || chr(1)"

    expr = "enc"
    for _, l, r in sorted(BPE_FIXED_MERGES):
        expr = f"replace({expr}, {enc(l)} || ' ' || {enc(r)}, {enc(l + r)})"
    return rf"""
WITH w AS (SELECT unnest(string_split_regex(text, '\s+')) AS word FROM documents),
wc AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM w WHERE word <> '' GROUP BY word),
e0 AS (
    SELECT word, cnt,
           array_to_string(
               list_transform(generate_series(1, length(word)),
                              i -> chr(1) || substring(word, i, 1) || chr(1)),
               ' ') AS enc
    FROM wc)
SELECT word, cnt, replace({expr}, chr(1), '') AS sym_str FROM e0
"""


@register("bpe_apply_check", oracle=_bpe_apply_oracle())
def bpe_apply_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer INFERENCE under a frozen merge table — the
    hash-checkable companion closing the BPE evidence loop: the trainer
    (bpe_learn_merges) is rows-only by nature (merge-dependent
    iteration), but APPLYING a fixed rule set is deterministic per
    word, so the full re-tokenized (word, cnt, sym) relation
    hash-checks against a DuckDB recomputation over the same literal
    rules (the delimiter-encoded replace chain — see
    _bpe_apply_oracle). Map-side only after the one word-frequency
    shuffle: the 8 rules fold as plan constants over each word's symbol
    array, the 100 TB inference shape (operators/bpe.py::apply_merges).
    """
    from ..operators.bpe import apply_merges

    docs = load(spark, sf_dir, "documents")
    rules = [
        {"rank": rank, "left": l, "right": r} for rank, l, r in BPE_FIXED_MERGES
    ]
    out = apply_merges(docs, rules)
    return out.select(
        "word", "cnt", F.concat_ws(" ", "sym").alias("sym_str")
    )


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


_XCOS = (
    "ROUND(list_inner_product(q.qv, c.v) / "
    "(sqrt(list_inner_product(q.qv, q.qv)) * sqrt(list_inner_product(c.v, c.v))), 6)"
)


@register(
    "ivfpq_recall_check",
    oracle=f"""
WITH {{_IVFPQ_CHAIN}},
approx AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist ASC, neighbor_id) AS rn
        FROM summed) WHERE rn <= {{TOP_K}}),
exact AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                                  ORDER BY {{_XCOS}} DESC, c.vec_id) AS rn
        FROM c CROSS JOIN q WHERE c.vec_id <> q.query_id
    ) WHERE rn <= {{TOP_K}})
SELECT e.query_id,
       ROUND(COUNT(a.neighbor_id) * 1.0 / {{TOP_K}}, 6) AS recall_at_k
FROM exact e
LEFT JOIN approx a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
ORDER BY e.query_id
""".format(_IVFPQ_CHAIN=_IVFPQ_CHAIN, TOP_K=TOP_K, _XCOS=_XCOS),
)
def ivfpq_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the IVF-PQ composite vs the exact cosine top-k —
    hash-checked TRUE recall, closing the recall-evidence triple
    (ann_recall_check for hyperplane LSH, lsh_recall_check for banded
    near-dup LSH, this for the compressed-code path). IVF-PQ loses
    recall BOTH from cell restriction (a true neighbor outside the
    probed cells) and code quantization (ADC misranks inside a cell);
    this measures the composite effect honestly against the
    full-precision baseline."""
    from ..operators.similarity import brute_force_topk

    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % CENTROID_MOD == 0)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    exact = brute_force_topk(emb, queries, k=TOP_K).select("query_id", "neighbor_id")
    approx = (
        ivfpq_topk(
            emb, queries, centroids, centroids,
            dim=EMBED_DIM, n_sub=PQ_SUB, k=TOP_K, nprobe=NPROBE,
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


PR_DAMPING = 0.85
PR_ITERS = 3


def _pr_iter_sql(prev: str, idx: int) -> str:
    """One unrolled PageRank iteration as a CTE — the DuckDB twin of the
    loop body in operators/graph.py::pagerank."""
    return f"""p{idx} AS (
    SELECT nd.node,
           ROUND((CAST(1 AS DOUBLE) - {PR_DAMPING}) / nn.n
                 + {PR_DAMPING} * COALESCE(s.s, 0), 9) AS pr
    FROM nodes nd CROSS JOIN n nn
    LEFT JOIN (
        SELECT e.dst AS node, SUM(p.pr / d.deg) AS s
        FROM e JOIN {prev} p ON p.node = e.src JOIN deg d ON d.src = e.src
        GROUP BY e.dst) s ON s.node = nd.node)"""


_PR_ITER_CTES = ",\n".join(
    _pr_iter_sql(f"p{i - 1}" if i > 1 else "p0", i) for i in range(1, PR_ITERS + 1)
)


@register(
    "pagerank_cosuppliers",
    oracle=f"""
WITH su AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
e AS (
    SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
    FROM su a JOIN su b
      ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
p0 AS (SELECT node, CAST(1 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN n nn),
{_PR_ITER_CTES}
SELECT node, pr AS pagerank FROM p{PR_ITERS} ORDER BY node
""",
)
def pagerank_cosuppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-authority PageRank over the co-supply graph (suppliers
    are connected iff they supplied the same order): {PR_ITERS}
    fixed iterations of operators/graph.py::pagerank, hash-checked
    against an unrolled DuckDB CTE trajectory — per-iteration 9dp
    rounding makes the distributed double sums engine-stable, as in
    kmeans_iterate. Edge build is an order-key equi-self-join (pairs
    linear in per-order supplier-set size squared, never |suppliers|²);
    per iteration one src-keyed join + one dst-keyed partial-agg sum.
    The symmetric graph has no dangling nodes, so the dropped-dangling
    simplification is exact here."""
    from ..operators.graph import pagerank

    li = load(spark, sf_dir, "lineitem")
    su = li.select("l_orderkey", "l_suppkey").distinct()
    a = su.select(F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("src"))
    b = su.select(F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("dst"))
    edges = (
        a.join(b, "__ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    pr = pagerank(edges, damping=PR_DAMPING, iters=PR_ITERS)
    out = pr.orderBy("node")
    out._cached_frames = pr._cached_frames  # survive the orderBy wrapper
    return out


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


@register(
    "triangle_coparts",
    oracle="""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM li a JOIN li b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
tr AS (
    SELECT e1.u AS a, e1.v AS b, e2.v AS c
    FROM e e1
    JOIN e e2 ON e2.u = e1.v
    JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
corners AS (
    SELECT a AS node FROM tr
    UNION ALL SELECT b FROM tr
    UNION ALL SELECT c FROM tr),
t AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM corners GROUP BY node),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e)
    GROUP BY node)
SELECT d.node,
       COALESCE(t.triangles, CAST(0 AS BIGINT)) AS triangles,
       ROUND(CASE WHEN d.degree >= 2
                  THEN CAST(2 AS DOUBLE) * COALESCE(t.triangles, 0)
                       / (d.degree * (d.degree - 1))
                  ELSE CAST(0 AS DOUBLE) END, 9) AS clustering_coeff
FROM deg d LEFT JOIN t ON t.node = d.node
ORDER BY d.node
""",
)
def triangle_coparts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + local clustering coefficient per part over the
    co-purchase graph (parts are adjacent iff they appear in the same
    order) — operators/graph.py::triangle_counts, the degree-oriented
    wedge-join formulation whose per-key fan-out is bounded by
    O(sqrt(2m)) regardless of degree skew. The DuckDB oracle counts the
    SAME triangles under a different orientation (plain id-order a<b<c,
    fine single-node), so a hash match is an independent witness that
    the rank-packed orientation enumerates each triangle exactly once.
    Edge build is the same order-key equi-self-join shape as
    pagerank_cosuppliers: pairs scale with per-order basket size
    squared, never |parts|^2."""
    from ..operators.graph import triangle_counts

    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("u"))
    b = op.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("v"))
    edges = (
        a.join(b, "__ok")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
    )
    tc = triangle_counts(edges)
    out = tc.select(
        "node", "triangles", "clustering_coeff"
    ).orderBy("node")
    out._cached_frames = tc._cached_frames
    return out


RERANK_R = 3 * TOP_K  # stage-1 shortlist depth: 3x the final k


@register(
    "ivfpq_rerank_topk",
    oracle="""
WITH {_IVFPQ_CHAIN},
short AS (
    SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY adist ASC, neighbor_id) AS rn
        FROM summed) WHERE rn <= {RERANK_R}),
scored AS (
    SELECT s.query_id, s.neighbor_id, {_XCOS} AS cos
    FROM short s
    JOIN c ON c.vec_id = s.neighbor_id
    JOIN q ON q.query_id = s.query_id)
SELECT query_id, neighbor_id, cos, rn FROM (
    SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rn
    FROM scored) WHERE rn <= {TOP_K}
""".format(_IVFPQ_CHAIN=_IVFPQ_CHAIN, RERANK_R=3 * TOP_K, TOP_K=TOP_K, _XCOS=_XCOS),
)
def ivfpq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage retrieval: IVF-PQ ADC shortlist of {RERANK_R}
    candidates per query (compressed codes, probed cells only), then
    operators/similarity.py::rerank_exact rescores ONLY those
    candidates at full precision and keeps the final top-{TOP_K} by
    exact cosine. This is the standard production ANN stack — the
    re-rank recovers most quantization misrankings for a candidate
    fetch that is |queries| x R point lookups, never a corpus scan.
    Fully hash-checked end-to-end: the oracle replays the shared
    IVF-PQ CTE chain, takes the same shortlist, and rescores with the
    same 6dp-rounded exact cosine."""
    from ..operators.similarity import ivfpq_topk, rerank_exact

    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") % CENTROID_MOD == 0)
    queries = emb.filter(F.col("vec_id") % QUERY_MOD == 0)
    shortlist = ivfpq_topk(
        emb, queries, centroids, centroids,
        dim=EMBED_DIM, n_sub=PQ_SUB, k=RERANK_R, nprobe=NPROBE,
    )
    return rerank_exact(emb, queries, shortlist, k=TOP_K)


from .expansion_round6b import DUP_NGRAM_MIN_DF, DUP_NGRAM_N  # noqa: E402
from .sql_fragments import TK  # noqa: E402

_DN = DUP_NGRAM_N


@register(
    "dup_span_removal",
    oracle=f"""
WITH t AS (SELECT doc_id, {TK} AS tk FROM documents),
base AS (SELECT doc_id, CAST(COALESCE(len(tk), 0) AS BIGINT) AS n_tok, tk FROM t),
g AS (
    SELECT doc_id, pos,
           array_to_string(list_slice(tk, pos, pos + {_DN - 1}), ' ') AS gram
    FROM (SELECT doc_id, tk,
                 unnest(generate_series(1, CAST(len(tk) - {_DN - 1} AS INT))) AS pos
          FROM base WHERE n_tok >= {_DN})),
dup AS (
    SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM g)
    GROUP BY gram HAVING COUNT(*) >= {DUP_NGRAM_MIN_DF}),
occ AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)),
cov AS (
    SELECT DISTINCT doc_id, idx
    FROM (SELECT doc_id, unnest(generate_series(pos, pos + {_DN - 1})) AS idx
          FROM occ)),
toks AS (
    SELECT b.doc_id, p, b.tk[p] AS tok
    FROM base b, unnest(generate_series(1, CAST(b.n_tok AS INT))) AS s(p)),
kept AS (
    SELECT tk2.doc_id, tk2.p, tk2.tok
    FROM toks tk2 LEFT JOIN cov c ON c.doc_id = tk2.doc_id AND c.idx = tk2.p
    WHERE c.idx IS NULL),
agg AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS kept_tokens,
           string_agg(tok, ' ' ORDER BY p) AS txt
    FROM kept GROUP BY doc_id)
SELECT b.doc_id, b.n_tok,
       COALESCE(a.kept_tokens, CAST(0 AS BIGINT)) AS kept_tokens,
       COALESCE(a.txt, '') AS clean_text
FROM base b LEFT JOIN agg a ON a.doc_id = b.doc_id
ORDER BY b.doc_id
""",
)
def dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup, removal form (operators/dedup.py::
    remove_dup_spans): cut every token covered by a {_DN}-gram that
    repeats verbatim across >= {DUP_NGRAM_MIN_DF} docs and emit the
    cleaned token stream — the transform `dup_ngram_spans` only
    measures. Hash-checked INCLUDING the rebuilt clean_text strings,
    so the per-doc covered-index sets and the map-side indexed filter
    must agree with the oracle's positional anti-join token-for-token.
    """
    from ..operators.dedup import remove_dup_spans

    docs = load(spark, sf_dir, "documents")
    return remove_dup_spans(docs, n=DUP_NGRAM_N, min_df=DUP_NGRAM_MIN_DF)


REACH_SEED_MOD = 1000  # seed parts: l_partkey % 1000 == 0
REACH_DEPTH = 2  # hop bound: depth guard makes UNION ALL recursion finite


@register(
    "copurchase_reach",
    oracle=f"""
WITH RECURSIVE op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
    SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
    FROM op a JOIN op b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey),
r(seed, node, depth) AS (
    SELECT src, src, 0 FROM (SELECT DISTINCT src FROM e WHERE src % {REACH_SEED_MOD} = 0)
    UNION ALL
    SELECT r.seed, e.dst, r.depth + 1
    FROM r JOIN e ON e.src = r.node WHERE r.depth < {REACH_DEPTH}
)
SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS hops
FROM r GROUP BY seed, node ORDER BY seed, node
""",
)
def copurchase_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-depth BFS via Spark 4's RECURSIVE CTE (SPARK-24497):
    every part reachable within {REACH_DEPTH} co-purchase hops of each
    seed part, with the hop distance (MIN(depth) collapses path
    multiplicity — UNION ALL recursion enumerates walks, the depth
    guard makes it finite). Both engines run the same recursion, so the
    hash check pins Spark's recursive-CTE semantics (seed step, step
    join, depth guard) against DuckDB's — the same cross-engine
    evidence form as the window/rollup surfaces.

    Scale notes: the edge list is built ONCE as a DataFrame and
    persisted behind a temp view, so each recursion level joins the
    cached frame instead of re-deriving the order-key self-join per
    level. Walk volume grows with |seeds| x deg^depth; the engine's
    recursion row-limit safety valve (spark.sql.cteRecursionRowLimit,
    default 1M) stays untouched here because the seed set is thinned
    to parts % {REACH_SEED_MOD} — a wider crawl raises the conf or, at
    real scale, uses the iterative join loop (operators/graph.py) that
    deduplicates per level instead of enumerating walks."""
    li = load(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("src"))
    b = op.select(F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("dst"))
    edges = (
        a.join(b, "__ok")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    edges.createOrReplaceTempView("__copurchase_edges")
    out = spark.sql(f"""
WITH RECURSIVE r(seed, node, depth) AS (
    SELECT src, src, 0
    FROM (SELECT DISTINCT src FROM __copurchase_edges WHERE src % {REACH_SEED_MOD} = 0)
    UNION ALL
    SELECT r.seed, e.dst, r.depth + 1
    FROM r JOIN __copurchase_edges e ON e.src = r.node WHERE r.depth < {REACH_DEPTH}
)
SELECT seed, node, CAST(MIN(depth) AS BIGINT) AS hops
FROM r GROUP BY seed, node ORDER BY seed, node""")
    out._cached_frames = [edges]
    return out
