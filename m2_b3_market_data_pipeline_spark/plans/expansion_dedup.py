"""Deduplication expansion queries: exact, MinHash+LSH, n-gram Jaccard,
SimHash — each with a DuckDB oracle generated from the SAME constants as
the Spark operators (seeds, band layout, thresholds), so the approximate
methods are hash-checked end-to-end, not just spot-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    BAND_SIZE,
    NUM_HASHES,
    SIMHASH_BITS,
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from .registry import load, register

from .sql_fragments import TK as _TK  # single SQL-side tokenizer definition
_SH = (
    "list_distinct([tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] "
    "for i in generate_series(1, len(tk)-2)])"
)
JACCARD_THRESHOLD = 0.5
NGRAM_THRESHOLD = 0.4


@register(
    "dedup_exact",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang, source ORDER BY doc_id) = 1
""",
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: deterministic keep-first per key via row_number
    (operators/dedup.py). Bare dropDuplicates keeps an arbitrary row and
    is therefore un-oracle-able; this form is the scalable deterministic
    variant (WindowGroupLimit: O(1) state per group)."""
    docs = load(spark, sf_dir, "documents")
    return exact_dedup(docs, keys=["lang", "source"], tiebreak=["doc_id"]).select(
        "doc_id", "lang", "source", "n_chars"
    )


def _minhash_sig_sql(source: str = "documents", suffix: str = "") -> str:
    """CTEs computing shingle sets + minhash signatures over ``source``
    (any relation with doc_id + text — parameterized so composed
    pipelines can run the same dedup over a filtered survivor set).
    ``suffix`` renames the CTE chain so two signature pipelines (e.g.
    delta + corpus for the incremental join) coexist in one query."""
    # Numeric 60-bit min-hashes — mirrors operators/dedup.py::
    # with_minhash (seeded_hash60): first 15 hex chars of the seeded md5
    # as BIGINT, numeric min.
    mh_exprs = ",\n       ".join(
        f"list_min(list_transform(sh, s -> "
        f"CAST(('0x' || substr(md5('{i}|' || s), 1, 15)) AS BIGINT))) AS mh{i}"
        for i in range(NUM_HASHES)
    )
    return f"""
tk{suffix} AS (SELECT doc_id, {_TK} AS tk FROM {source}),
sh{suffix} AS (SELECT doc_id, {_SH} AS sh FROM tk{suffix}),
sigs{suffix} AS (SELECT doc_id, sh, {mh_exprs} FROM sh{suffix})
"""


def _band_sql(suffix: str = "") -> str:
    n_bands = NUM_HASHES // BAND_SIZE
    selects = []
    for b in range(n_bands):
        # decimal string concatenation, matching Spark's concat_ws("")
        # over BIGINT columns
        cols = " || ".join(
            f"CAST(mh{b * BAND_SIZE + j} AS VARCHAR)" for j in range(BAND_SIZE)
        )
        selects.append(
            f"SELECT doc_id, {b} AS band_id, md5({cols}) AS band_hash"
            f" FROM sigs{suffix} WHERE mh0 IS NOT NULL"
        )
    return f"bands{suffix} AS (" + " UNION ALL ".join(selects) + ")"


_JACC = (
    "ROUND(CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)"
    " / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE), 6)"
)


def minhash_pairs_sql(source: str = "documents", threshold: float = JACCARD_THRESHOLD) -> str:
    """CTE chain (no leading WITH) ending in ``mh_pairs``: verified
    MinHash+LSH near-dup pairs (id_a < id_b, jaccard >= threshold)
    over ``source``."""
    return f"""{_minhash_sig_sql(source)},
{_band_sql()},
pairs AS (
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM bands a JOIN bands b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
),
mh_pairs AS (
    SELECT p.id_a, p.id_b, {_JACC} AS jaccard
    FROM pairs p
    JOIN sigs sa ON sa.doc_id = p.id_a
    JOIN sigs sb ON sb.doc_id = p.id_b
    WHERE {_JACC} >= {threshold}
)"""


MINHASH_ORACLE = f"""
WITH {minhash_pairs_sql()}
SELECT id_a, id_b, jaccard FROM mh_pairs
"""


@register("minhash_dedup", oracle=MINHASH_ORACLE)
def minhash_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH fuzzy dedup: shingle -> 12 portable min-hashes (pure
    projection) -> 3 bands of 4 -> bucket equi-join -> exact Jaccard
    verify at >= 0.5 (operators/dedup.py). Shuffle volume is docs×bands,
    never docs²."""
    docs = load(spark, sf_dir, "documents")
    return minhash_dedup_pairs(docs, threshold=JACCARD_THRESHOLD)


NGRAM_ORACLE = f"""
WITH tk AS (SELECT doc_id, {_TK} AS tk FROM documents),
sh AS (SELECT doc_id, {_SH} AS shl FROM tk),
ex AS (SELECT doc_id, len(shl) AS set_size, unnest(shl) AS shingle FROM sh),
inter AS (
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           a.set_size AS size_a, b.set_size AS size_b,
           COUNT(*) AS inter
    FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       ROUND(CAST(inter AS DOUBLE) / CAST(size_a + size_b - inter AS DOUBLE), 6) AS jaccard
FROM inter
WHERE ROUND(CAST(inter AS DOUBLE) / CAST(size_a + size_b - inter AS DOUBLE), 6) >= {NGRAM_THRESHOLD}
"""


@register("ngram_jaccard", oracle=NGRAM_ORACLE)
def ngram_jaccard_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT n-gram Jaccard similarity join via shingle inverted index —
    the ground truth the LSH path approximates (operators/dedup.py)."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=NGRAM_THRESHOLD)


_HALF = SIMHASH_BITS // 2


def _simhash_sig_cte() -> str:
    """CTEs computing the SAME two-halves 64-bit simhash as
    ``operators/dedup.py::simhash_expr``: lo half votes on md5 hex chars
    1-8, hi half on chars 9-16."""
    votes = ",\n           ".join(
        f"SUM(CASE WHEN (h_lo >> {j}) & 1 = 1 THEN cnt ELSE -cnt END) AS vl{j},\n"
        f"           SUM(CASE WHEN (h_hi >> {j}) & 1 = 1 THEN cnt ELSE -cnt END) AS vh{j}"
        for j in range(_HALF)
    )
    sig_lo = " + ".join(
        f"CASE WHEN vl{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END" for j in range(_HALF)
    )
    sig_hi = " + ".join(
        f"CASE WHEN vh{j} > 0 THEN CAST({2**j} AS BIGINT) ELSE 0 END" for j in range(_HALF)
    )
    return f"""
tk AS (SELECT doc_id, {_TK} AS tk FROM documents),
tok AS (SELECT doc_id, unnest(tk) AS token FROM tk),
wt AS (SELECT doc_id, token, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
h AS (SELECT doc_id, cnt,
             CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) AS h_lo,
             CAST(('0x' || substr(md5(token), 9, 8)) AS BIGINT) AS h_hi
      FROM wt),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
sigs AS (SELECT doc_id, {sig_lo} AS simhash_lo, {sig_hi} AS simhash_hi FROM v)
"""


@register("simhash_signatures", oracle=f"WITH {_simhash_sig_cte()} SELECT * FROM sigs")
def simhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document via token-hash bit voting, carried as
    two 32-bit bigint halves (operators/dedup.py); near-dup pair search
    uses the 16-bit pigeonhole chunk join (see simhash_near_dups)."""
    docs = load(spark, sf_dir, "documents")
    return simhash_signatures(docs)


SIMHASH_MAX_HAMMING = 3


def _simhash_pairs_oracle() -> str:
    from ..operators.dedup import simhash_chunks

    layout = simhash_chunks(SIMHASH_MAX_HAMMING + 1)
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash_lo, simhash_hi, {c} AS chunk_id,"
        f" ({half} >> {shift}) & {mask} AS chunk_val FROM sigs"
        for c, (half, shift, mask) in enumerate(layout)
    )
    ham = (
        "CAST(bit_count(xor(a.simhash_lo, b.simhash_lo))"
        " + bit_count(xor(a.simhash_hi, b.simhash_hi)) AS BIGINT)"
    )
    return f"""
WITH {_simhash_sig_cte()},
bands AS ({bands})
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, {ham} AS hamming
FROM bands a JOIN bands b
  ON a.chunk_id = b.chunk_id AND a.chunk_val = b.chunk_val AND a.doc_id < b.doc_id
WHERE {ham} <= {SIMHASH_MAX_HAMMING}
"""


DELTA_MOD = 7          # every 7th doc spawns a perturbed incoming twin
DELTA_ID_OFFSET = 3_000_000
DELTA_SUFFIX = " zq marker token"


def _incremental_oracle() -> str:
    return f"""
WITH delta_src AS (
    SELECT doc_id + {DELTA_ID_OFFSET} AS doc_id,
           text || '{DELTA_SUFFIX}' AS text
    FROM documents WHERE doc_id % {DELTA_MOD} = 0
),
{_minhash_sig_sql("documents", suffix="_c")},
{_minhash_sig_sql("delta_src", suffix="_d")},
{_band_sql(suffix="_c")},
{_band_sql(suffix="_d")},
cand AS (
    SELECT DISTINCT d.doc_id AS delta_id, c.doc_id AS corpus_id
    FROM bands_d d JOIN bands_c c
      ON d.band_id = c.band_id AND d.band_hash = c.band_hash
)
SELECT p.delta_id, p.corpus_id, {_JACC} AS jaccard
FROM cand p
JOIN sigs_d sa ON sa.doc_id = p.delta_id
JOIN sigs_c sb ON sb.doc_id = p.corpus_id
WHERE {_JACC} >= {JACCARD_THRESHOLD}
"""


@register("incremental_near_dedup", oracle=_incremental_oracle())
def incremental_near_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (delta-vs-corpus) near-dedup — the continuous-crawl
    curation shape: which INCOMING documents are near-copies of
    something already kept? Cross-relation LSH band join
    (operators/dedup.py::minhash_incremental_pairs): corpus×corpus
    pairs are never formed, and at scale the corpus side joins from a
    stored signature table instead of rescanning text. The delta feed
    is planted deterministically (every 7th doc with a short appended
    marker, so shingle overlap stays high for non-trivial docs) and the
    match set is hash-checked end-to-end."""
    from ..operators.dedup import minhash_incremental_pairs

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    delta = docs.filter(F.col("doc_id") % DELTA_MOD == 0).select(
        (F.col("doc_id") + DELTA_ID_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(DELTA_SUFFIX)).alias("text"),
    )
    return minhash_incremental_pairs(delta, docs, threshold=JACCARD_THRESHOLD)


@register("simhash_near_dups", oracle=_simhash_pairs_oracle())
def simhash_near_dups_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within Hamming distance 3 over the 64-bit
    signature — the Manku et al. WWW'07 layout: pigeonhole equi-join on
    four 16-bit chunks instead of a cross join (operators/dedup.py).
    Hash-checked end-to-end: the oracle reproduces signatures, chunk
    join and bit_count verify in DuckDB."""
    from ..operators.dedup import simhash_near_pairs

    docs = load(spark, sf_dir, "documents")
    sigs = simhash_signatures(docs)
    return simhash_near_pairs(sigs, max_hamming=SIMHASH_MAX_HAMMING)
