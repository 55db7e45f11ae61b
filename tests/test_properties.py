"""Property-based tests (hypothesis) on the trickiest semantics
(SURVEY.md §5 strategy item 3): rolling-mean min_periods against the
pandas engine the reference itself uses, and the coalesce invariant.

Spark actions are slow, so examples are few but adversarial: random
group sizes straddling the window width, NULL patterns, duplicate-heavy
columns.
"""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from m2_b3_market_data_pipeline_spark.operators.normalize import coalesce_duplicate_columns
from m2_b3_market_data_pipeline_spark.operators.rolling import with_rolling_mean

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

prices = st.one_of(st.none(), st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))


@_slow
@given(
    data=st.lists(
        st.tuples(st.sampled_from(["A", "B", "C"]), prices), min_size=1, max_size=40
    )
)
def test_rolling_mean_matches_pandas_property(spark, data):
    rows = [(a, i, v, 1) for i, (a, v) in enumerate(data)]
    df = spark.createDataFrame(
        rows, "ativo string, date int, close_price double, trade_volume long"
    )
    got = (
        with_rolling_mean(df, window_rows=4)
        .orderBy("ativo", "date")
        .toPandas()
    )
    for _, grp in got.groupby("ativo"):
        golden = grp["close_price"].rolling(window=4).mean()
        for g, e in zip(grp["mm_7d"], golden):
            if pd.isna(e):
                assert g is None or (isinstance(g, float) and math.isnan(g))
            else:
                assert g is not None and abs(g - e) < 1e-9


@_slow
@given(
    cols=st.lists(
        st.tuples(st.sampled_from(["x", "y", "z"]), st.one_of(st.none(), st.integers(-99, 99))),
        min_size=1,
        max_size=6,
    ),
    n_rows=st.integers(1, 5),
)
def test_coalesce_duplicates_property(spark, cols, n_rows):
    """Output equals: for each distinct name (first-seen order), the
    first non-null value scanning its occurrences left-to-right."""
    names = [name for name, _ in cols]
    rows = [tuple(v for _, v in cols) for _ in range(n_rows)]
    df = spark.createDataFrame(rows, ", ".join(f"c{i} int" for i in range(len(cols)))).toDF(*names)
    out = coalesce_duplicate_columns(df)

    first_seen = list(dict.fromkeys(names))
    assert out.columns == first_seen
    expected_row = []
    for name in first_seen:
        vals = [v for n, v in cols if n == name]
        expected_row.append(next((v for v in vals if v is not None), None))
    for row in out.collect():
        assert tuple(row) == tuple(expected_row)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=65535),
            st.integers(min_value=0, max_value=65535),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_key_is_a_bijection_property(spark, pairs):
    """Morton interleaving must be invertible: de-interleaving the even
    bits recovers x, the odd bits recover y — for ANY 16-bit inputs.
    Guarantees no two (x, y) cells ever share a z-value (what makes
    z-range file pruning sound)."""
    from m2_b3_market_data_pipeline_spark.operators.layout import zorder_key

    df = spark.createDataFrame(pairs, "x long, y long")
    got = df.select("x", "y", zorder_key("x", "y").alias("z")).collect()
    for r in got:
        x_back = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        y_back = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (x_back, y_back) == (r.x, r.y)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4095),
            st.integers(min_value=0, max_value=4095),
            st.integers(min_value=0, max_value=4095),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_zorder_n_is_a_bijection_property(spark, triples):
    """Three-column Morton codes must de-interleave back to the inputs
    (round-robin layout: bit i of col j sits at position i*3 + j)."""
    from m2_b3_market_data_pipeline_spark.operators.layout import zorder_key_n

    df = spark.createDataFrame(triples, "x long, y long, z long")
    got = df.select(
        "x", "y", "z", zorder_key_n(["x", "y", "z"], bits=12).alias("m")
    ).collect()
    for r in got:
        back = [
            sum(((r.m >> (3 * i + j)) & 1) << i for i in range(12)) for j in range(3)
        ]
        assert back == [r.x, r.y, r.z]


@_slow
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=60,
        ),
        min_size=1,
        max_size=12,
    )
)
def test_text_canonicalize_idempotent_property(spark, texts):
    """canon(canon(x)) == canon(x): the canonical form is a fixed point,
    so re-running the cleaning stage (pipeline retries, multi-pass
    curation) never changes keys — and equal canon_text always means
    equal canon_key."""
    from pyspark.sql import functions as F

    canon = lambda c: F.lower(  # noqa: E731 - mirror of text_canonicalize
        F.trim(F.regexp_replace(F.regexp_replace(c, r"\p{Punct}", " "), r"\s+", " "))
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = df.select(
        canon(F.col("text")).alias("once"),
    ).withColumn("twice", canon(F.col("once")))
    assert out.filter(F.col("once") != F.col("twice")).count() == 0


@_slow
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=6,
    )
)
def test_simhash_expr_matches_python_reference_property(spark, docs):
    """The round-6 bit-explode rewrite of simhash_expr against a direct
    Python computation of the same algorithm: md5-derived 32-bit halves,
    per-bit weighted majority vote (ties -> 0)."""
    import hashlib

    from m2_b3_market_data_pipeline_spark.operators.dedup import simhash_expr

    rows = []
    expected = {}
    for doc_id, tokens_ in enumerate(docs):
        counts: dict[str, int] = {}
        for t in tokens_:
            counts[t] = counts.get(t, 0) + 1
        rows += [(doc_id, t, c) for t, c in counts.items()]
        tot = sum(counts.values())
        sig = {}
        for name, off in (("lo", 0), ("hi", 8)):
            val = 0
            for j in range(32):
                ones = 0
                for t, c in counts.items():
                    h = int(hashlib.md5(t.encode()).hexdigest()[off : off + 8], 16)
                    ones += c * ((h >> j) & 1)
                if ones * 2 > tot:
                    val += 1 << j
            sig[name] = val
        expected[doc_id] = (sig["lo"], sig["hi"])

    df = spark.createDataFrame(rows, "doc_id long, token string, cnt long")
    got = {
        r.doc_id: (r.simhash_lo, r.simhash_hi)
        for r in simhash_expr(df, id_col="doc_id").collect()
    }
    assert got == expected


@_slow
@given(
    corpus=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=1, max_value=9),  # tokens per doc
        ),
        min_size=1,
        max_size=25,
    )
)
def test_mixture_waterline_invariants_property(spark, corpus):
    """For any corpus: (a) no source's kept tokens exceed its integer
    waterline cap; (b) a source wholly under its cap keeps every doc;
    (c) the admission is deterministic."""
    from m2_b3_market_data_pipeline_spark.plans.corpus_quality import (
        BUDGET_DEN,
        BUDGET_NUM,
        mixture_rebalance_df,
    )

    rows = [
        (i, src, " ".join(f"w{j}" for j in range(ntok)))
        for i, (src, ntok) in enumerate(corpus)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    total = sum(ntok for _, ntok in corpus)
    n_src = len({src for src, _ in corpus})
    per_source = {}
    for src, ntok in corpus:
        per_source[src] = per_source.get(src, 0) + ntok

    got = {r.source: r for r in mixture_rebalance_df(docs).collect()}
    for src, tokens_kept in ((s, r.tokens_kept) for s, r in got.items()):
        # cum * n_src * DEN <= total * NUM for every admitted doc
        assert tokens_kept * n_src * BUDGET_DEN <= total * BUDGET_NUM
    for src, src_tok in per_source.items():
        if src_tok * n_src * BUDGET_DEN <= total * BUDGET_NUM:
            assert got[src].tokens_kept == src_tok  # fits entirely
    again = {r.source: r.tokens_kept for r in mixture_rebalance_df(docs).collect()}
    assert again == {s: r.tokens_kept for s, r in got.items()}


@_slow
@given(values=st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=10))
def test_seeded_hash60_matches_python_md5_prefix_property(spark, values):
    """seeded_hash60 == int(md5(f'{seed}|{s}')[:15], 16): non-negative,
    < 2^60, and exactly the documented md5 prefix (the portability
    contract the DuckDB oracles rely on)."""
    import hashlib

    from pyspark.sql import functions as F

    from m2_b3_market_data_pipeline_spark.functions.textfns import seeded_hash60

    df = spark.createDataFrame([(v,) for v in values], "s string")
    for seed in (0, 7):
        got = {
            r.s: r.h
            for r in df.select("s", seeded_hash60(F.col("s"), seed).alias("h")).collect()
        }
        for v in values:
            want = int(hashlib.md5(f"{seed}|{v}".encode()).hexdigest()[:15], 16)
            assert got[v] == want
            assert 0 <= got[v] < 1 << 60


words6 = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
docs_texts = st.lists(
    st.lists(words6, min_size=0, max_size=14).map(" ".join),
    min_size=1,
    max_size=10,
)


@_slow
@given(texts=docs_texts)
def test_dup_ngram_coverage_invariants_property(spark, texts):
    """Structural invariants of duplicated-span coverage on random
    small-vocab corpora (tiny vocab => heavy gram collisions, the
    adversarial case): coverage never exceeds the token stream, the
    interval union never exceeds dup_positions * n, positions are
    bounded by the gram count, and an exact duplicate of a long-enough
    doc is covered END TO END."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        dup_ngram_coverage,
        release_cached,
    )

    n = 3
    rows = [(i, t) for i, t in enumerate(texts)]
    # plant an exact duplicate of the first doc
    rows.append((1000, texts[0]))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = dup_ngram_coverage(docs, n=n, min_df=2)
    got = {r.doc_id: r for r in out.collect()}
    release_cached(out)
    assert len(got) == len(rows)
    for r in got.values():
        assert 0 <= r.covered_tokens <= r.n_tok
        assert r.covered_tokens <= r.dup_positions * n
        assert r.dup_positions <= max(0, r.n_tok - n + 1)
        if r.dup_positions:  # each position covers at least one new-ish token
            assert r.covered_tokens >= n  # a single gram covers n tokens
    first_len = len([w for w in texts[0].split() if w])
    if first_len >= n:
        assert got[1000].covered_tokens == first_len  # exact dup fully covered
        assert got[0].covered_tokens == first_len


@_slow
@given(
    seeds=st.lists(
        st.integers(min_value=0, max_value=50), min_size=4, max_size=12, unique=True
    )
)
def test_semdedup_witness_property(spark, seeds):
    """Every pruned vector has a LOWER-id cluster-mate within the
    threshold (a witness); every kept vector has none. Checked against
    an exact recomputation of in-cluster cosines on random vectors plus
    a planted duplicate pair."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached
    from m2_b3_market_data_pipeline_spark.operators.embeddings import semdedup

    def vec(s: int) -> list[float]:
        return [math.sin(s * 7.3 + d * 1.7) + 0.1 * s for d in range(6)]

    rows = [(i, vec(s)) for i, s in enumerate(sorted(seeds))]
    rows.append((500, rows[0][1]))  # exact duplicate of vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tau = 0.995
    out = semdedup(emb, k=2, iters=1, threshold=tau)
    got = {r.vec_id: r for r in out.collect()}
    release_cached(out)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(num / (na * nb), 6)

    by_id = dict(rows)
    assert got[500].pruned  # the planted duplicate always prunes
    for vid, r in got.items():
        witnesses = [
            o
            for o, ro in got.items()
            if o < vid
            and ro.centroid_id == r.centroid_id
            and cos(by_id[o], by_id[vid]) >= tau
        ]
        assert bool(witnesses) == bool(r.pruned), (vid, witnesses, r.pruned)


@_slow
@given(
    seeds=st.lists(
        st.integers(min_value=0, max_value=60), min_size=6, max_size=14, unique=True
    )
)
def test_hard_negatives_are_true_argmaxes_property(spark, seeds):
    """On random labeled vectors, every emitted triplet's positive must
    be the true nearest same-label candidate and its negative the true
    nearest different-label candidate (checked against an exact python
    recompute, same rounding and tiebreak); queries missing either side
    must be absent."""
    from pyspark.sql import functions as F

    from m2_b3_market_data_pipeline_spark.operators.similarity import (
        hard_negative_mining,
    )

    def vec(s: int) -> list[float]:
        return [math.sin(s * 3.7 + d * 2.3) for d in range(5)]

    rows = [(i, "L" + str(s % 3), vec(s)) for i, s in enumerate(sorted(seeds))]
    emb = spark.createDataFrame(rows, "vec_id long, label string, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 2 == 0)
    got = {r.query_id: r for r in hard_negative_mining(emb, queries).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        return round(num / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(x * x for x in b))), 6)

    by_id = {i: (lab, v) for i, lab, v in rows}
    for qid, (qlab, qv) in by_id.items():
        if qid % 2 != 0:
            continue
        cands = [(cos(qv, v), -cid, cid, lab) for cid, (lab, v) in by_id.items() if cid != qid]
        pos = max(((c, n, cid) for c, n, cid, lab in cands if lab == qlab), default=None)
        neg = max(((c, n, cid) for c, n, cid, lab in cands if lab != qlab), default=None)
        if pos is None or neg is None:
            assert qid not in got, f"query {qid} lacks a side but emitted a triplet"
            continue
        r = got[qid]
        assert (r.pos_id, r.pos_cos) == (pos[2], pos[0]), (qid, r, pos)
        assert (r.neg_id, r.neg_cos) == (neg[2], neg[0]), (qid, r, neg)


# Unicode-heavy alphabet around the round-8 portability contract: word
# matching is exact token membership, so the Spark count must equal a
# pure-Python whitespace-split twin on ANY text — including the ß/é/ĳ
# shapes where Java and RE2 \b semantics diverge (the bug class the
# contract eliminated).
_uni_words = st.sampled_from(
    ["the", "straße", "é", "café", "a", "não", "世界", "ĳs", "x#y", "de",
     "THE", "De", "...", "", "   "]
)


@_slow
@given(texts=st.lists(st.lists(_uni_words, max_size=12), min_size=1, max_size=8))
def test_marker_count_matches_python_membership_property(spark, texts):
    from m2_b3_market_data_pipeline_spark.operators.text import (
        ENGLISH_STOPWORDS,
        LANG_MARKERS,
        marker_count,
        stopword_count,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sets = dict(LANG_MARKERS, stop=ENGLISH_STOPWORDS)
    out = df.select(
        "doc_id",
        *[marker_count("text", w).alias(f"c_{k}") for k, w in LANG_MARKERS.items()],
        stopword_count("text").alias("c_stop"),
    )
    got = {r.doc_id: r for r in out.collect()}
    for i, t in rows:
        toks = [w for w in t.lower().strip().split() if w]
        for k, words in sets.items():
            want = sum(1 for w in toks if w in words)
            assert got[i][f"c_{k}"] == want, (t, k, got[i][f"c_{k}"], want)


@_slow
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["apple", "pear", "plum", "kiwi"]), min_size=1, max_size=12),
        min_size=2,
        max_size=12,
    )
)
def test_bm25_golden_recompute_property(spark, docs):
    """BM25 scores over hypothesis corpora match a plain-Python
    recompute of the Lucene formula — the published-definition witness
    for the retrieval wave (same pattern as the BPE/triangle goldens)."""
    import math as m

    from m2_b3_market_data_pipeline_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        bm25_topk,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    queries = {"q": ("apple", "kiwi")}
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in bm25_topk(sdf, queries, k=len(docs)).collect()
    }

    n = len(docs)
    avgdl = sum(len(t) for t in docs) / n
    df_ = {
        t: sum(1 for toks in docs if t in toks) for t in queries["q"]
    }
    want = {}
    for i, toks in enumerate(docs):
        s = 0.0
        hit = False
        for t in queries["q"]:
            tf = toks.count(t)
            if tf == 0:
                continue
            hit = True
            idf = m.log((n - df_[t] + 0.5) / (df_[t] + 0.5) + 1.0)
            s += idf * (tf * (BM25_K1 + 1.0)) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(toks) / avgdl)
            )
        if hit:
            want[("q", i)] = round(s, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


@_slow
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=10),
        ),
        min_size=1,
        max_size=15,
    )
)
def test_source_kl_nonnegative_and_golden_property(spark, docs):
    """KL(p_source || p_corpus) is >= 0 for every source (Gibbs), and
    matches a plain-Python recompute."""
    import math as m
    from collections import Counter

    from m2_b3_market_data_pipeline_spark.operators.text import source_unigram_kl

    rows = [(i, src, " ".join(toks)) for i, (src, toks) in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in source_unigram_kl(sdf).collect()}

    per_src: dict[str, Counter] = {}
    corpus: Counter = Counter()
    for src, toks in docs:
        per_src.setdefault(src, Counter()).update(toks)
        corpus.update(toks)
    ctot = sum(corpus.values())
    for src, cnt in per_src.items():
        stot = sum(cnt.values())
        kl = sum(
            (c / stot) * m.log((c / stot) / (corpus[t] / ctot))
            for t, c in cnt.items()
        )
        assert got[src]["n_tokens"] == stot
        assert got[src]["kl_divergence"] >= 0.0
        assert abs(got[src]["kl_divergence"] - round(kl + 0.0, 6)) < 1e-9


@_slow
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", None]),
            st.lists(st.sampled_from(["u", "v", "w", "x"]), min_size=0, max_size=8),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_nb_classifier_golden_recompute_property(spark, docs):
    """The NB posterior argmax over hypothesis corpora matches a plain-
    Python recompute of the alpha=1 multinomial definition (priors,
    dense vocab x label smoothing, vocabulary restriction, rounded-
    posterior argmax with label-ASC tiebreak)."""
    import math as m
    from collections import Counter

    from m2_b3_market_data_pipeline_spark.operators.text import nb_lang_scores

    rows = [(i, lab, " ".join(toks)) for i, (lab, toks) in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r["doc_id"]: r for r in nb_lang_scores(sdf).collect()}

    labeled = [(lab, toks) for lab, toks in docs if lab is not None]
    counts: dict[str, Counter] = {}
    for lab, toks in labeled:
        counts.setdefault(lab, Counter()).update(toks)
    vocab = sorted({t for c in counts.values() for t in c})
    labels = sorted(counts)
    if not labels or not vocab:
        assert got == {}
        return
    n_train = len(labeled)
    prior = {l: m.log(sum(1 for la, _ in labeled if la == l) / n_train) for l in labels}
    tot = {l: sum(counts[l].values()) for l in labels}
    lp = {
        (t, l): m.log((counts[l].get(t, 0) + 1.0) / (tot[l] + len(vocab)))
        for t in vocab
        for l in labels
    }
    for i, (lab, toks) in enumerate(docs):
        known = [t for t in toks if t in set(vocab)]
        if not known:
            assert i not in got
            continue
        posts = {
            l: round(prior[l] + sum(lp[(t, l)] for t in known), 6) + 0.0
            for l in labels
        }
        best = sorted(posts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[i]["pred_lang"] == best[0], (i, posts, got[i])
        assert abs(got[i]["log_post"] - best[1]) < 1e-9


@_slow
@given(
    seeds=st.lists(st.integers(0, 10**6), min_size=4, max_size=10, unique=True)
)
def test_mmr_golden_recompute_property(spark, seeds):
    """The MMR selection over hypothesis vector sets matches a plain-
    Python greedy that replicates the pinned contract EXACTLY —
    float32-cast inputs, left-to-right dot/norm folds, and Spark's
    ROUND semantics (BigDecimal.valueOf == Decimal(repr(x)), HALF_UP) —
    so selection order and scores are equal, not approximately equal."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    from m2_b3_market_data_pipeline_spark.operators.retrieval import mmr_select

    def r6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
        )

    dim = 4
    vecs = {}
    for i, s in enumerate(sorted(seeds)):
        comps = [((s * 2654435761 + j * 97 + 13) % 1000) / 999.0 + 0.01 for j in range(dim)]
        vecs[i] = [float(np.float32(c)) for c in comps]

    emb = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    k, lam, short_m = 4, 0.7, 6
    got = [(r["rank"], r["vec_id"], r["mmr_score"]) for r in
           mmr_select(emb, k=k, lam=lam, shortlist=short_m).collect()]

    def dot(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s = s + x * y
        return s

    def nrm(a):
        s = 0.0
        for x in a:
            s = s + x * x
        return s ** 0.5

    def cos(a, b):
        return dot(a, b) / (nrm(a) * nrm(b))

    qid = min(vecs)
    q = vecs[qid]
    cand = {i: v for i, v in vecs.items() if i != qid}
    rel = {i: r6(cos(q, v)) for i, v in cand.items()}
    short = sorted(cand, key=lambda i: (-rel[i], i))[:short_m]
    sel, want = [], []
    remaining = list(short)
    for rank in range(1, k + 1):
        if not remaining:
            break
        scores = {}
        for i in remaining:
            pen = max((r6(cos(cand[i], vecs[s])) for s in sel), default=0.0)
            scores[i] = r6(lam * rel[i] - (1.0 - lam) * pen) + 0.0
        pick = sorted(remaining, key=lambda i: (-scores[i], i))[0]
        want.append((rank, pick, scores[pick]))
        sel.append(pick)
        remaining.remove(pick)
    assert got == want, (got, want)
