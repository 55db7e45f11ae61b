"""Independent pure-Python golden recomputes for the round-6b wave
(DSIR, bigram PMI, lang segments).

These three operators' DuckDB oracles re-derive the same formulas in
SQL, so an algorithmic misreading could pass both engines (shared-fate
oracle risk). Each test here recomputes the operator from its
published definition in plain Python over hypothesis-generated corpora
and compares — a third, independent witness (the simhash / triplet /
dup-span precedent)."""

from __future__ import annotations

import hashlib
import math
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from m2_b3_market_data_pipeline_spark.operators.corpus import (
    DSIR_SEED,
    bigram_pmi,
    dsir_log_weights,
)
from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached
from m2_b3_market_data_pipeline_spark.operators.text import LANG_MARKERS, lang_segments

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

# Small vocabularies force hash-bucket and marginal collisions (the
# interesting arithmetic) within few examples. Mixed-language markers
# exercise every vote branch of lang_segments.
_WORDS = ["the", "and", "der", "und", "le", "la", "el", "es", "foo", "qq", "zz"]

docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=12,
)


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _hash60(value: str, seed: int) -> int:
    return int(hashlib.md5(f"{seed}|{value}".encode()).hexdigest()[:15], 16)


@_slow
@given(docs=docs_strategy)
def test_dsir_log_weights_matches_python_golden(spark, docs):
    """DSIR (Xie et al. 2023) from its published definition: hashed
    unigram+bigram features, Laplace-smoothed target/raw bucket models,
    per-doc summed log2 likelihood ratio."""
    n_buckets = 16  # small so buckets actually collide
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    # --- golden ---
    feats = {}
    for i, t in rows:
        toks = _tokens(t)
        fs = toks + [" ".join(toks[j : j + 2]) for j in range(len(toks) - 1)]
        feats[i] = [_hash60(f, DSIR_SEED) % n_buckets for f in fs]
    nt: dict[int, int] = {}
    nr: dict[int, int] = {}
    for i, bs in feats.items():
        for b in bs:
            nr[b] = nr.get(b, 0) + 1
            if i % 2 == 0:  # the target definition used below
                nt[b] = nt.get(b, 0) + 1
    tt, tr = sum(nt.values()), sum(nr.values())
    lr = {
        b: math.log2((nt.get(b, 0) + 1) / (tt + n_buckets))
        - math.log2((nr[b] + 1) / (tr + n_buckets))
        for b in nr
    }
    want = {
        i: (len(bs), sum(lr[b] for b in bs)) for i, bs in feats.items() if bs
    }

    out = dsir_log_weights(
        df,
        target=df.doc_id % 2 == 0,
        n_buckets=n_buckets,
    )
    got = {r.doc_id: (r.n_feats, r.log_weight) for r in out.collect()}
    release_cached(out)
    assert set(got) == set(want)
    for i, (nf, w) in want.items():
        assert got[i][0] == nf
        assert abs(got[i][1] - round(w, 6)) < 2e-6, (i, got[i], w)


@_slow
@given(docs=docs_strategy)
def test_bigram_pmi_matches_python_golden(spark, docs):
    """PMI from its definition: log2 P(w1 w2) - log2 P(w1) - log2 P(w2)
    with pair probability under the bigram total and marginals under
    the token total; pairs under min_count cut first. k is set past the
    pair-vocab size so the whole scored relation compares (top-k
    truncation would hide marginal mistakes in the tail)."""
    min_count = 2
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    for _, t in rows:
        toks = _tokens(t)
        for w in toks:
            uni[w] = uni.get(w, 0) + 1
        for j in range(len(toks) - 1):
            p = (toks[j], toks[j + 1])
            bi[p] = bi.get(p, 0) + 1
    n_tok, n_bi = sum(uni.values()), sum(bi.values())
    want = {
        (w1, w2): (
            n,
            round(
                math.log2(n / n_bi)
                - math.log2(uni[w1] / n_tok)
                - math.log2(uni[w2] / n_tok),
                6,
            ),
        )
        for (w1, w2), n in bi.items()
        if n >= min_count
    }

    out = bigram_pmi(df, min_count=min_count, k=10_000)
    got = {(r.w1, r.w2): (r.n_pair, r.pmi) for r in out.collect()}
    release_cached(out)
    assert set(got) == set(want)
    for p, (n, pmi) in want.items():
        assert got[p][0] == n
        assert abs(got[p][1] - pmi) < 2e-6, (p, got[p], (n, pmi))


@_slow
@given(docs=docs_strategy)
def test_lang_segments_matches_python_golden(spark, docs):
    """lang_segments from its definition: fixed token windows, marker
    regex votes per segment, first-language-wins argmax ('und' on zero),
    switch count over adjacent segments, majority with lowest-label
    tiebreak. Integer votes make the compare exact."""
    seg_tokens = 5
    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    want = {}
    for i, t in rows:
        toks = _tokens(t)
        if not toks:
            continue
        segs = [toks[j : j + seg_tokens] for j in range(0, len(toks), seg_tokens)]
        langs = []
        for seg in segs:
            votes = {
                lang: sum(1 for tok in seg if tok in words)
                for lang, words in LANG_MARKERS.items()
            }
            best = max(votes.values())
            langs.append(
                next(l for l in LANG_MARKERS if votes[l] == best)
                if best > 0
                else "und"
            )
        switches = sum(1 for a, b in zip(langs, langs[1:]) if a != b)
        counts: dict[str, int] = {}
        for l in langs:
            counts[l] = counts.get(l, 0) + 1
        majority = min(counts, key=lambda l: (-counts[l], l))
        want[i] = (
            len(langs),
            majority,
            round(counts[majority] / len(langs), 6),
            switches,
        )

    out = lang_segments(df, seg_tokens=seg_tokens)
    got = {
        r.doc_id: (r.n_segments, r.majority_lang, r.agree_frac, r.n_switches)
        for r in out.collect()
    }
    release_cached(out)
    assert got == want


@_slow
@given(docs=docs_strategy)
def test_bpe_learn_merges_matches_python_golden(spark, docs):
    """BPE trainer (Sennrich et al. 2016) from its published definition:
    word-frequency table, weighted adjacent-pair counts, argmax with
    (count desc, pair asc) tiebreak, greedy left-to-right merge where a
    freshly-merged token may serve as the next match's left side. The
    Spark fold (operators/bpe.py::_apply_merge) must reproduce this
    exactly, rule for rule — iteration makes the op rows-only at the
    driver, so this recompute is its primary correctness witness."""
    from collections import Counter

    from m2_b3_market_data_pipeline_spark.operators.bpe import learn_merges

    n_merges = 6

    # --- pure-Python golden ---
    wc = Counter()
    for text in docs:
        for w in re.split(r"\s+", text):
            if w:
                wc[w] += 1
    syms = {w: [ch for ch in w] for w in wc}
    golden = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += wc[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        golden.append((rank, l, r, l + r, cnt))
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out

    # --- Spark ---
    sdocs = spark.createDataFrame([(i, t) for i, t in enumerate(docs)], "doc_id long, text string")
    got = [tuple(r) for r in learn_merges(spark, sdocs, n_merges=n_merges).collect()]
    assert got == golden


@_slow
@given(docs=docs_strategy)
def test_bpe_apply_merges_matches_python_golden(spark, docs):
    """apply_merges (the map-side inference path) must reproduce the
    golden final symbolization when folding the golden rules in rank
    order — the trainer and the re-tokenizer share _apply_merge, but
    this pins the rank-ordered fold composition itself."""
    from collections import Counter

    from m2_b3_market_data_pipeline_spark.operators.bpe import apply_merges

    n_merges = 4

    wc = Counter()
    for text in docs:
        for w in re.split(r"\s+", text):
            if w:
                wc[w] += 1
    syms = {w: [ch for ch in w] for w in wc}
    rules = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += wc[w]
        if not pairs:
            break
        (l, r), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append({"rank": rank, "left": l, "right": r})
        for w, s in syms.items():
            out = []
            for x in s:
                if out and out[-1] == l and x == r:
                    out[-1] = l + r
                else:
                    out.append(x)
            syms[w] = out

    sdocs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["word"]: (r["cnt"], list(r["sym"]))
        for r in apply_merges(sdocs, rules).collect()
    }
    assert got == {w: (wc[w], syms[w]) for w in wc}
