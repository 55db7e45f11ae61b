"""Round-10 additions: the hashed-feature NB variant (bounded model
broadcast at open vocabulary) and the MMR shortlist recall gate.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _bucket(tok: str, n_buckets: int, seed: int) -> int:
    """Python twin of seeded_hash60(tok, seed) % n_buckets."""
    return int(hashlib.md5(f"{seed}|{tok}".encode()).hexdigest()[:15], 16) % n_buckets


@_slow
@given(
    docs=st.lists(
        st.tuples(
            st.sampled_from(["aa", "bb", None]),
            st.lists(
                st.sampled_from(["u", "v", "w", "x", "yy", "zz", "qq"]),
                min_size=0,
                max_size=8,
            ),
        ),
        min_size=1,
        max_size=12,
    ),
    n_buckets=st.sampled_from([2, 3, 5]),
)
def test_nb_hashed_golden_recompute_property(spark, docs, n_buckets):
    """The hashed-feature NB (n_buckets set) matches a plain-Python
    recompute of the SAME alpha=1 multinomial definition run over
    bucket ids instead of tokens: vocabulary = occupied training
    buckets, smoothing denominator = that bucket-vocab size, OOV drop
    = docs whose buckets are all unoccupied. n_buckets is chosen well
    below the 7-token alphabet so collisions actually fold features."""
    from m2_b3_market_data_pipeline_spark.operators.text import (
        NB_HASH_SEED,
        nb_lang_scores,
    )

    rows = [(i, lab, " ".join(toks)) for i, (lab, toks) in enumerate(docs)]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: r
        for r in nb_lang_scores(sdf, n_buckets=n_buckets).collect()
    }

    from collections import Counter

    bdocs = [
        (lab, [_bucket(t, n_buckets, NB_HASH_SEED) for t in toks])
        for lab, toks in docs
    ]
    labeled = [(lab, bs) for lab, bs in bdocs if lab is not None]
    counts: dict[str, Counter] = {}
    for lab, bs in labeled:
        counts.setdefault(lab, Counter()).update(bs)
    vocab = sorted({b for c in counts.values() for b in c})
    labels = sorted(counts)
    if not labels or not vocab:
        assert got == {}
        return
    n_train = len(labeled)
    prior = {
        l: math.log(sum(1 for la, _ in labeled if la == l) / n_train)
        for l in labels
    }
    tot = {l: sum(counts[l].values()) for l in labels}
    lp = {
        (b, l): math.log((counts[l].get(b, 0) + 1.0) / (tot[l] + len(vocab)))
        for b in vocab
        for l in labels
    }
    vset = set(vocab)
    for i, (lab, bs) in enumerate(bdocs):
        known = [b for b in bs if b in vset]
        if not known:
            assert i not in got
            continue
        posts = {
            l: round(prior[l] + sum(lp[(b, l)] for b in known), 6) + 0.0
            for l in labels
        }
        best = sorted(posts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[i]["pred_lang"] == best[0], (i, posts, got[i])
        assert abs(got[i]["log_post"] - best[1]) < 1e-9


def test_nb_hashed_model_bounded_by_buckets(spark):
    """The broadcast-size invariant the variant exists for: with a
    corpus vocabulary far wider than n_buckets, the scored relation
    still behaves (every non-empty doc scores — no OOV drops once all
    buckets are occupied) and the internal feature space is the bucket
    range, not the vocabulary. Checked from the outside: 200 distinct
    tokens, n_buckets=4, every labeled doc present in the output."""
    from m2_b3_market_data_pipeline_spark.operators.text import nb_lang_scores

    rows = [
        (i, "aa" if i % 2 == 0 else "bb", f"tok{i} tok{i + 100} shared")
        for i in range(100)
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = nb_lang_scores(sdf, n_buckets=4).collect()
    assert len(out) == 100  # 300 distinct tokens all fold into 4 buckets
    # And the dense form on the same corpus carries a 300-token vocab —
    # the hashed model's feature space is 75x smaller by contract.
    dense = nb_lang_scores(sdf).collect()
    assert len(dense) == 100
