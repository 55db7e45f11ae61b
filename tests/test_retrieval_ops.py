"""BM25 retrieval, MMR diversity selection, the counting-trained NB
classifier, and the source-KL mixture diagnostic (round-9 second wave).

Planted-input properties only — the hash-level engine parity is the
driver gate's job (all four register DuckDB oracles)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.retrieval import (
    bm25_topk,
    mmr_select,
)
from m2_b3_market_data_pipeline_spark.operators.text import (
    nb_lang_scores,
    source_unigram_kl,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, schema="doc_id long, lang string, source string, text string")


def test_bm25_tf_orders_within_equal_length(spark):
    docs = _docs(
        spark,
        [
            (1, "en", "s", "apple apple banana"),
            (2, "en", "s", "apple banana banana"),
            (3, "en", "s", "cherry cherry cherry"),
            (4, "en", "s", None),  # NULL text: not in the corpus at all
        ],
    )
    out = bm25_topk(docs, {"qa": ("apple",)}).collect()
    # doc 3 matches no term -> absent; NULL-text doc never scores.
    assert [r["doc_id"] for r in out] == [1, 2]
    assert [r["rank"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"] > 0


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    # Same tf, different dl: the b-term must rank the shorter doc first.
    docs = _docs(
        spark,
        [
            (1, "en", "s", "apple banana"),
            (2, "en", "s", "apple banana filler filler filler filler"),
        ],
    )
    out = bm25_topk(docs, {"qa": ("apple",)}).collect()
    assert [r["doc_id"] for r in out] == [1, 2]


def test_bm25_multi_term_sums_and_ties_break_by_doc_id(spark):
    docs = _docs(
        spark,
        [(1, "en", "s", "x y"), (2, "en", "s", "x y"), (3, "en", "s", "x z")],
    )
    out = bm25_topk(docs, {"q": ("x", "y")}).collect()
    assert [(r["doc_id"], r["rank"]) for r in out] == [(1, 1), (2, 2), (3, 3)]
    assert out[0]["score"] == out[1]["score"] > out[2]["score"]


def test_mmr_skips_redundant_near_duplicate(spark):
    # vec 0 = the query (min id). 1 ~ 2 are near-duplicates; 3 is
    # orthogonal-ish with lower relevance. With lam=0.3 the redundancy
    # penalty must demote 2 below 3.
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0, 0.0]),
            (1, [0.9, 0.1, 0.0, 0.0]),
            (2, [0.9, 0.11, 0.0, 0.0]),
            (3, [0.1, 0.9, 0.0, 0.0]),
        ],
        schema="vec_id long, embedding array<float>",
    )
    out = mmr_select(emb, k=3, lam=0.3, shortlist=8).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [(1, 1), (2, 3), (3, 2)]
    # first pick's score is round6(lam * rel) with zero penalty
    rel = out[0]["mmr_score"]
    assert rel > 0
    # scores are monotone non-increasing only for equal-penalty steps;
    # what IS pinned: every emitted score is finite and 6dp-rounded
    for r in out:
        assert r["mmr_score"] == round(r["mmr_score"], 6)


def test_mmr_fewer_candidates_than_k(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.5, 0.5])],
        schema="vec_id long, embedding array<float>",
    )
    out = mmr_select(emb, k=8, lam=0.7, shortlist=4).collect()
    assert [(r["rank"], r["vec_id"]) for r in out] == [(1, 1)]


def test_mmr_empty_input_yields_empty_frame_with_schema(spark):
    emb = spark.createDataFrame([], schema="vec_id long, embedding array<float>")
    out = mmr_select(emb, k=3)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == ["rank", "vec_id", "mmr_score"]


def test_nb_separable_languages_classify_perfectly(spark):
    docs = _docs(
        spark,
        [
            (1, "aa", "s", "foo foo"),
            (2, "aa", "s", "foo foo foo"),
            (3, "bb", "s", "bar bar"),
            (4, "bb", "s", "bar"),
            (5, None, "s", "foo"),  # unlabeled: scored, correct NULL
            (6, "aa", "s", None),   # NULL text: not scored
            (7, "aa", "s", "zzz"),  # labeled, so zzz is in-vocab
        ],
    )
    out = {r["doc_id"]: r for r in nb_lang_scores(docs).collect()}
    assert out[1]["pred_lang"] == "aa" and out[1]["correct"] == 1
    assert out[2]["pred_lang"] == "aa"
    assert out[3]["pred_lang"] == "bb" and out[3]["correct"] == 1
    assert out[4]["pred_lang"] == "bb"
    assert out[5]["pred_lang"] == "aa" and out[5]["correct"] is None
    assert 6 not in out
    # zzz occurs only in an 'aa' doc; smoothing + the aa prior keep it aa
    assert out[7]["pred_lang"] == "aa"
    assert out[5]["log_post"] < 0  # log of a probability


def test_nb_out_of_vocab_doc_drops(spark):
    docs = _docs(
        spark,
        [
            (1, "aa", "s", "foo"),
            (2, "bb", "s", "bar"),
            (3, None, "s", "zzz"),  # unlabeled AND out-of-vocab: no rows
        ],
    )
    out = {r["doc_id"] for r in nb_lang_scores(docs).collect()}
    assert out == {1, 2}


def test_kl_values_match_hand_computation(spark):
    # corpus (NULL-source doc excluded): x 4/6, y 2/6.
    # s1 = s2 = 50/50 -> KL = .5 ln(3/4) + .5 ln(3/2) = .5 ln(9/8);
    # s3 pure x -> KL = ln(3/2).
    docs = _docs(
        spark,
        [
            (1, "en", "s1", "x y"),
            (2, "en", "s2", "x y"),
            (3, "en", "s3", "x x"),
            (4, "en", None, "x"),  # NULL source: excluded by contract
        ],
    )
    out = {r["source"]: r for r in source_unigram_kl(docs).collect()}
    assert set(out) == {"s1", "s2", "s3"}
    assert out["s1"]["n_tokens"] == 2
    assert out["s1"]["kl_divergence"] == round(0.5 * math.log(9 / 8), 6)
    assert out["s2"]["kl_divergence"] == out["s1"]["kl_divergence"]
    assert out["s3"]["kl_divergence"] == round(math.log(3 / 2), 6)


def test_kl_zero_when_every_source_matches_corpus(spark):
    docs = _docs(
        spark,
        [(1, "en", "s1", "x y"), (2, "en", "s2", "y x"), (3, "en", "s3", "x y")],
    )
    out = source_unigram_kl(docs).collect()
    assert {r["kl_divergence"] for r in out} == {0.0}


def test_nb_zero_token_label_stays_in_the_model(spark):
    """Regression (golden-found): a label whose training docs are all
    empty-text has zero token mass but a real prior — it must stay in
    the label universe and score every vocab token at ln(1/V), not drop
    from the model. Here 'bb' has 2 of 3 training docs, so its prior
    dominates the single-token evidence for 'aa'."""
    docs = _docs(
        spark,
        [(1, "bb", "s", ""), (2, "aa", "s", "w"), (3, "bb", "s", "")],
    )
    out = {r["doc_id"]: r for r in nb_lang_scores(docs).collect()}
    # only doc 2 has an in-vocab token, and it must classify as 'bb':
    # post_bb = ln(2/3) + ln(1/1) = -0.405465 beats
    # post_aa = ln(1/3) + ln(2/2) = -1.098612
    assert set(out) == {2}
    assert out[2]["pred_lang"] == "bb"
    assert out[2]["log_post"] == round(math.log(2 / 3), 6)
