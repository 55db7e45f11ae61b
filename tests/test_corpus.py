"""Corpus-preparation operators: repetition signals, PII scrub,
sequence packing, and the composed pipeline, on small known inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from m2_b3_market_data_pipeline_spark.operators.corpus import (
    pack_sequences,
    prepare_corpus,
    scrub_pii,
    top_bigram_fraction,
    with_repetition_stats,
)


def test_repetition_fractions_exact(spark):
    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "w x y z"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in with_repetition_stats(df).collect()}
    # doc 1: 4 tokens 1 distinct -> 0.75; bigrams [a a, a a, a a] -> 2/3
    assert out[1].dup_token_frac == 0.75
    assert out[1].dup_bigram_frac == round(2 / 3, 6)
    assert out[2].dup_token_frac == 0.0 and out[2].dup_bigram_frac == 0.0
    # single token: no bigrams -> NULL fraction
    assert out[3].dup_bigram_frac is None


def test_top_bigram_fraction_exact(spark):
    df = spark.createDataFrame(
        [(1, "a b a b c"), (2, "only")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in top_bigram_fraction(df).collect()}
    # bigrams: [a b, b a, a b, b c] -> top 'a b' = 2/4
    assert rows[1].n_bigrams == 4 and rows[1].top_bigram_frac == 0.5
    assert 2 not in rows  # <2 tokens: no bigrams, row drops out


def test_scrub_pii_redacts(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@mail.example.com or +55-123-4567 today")],
        "doc_id long, text string",
    )
    out = scrub_pii(df, text_col="text").collect()[0]
    assert out.scrubbed == "mail me at <EMAIL> or <PHONE> today"


def test_pack_sequences_math(spark):
    # token counts: a=3, b=2, c=4 in one source; budget 4
    df = spark.createDataFrame(
        [(1, "s", "t t t"), (2, "s", "t t"), (3, "s", "t t t t"), (9, "z", "t")],
        "doc_id long, source string, text string",
    )
    out = {r.doc_id: r for r in pack_sequences(df, budget=4).collect()}
    assert (out[1].shard_id, out[1].shard_offset) == (0, 0)
    assert (out[2].shard_id, out[2].shard_offset) == (0, 3)  # starts at token 3
    assert (out[3].shard_id, out[3].shard_offset) == (1, 1)  # cum 5 -> shard 1
    assert (out[9].shard_id, out[9].shard_offset) == (0, 0)  # separate key


def test_prepare_corpus_stages(spark):
    # the same near-pair the minhash unit test pins as caught by the
    # 3x4 band layout (one trailing-word edit -> jaccard ~0.8)
    rich = "the quick brown fox jumps over the lazy dog near the river bank today"
    near = rich.replace("today", "yesterday")
    junk = "!!! ??? !!! ??? !!! ???"  # punctuation noise -> low quality
    df = spark.createDataFrame(
        [(1, "s", rich), (2, "s", near), (3, "s", junk), (4, "s", rich)],
        "doc_id long, source string, text string",
    )
    kept = sorted(r.doc_id for r in prepare_corpus(df, min_quality=0.55).collect())
    # 3 fails quality; 4 is an exact dup of 1; 2 is a near-dup of 1 -> only 1 survives
    assert kept == [1]
