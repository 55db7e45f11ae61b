"""Distributed BPE tokenizer training — learn merge rules from the
corpus (the operation a training-data pipeline runs BEFORE token
counting; the reference surface has no tokenizer trainer, this extends
it per the LLM-data mandate alongside token_count_bpe / token_fertility).

Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY table,
not the raw corpus: at 100 TB the corpus collapses to a bounded
|distinct words| frame in one shuffle, and every learning step after
that runs over vocab-sized data. Each merge round is

  pair-count:   explode adjacent symbol pairs weighted by word count
                (map-side partial aggregation; pair space is tiny),
  argmax:       ORDER BY count DESC, pair ASC LIMIT 1 — a one-row
                collect, the sanctioned scalar pattern (graph.py:164),
  apply:        a map-side F.aggregate fold over each word's symbol
                array (greedy left-to-right, merged output can cascade
                into the next match — the standard implementation).

The driver loop carries only the merge table (n_merges rows of string
metadata — exactly like k-means centroids); per-round frames are
persisted and released so lineage depth stays constant. Everything is
deterministic (count desc, lexicographic pair tiebreak), pinned by a
pure-Python golden recompute (tests/test_golden_recompute.py) — the
merge-dependent iteration is the documented non-SQL-expressible case,
so the registry entry is rows-only while the first round's pair table
(``bpe_pair_counts``) is hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Explicit greedy-merge semantics (shared by the Spark fold and the
# golden recompute): scan symbols left to right; if the OUTPUT's last
# symbol is `left` and the incoming symbol is `right`, replace the last
# output symbol with the merged token — so "aaa" under (a,a) becomes
# ["aa", "a"], and a freshly-merged token can immediately serve as the
# `left` of the same rule ("abab" under (a,b) -> ["ab", "ab"]).


def word_frequencies(docs: DataFrame, *, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, cnt, sym) with sym = the character-split symbol
    array. The ONE corpus-sized shuffle in BPE training."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    sym = F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
    return words.withColumn("sym", sym)


def pair_counts(words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current symbolization,
    weighted by word count. Words reduced to one symbol no longer
    participate (also dodges ANSI sequence(0,-1))."""
    pairs = (
        words.filter(F.size("sym") >= 2)
        .select(
            "cnt",
            F.explode(
                F.expr("transform(sequence(0, size(sym) - 2), i -> struct(sym[i] AS l, sym[i+1] AS r))")
            ).alias("p"),
        )
        .select(F.col("p.l").alias("left"), F.col("p.r").alias("right"), "cnt")
    )
    return pairs.groupBy("left", "right").agg(F.sum("cnt").alias("pair_count"))


def _apply_merge(sym_col: Column, left: str, right: str) -> Column:
    """Greedy left-to-right merge fold. F.get (null-safe, 0-based) reads
    the accumulator's last element — NULL on the empty array, which
    fails the WHEN condition without tripping ANSI array-index errors
    (Spark 4 has ANSI on; CASE WHEN short-circuits, AND may not)."""
    merged = left + right
    return F.aggregate(
        sym_col,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.get(acc, F.size(acc) - F.lit(1)) == F.lit(left)) & (x == F.lit(right)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def learn_merges(
    spark: SparkSession,
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_merges: int = 16,
) -> DataFrame:
    """Train ``n_merges`` BPE merge rules; returns the merge table
    (rank, left, right, merged, pair_count) — driver-resident metadata,
    like learned k-means centroids. Stops early if the corpus runs out
    of pairs.

    Each round LOCAL-CHECKPOINTS the re-symbolized vocab instead of
    persisting it: persist alone caches the DATA but Catalyst still
    re-analyzes the full lineage every round, so after N rounds each
    new job pays O(N) nested-fold analysis — measured 4.4s/round by
    round 16 vs 1.2s flat with the checkpoint (plan growth, not
    compute). The checkpoints are LAZY (eager=False, r15): the logical
    plan truncates immediately either way, and materialization folds
    into the next round's argmax job instead of paying a separate
    per-round action — one job per merge instead of two, and the final
    round's never-consumed checkpoint costs nothing (same-window A/B:
    5.14 -> 4.16s at sf0.1, merges identical). A production run on
    preemptible executors would use reliable ``checkpoint()``; the
    loop shape is identical. The argmax is a one-row
    ``min(struct(-count, left, right))`` partial aggregate (count
    desc, lexicographic tiebreak), not a sort."""
    words = word_frequencies(docs, text_col=text_col).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        best = (
            pair_counts(words)
            .select(
                F.min(
                    F.struct(
                        (-F.col("pair_count")).alias("nc"), "left", "right"
                    )
                ).alias("b")
            )
            .collect()[0]["b"]
        )
        if best is None:
            break
        l, r, cnt = best["left"], best["right"], -best["nc"]
        merges.append((rank, l, r, l + r, cnt))
        words = words.withColumn(
            "sym", _apply_merge(F.col("sym"), l, r)
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count bigint"
    )


def apply_merges(
    docs: DataFrame, merge_rows: list, *, text_col: str = "text"
) -> DataFrame:
    """Re-tokenize the corpus under a learned merge table: fold every
    rule in rank order over each word's symbols (map-side only — the
    merge table is literals in the plan, the 100 TB inference path).
    Returns (word, cnt, sym) at the final symbolization."""
    words = word_frequencies(docs, text_col=text_col)
    sym = F.col("sym")
    for row in sorted(merge_rows, key=lambda r: r["rank"]):
        sym = _apply_merge(sym, row["left"], row["right"])
    return words.withColumn("sym", sym)
