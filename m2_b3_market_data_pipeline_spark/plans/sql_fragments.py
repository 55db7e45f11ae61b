"""Shared DuckDB oracle SQL fragments.

The tokenization contract is defined ONCE here, mirroring
``functions/textfns.py::tokens`` (lowercased, trimmed, whitespace-split,
empties removed). Four modules previously carried verbatim copies of
this string; a future change to the tokenizer (which must land in
textfns AND here, in lockstep) now has exactly one SQL-side definition
to edit, so no module's oracle can silently drift.
"""

# whitespace tokens of lowercased trimmed text, empties removed
TK = "list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'), x -> x <> '')"

# token count of the same contract
NTOK = f"len({TK})"


def sql_word_set(words: tuple[str, ...]) -> str:
    """Render a marker/stopword tuple as a SQL IN-list. Word matching is
    EXACT TOKEN MEMBERSHIP on both engines (see operators/text.py
    LANG_MARKERS): \\b-regex scans diverge between Java (Unicode word
    boundary) and RE2 (ASCII-only), string equality cannot."""
    return "(" + ", ".join("'" + w.replace("'", "''") + "'" for w in words) + ")"


def token_in_count(words: tuple[str, ...], arr: str = TK) -> str:
    """SQL count of tokens of ``arr`` that are members of ``words`` —
    the oracle twin of operators/text.py::marker_count."""
    return f"len(list_filter({arr}, x -> x IN {sql_word_set(words)}))"

# Valid-vector source contract for the embeddings table, mirroring
# ``plans/registry.py::load``: a vector participates in geometry only if
# it is non-NULL, non-empty, and has nonzero norm. NULL vectors break
# DuckDB's list_inner_product outright, empty vectors break fixed-dim
# subspace splits, and zero-norm vectors turn cosine into ANSI
# divide-by-zero on the Spark side — production vector stores quarantine
# all three at ingestion, so the engine contract does too (adversarial
# gate, round 8). Use as: ``FROM {EMB}`` wherever an oracle previously
# said ``FROM embeddings``.
EMB = (
    "(SELECT * FROM embeddings WHERE embedding IS NOT NULL"
    " AND len(embedding) > 0"
    " AND list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * x)) > 0) embeddings"
)
