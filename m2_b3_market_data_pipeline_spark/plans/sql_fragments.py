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
