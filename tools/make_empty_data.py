"""Empty-input fixture for the degenerate-corpus gate.

At 100 TB, empty inputs are not exotic: a partition-pruned scan, a
filter that matches nothing, a new tenant's first run, or a delta batch
with no rows all present the SAME shape — a relation with the full
schema and zero rows. Every registered query must degrade to a clean
(usually empty) result on that shape, never throw (a driver-side
``.first()``/``collect()[0]`` on an empty relation, an iterative
trainer assuming a non-empty vocabulary, a divide on an empty
aggregate).

This tool derives a zero-row twin of every fixture table — SAME parquet
schema, via pyarrow — and the standard differential gate runs over it:

    python tools/make_empty_data.py           # -> /root/repo/.empty/sf0
    python tools/check_oracle.py /root/repo/.empty/sf0

Both engines see the same empty relations, so any FAIL is either a
genuine crash-on-empty (fix the operator) or an empty-vs-NULL scalar
divergence between the engines (pin the contract, as with the
adversarial fixture's classes).
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.empty/sf0"
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(os.path.join(src, f"{t}.parquet"))
        empty = table.slice(0, 0)
        pq.write_table(empty, os.path.join(dst, f"{t}.parquet"))
        print(f"{t}: 0 rows, schema preserved ({len(empty.schema)} cols)")


if __name__ == "__main__":
    main()
