"""Adversarial fixture generator for the differential gate.

Round 7's advisor found three latent edge-case divergences (NULL doc
text in span removal, absent count-min buckets, triangle-rank overflow)
by *reading* the code. This tool converts that bug class into a
mechanical gate: derive an sf0.001-sized fixture with planted edge rows
— NULL/empty/whitespace/unicode text, zero-norm/NULL/empty embeddings,
NULL event fields and timestamps, zero prices, 100% discounts, orphan
foreign keys — and run the FULL DuckDB differential check over it
(`python tools/check_oracle.py /root/repo/.adv/sf0.001`). Both engines
see the same planted rows, so any hash mismatch is a genuine
engine-semantics divergence (ANSI edge, NULL ordering, unicode case
rule), not a data accident.

Schema fidelity: planted rows are appended through the SOURCE parquet
schema via pyarrow (same physical types, same nullability), so Spark
and DuckDB read the adversarial fixture exactly as they read the
driver's.

Usage: python tools/make_adversarial_data.py [SRC_DIR] [DST_DIR]
       (defaults /root/testdata/sf0.001 -> /root/repo/.adv/sf0.001)
"""

from __future__ import annotations

import os
import sys
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

# Planted keys start far above any fixture key so replica/mod-based
# selections in registered queries keep their original density.
K = 9000

EMO_TEXT = "héllo wörld 世界 🚀 مرحبا Straße ĳs"  # mixed scripts + ligature
COMBINING = "café latte"  # combining accent (NFD) vs precomposed
PRECOMPOSED = "café latte"  # NFC twin of the row above

PLANTS: dict[str, list[dict]] = {
    "documents": [
        # the advisor's NULL-text case, now a permanent fixture row
        {"doc_id": K + 1, "text": None, "lang": "en", "source": "src0", "n_chars": None},
        {"doc_id": K + 2, "text": "", "lang": "en", "source": "src1", "n_chars": 0},
        {"doc_id": K + 3, "text": "   \n\t  ", "lang": "en", "source": "src2", "n_chars": 7},
        {"doc_id": K + 4, "text": "x", "lang": "en", "source": "src3", "n_chars": 1},
        {"doc_id": K + 5, "text": EMO_TEXT, "lang": "de", "source": "src4", "n_chars": len(EMO_TEXT)},
        {"doc_id": K + 6, "text": "!!! ??? ... ,,, ;;;", "lang": "fr", "source": "src5", "n_chars": 19},
        {"doc_id": K + 7, "text": ("dup " * 200).strip(), "lang": "en", "source": "src6", "n_chars": 799},
        {"doc_id": K + 8, "text": "123 456.78 1e9 -0.0 NaN", "lang": "en", "source": "src7", "n_chars": 23},
        {"doc_id": K + 9, "text": "plain words here", "lang": None, "source": "src8", "n_chars": 16},
        {"doc_id": K + 10, "text": "plain words there", "lang": "en", "source": None, "n_chars": 17},
        {"doc_id": K + 11, "text": COMBINING, "lang": "fr", "source": "src9", "n_chars": len(COMBINING)},
        {"doc_id": K + 12, "text": PRECOMPOSED, "lang": "fr", "source": "src10", "n_chars": len(PRECOMPOSED)},
        # >= 64 utf-8 BYTES of multi-byte text: exercises the byte-domain
        # frame/feature oracles where a frame boundary falls mid-codepoint
        {"doc_id": K + 13, "text": (EMO_TEXT + " ") * 4, "lang": "de", "source": "src11", "n_chars": len((EMO_TEXT + " ") * 4)},
        # round-8 curation-filter edges (gopher_rules / c4_line_filters):
        # all-bullet lines, all-ellipsis lines, banned substrings, a line
        # ending in the quote terminal, and mixed keep/drop lines.
        {"doc_id": K + 14, "text": "\n".join(["- bullet item one two."] * 6), "lang": "en", "source": "src12", "n_chars": 137},
        {"doc_id": K + 15, "text": "\n".join(["trailing thought goes on and on..."] * 4 + ["  \t* spaced bullet?"]), "lang": "en", "source": "src12", "n_chars": 159},
        {"doc_id": K + 16, "text": "Uses JavaScript and { braces } here.\nLorem ipsum dolor sit amet line.\nShe said the words were \"fine.\"\nA good plain sentence stays here.", "lang": "en", "source": "src13", "n_chars": 135},
        {"doc_id": K + 17, "text": "#tag #tag #tag the of and…\nthe # of # and # it # is.", "lang": "en", "source": "src13", "n_chars": 52},
    ],
    "embeddings": [
        {"vec_id": K + 1, "embedding": [0.0] * 64, "label": 0},  # zero norm
        {"vec_id": K + 2, "embedding": None, "label": 1},
        {"vec_id": K + 3, "embedding": [], "label": 2},
        {"vec_id": K + 4, "embedding": [1e-30] * 64, "label": 3},  # fp32 underflow-adjacent
        {"vec_id": K + 5, "embedding": [float(i % 7) - 3.0 for i in range(64)], "label": None},
    ],
    "events": [
        {"event_id": K + 1, "ts": datetime(2024, 1, 2, 0, 0, 1), "user_id": 9001, "event_type": "purchase", "value": None, "props": '{"k": 1}'},
        {"event_id": K + 2, "ts": datetime(2024, 1, 2, 0, 0, 2), "user_id": 9001, "event_type": "click", "value": 1.5, "props": None},
        {"event_id": K + 3, "ts": datetime(2024, 1, 2, 0, 0, 3), "user_id": 9001, "event_type": "view", "value": 2.5, "props": "not json"},
        {"event_id": K + 4, "ts": datetime(2024, 1, 2, 0, 0, 4), "user_id": 9002, "event_type": None, "value": 3.5, "props": "{}"},
        {"event_id": K + 5, "ts": datetime(2024, 1, 2, 0, 0, 5), "user_id": None, "event_type": "signup", "value": 4.5, "props": '{"k": 2}'},
        {"event_id": K + 6, "ts": None, "user_id": 9002, "event_type": "error", "value": 5.5, "props": '{"k": 3}'},
        {"event_id": K + 7, "ts": datetime(2024, 1, 2, 0, 0, 7), "user_id": 9002, "event_type": "purchase", "value": 0.0, "props": '{"k": 4}'},
    ],
    "lineitem": [
        # zero-everything row: qty 0, price 0, 100% discount, epoch date
        {"l_orderkey": K + 1, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1,
         "l_quantity": 0.0, "l_extendedprice": 0.0, "l_discount": 1.0, "l_tax": 0.0,
         "l_returnflag": "", "l_linestatus": "O", "l_shipdate": datetime(1970, 1, 1)},
        # huge-price row + orphan orderkey (no matching orders row)
        {"l_orderkey": K + 2, "l_partkey": 1, "l_suppkey": 1, "l_linenumber": 1,
         "l_quantity": 50.0, "l_extendedprice": 1e9, "l_discount": 0.0, "l_tax": 0.08,
         "l_returnflag": "N", "l_linestatus": "O", "l_shipdate": datetime(2024, 6, 1)},
    ],
    "orders": [
        # zero-price order with empty-string status/priority
        {"o_orderkey": K + 1, "o_custkey": 1, "o_orderstatus": "", "o_totalprice": 0.0,
         "o_orderdate": datetime(2024, 6, 1), "o_orderpriority": ""},
        # orphan custkey (no matching customer row)
        {"o_orderkey": K + 3, "o_custkey": K + 500, "o_orderstatus": "F", "o_totalprice": 123.45,
         "o_orderdate": datetime(2024, 6, 2), "o_orderpriority": "1-URGENT"},
    ],
    "customer": [
        {"c_custkey": K + 1, "c_name": None, "c_nationkey": 1, "c_acctbal": 0.0, "c_mktsegment": "BUILDING"},
        {"c_custkey": K + 2, "c_name": "Customer#9002", "c_nationkey": 1, "c_acctbal": -999.99, "c_mktsegment": None},
    ],
    "part": [
        {"p_partkey": K + 1, "p_name": "edge zero part", "p_brand": "Brand#0", "p_type": None,
         "p_size": 0, "p_retailprice": 0.0},
    ],
    # region / nation / supplier untouched: tiny heavily-joined dims
    # whose planted NULL keys would change every join's contract rather
    # than probe an edge.
}


def build(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in TABLES:
        table = pq.read_table(f"{src}/{t}.parquet")
        plants = PLANTS.get(t)
        if plants:
            extra = pa.Table.from_pylist(plants, schema=table.schema)
            table = pa.concat_tables([table, extra])
        pq.write_table(table, f"{dst}/{t}.parquet", compression="snappy")
        print(f"{t}: {table.num_rows} rows ({len(plants) if plants else 0} planted)")


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.adv/sf0.001"
    build(src, dst)
