"""Cross-seed fixture generator for the differential gate.

Twelve rounds of hash evidence all derive from one driver seed
(TESTDATA.md: seed=42; the adversarial/empty/scale twins perturb or
upsample the SAME generator output). This tool removes that single
point of epistemic failure: it synthesizes a schema-identical fixture
family at the source directory's row counts from a DIFFERENT seed, so
the full registry gate (`tools/check_oracle.py`) can prove that no
constant in the engine — hash families, `nb_hashed`'s bucket count,
knob floors, MMR's exactness window — silently overfits the shape of
one particular dataset.

Fidelity contract (what makes the sweep meaningful):

- **physical schema**: every output table is cast to the SOURCE
  parquet's arrow schema (same types, same field order, same
  nullability), so Spark and DuckDB read the new fixture exactly as
  they read the driver's;
- **value domains**: categorical columns draw from the same domains
  the driver uses (region names, mktsegments, order status/priority,
  return flags, event types, the 31-word document vocabulary,
  langs/sources, Brand#N) because registered queries carry domain
  literals (stopword lists, event-type filters, priority prefixes);
- **referential integrity**: lineitem→orders→customer→nation→region
  and lineitem→{part,supplier} key ranges all resolve, as in the
  driver fixture;
- **planted structure**: the driver fixture carries ~25 document
  near-dup pairs (5-shingle jaccard>0.5) and unit-norm 64-dim
  embeddings; the twin plants mutated-copy documents and
  noise-perturbed embedding twins so dedup/ANN queries exercise their
  non-trivial paths instead of vacuously hash-matching on empty
  results;
- **different everything else**: all draws come from
  numpy's PCG64 seeded with --seed (default 7), so every key
  assignment, text, timestamp, price, and vector differs from the
  driver's.

Determinism: same (src, seed) → byte-identical output.

Usage:
    python tools/make_seed_data.py [SRC_DIR] [DST_DIR] [--seed N]
    python tools/make_seed_data.py /root/testdata/sf0.01 /root/repo/.seed7/sf0.01
"""

from __future__ import annotations

import os
import sys
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
STATUSES = ["F", "O", "P"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
RETURNFLAGS = ["A", "N", "R"]
LINESTATUSES = ["F", "O"]
PTYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_W = [0.44, 0.14, 0.14, 0.13, 0.15]
# the driver fixture's exact 31-word document vocabulary — registered
# text queries carry domain literals (stopwords "the"/"a", the word
# "dup"), so the twin must speak the same language
VOCAB = (
    "a agg batch big column customer data dup fast filter group hash "
    "join key line merge order part query row scan slow small sort "
    "spark stream table the value vector window"
).split()
ADJ = ["red", "blue", "hot", "small", "green", "dark", "cold", "big"]
NOUN = ["ring", "widget", "bolt", "gear", "gizmo", "cog", "plate", "lever"]


def _counts(src: str) -> dict[str, int]:
    return {t: pq.ParquetFile(f"{src}/{t}.parquet").metadata.num_rows for t in TABLES}


def _dt_array(days_lo: datetime, seconds_span: float, n: int, rng) -> list[datetime]:
    offs = rng.uniform(0, seconds_span, n)
    return [days_lo + timedelta(seconds=float(s)) for s in offs]


def build(src: str, dst: str, seed: int) -> None:
    rng = np.random.default_rng(seed)
    n = _counts(src)
    os.makedirs(dst, exist_ok=True)
    out: dict[str, dict] = {}

    # --- dims -----------------------------------------------------------
    out["region"] = {
        "r_regionkey": np.arange(len(REGIONS), dtype=np.int32),
        "r_name": REGIONS,
    }
    nn = n["nation"]
    out["nation"] = {
        "n_nationkey": np.arange(nn, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(nn)],
        "n_regionkey": rng.integers(0, len(REGIONS), nn).astype(np.int32),
    }
    nc = n["customer"]
    out["customer"] = {
        "c_custkey": np.arange(nc, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(nc)],
        "c_nationkey": rng.integers(0, nn, nc).astype(np.int32),
        "c_acctbal": np.round(rng.uniform(-1000, 10000, nc), 2),
        "c_mktsegment": [SEGMENTS[i] for i in rng.integers(0, len(SEGMENTS), nc)],
    }
    ns = n["supplier"]
    out["supplier"] = {
        "s_suppkey": np.arange(ns, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(ns)],
        "s_nationkey": rng.integers(0, nn, ns).astype(np.int32),
        "s_acctbal": np.round(rng.uniform(-1000, 10000, ns), 2),
    }
    np_ = n["part"]
    names = [f"{a} {b}" for a in ADJ for b in NOUN]
    out["part"] = {
        "p_partkey": np.arange(np_, dtype=np.int64),
        "p_name": [names[i] for i in rng.integers(0, len(names), np_)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, np_)],
        "p_type": [PTYPES[i] for i in rng.integers(0, len(PTYPES), np_)],
        "p_size": rng.integers(1, 51, np_).astype(np.int32),
        "p_retailprice": np.round(rng.uniform(900, 1000, np_), 2),
    }

    # --- facts ----------------------------------------------------------
    no = n["orders"]
    odate_lo = datetime(1995, 1, 1)
    odays = rng.integers(0, (datetime(2001, 8, 2) - odate_lo).days, no)
    odates = [odate_lo + timedelta(days=int(d)) for d in odays]
    out["orders"] = {
        "o_orderkey": np.arange(no, dtype=np.int64),
        "o_custkey": rng.integers(0, nc, no).astype(np.int64),
        "o_orderstatus": [STATUSES[i] for i in rng.choice(3, no, p=[0.48, 0.48, 0.04])],
        "o_totalprice": np.round(rng.uniform(1000, 500000, no), 2),
        "o_orderdate": odates,
        "o_orderpriority": [PRIORITIES[i] for i in rng.integers(0, 5, no)],
    }

    # lineitem: per-order line counts sized so the total matches the
    # source count exactly (keeps sf semantics: sf0.01 ≈ 60k lines)
    nl = n["lineitem"]
    percount = rng.integers(1, 8, no)
    diff = nl - int(percount.sum())
    idx = rng.permutation(no)
    i = 0
    while diff != 0 and i < no * 4:
        j = int(idx[i % no])
        if diff > 0 and percount[j] < 13:
            percount[j] += 1
            diff -= 1
        elif diff < 0 and percount[j] > 1:
            percount[j] -= 1
            diff += 1
        i += 1
    okeys = np.repeat(np.arange(no, dtype=np.int64), percount)
    lnum = np.concatenate([np.arange(1, k + 1, dtype=np.int32) for k in percount])
    qty = rng.integers(1, 51, nl).astype(np.float64)
    out["lineitem"] = {
        "l_orderkey": okeys,
        "l_partkey": rng.integers(0, np_, nl).astype(np.int64),
        "l_suppkey": rng.integers(0, ns, nl).astype(np.int64),
        "l_linenumber": lnum,
        "l_quantity": qty,
        "l_extendedprice": np.round(qty * rng.uniform(900, 2100, nl), 2),
        "l_discount": np.round(rng.integers(0, 11, nl) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, nl) / 100.0, 2),
        "l_returnflag": [RETURNFLAGS[i] for i in rng.integers(0, 3, nl)],
        "l_linestatus": [LINESTATUSES[i] for i in rng.integers(0, 2, nl)],
        "l_shipdate": [
            odates[int(ok)] + timedelta(days=int(d))
            for ok, d in zip(okeys, rng.integers(1, 96, nl))
        ],
    }

    ne = n["events"]
    n_users = max(10, ne // 67)  # driver density: 150 users per 10k events
    out["events"] = {
        "event_id": np.arange(ne, dtype=np.int64),
        "ts": _dt_array(datetime(2024, 1, 1), 30 * 86400.0, ne, rng),
        "user_id": rng.integers(0, n_users, ne).astype(np.int64),
        "event_type": [EVENT_TYPES[i] for i in rng.integers(0, 5, ne)],
        "value": np.round(rng.uniform(0.01, 500.0, ne), 2),
        "props": [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, ne)],
    }

    nd = n["documents"]
    texts: list[str] = []
    for i in range(nd):
        if i >= 20 and i % 10 == 7:
            # near-dup plant: mutate ~10% of an earlier doc's words
            base = texts[int(rng.integers(0, i - 10))].split()
            for _ in range(max(1, len(base) // 10)):
                base[int(rng.integers(0, len(base)))] = VOCAB[int(rng.integers(0, len(VOCAB)))]
            texts.append(" ".join(base))
        else:
            k = int(rng.integers(10, 100))
            texts.append(" ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), k)))
    out["documents"] = {
        "doc_id": np.arange(nd, dtype=np.int64),
        "text": texts,
        "lang": [LANGS[i] for i in rng.choice(5, nd, p=LANG_W)],
        "source": [f"src{i}" for i in rng.integers(0, 20, nd)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    }

    nv = n["embeddings"]
    vecs = rng.normal(0, 1, (nv, 64)).astype(np.float32)
    for i in range(nv):
        if i >= 25 and i % 25 == 13:
            # ANN/semdedup plant: a noise-perturbed twin of an earlier vector
            vecs[i] = vecs[i - 13] + rng.normal(0, 0.05, 64).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    out["embeddings"] = {
        "vec_id": np.arange(nv, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
        "label": rng.integers(0, 10, nv).astype(np.int32),
    }

    for t in TABLES:
        ref_schema = pq.read_table(f"{src}/{t}.parquet").schema.remove_metadata()
        tbl = pa.table(out[t]).cast(ref_schema)
        pq.write_table(tbl, f"{dst}/{t}.parquet", compression="snappy")
        print(f"{t}: {tbl.num_rows} rows")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if not a.startswith("--seed")]
    seed = 7
    for a in sys.argv[1:]:
        if a.startswith("--seed"):
            seed = int(a.split("=", 1)[1]) if "=" in a else seed
    src = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    dst = argv[1] if len(argv) > 1 else "/root/repo/.seed7/sf0.01"
    build(src, dst, seed)
