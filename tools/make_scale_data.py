"""Deterministic scale-up replicator for the bench fixtures.

Builds an sf-N directory from an sf-M one by replicating every table
``factor`` times with consistent key offsets — TPC-H-style scaling
where DIMENSIONS grow with facts (each lineitem/orders replica points
at its own customer/supplier/part replica), not the
identical-twin replication of the earlier one-off probes:

- relational keys: ``key' = key + r * BASE`` with BASE = the next
  power of 10 above the source max, so replica key spaces never
  collide and mod-based selections (vec_id % k == 0) keep the same
  relative density in every replica;
- entity names get a ``_r<r>`` suffix so replicas are distinct
  entities under name-keyed group-bys;
- documents: replica r > 0 of doc i is a half-and-half SPLICE of doc i
  and doc (i + 137 r) mod N — the realistic crawl shape (duplicated
  half-doc spans, few full near-twins) instead of 9 exact copies per
  doc, whose pair blow-up (45x, round-6 probe) says more about the
  replicator than the operator;
- embeddings: replica r rotates the vector by r positions — norm and
  component distribution preserved, vectors genuinely distinct;
- events: new user populations in the same time window (density
  scaling, the shape a 10x traffic year lands in).

Usage:
    python tools/make_scale_data.py SRC_DIR DST_DIR FACTOR [--tables a,b]
    python tools/make_scale_data.py /root/testdata/sf0.1 .scale/sf1 10

``--tables`` writes only the named tables (round 10: the sf10 dir
already carries real documents/embeddings; the graph-family witnesses
additionally need a real 10x lineitem, not the sf1 symlink).
"""

from __future__ import annotations

import math
import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _base(df: DataFrame, key: str) -> int:
    mx = df.agg(F.max(key)).collect()[0][0] or 0
    return 10 ** (int(math.log10(mx)) + 1) if mx > 0 else 10


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    """Cross the frame with replica ids 0..factor-1 (explode of a
    literal array: zero-shuffle projection)."""
    return df.withColumn(
        "__r", F.explode(F.array(*[F.lit(i) for i in range(factor)]))
    )


def _offset(col: str, base: int):
    return (F.col(col) + F.col("__r") * F.lit(base)).alias(col)


def _suffix(col: str):
    return F.when(F.col("__r") == 0, F.col(col)).otherwise(
        F.concat(F.col(col), F.lit("_r"), F.col("__r"))
    ).alias(col)


def main(src: str, dst: str, factor: int, tables: list[str] | None = None) -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("make_scale_data")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # A 10x lineitem replica shuffles ~60M rows through the final
        # repartition; the stock 1g driver heap GC-thrashes (observed:
        # GCLocker retry warnings, then a dead write). Generator-only
        # setting — engine sessions size theirs in session.py.
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    t = {n: spark.read.parquet(f"{src}/{n}.parquet") for n in TABLES}
    ok_b = _base(t["lineitem"], "l_orderkey")
    ck_b = _base(t["customer"], "c_custkey")
    sk_b = _base(t["supplier"], "s_suppkey")
    pk_b = _base(t["part"], "p_partkey")
    ev_b = _base(t["events"], "event_id")
    us_b = _base(t["events"], "user_id")
    dk_b = _base(t["documents"], "doc_id")
    vk_b = _base(t["embeddings"], "vec_id")

    out: dict[str, DataFrame] = {}
    out["region"] = t["region"]
    out["nation"] = t["nation"]
    out["customer"] = _replicate(t["customer"], factor).select(
        _offset("c_custkey", ck_b), _suffix("c_name"),
        "c_nationkey", "c_acctbal", "c_mktsegment",
    )
    out["supplier"] = _replicate(t["supplier"], factor).select(
        _offset("s_suppkey", sk_b), _suffix("s_name"), "s_nationkey", "s_acctbal"
    )
    out["part"] = _replicate(t["part"], factor).select(
        _offset("p_partkey", pk_b), _suffix("p_name"),
        "p_brand", "p_type", "p_size", "p_retailprice",
    )
    out["orders"] = _replicate(t["orders"], factor).select(
        _offset("o_orderkey", ok_b), _offset("o_custkey", ck_b),
        "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
    )
    out["lineitem"] = _replicate(t["lineitem"], factor).select(
        _offset("l_orderkey", ok_b), _offset("l_partkey", pk_b),
        _offset("l_suppkey", sk_b), "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    )
    out["events"] = _replicate(t["events"], factor).select(
        _offset("event_id", ev_b), "ts", _offset("user_id", us_b),
        "event_type", "value", "props",
    )

    docs = t["documents"]
    n_docs = docs.count()
    rep = _replicate(docs.select("doc_id", "text", "lang", "source"), factor)
    partner_id = (F.col("doc_id") + F.lit(137) * F.col("__r")) % F.lit(n_docs)
    rep = rep.withColumn("__pid", partner_id)
    ptexts = docs.select(
        F.col("doc_id").alias("__pid"), F.col("text").alias("__ptext")
    )
    tk = F.split(F.col("text"), " ")
    ptk = F.split(F.col("__ptext"), " ")
    half = F.ceil(F.size(tk) / 2).cast("int")
    phalf = F.floor(F.size(ptk) / 2).cast("int")
    spliced = F.concat_ws(
        " ",
        F.concat(
            F.slice(tk, F.lit(1), half),
            F.slice(ptk, phalf + 1, F.size(ptk) - phalf),
        ),
    )
    new_text = F.when(F.col("__r") == 0, F.col("text")).otherwise(spliced)
    out["documents"] = (
        rep.join(ptexts, "__pid")
        .select(
            _offset("doc_id", dk_b),
            new_text.alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )

    dim = t["embeddings"].select(F.max(F.size("embedding"))).collect()[0][0]
    emb = F.col("embedding")
    rot = F.when(F.col("__r") == 0, emb).otherwise(
        F.concat(
            F.slice(emb, F.col("__r") + 1, F.lit(dim) - F.col("__r")),
            F.slice(emb, F.lit(1), F.col("__r")),
        )
    )
    out["embeddings"] = _replicate(t["embeddings"], factor).select(
        _offset("vec_id", vk_b), rot.alias("embedding"), "label"
    )

    for name, df in out.items():
        if tables and name not in tables:
            continue
        # Splits proportional to volume (the shape a real 10x crawl
        # lands in): factor files per table for the replicated ones.
        parts = factor if name not in ("region", "nation") else 1
        df.repartition(parts).write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"wrote {name}: {spark.read.parquet(f'{dst}/{name}.parquet').count()} rows")
    spark.stop()


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    only = None
    if "--tables" in argv:
        i = argv.index("--tables")
        only = argv[i + 1].split(",")
        del argv[i : i + 2]
    src, dst, factor = argv[0], argv[1], int(argv[2])
    main(src, dst, factor, tables=only)
