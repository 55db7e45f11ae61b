"""Text-format edge: declared-schema scans, dead-letter accounting, and
typed round trips (the oracle-visible halves live in
plans/formats_queries.py; these cover the corrupt-record machinery the
hash oracle structurally cannot see).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from m2_b3_market_data_pipeline_spark.operators.dedup import release_cached
from m2_b3_market_data_pipeline_spark.sources.formats import (
    CORRUPT_COL,
    malformed_stats,
    read_csv,
    read_jsonl,
    write_jsonl,
)

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def test_csv_corrupt_rows_quarantined_not_dropped(spark, tmp_path):
    """PERMISSIVE + corrupt-record column: a malformed line lands in
    _corrupt with null fields — never silently dropped (DROPMALFORMED)
    and never fatal (FAILFAST)."""
    p = tmp_path / "feed.csv"
    p.write_text("k,v\n1,alpha\nnot-a-long,beta\n3,gamma\n")
    df = read_csv(spark, str(p), SCHEMA, keep_corrupt=True)
    rows = {r.k: (r.v, r[CORRUPT_COL]) for r in df.collect()}
    assert rows[1] == ("alpha", None)
    assert rows[3] == ("gamma", None)
    assert None in rows and rows[None][1] is not None  # quarantined line
    sdf = malformed_stats(df)
    stats = sdf.collect()[0]
    release_cached(sdf)
    assert (stats.n_rows, stats.n_malformed) == (3, 1)
    assert abs(stats.malformed_frac - 1 / 3) < 1e-6


def test_jsonl_corrupt_rows_quarantined(spark, tmp_path):
    p = tmp_path / "feed.jsonl"
    p.write_text('{"k": 1, "v": "a"}\nnot json at all\n{"k": 2, "v": "b"}\n')
    df = read_jsonl(spark, str(p), SCHEMA, keep_corrupt=True)
    sdf = malformed_stats(df)
    stats = sdf.collect()[0]
    release_cached(sdf)
    assert (stats.n_rows, stats.n_malformed) == (3, 1)
    good = {r.k for r in df.filter(F.col(CORRUPT_COL).isNull()).collect()}
    assert good == {1, 2}


def test_jsonl_nested_struct_round_trips_typed(spark, tmp_path):
    """Nested struct + timestamp survive the JSONL encoding at
    microsecond precision (the default millisecond timestampFormat
    silently truncates — pinned here)."""
    nested = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField(
                "payload",
                T.StructType([T.StructField("x", T.DoubleType())]),
            ),
        ]
    )
    src = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00.123456", 2.5)], "k long, ts string, x double"
    ).select(
        "k",
        F.col("ts").cast("timestamp").alias("ts"),
        F.struct("x").alias("payload"),
    )
    path = str(tmp_path / "nested")
    write_jsonl(src, path)
    back = read_jsonl(spark, path, nested)
    row = back.collect()[0]
    assert row.ts.microsecond == 123456
    assert row.payload.x == 2.5
    assert back.schema == nested


def test_csv_quoting_survives_adversarial_strings(spark, tmp_path):
    """Embedded separators, quotes, newlines, and unicode must survive
    write_csv -> read_csv intact — CSV quoting is the classic silent
    corruption source at text edges."""
    from m2_b3_market_data_pipeline_spark.sources.formats import write_csv

    rows = [
        (1, 'comma, inside'),
        (2, 'quote " inside'),
        (3, 'newline\ninside'),
        (4, 'both ", and\n"'),
        (5, 'unicode café 北京'),
        (6, ''),
        (7, None),
    ]
    src = spark.createDataFrame(rows, "k long, v string")
    path = str(tmp_path / "quoted")
    write_csv(src, path)
    # multiline=True: quoted embedded newlines span physical lines, so
    # the reader must not split on them (cost: single-task files — the
    # documented trade-off; JSONL is the policy for newline-bearing text)
    back = read_csv(spark, path, SCHEMA, multiline=True)
    got = {r.k: r.v for r in back.collect()}
    want = dict(rows)
    # CSV has no NULL-vs-empty-string distinction for unquoted empties:
    # both legitimately come back as NULL under Spark defaults.
    assert got[6] in ("", None) and got[7] is None
    del got[6], want[6], got[7], want[7]
    assert got == want


def test_orc_round_trips_typed_with_projection_pruning(spark, tmp_path):
    """ORC: µs timestamps and all primitive types survive exactly, and
    the declared schema PROJECTS — a reader declaring fewer columns than
    the file carries gets exactly those columns (producer additions
    can't widen downstream plans)."""
    import datetime as dt

    from m2_b3_market_data_pipeline_spark.sources.formats import read_orc, write_orc

    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("q", T.DoubleType()),
            T.StructField("s", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    micro = dt.datetime(2026, 3, 1, 12, 0, 0, 123456)
    rows = [(1, 1.5, "a,b\nc", micro), (2, float("inf"), "", None)]
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "orc")
    write_orc(df, path)
    back = {r.k: r for r in read_orc(spark, path, schema).collect()}
    assert back[1].ts == micro  # microseconds intact
    assert back[1].s == "a,b\nc" and back[2].s == ""
    assert back[2].q == float("inf") and back[2].ts is None
    # Projection: a narrower declared schema returns only those fields.
    narrow = T.StructType([T.StructField("k", T.LongType())])
    assert read_orc(spark, path, narrow).columns == ["k"]
