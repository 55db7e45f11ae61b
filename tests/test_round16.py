"""Round-16 (second optimization round) focused tests: the r15 advisor
closures (approx_distinct_check NULL-group join, bare-PIL probe
fall-through, VP8L duplicated simple-code rejection) and the operator
internals this round's optimizations touch."""

from __future__ import annotations

import sys

import pytest

from pyspark.sql import functions as F


def test_approx_distinct_check_keeps_null_event_type(spark, tmp_path):
    """The split exact/HLL legs rejoin NULL-SAFELY: an event_type=NULL
    group (planted by the adversarial fixture) must survive the join —
    a plain equi-join silently drops it while the DuckDB oracle's
    GROUP BY keeps it (r15 advice, high)."""
    from m2_b3_market_data_pipeline_spark.plans.all_queries import QUERIES

    d = tmp_path / "sf"
    d.mkdir()
    spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:01", "click", 10, 1.0, "{}"),
            (2, "2024-01-01 00:00:02", "click", 11, 1.0, "{}"),
            (3, "2024-01-01 00:00:03", None, 12, 1.0, "{}"),
            (4, "2024-01-01 00:00:04", None, 12, 1.0, "{}"),
            (5, "2024-01-01 00:00:05", None, 13, 1.0, "{}"),
        ],
        "event_id bigint, ts string, event_type string, user_id bigint,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
        str(d / "events.parquet")
    )
    rows = {
        r["event_type"]: r
        for r in QUERIES["approx_distinct_check"](spark, str(d)).collect()
    }
    assert set(rows) == {"click", None}
    assert rows[None]["exact_users"] == 2
    assert rows[None]["within_5pct"] is True
    assert rows["click"]["exact_users"] == 2


def test_bare_pil_import_does_not_disable_probe(monkeypatch):
    """A ``sys.modules['PIL']`` entry WITHOUT an Image attribute (a bare
    ``import PIL`` ran first — Pillow's __init__ does not import the
    submodule) must fall through to the cached probe instead of
    permanently returning None (r15 advice, low)."""
    import types

    from m2_b3_market_data_pipeline_spark.operators import multimodal

    bare = types.ModuleType("PIL")  # simulates `import PIL` with no Image
    monkeypatch.setitem(sys.modules, "PIL", bare)
    sentinel = object()
    monkeypatch.setattr(multimodal, "_PIL_CACHE", sentinel)
    assert multimodal._pil_image() is sentinel
    # and a module that DOES carry Image is still honored directly
    bare.Image = object()
    assert multimodal._pil_image() is bare.Image


def test_vp8l_simple_code_duplicate_symbols_rejected():
    """A malformed simple 2-symbol code with sym0 == sym1 collapses the
    lengths dict to one entry; the reader must reject it instead of
    silently decoding (symbol 0, 0 bits) from LUT slot 1 (r15 advice,
    low)."""
    from m2_b3_market_data_pipeline_spark.operators.webp import (
        _BitReader,
        _read_prefix_code,
    )

    # simple-code header: 1 (simple), 1 (two symbols), 1 (first 8-bit),
    # sym0 = 7 (8 bits), sym1 = 7 (8 bits)
    bits = 0b1 | (0b1 << 1) | (0b1 << 2) | (7 << 3) | (7 << 11)
    data = bits.to_bytes(4, "little")
    with pytest.raises(ValueError, match="must differ"):
        _read_prefix_code(_BitReader(data), 256)
