"""Round-12 additions: the pre-round-11 flat-store upgrade path for
the incremental sinks, the byte-true shuffle-switch stat, and the
banded-layout plane-stride guard (r11 advisor orders).
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_migrate_flat_store_moves_only_data(tmp_path):
    """Pure-fs contract: root-level parquet files and centroid_id=*
    cell dirs move into batch=-1; markers, hidden files, _SUCCESS and
    existing batch=* partitions stay put; second call is a no-op."""
    from m2_b3_market_data_pipeline_spark.streaming.agg_sink import (
        _migrate_flat_store,
    )

    state = tmp_path / "store"
    state.mkdir()
    (state / "part-0000.parquet").write_bytes(b"pq")
    (state / "part-0001.parquet").write_bytes(b"pq")
    (state / "centroid_id=3").mkdir()
    (state / "centroid_id=3" / "part-0000.parquet").write_bytes(b"pq")
    (state / "_applied_batch_id").write_text("0")
    (state / "_SUCCESS").write_text("")
    (state / ".hidden").write_text("")
    (state / "batch=5").mkdir()
    (state / "batch=5" / "part-0000.parquet").write_bytes(b"pq")

    assert _migrate_flat_store(str(state)) is True
    moved = sorted(os.listdir(state / "batch=-1"))
    assert moved == ["centroid_id=3", "part-0000.parquet", "part-0001.parquet"]
    root = sorted(os.listdir(state))
    assert root == [".hidden", "_SUCCESS", "_applied_batch_id", "batch=-1", "batch=5"]
    # Idempotent: nothing left to move.
    assert _migrate_flat_store(str(state)) is False
    # Absent dir: no-op, no crash.
    assert _migrate_flat_store(str(tmp_path / "nope")) is False


def _flatten_batch0(state: str) -> None:
    """Rewrite a round-11 store into the pre-round-11 flat layout:
    batch=0's contents land directly under state_path (the old swap
    layout), the batch dir disappears, the marker stays."""
    b0 = os.path.join(state, "batch=0")
    for name in os.listdir(b0):
        if name.startswith(("_", ".")):
            continue
        os.rename(os.path.join(b0, name), os.path.join(state, name))
    import shutil

    shutil.rmtree(b0)


def test_near_dedup_sink_migrates_pre_r11_flat_store(spark, sf_dir, tmp_path):
    """Upgrade path (r11 advisor, medium): a flat pre-round-11
    signature store must NOT read as an empty corpus. Drain wave 0,
    flatten its store to the old layout, then drain wave 1 under the
    same checkpoint — the pairs must equal the clean incremental
    admission of wave 1 vs wave 0, and read_signatures must see both
    waves (the old rows were unreachable before the migration)."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        minhash_incremental_pairs,
        release_cached,
    )
    from m2_b3_market_data_pipeline_spark.plans.registry import load
    from m2_b3_market_data_pipeline_spark.streaming.near_dedup_sink import (
        read_pairs,
        read_signatures,
        run_incremental_dedup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    waves = [docs.filter(F.col("doc_id") % 2 == w) for w in range(2)]

    updates = str(tmp_path / "in")
    state = str(tmp_path / "sigs")
    pairs_out = str(tmp_path / "pairs")
    ckpt = str(tmp_path / "ckpt")

    def run():
        run_incremental_dedup_stream(
            spark, updates_path=updates, state_path=state,
            pairs_path=pairs_out, checkpoint_path=ckpt,
            schema=schema, threshold=0.4,
        ).awaitTermination(120)

    waves[0].write.parquet(f"{updates}/b0")
    run()
    _flatten_batch0(state)

    waves[1].write.parquet(f"{updates}/b1")
    run()

    got = {
        (r.delta_id, r.corpus_id, round(r.jaccard, 6))
        for r in read_pairs(spark, pairs_out).collect()
    }
    want_df = minhash_incremental_pairs(waves[1], waves[0], threshold=0.4)
    want = {
        (r.delta_id, r.corpus_id, round(r.jaccard, 6))
        for r in want_df.collect()
    }
    release_cached(want_df)
    assert got == want
    assert got, "fixture yields cross-wave near-dups at threshold 0.4"
    # Migration, not just admission: the old rows are reachable again,
    # under the batch=-1 partition.
    sigs = read_signatures(spark, state)
    assert sigs.count() == docs.count()
    assert os.path.isdir(os.path.join(state, "batch=-1"))


def test_semdedup_sink_migrates_pre_r11_flat_store(spark, sf_dir, tmp_path):
    """Semdedup twin of the flat-store upgrade test: the old layout is
    centroid_id=* cell dirs directly under state_path. After the
    migration, wave 1 must be pruned against wave 0's survivors and
    read_assigned must see the full surviving corpus."""
    from m2_b3_market_data_pipeline_spark.operators.embeddings import (
        lsh_cell_assigner,
        semdedup_prune_assigned,
    )
    from m2_b3_market_data_pipeline_spark.plans.registry import load
    from m2_b3_market_data_pipeline_spark.streaming.semdedup_sink import (
        read_assigned,
        read_decisions,
        run_semdedup_stream,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    waves = [emb.filter(F.col("vec_id") % 2 == w) for w in range(2)]
    assigner = lsh_cell_assigner(dim=64, cell_bits=3)

    updates = str(tmp_path / "in")
    state = str(tmp_path / "store")
    dec_out = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt")

    def run():
        run_semdedup_stream(
            spark, updates_path=updates, state_path=state,
            decisions_path=dec_out, checkpoint_path=ckpt,
            schema=schema, assign_fn=assigner, threshold=0.25,
        ).awaitTermination(120)

    waves[0].write.parquet(f"{updates}/b0")
    run()
    _flatten_batch0(state)

    waves[1].write.parquet(f"{updates}/b1")
    run()

    got = {
        (r.vec_id, r.pruned)
        for r in read_decisions(spark, dec_out).collect()
    }
    a0, a1 = assigner(waves[0]), assigner(waves[1])
    dec1 = semdedup_prune_assigned(a1, a0, threshold=0.25).collect()
    want = {(r.vec_id, False) for r in a0.select("vec_id").collect()} | {
        (r.vec_id, r.pruned) for r in dec1
    }
    assert got == want
    assert any(p for _, p in got), "threshold chosen to prune something"
    state_ids = {r.vec_id for r in read_assigned(spark, state).collect()}
    assert state_ids == {v for v, p in want if not p}


def test_banded_near_dup_rejects_overlapping_plane_families(spark):
    """plane_stride < band_bits would make bands share hyperplanes —
    correlated band values, broken independence math (r11 advisor)."""
    from m2_b3_market_data_pipeline_spark.operators.similarity import (
        banded_near_dup_pairs,
    )

    df = spark.range(1).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(0.1)] * 4).alias("embedding"),
    )
    with pytest.raises(ValueError, match="plane_stride"):
        banded_near_dup_pairs(
            df, dim=4, threshold=0.9, band_bits=8, n_bands=2, plane_stride=4
        )


def test_dedup_switch_counts_bytes_not_chars(spark):
    """The shuffle-switch stat must be octet_length: a CJK shingle is
    ~3 bytes/char in UTF-8, and the threshold is byte-denominated.
    Pin the aggregate itself (unit-level, no full dedup run)."""
    df = spark.createDataFrame([("世界",), ("ab",)], ["s"])
    got = df.agg(
        F.sum(F.octet_length("s")).alias("b"),
        F.sum(F.length("s")).alias("c"),
    ).collect()[0]
    assert got["b"] == 6 + 2 and got["c"] == 4
    # And the switch's source actually uses octet_length now.
    import inspect

    from m2_b3_market_data_pipeline_spark.operators import dedup

    src = inspect.getsource(dedup.minhash_dedup_pairs)
    assert "octet_length" in src


def _evidence_age_mod():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "evidence_age",
        os.path.join(os.path.dirname(__file__), "..", "tools", "evidence_age.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_test_pinned_tier_is_justified():
    """The evidence-consolidation tier (r11 verdict item 1) is
    self-policing: every demoted query maps to a rotating
    representative that is registered, oracle-backed, and not itself
    demoted; nothing enters the tier unevidenced (each member has a
    historical green driver row, or is a rows-only sketch whose
    representative is its hash-checked accuracy companion); and the
    post-demotion rotation fits the freshness budget with margin."""
    from m2_b3_market_data_pipeline_spark.plans import all_queries

    ea = _evidence_age_mod()
    newest, _ = ea.newest_green()
    for name, rep in ea.TEST_PINNED.items():
        assert name in all_queries.QUERIES, name
        assert rep in all_queries.QUERIES, rep
        assert rep in all_queries.ORACLES, f"{rep} must be hash-checkable"
        assert rep not in ea.TEST_PINNED, f"{rep} must itself rotate"
        assert rep != ea.ANCHOR or rep == "refined_pipeline"
        assert newest.get(rep), f"{rep} needs a green driver row"
        if name in all_queries.ORACLES:
            assert newest.get(name), f"{name} demoted without any green row"

    # Budget: rotating set cycles within MAX_AGE rounds of 49 slots.
    rotating = [
        n
        for n in all_queries.ORACLES
        if n not in ea.TEST_PINNED
        and n not in ea.DELIBERATE_NO_HASH
        and n != ea.ANCHOR
    ]
    budget = 49 * ea.MAX_AGE
    # Headroom note (late r14): the margin dropped 8 -> 7 for ONE round
    # to let the decoded_rebalanced_check newborn earn its first direct
    # driver row (the tier rules above rightly refuse an unevidenced
    # demotion). r15 flips the oracle-identical pair — the rebalanced
    # superset rotates, decoded_phash_check pins behind it — restoring
    # the margin. 189 rotating / 49 slots = 3.86 rounds, still inside
    # MAX_AGE=4.
    assert len(rotating) <= budget - 7, (
        f"{len(rotating)} rotating queries vs {budget} slot-budget: "
        "retire/demote more family duplicates or the freshness gate "
        "breaks mechanically (BASELINE.md round-12 window-budget note)"
    )


def test_bpe_learn_merges_matches_duckdb_trainer(spark, sf_dir):
    """The unrolled-CTE DuckDB trainer (r11 verdict item 2) agrees with
    the Spark trainer merge-for-merge at sf0.001 — the in-suite tier of
    the driver row bpe_learn_merges now earns."""
    import duckdb

    from m2_b3_market_data_pipeline_spark.plans import all_queries

    sdf = all_queries.QUERIES["bpe_learn_merges"](spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    odf = con.execute(all_queries.ORACLES["bpe_learn_merges"]).df()
    con.close()
    got = [tuple(r) for r in sdf.itertuples(index=False, name=None)]
    want = [tuple(r) for r in odf.itertuples(index=False, name=None)]
    assert got == want
    assert len(got) == 16


def test_mmr_greedy_multi_matches_single_chains(spark, sf_dir):
    """The folded multi-chain greedy (r11 verdict item 5) must pick
    EXACTLY what per-chain mmr_greedy picks — same ids, ranks, and
    6dp scores — for every pool shape the recall gate uses (full set,
    prefix shortlists, band filter)."""
    from m2_b3_market_data_pipeline_spark.operators.retrieval import (
        mmr_greedy,
        mmr_greedy_multi,
        mmr_reach_band,
        mmr_relevance,
    )
    from m2_b3_market_data_pipeline_spark.plans.registry import load

    emb = load(spark, sf_dir, "embeddings")
    cand = mmr_relevance(emb).cache()
    pool = cand.orderBy(F.desc("rel"), "vec_id").limit(16).cache()
    try:
        rels = sorted((r["rel"] for r in pool.collect()), reverse=True)
        rk = rels[7] if len(rels) >= 8 else rels[-1]
        band = cand.filter(F.col("rel") >= rk - mmr_reach_band(0.7))
        pools = {
            "exact": cand,
            "s8": pool.orderBy(F.desc("rel"), "vec_id").limit(8),
            "band": band,
        }
        multi = mmr_greedy_multi(pools, k=8, lam=0.7)
        for tag, p in pools.items():
            single = [
                (r["rank"], r["vec_id"], r["mmr_score"])
                for r in mmr_greedy(p, k=8, lam=0.7).collect()
            ]
            assert multi[tag] == single, tag
        assert len(multi["exact"]) == 8
    finally:
        pool.unpersist()
        cand.unpersist()


def _make_bmp(width, height, pixel, *, top_down=False):
    """Pure-stdlib 24-bit BI_RGB BMP writer for fixtures: ``pixel`` is
    (x, y) -> (r, g, b) with y=0 the TOP row; rows pad to 4 bytes.
    Emits bottom-up (positive height) by default, top-down on request —
    both layouts the decoder must handle."""
    import struct

    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    rows = []
    ys = range(height) if top_down else range(height - 1, -1, -1)
    for y in ys:
        row = bytearray()
        for x in range(width):
            r, g, b = pixel(x, y)
            row += bytes((b, g, r))  # BMP stores BGR
        rows.append(bytes(row) + pad)
    px = b"".join(rows)
    data_offset = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", data_offset + len(px), 0, 0, data_offset)
    info = struct.pack(
        "<IiiHHIIiiII",
        40, width, -height if top_down else height, 1, 24, 0,
        len(px), 2835, 2835, 0, 0,
    )
    return hdr + info + px


def test_bmp_decode_exact_pixels():
    """The stdlib BMP decoder (r11 verdict item 6) recovers EXACT RGB
    pixels: odd width (row padding exercised), bottom-up AND top-down
    layouts, corners pinned; malformed payloads fail loud."""
    import pytest as _pytest

    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_bmp,
        decode_image,
    )

    def pixel(x, y):
        return (x * 40 % 256, y * 80 % 256, (x + y) * 10 % 256)

    for top_down in (False, True):
        data = _make_bmp(5, 3, pixel, top_down=top_down)
        img = decode_image(data)  # in-container: the non-stubbed path
        assert (img.width, img.height) == (5, 3)
        got = {
            (x, y): tuple(img.pixels[(y * 5 + x) * 3 : (y * 5 + x) * 3 + 3])
            for y in range(3)
            for x in range(5)
        }
        for y in range(3):
            for x in range(5):
                assert got[(x, y)] == pixel(x, y), (x, y, top_down)

    with _pytest.raises(ValueError, match="not a BMP"):
        _decode_bmp(b"JUNK" * 20)
    with _pytest.raises(ValueError, match="8/24/32-bit"):
        import struct

        # 16bpp stays unsupported (r14 widened coverage to 8/24/32)
        bad = bytearray(_make_bmp(2, 2, lambda x, y: (0, 0, 0)))
        struct.pack_into("<H", bad, 28, 16)
        _decode_bmp(bytes(bad))
    with _pytest.raises(ValueError, match="truncated"):
        _decode_bmp(_make_bmp(4, 4, lambda x, y: (0, 0, 0))[:-8])


def test_decoded_image_features_end_to_end(spark):
    """Real decode -> phash over DECODED pixels, through the Spark
    mapInPandas path (the done-criterion of r11 verdict item 6): BMP
    payloads built in-test, decoded non-stubbed in-container; the
    phash matches a driver-side recompute, a near-identical image
    lands within small Hamming distance of its original while a
    structurally different one lands far, and an undecodable payload
    is skipped, not poisoned."""
    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        decode_image,
        decoded_image_features,
        luma_histogram,
        pixel_phash,
    )

    def gradient(x, y):
        return (x * 8 % 256, y * 8 % 256, 128)

    def gradient_noise(x, y):  # slight brightness ripple, same structure
        r, g, b = gradient(x, y)
        d = 3 if (x + y) % 2 else -3
        return (min(255, max(0, r + d)), g, b)

    def checker(x, y):  # structurally different
        v = 255 if (x // 4 + y // 4) % 2 else 0
        return (v, v, v)

    payloads = [
        (1, _make_bmp(32, 32, gradient)),
        (2, _make_bmp(32, 32, gradient_noise)),
        (3, _make_bmp(32, 32, checker)),
        (4, b"not an image at all"),
    ]
    df = spark.createDataFrame(payloads, "doc_id long, content binary")
    out = {
        r["doc_id"]: r
        for r in decoded_image_features(df).collect()
    }
    assert set(out) == {1, 2, 3}, "undecodable payload skipped"
    img1 = decode_image(payloads[0][1])
    want_ph = pixel_phash(img1)
    got_ph = out[1]["phash64"] % (1 << 64)
    assert got_ph == want_ph
    assert out[1]["luma_hist"] == luma_histogram(img1)
    assert (out[1]["width"], out[1]["height"]) == (32, 32)

    def ham(a, b):
        return bin((a % (1 << 64)) ^ (b % (1 << 64))).count("1")

    near = ham(out[1]["phash64"], out[2]["phash64"])
    far = ham(out[1]["phash64"], out[3]["phash64"])
    assert near <= 6, f"near-dup pair too far: {near}"
    assert far >= 16, f"different images too close: {far}"


def _make_wav(samples, *, rate=8000, channels=1, bits=16):
    """Pure-stdlib PCM WAV writer for fixtures (RIFF/WAVE, fmt 1)."""
    import struct

    if bits == 16:
        raw = struct.pack(f"<{len(samples)}h", *samples)
    else:
        raw = bytes((s + 128) & 0xFF for s in samples)
    align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * align, align, bits)
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_ppm_decode_exact_pixels():
    """Binary PPM (P6) joins the stdlib decode chain: header with
    comments, exact pixels, truncation fails loud."""
    import pytest as _pytest

    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        decode_image,
    )

    def pixel(x, y):
        return (x * 30 % 256, y * 60 % 256, (x * y) % 256)

    px = b"".join(
        bytes(pixel(x, y)) for y in range(3) for x in range(4)
    )
    data = b"P6\n# a comment\n4 3\n255\n" + px
    img = decode_image(data)
    assert (img.width, img.height) == (4, 3)
    assert img.pixels == px
    with _pytest.raises(ValueError, match="truncated PPM/PGM pixel"):
        decode_image(data[:-2])
    # 16-bit P6 at maxval 65535 became a real leg late in r14 (high-
    # byte reduction, the png-16 convention) — it decodes now; odd
    # wide maxvals still fail loud on the rounding-convention guard
    img16 = decode_image(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    assert (img16.width, img16.height) == (2, 2)
    with _pytest.raises(ValueError, match="maxval"):
        decode_image(b"P6\n2 2\n1023\n" + b"\x00" * 24)


def test_wav_decode_and_frame_rms_end_to_end(spark):
    """Real PCM WAV decode -> per-frame RMS through Spark mapInPandas:
    a loud-then-quiet square wave must show the energy step in the
    DECODED-sample domain (amplitudes 1000 vs 100 — invisible to the
    byte-domain stand-in at the same byte length), RMS matches a
    driver-side recompute exactly, 8-bit and stereo payloads decode,
    and non-WAV payloads are skipped."""
    import math

    from m2_b3_market_data_pipeline_spark.operators.multimodal import (
        _decode_wav,
        decoded_frame_energy,
    )

    loud = [1000 if i % 2 else -1000 for i in range(512)]
    quiet = [100 if i % 2 else -100 for i in range(512)]
    wav16 = _make_wav(loud + quiet)
    rate, ch, samples = _decode_wav(wav16)
    assert (rate, ch) == (8000, 1)
    assert samples == loud + quiet

    wav8 = _make_wav([50, -50, 25, -25] * 16, bits=8)
    assert _decode_wav(wav8)[2][:4] == [50, -50, 25, -25]
    stereo = _make_wav([7, -7] * 32, channels=2)
    assert _decode_wav(stereo)[1] == 2

    df = spark.createDataFrame(
        [(1, wav16), (2, wav8), (3, b"definitely not audio bytes")],
        "doc_id long, content binary",
    )
    rows = decoded_frame_energy(df, frames=4).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], {})[r["frame_idx"]] = r["rms"]
    assert set(by_doc) == {1, 2}
    # frames 0-1 cover the loud half, 2-3 the quiet half
    assert by_doc[1][0] == by_doc[1][1] == 1000.0
    assert by_doc[1][2] == by_doc[1][3] == 100.0
    # exact driver-side recompute of one frame
    n = len(loud + quiet)
    win = (loud + quiet)[n // 4 : n // 2]
    assert by_doc[1][1] == math.sqrt(sum(s * s for s in win) / len(win))
    assert all(r["sample_rate"] == 8000 for r in rows if r["doc_id"] == 1)


def test_incremental_cross_pairs_shuffle_switch(spark):
    """The fifth-decade streaming finding (round 12): the incremental
    band/verify joins must pin to SORT-MERGE past the doc threshold —
    at 3.05M stored docs the auto-broadcast of the corpus-sized sides
    died on spark.driver.maxResultSize mid-drain. force_shuffle=True
    plans SortMergeJoin with zero BroadcastHashJoin; the small-corpus
    default keeps the (faster there) broadcast plan; pair OUTPUT is
    identical under both strategies."""
    from m2_b3_market_data_pipeline_spark.operators.dedup import (
        _cross_pairs_from_signed,
        fan_out,
        with_minhash,
    )

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta eta theta doc{i % 3}")
         for i in range(12)],
        "doc_id long, text string",
    )
    d = with_minhash(fan_out(docs.filter("doc_id % 2 = 0"))).persist()
    c = with_minhash(fan_out(docs.filter("doc_id % 2 = 1"))).persist()
    try:
        forced = _cross_pairs_from_signed(d, c, threshold=0.3, force_shuffle=True)
        plan = forced._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "BroadcastHashJoin" not in plan
        auto = _cross_pairs_from_signed(d, c, threshold=0.3)  # tiny: stays broadcast-eligible
        got_f = {(r.delta_id, r.corpus_id, r.jaccard) for r in forced.collect()}
        got_a = {(r.delta_id, r.corpus_id, r.jaccard) for r in auto.collect()}
        assert got_f == got_a and got_f, "strategy must not change pairs"
    finally:
        d.unpersist()
        c.unpersist()
