"""Reference-surface queries: the operator inventory of SURVEY.md §2.

Each query exercises one (or one cluster of) reference operators on the
driver fixtures, with a DuckDB oracle. OHLCV inputs are derived
deterministically from ``events`` (FIXTURES.md §1, plans/ohlcv.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import asset_aggregates, enrich_with_aggregates_join
from ..operators.normalize import REFERENCE_RENAMES, coalesce_duplicate_columns, rename_columns
from ..operators.rolling import rolling_mean
from .ohlcv import OHLCV_SQL, derive_ohlcv, load_events
from .pipeline import transform
from .registry import load, register

_REFINED_COLS = [
    "ativo",
    "date",
    "open",
    "high",
    "low",
    "close_price",
    "trade_volume",
    "mm_7d",
    "avg_close_price",
    "total_volume",
]


@register(
    "refined_pipeline",
    oracle=OHLCV_SQL
    + """
, w AS (
    SELECT ativo, "date", "Open" AS open, "High" AS high, "Low" AS low,
           close_price, trade_volume,
           CASE WHEN COUNT(close_price) OVER win >= 7
                THEN ROUND(AVG(close_price) OVER win, 6) END AS mm_7d
    FROM ohlcv
    WINDOW win AS (PARTITION BY ativo ORDER BY "date"
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT ativo, "date", open, high, low, close_price, trade_volume, mm_7d,
       ROUND(AVG(close_price) OVER (PARTITION BY ativo), 6) AS avg_close_price,
       CAST(SUM(trade_volume) OVER (PARTITION BY ativo) AS BIGINT) AS total_volume
FROM w
""",
)
def refined_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference ETL (B -> C -> A -> J1) end-to-end
    (reference: etl/etl_job.py:101-142). Flagship query."""
    raw = derive_ohlcv(load_events(spark, sf_dir))
    out = transform(raw)
    return out.select(
        "ativo",
        "date",
        F.col("Open").alias("open"),
        F.col("High").alias("high"),
        F.col("Low").alias("low"),
        "close_price",
        "trade_volume",
        "mm_7d",
        "avg_close_price",
        "total_volume",
    )


_REFINED_ORACLE_TAIL = """
, w AS (
    SELECT ativo, "date", "Open" AS open, "High" AS high, "Low" AS low,
           close_price, trade_volume,
           CASE WHEN COUNT(close_price) OVER win >= 7
                THEN ROUND(AVG(close_price) OVER win, 6) END AS mm_7d
    FROM ohlcv
    WINDOW win AS (PARTITION BY ativo ORDER BY "date"
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT ativo, "date", open, high, low, close_price, trade_volume, mm_7d,
       ROUND(AVG(close_price) OVER (PARTITION BY ativo), 6) AS avg_close_price,
       CAST(SUM(trade_volume) OVER (PARTITION BY ativo) AS BIGINT) AS total_volume
FROM w
"""


@register("refined_write_roundtrip", oracle=OHLCV_SQL + _REFINED_ORACLE_TAIL)
def refined_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 + S5 under the hash oracle: the refined result is written
    through ``write_refined`` (Hive layout ``ativo=<a>/data=<d>``,
    partition columns dropped from the data files — reference:
    etl/etl_job.py:144-166) and read BACK from the directory tree; the
    oracle is the direct computation, so a hash match proves the
    partitioned write/read round trip is lossless, including the
    partition values re-derived from directory names. The write target
    is recreated per run (plain overwrite would leave stale partitions
    from a previous fixture generation in dynamic mode)."""
    import os
    import shutil
    import tempfile

    from ..sources.parquet_io import write_refined

    out = refined_pipeline(spark, sf_dir).withColumn(
        "data", F.date_format("date", "yyyy-MM-dd")
    )
    target = os.path.join(
        tempfile.gettempdir(),
        "m2b3_refined_roundtrip",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(target, ignore_errors=True)
    write_refined(out, target, partition_by=("ativo", "data"))
    if not os.path.exists(target):
        # The S9 empty-input guard skipped the write: an empty refined
        # batch round-trips to an empty refined relation, it does not
        # crash the read (empty-input gate, round 8).
        return out.select(
            F.col("ativo").cast("string").alias("ativo"), *_REFINED_COLS[1:]
        ).limit(0)
    back = spark.read.parquet(target)
    # `ativo` comes back from the directory layout; `data` (the layout
    # duplicate of `date`) is dropped again. Inference may type the
    # partition value, so pin the original string type.
    return back.select(
        F.col("ativo").cast("string").alias("ativo"), *_REFINED_COLS[1:]
    )


@register(
    "rolling_mean_7",
    oracle=OHLCV_SQL
    + """
SELECT ativo, "date", close_price,
       CASE WHEN COUNT(close_price) OVER win >= 7
            THEN ROUND(AVG(close_price) OVER win, 6) END AS mm_7d
FROM ohlcv
WINDOW win AS (PARTITION BY ativo ORDER BY "date"
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
)
def rolling_mean_7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 alone: 7-row trailing mean with the min_periods NULL guard
    (reference: etl/etl_job.py:125-130)."""
    bars = derive_ohlcv(load_events(spark, sf_dir))
    bars = rename_columns(bars, {"Date": "date", "Close": "close_price"})
    expr = rolling_mean("close_price", window_rows=7, partition_by=["ativo"], order_by=["date"])
    return bars.select("ativo", "date", "close_price", F.round(expr, 6).alias("mm_7d"))


@register(
    "asset_aggregates",
    oracle=OHLCV_SQL
    + """
SELECT ativo,
       ROUND(AVG(close_price), 6)            AS avg_close_price,
       CAST(SUM(trade_volume) AS BIGINT)     AS total_volume
FROM ohlcv
GROUP BY ativo
""",
)
def asset_aggregates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: per-asset hash aggregation (reference: etl/etl_job.py:133-140)."""
    bars = rename_columns(derive_ohlcv(load_events(spark, sf_dir)))
    agg = asset_aggregates(bars)
    return agg.select("ativo", F.round("avg_close_price", 6).alias("avg_close_price"), "total_volume")


@register(
    "enrich_join",
    oracle=OHLCV_SQL
    + """
SELECT o.ativo, o."date", o.close_price,
       a.avg_close_price,
       a.total_volume
FROM ohlcv o
LEFT JOIN (
    SELECT ativo,
           ROUND(AVG(close_price), 6)        AS avg_close_price,
           CAST(SUM(trade_volume) AS BIGINT) AS total_volume
    FROM ohlcv GROUP BY ativo
) a USING (ativo)
""",
)
def enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 in its explicit broadcast-join form (reference: etl/etl_job.py:142)."""
    bars = rename_columns(derive_ohlcv(load_events(spark, sf_dir)))
    out = enrich_with_aggregates_join(bars)
    return out.select(
        "ativo",
        "date",
        "close_price",
        F.round("avg_close_price", 6).alias("avg_close_price"),
        "total_volume",
    )


@register(
    "filter_sort_limit",
    oracle="""
SELECT event_id, ts, user_id, value
FROM events
WHERE event_type = 'purchase'
ORDER BY ts DESC, event_id
LIMIT 30
""",
)
def filter_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q3: filter + ORDER BY DESC + LIMIT top-k
    (reference: README.md:288, 291-295). Catalyst compiles this to
    TakeOrderedAndProject — true distributed top-k, no full sort."""
    events = load(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .orderBy(F.desc("ts"), F.asc("event_id"))
        .limit(30)
        .select("event_id", "ts", "user_id", "value")
    )


@register(
    "select_limit",
    oracle="SELECT * FROM events ORDER BY event_id LIMIT 50",
)
def select_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: SELECT * ... LIMIT (reference: README.md:285); ordered by the
    unique key so the result set is deterministic."""
    return load(spark, sf_dir, "events").orderBy("event_id").limit(50)


@register(
    "union_all",
    oracle="""
SELECT event_id, event_type, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, event_type, value FROM events WHERE event_type = 'view'
""",
)
def union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: multi-frame by-name union (reference: etl/etl_job.py:98
    ``pd.concat``)."""
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    clicks = events.filter(F.col("event_type") == "click")
    views = events.filter(F.col("event_type") == "view")
    return clicks.unionByName(views)


@register(
    "coalesce_duplicates",
    oracle="""
SELECT event_id,
       COALESCE(CASE WHEN value > 100 THEN value END, 0.0) AS value_capped
FROM events
""",
)
def coalesce_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: first-non-null coalesce across duplicate-named columns
    (reference: etl/etl_job.py:42-61). Builds a frame with two columns
    both named ``value_capped`` and runs the ingest coalesce over them."""
    events = load(spark, sf_dir, "events")
    dup = events.select(
        "event_id",
        F.when(F.col("value") > 100, F.col("value")).alias("value_capped"),
        F.lit(0.0).alias("value_capped"),
    )
    return coalesce_duplicate_columns(dup)


@register(
    "json_extract",
    oracle="""
SELECT event_id,
       CASE WHEN json_valid(props)
            THEN json_extract_string(props, '$.k') END            AS k_str,
       CAST(CASE WHEN json_valid(props)
                 THEN json_extract_string(props, '$.k') END AS BIGINT) AS k_int
FROM events
""",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar JSON functions over the events payload (Athena/Presto scalar
    surface stand-in, SURVEY.md §2.9). Malformed-input contract is
    Spark/Athena's lenient one — get_json_object returns NULL on
    invalid JSON — so the oracle guards DuckDB's throwing
    json_extract_string behind json_valid."""
    events = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return events.select("event_id", k.alias("k_str"), k.cast("bigint").alias("k_int"))


@register(
    "date_functions",
    oracle="""
SELECT event_id,
       strftime(ts, '%Y-%m-%d')            AS day_str,
       CAST(year(ts) AS INT)               AS y,
       CAST(month(ts) AS INT)              AS m,
       CAST(day(ts) AS INT)                AS d,
       date_trunc('day', ts)               AS day_ts
FROM events
""",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X4 scalar date functions: formatting (the raw partition path
    scheme, reference: scraper/scraper_upload.py:42-47) and truncation."""
    events = load(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("day_str"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.date_trunc("day", F.col("ts")).alias("day_ts"),
    )


@register(
    "string_functions",
    oracle="""
SELECT doc_id,
       lower(source)                               AS source_lower,
       CASE WHEN source IS NOT NULL
            THEN split_part(source, 'c', 1) END    AS src_prefix,
       lang || '-' || source                       AS lang_source,
       CAST(length(text) AS INT)                   AS text_len
FROM documents
""",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2/X3 scalar string functions: split/lower/concat
    (reference: scraper/scraper_upload.py:29-30, :47).

    NULL contract is Spark's: ``concat``/``split`` propagate NULL
    inputs, so the oracle uses NULL-propagating ``||`` (DuckDB's
    ``concat`` skips NULLs) and guards ``split_part`` (DuckDB returns
    '' on NULL input)."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.lower("source").alias("source_lower"),
        F.split(F.col("source"), "c").getItem(0).alias("src_prefix"),
        F.concat(F.col("lang"), F.lit("-"), F.col("source")).alias("lang_source"),
        F.length("text").alias("text_len"),
    )
