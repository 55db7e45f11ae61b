"""The reference's core ETL pipeline, Spark-first.

Reference lifecycle (etl/etl_job.py:170-181, SURVEY.md §3.2):
read raw -> flatten -> rename (B) -> coalesce -> guard -> to_datetime ->
sort -> rolling mm_7d (C) -> groupby agg (A) -> left merge (J1) ->
partitioned write.

Here the transform is a pure ``DataFrame -> DataFrame`` function; I/O
lives in ``sources``. Physical shape: ONE shuffle (exchange on ``ativo``
feeding WindowExec), inside which both the rolling mean and the unbounded
per-asset aggregates are computed; no join node. Catalyst handles column
pruning and pushdown; the plan survives a 100x scale-up because per-asset
state is bounded (daily bars) and the shuffle is keyed on the natural
partition key.

Deliberate semantic upgrades over the reference (documented, SURVEY.md
§7.4 risk 3):
- handles N assets per run; the reference writes only the first row's
  asset (etl/etl_job.py:147-151).
- the processing date is injectable, not wall-clock ``datetime.now()``
  (etl/etl_job.py:37).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.aggregates import enrich_with_aggregates_window
from ..operators.normalize import normalize
from ..operators.rolling import with_rolling_mean

ROUND_DIGITS = 6


def transform(raw: DataFrame, *, default_asset: str | None = None) -> DataFrame:
    """B -> C -> A -> J on a raw OHLCV frame. Pure; no I/O.

    Output schema (FIXTURES.md §1): date, Open, High, Low, close_price,
    trade_volume, mm_7d (NULL first 6 rows/asset), avg_close_price,
    total_volume, ativo.
    """
    df = normalize(raw, default_asset=default_asset, timestamp_column="date")
    df = with_rolling_mean(df, value="close_price", output="mm_7d", window_rows=7)
    df = enrich_with_aggregates_window(df)
    # Sum-of-double results are rounded so distributed aggregation order
    # cannot produce last-bit drift vs a single-node oracle.
    return df.withColumn("mm_7d", F.round("mm_7d", ROUND_DIGITS)).withColumn(
        "avg_close_price", F.round("avg_close_price", ROUND_DIGITS)
    )


def refined(raw: DataFrame, run_date: str | None = None) -> DataFrame:
    """Full refined output: transform + the string partition column
    ``data`` (processing date, reference: etl/etl_job.py:37,152) —
    injectable for deterministic runs.
    """
    out = transform(raw)
    data = F.lit(run_date) if run_date else F.date_format(F.current_date(), "yyyy-MM-dd")
    return out.withColumn("data", data.cast("string"))
