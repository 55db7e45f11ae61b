"""Ingestion normalization: the schema-drift guards of the reference ETL.

The reference has no declared schema; it defends against drift with four
guards (reference: etl/etl_job.py:42-61, 67-68, 106-121, 124):

1. MultiIndex flatten       -> struct flattening (P1)
2. column rename (B)        -> withColumnsRenamed (P2)
3. duplicate-column coalesce-> first non-null left-to-right (P3)
4. missing-column default + timestamp cast (S3 guard, P5)

Spark cannot carry duplicate column names through writes or most ops, so
coalescing happens eagerly at ingest — the same place the reference does.
All of this is pure Column expressions: no Python UDFs, fully codegen'd,
safe at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Transformation "B" of the reference (etl/etl_job.py:111-115, README.md:53).
REFERENCE_RENAMES: dict[str, str] = {
    "Close": "close_price",
    "Volume": "trade_volume",
    "Date": "date",
}


def coalesce_duplicate_columns(df: DataFrame) -> DataFrame:
    """For each repeated column name keep one column = first non-null value
    scanning left-to-right; preserve first-seen column order.

    Parity: ``_coalesce_duplicate_columns`` (reference: etl/etl_job.py:42-61,
    the ``bfill(axis=1).iloc[:, 0]`` idiom at :60 — verified left-to-right
    first-non-null). Duplicate names are legal in pandas but fatal in Spark
    writes, so this runs at ingest (SURVEY.md §1.3).
    """
    names = df.columns
    if len(set(names)) == len(names):
        return df
    # Positional aliases let us address duplicate-named columns safely.
    tagged = df.toDF(*[f"__c{i}" for i in range(len(names))])
    first_seen: list[str] = []
    positions: dict[str, list[int]] = {}
    for i, name in enumerate(names):
        if name not in positions:
            first_seen.append(name)
            positions[name] = []
        positions[name].append(i)
    cols: list[Column] = []
    for name in first_seen:
        pos = positions[name]
        if len(pos) == 1:
            cols.append(F.col(f"__c{pos[0]}").alias(name))
        else:
            cols.append(F.coalesce(*[F.col(f"__c{i}") for i in pos]).alias(name))
    return tagged.select(*cols)


def flatten_structs(df: DataFrame, *, separator: str = "_") -> DataFrame:
    """Flatten one level of struct columns into top-level columns.

    Parity: the MultiIndex flatten (reference: etl/etl_job.py:67-68,
    106-108) collapses 2-level column labels to level 0. Spark's analogue
    of a nested header is a struct column; a single ``select`` expands it —
    pure projection, zero shuffle.
    """
    cols: list[Column] = []
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StructType):
            for sub in field.dataType.fieldNames():
                cols.append(F.col(f"{field.name}.{sub}").alias(f"{field.name}{separator}{sub}"))
        else:
            cols.append(F.col(field.name))
    return df.select(*cols)


def rename_columns(df: DataFrame, renames: dict[str, str] | None = None) -> DataFrame:
    """Transformation B: bulk column rename (reference: etl/etl_job.py:111-115)."""
    return df.withColumnsRenamed(renames or REFERENCE_RENAMES)


def ensure_column(df: DataFrame, name: str, default: Column) -> DataFrame:
    """Missing-column default, e.g. tag every row with the asset id when the
    ``ativo`` column is absent (reference: etl/etl_job.py:120-121,
    scraper/scraper_upload.py:39).
    """
    if name in df.columns:
        return df
    return df.withColumn(name, default)


def cast_timestamp(df: DataFrame, column: str = "date") -> DataFrame:
    """P5: string/object -> timestamp (reference: etl/etl_job.py:124)."""
    return df.withColumn(column, F.col(column).cast("timestamp"))


def normalize(
    df: DataFrame,
    *,
    renames: dict[str, str] | None = None,
    default_asset: str | None = None,
    timestamp_column: str = "date",
) -> DataFrame:
    """Full ingest normalization: flatten -> rename -> coalesce -> default
    column -> timestamp cast, in the reference's order
    (etl/etl_job.py:106-124).
    """
    out = flatten_structs(df)
    out = rename_columns(out, renames)
    out = coalesce_duplicate_columns(out)
    if default_asset is not None:
        out = ensure_column(out, "ativo", F.lit(default_asset))
    if timestamp_column in out.columns:
        out = cast_timestamp(out, timestamp_column)
    return out
