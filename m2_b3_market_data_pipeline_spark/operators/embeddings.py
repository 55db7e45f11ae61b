"""Embedding-vector operators for LLM training-data pipelines.

The vector-hygiene steps that sit next to ANN/dedup at 100 TB
(BASELINE.json north star): L2 normalization, int8 quantization for
storage/serving, and nearest-centroid assignment (the inner step of
k-means / IVF training). All built-in higher-order SQL functions over
``array<float>`` — JVM-side, codegen'd, no Python, no shuffle for the
per-vector ops; the centroid join broadcasts the (tiny) centroid side.

Scale notes:
- normalize/quantize are pure projections: throughput is bounded by
  parquet scan speed; the embedding column should be the only one read
  (column pruning — asserted in plan tests).
- centroid assignment broadcasts K centroids (K ~ 2^10..2^16 at IVF
  scale, a few MB) and never shuffles the corpus; the per-row cost is
  K dot products inside codegen. For K beyond broadcast range, switch
  to the IVF two-level scheme in operators/similarity.py.

Each operator has a DuckDB oracle twin in plans/expansion_embeddings.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .similarity import as_double, norm


def l2_normalize(
    df: DataFrame, *, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Unit-normalize vectors (double precision); adds ``l2_norm`` and
    the normalized vector. Zero vectors yield a null unit vector rather
    than NaNs."""
    v = as_double(vec_col)
    n = norm(v)
    unit = F.when(n > 0, F.transform(v, lambda x: x / n))
    return df.withColumn("l2_norm", n).withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame, *, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Symmetric int8 quantization: scale = max(|v|)/127, q_i =
    round(v_i / scale). Adds ``{prefix}_scale`` (double), ``{prefix}_vec``
    (array<int>) and ``{prefix}_mse`` (reconstruction mean-squared error).
    Integer codes are bit-stable across engines; scale/mse are rounded
    at the query layer per the registry determinism contract."""
    v = as_double(vec_col)
    absmax = F.array_max(F.transform(v, F.abs))
    scale = absmax / F.lit(127.0)
    q = F.when(absmax > 0, F.transform(v, lambda x: F.round(x / scale).cast("int")))
    recon_err = F.when(
        absmax > 0,
        F.aggregate(
            F.zip_with(
                v,
                q,
                lambda x, qi: (x - qi.cast("double") * scale)
                * (x - qi.cast("double") * scale),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        / F.size(v).cast("double"),
    )
    return (
        df.withColumn(f"{prefix}_scale", scale)
        .withColumn(f"{prefix}_vec", q)
        .withColumn(f"{prefix}_mse", recon_err)
    )


def sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 distance between two double arrays (codegen'd fold)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_centroids(
    df: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroid_id_col: str = "centroid_id",
    centroid_vec_col: str = "centroid",
) -> DataFrame:
    """Nearest-centroid assignment (the k-means / IVF-training inner
    step): broadcast the centroid set, compute K squared distances per
    row inside codegen, keep the argmin with a deterministic tiebreak
    (lowest centroid id). The corpus side never shuffles; the ROW_NUMBER
    window partitions by vector id, so WindowGroupLimit keeps O(1) state
    per vector."""
    joined = df.select(id_col, as_double(vec_col).alias("__v")).join(
        F.broadcast(
            centroids.select(
                centroid_id_col, as_double(centroid_vec_col).alias("__c")
            )
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("__dist").asc(), F.col(centroid_id_col).asc()
    )
    return (
        joined.withColumn("__dist", sq_dist(F.col("__v"), F.col("__c")))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            centroid_id_col,
            F.round(F.col("__dist"), 6).alias("sq_dist"),
        )
    )
