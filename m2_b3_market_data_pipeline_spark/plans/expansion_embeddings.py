"""Embedding-hygiene queries: L2 normalization, int8 quantization,
nearest-centroid assignment (operators/embeddings.py). All hash-checked:
float vectors are verified bit-meaningfully by hashing micro-unit
integer codes (ROUND(x * 1e6) AS BIGINT) — integer strings are identical
across engines, unlike double-to-string formatting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.embeddings import (
    assign_centroids,
    kmeans_iterate,
    l2_normalize,
    quantize_int8,
)
from .registry import load, register
from .sql_fragments import EMB

N_CENTROIDS = 8
KMEANS_ITERS = 2
EMBED_DIM = 64


def _micro_md5(col: Column) -> Column:
    """md5 over comma-joined micro-unit integer codes of a double array
    — the cross-engine-stable way to value-check a float vector."""
    return F.md5(
        F.array_join(
            F.transform(col, lambda x: F.round(x * 1e6).cast("bigint").cast("string")),
            ",",
        )
    )


_MICRO_SQL = "array_to_string(list_transform({v}, x -> CAST(ROUND(x * 1000000) AS BIGINT)), ',')"


@register(
    "embed_normalize",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {EMB}),
n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e)
SELECT vec_id,
       ROUND(nrm, 6) AS l2_norm,
       CASE WHEN nrm > 0 THEN
         md5({_MICRO_SQL.format(v="list_transform(v, x -> x / nrm)")})
       END AS unit_md5
FROM n
""",
)
def embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization as a pure projection — norm plus an md5 over the
    micro-unit codes of the full unit vector, so all 64 components are
    value-checked (operators/embeddings.py)."""
    emb = load(spark, sf_dir, "embeddings")
    out = l2_normalize(emb)
    return out.select(
        "vec_id",
        F.round("l2_norm", 6).alias("l2_norm"),
        _micro_md5(F.col("unit")).alias("unit_md5"),
    )


@register(
    "embed_quantize",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {EMB}),
s AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM e),
q AS (SELECT vec_id, v, scale,
             list_transform(v, x -> CAST(ROUND(x / scale) AS INT)) AS qv
      FROM s WHERE scale > 0)
SELECT vec_id,
       ROUND(scale, 9) AS q_scale,
       md5(array_to_string(qv, ',')) AS q_md5,
       ROUND(list_sum(list_transform(generate_series(1, len(v)),
                                     i -> pow(v[i] - qv[i] * scale, 2)))
             / len(v), 9) AS q_mse
FROM q
""",
)
def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: integer codes hashed exactly, scale
    and reconstruction MSE rounded (operators/embeddings.py). Codes are
    bit-stable across engines, so this checks the quantizer itself, not
    a float shadow of it."""
    emb = load(spark, sf_dir, "embeddings")
    out = quantize_int8(emb).filter(F.col("q_scale") > 0)
    return out.select(
        "vec_id",
        F.round("q_scale", 9).alias("q_scale"),
        F.md5(
            F.array_join(F.transform("q_vec", lambda q: q.cast("string")), ",")
        ).alias("q_md5"),
        F.round("q_mse", 9).alias("q_mse"),
    )


def _km_dist(a: str, b: str) -> str:
    return (
        f"list_inner_product({a}, {a}) - 2 * list_inner_product({a}, {b})"
        f" + list_inner_product({b}, {b})"
    )


def _km_assign_cte(cents: str, out: str) -> str:
    d = _km_dist("e.v", "c.cv")
    return f"""{out} AS (
    SELECT vec_id, v, centroid_id, dist FROM (
        SELECT e.vec_id, e.v, c.centroid_id, {d} AS dist,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                  ORDER BY {d}, c.centroid_id) AS rn
        FROM e CROSS JOIN {cents} c) WHERE rn = 1)"""


def _km_update_cte(assigned: str, out: str) -> str:
    return f"""{out} AS (
    SELECT centroid_id, list(m ORDER BY dim) AS cv FROM (
        SELECT centroid_id, dim, ROUND(AVG(v[dim]), 6) AS m
        FROM {assigned}, unnest(generate_series(1, {EMBED_DIM})) AS t(dim)
        GROUP BY centroid_id, dim) GROUP BY centroid_id)"""


def _kmeans_oracle(iters: int) -> str:
    ctes = [
        f"e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {EMB})",
        f"c0 AS (SELECT CAST(vec_id AS INT) AS centroid_id, v AS cv FROM e "
        f"WHERE vec_id < {N_CENTROIDS})",
    ]
    for i in range(iters):
        ctes.append(_km_assign_cte(f"c{i}", f"a{i}"))
        ctes.append(_km_update_cte(f"a{i}", f"c{i + 1}"))
    ctes.append(_km_assign_cte(f"c{iters}", "af"))
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT vec_id, centroid_id, ROUND(dist, 6) AS sq_dist FROM af"
    )


@register("kmeans_clusters", oracle=_kmeans_oracle(KMEANS_ITERS))
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means (deterministic seeding, 6dp-rounded centroid
    updates so the iterate is bit-stable) — the iterative-algorithm
    pattern on Spark: broadcast argmin assign + explode-by-dimension
    mean per round, only the k x dim centroid frame crosses rounds
    (operators/embeddings.py::kmeans_iterate). Oracle: the same
    iterations unrolled as chained CTEs."""
    emb = load(spark, sf_dir, "embeddings")
    return kmeans_iterate(emb, k=N_CENTROIDS, iters=KMEANS_ITERS)


@register(
    "centroid_assign",
    oracle=f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {EMB}),
c AS (SELECT vec_id AS centroid_id, v AS cv FROM e WHERE vec_id < {N_CENTROIDS}),
d AS (
    SELECT e.vec_id, c.centroid_id,
           list_inner_product(e.v, e.v) - 2 * list_inner_product(e.v, c.cv)
             + list_inner_product(c.cv, c.cv) AS dist
    FROM e CROSS JOIN c
)
SELECT vec_id, centroid_id, ROUND(dist, 6) AS sq_dist
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, centroid_id) AS rn
      FROM d)
WHERE rn = 1
""",
)
def centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid assignment (the k-means / IVF-training inner
    step): broadcast K centroids, argmin of K codegen'd distances per
    row, deterministic tiebreak (operators/embeddings.py). The corpus
    side never shuffles for the join."""
    emb = load(spark, sf_dir, "embeddings")
    centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("centroid")
    )
    return assign_centroids(emb, centroids)


# --- Johnson-Lindenstrauss random projection -------------------------------

from ..operators.embeddings import jl_project, jl_signs  # noqa: E402
from ..operators.similarity import as_double, norm  # noqa: E402

JL_OUT = 16
JL_SEED = 9000


def _jl_oracle() -> str:
    """The same ±1 sign matrix as literals; proj components y_i are
    named CTE columns so the norm sum references each exactly once, and
    the squared sum parenthesizes left-to-right to match Spark's
    aggregate fold."""
    scale = JL_OUT ** 0.5
    ys = ", ".join(
        f"list_inner_product(v, {signs}) / {scale!r} AS y{i}"
        for i, signs in enumerate(jl_signs(EMBED_DIM, JL_OUT, JL_SEED))
    )
    sq = ""
    for i in range(JL_OUT):
        sq = f"({sq} + y{i} * y{i})" if sq else f"(0.0 + y0 * y0)"
    return f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {EMB}),
proj AS (SELECT vec_id, v, {ys} FROM c)
SELECT vec_id,
       ROUND(sqrt(list_inner_product(v, v)), 6) AS orig_norm,
       ROUND(sqrt({sq}), 6) AS proj_norm,
       ROUND(sqrt({sq}) / sqrt(list_inner_product(v, v)), 6) AS norm_ratio
FROM proj
ORDER BY vec_id
"""


@register("jl_project_norms", oracle=_jl_oracle())
def jl_project_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-projection dimensionality reduction (Johnson-Lindenstrauss
    with Achlioptas ±1 signs, operators/embeddings.py::jl_project) —
    the pre-ANN shrink step (64 -> 16 here; 1024 -> 64 in production).
    Per-vector norm preservation is the checked signal: orig/projected
    norms and their ratio, 6dp. Pure codegen projection, no shuffle —
    parquet-scan-bound at any corpus size; the sign matrix is literals
    on both engines."""
    emb = load(spark, sf_dir, "embeddings")
    proj = jl_project(
        emb, vec_col="embedding", dim=EMBED_DIM, out_dim=JL_OUT, seed=JL_SEED
    )
    v = as_double("embedding")
    onorm = norm(v)
    pnorm = norm(F.col("projected"))
    return proj.select(
        "vec_id",
        F.round(onorm, 6).alias("orig_norm"),
        F.round(pnorm, 6).alias("proj_norm"),
        F.round(pnorm / onorm, 6).alias("norm_ratio"),
    ).orderBy("vec_id")
