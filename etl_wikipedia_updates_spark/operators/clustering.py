"""Distributed k-means (Lloyd's) over an embedding column.

Reference parity: the reference app has no clustering, but a
training-data pipeline needs learned cells for IVF-style similarity
search and corpus topic maps; this is the standard distributed recipe
(same shape as Spark MLlib's KMeans): the driver holds only the
k x dim centroid matrix between iterations (a few KB), every
data-sized step is a DataFrame op. Assignment is a pure projection —
centroids are embedded as literal arrays, each vector computes its k
distances and takes the (d2, cid) struct-min, so no join and no
shuffle touches the corpus. The update is one shuffle keyed on
(cid, dim-position): k*dim cells, independent of corpus size.

Determinism (oracle hash-matching):
- init = the k vectors with the smallest vec_id, in vec_id order.
- distances fold sequentially in array order from a 0.0 seed on both
  engines (functions.arrays conventions) -> bit-identical doubles;
  assignment ties break toward the lowest cid via struct-min.
- the centroid update is an exact scaled-long mean
  (functions.deterministic.dec_sum), so partial-aggregation order can
  never change it; a cluster that loses every member keeps its
  previous centroid.
- iteration count is fixed (no data-dependent convergence loop), so
  the oracle is expressible as unrolled SQL and the job count is
  bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.functions.deterministic import dec_sum

MEAN_SCALE = 6  # scaled-long mean precision (1e-6) for centroid updates


def _matrix_sql(cents: list[list[float]]) -> str:
    """The k x dim centroid matrix as ONE SQL array-of-arrays literal.

    Built as a string and parsed JVM-side by ``F.expr``: constructing the
    same literal through k*dim ``F.lit`` py4j calls costs ~0.4s of driver
    time per call site at k=8, dim=64 (measured), which multiplies across
    Lloyd's iterations. ``repr(float)`` round-trips doubles exactly, so
    the parsed literal is bit-identical to the Python value."""
    return (
        "array("
        + ",".join(
            "array(" + ",".join(repr(float(x)) + "D" for x in c) + ")"
            for c in cents
        )
        + ")"
    )


def sql_squared_l2(e: str, c: str) -> str:
    """DuckDB twin of squared_l2_to for centroid arrays already cast to
    double — identical IEEE op sequence (cast, subtract, square, left
    fold from 0.0)."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({e}, {c}), "
        f"p -> (CAST(p[1] AS DOUBLE) - p[2]) * (CAST(p[1] AS DOUBLE) - p[2]))), "
        f"(acc, v) -> acc + v)"
    )


def assignment(emb: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, cid, d2): nearest centroid per vector, ties to lowest
    cid. Pure projection (struct-min over the per-centroid distances) —
    scales map-side at any corpus size. The whole expression is one SQL
    string (single py4j call + JVM parse; see _matrix_sql). The distance
    keeps the cross-engine op sequence: per element cast-to-double,
    subtract, square, then a sequential left fold from a 0.0 seed
    (sql_squared_l2 is the DuckDB twin). The cast happens per element
    inside the lambda — never reference a computed array from inside a
    lambda body (Catalyst re-evaluates it per element access)."""
    best = (
        f"array_min(transform({_matrix_sql(centroids)}, (c, i) -> "
        "named_struct('d2', aggregate(zip_with(embedding, c, "
        "(x, y) -> (CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y)), "
        "0.0D, (acc, v) -> acc + v), 'cid', CAST(i AS INT))))"
    )
    return emb.select(
        "vec_id",
        "embedding",
        F.expr(best + ".cid").alias("cid"),
        F.expr(best + ".d2").alias("d2"),
    )


def init_centroids(emb: DataFrame, k: int) -> list[list[float]]:
    """The k vectors with the smallest vec_id, in vec_id order."""
    rows = emb.select("vec_id", "embedding").orderBy("vec_id").limit(k).collect()
    return [[float(x) for x in r.embedding] for r in rows]


def update_centroids(
    assigned: DataFrame, prev: list[list[float]]
) -> list[list[float]]:
    """Exact scaled-long per-dimension means; one shuffle on
    (cid, pos) = k*dim cells. Empty clusters keep their previous
    centroid."""
    dims = (
        assigned.select(
            "cid", F.posexplode(F.col("embedding")).alias("pos", "x")
        )
        .groupBy("cid", "pos")
        .agg(
            (
                dec_sum(F.col("x").cast("double"), scale=MEAN_SCALE)
                / F.count("x")
            ).alias("m")
        )
        .collect()
    )
    cents = [list(c) for c in prev]
    for r in dims:
        cents[r.cid][r.pos] = r.m
    return cents


def kmeans_fit(
    emb: DataFrame, k: int, iters: int
) -> list[list[float]]:
    """Lloyd's with fixed iteration count; returns the final centroid
    matrix (driver-side, k x dim)."""
    cents = init_centroids(emb, k)
    for _ in range(iters):
        cents = update_centroids(assignment(emb, cents), cents)
    return cents


def centroid_frame(
    spark: SparkSession, cents: list[list[float]]
) -> DataFrame:
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        schema="cid INT, cent ARRAY<DOUBLE>",
    )
