"""kmeans_clusters: distributed Lloyd's over the embeddings table.

Engine extension (no reference analog — the training-pipeline cluster
map / learned-IVF-cells operator). The oracle is the SAME fixed-point
computation unrolled as chained CTEs: init = k lowest vec_ids,
`KMEANS_ITERS` assignment+update rounds with exact scaled-long means,
then a final assignment under the converged centroids. Every float op
follows the cross-engine determinism conventions
(functions.arrays / functions.deterministic), so the 8-row summary
hash-matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.functions.deterministic import (
    dec_sum,
    det_round,
    sql_dec_sum,
    sql_det_round,
)
from etl_wikipedia_updates_spark.operators import clustering as C
from etl_wikipedia_updates_spark.plans.base import DeclaredQuery, total_order
from etl_wikipedia_updates_spark.tables import load_table, spread

KMEANS_K = 8
KMEANS_ITERS = 3


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit k-means (fixed k/iters), then summarize: per cluster the
    member count, exact mean squared distance, and the first centroid
    coordinate as a value fingerprint."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = C.kmeans_fit(emb, KMEANS_K, KMEANS_ITERS)
    assigned = C.assignment(emb, cents)
    # cent1 is a driver-known constant per cid after the fit — a k-double
    # array literal indexed by cid instead of a broadcast join against a
    # centroid frame (one fewer exchange + frame round trip; repr
    # round-trips doubles exactly, same as _matrix_sql).
    cent1 = F.expr(
        "element_at(array("
        + ",".join(repr(float(c[0])) + "D" for c in cents)
        + "), cid + 1)"
    )
    return (
        assigned.groupBy("cid")
        .agg(
            F.count("*").alias("n_members"),
            det_round(
                dec_sum(F.col("d2"), scale=C.MEAN_SCALE) / F.count("d2"), 4
            ).alias("mean_dist2"),
        )
        .select(
            "cid",
            "n_members",
            "mean_dist2",
            det_round(cent1, 4).alias("cent1"),
        )
        .transform(total_order, "cid")
    )


def _assign_sql(cents: str) -> str:
    d = C.sql_squared_l2("emb.embedding", "c.cent")
    return (
        "SELECT vec_id, embedding, cid, d2 FROM ("
        f"SELECT emb.vec_id, emb.embedding, c.cid, {d} AS d2, "
        f"row_number() OVER (PARTITION BY emb.vec_id ORDER BY {d}, c.cid) AS rn "
        f"FROM embeddings emb CROSS JOIN {cents} c) WHERE rn = 1"
    )


def _kmeans_ctes(k: int, iters: int) -> list[str]:
    """CTE chain c0 .. c{iters} (fit) + af (final assignment)."""
    parts = [
        "WITH c0 AS ("
        "SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INTEGER) AS cid, "
        "list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent "
        f"FROM (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT {k}))"
    ]
    mean = f"({sql_dec_sum('u.x', scale=C.MEAN_SCALE)} / COUNT(u.x))"
    for i in range(1, iters + 1):
        parts.append(f"a{i} AS ({_assign_sql(f'c{i - 1}')})")
        parts.append(
            f"g{i} AS (SELECT cid, u.pos AS pos, {mean} AS m FROM ("
            "SELECT cid, unnest(list_transform(range(1, len(embedding) + 1), "
            "i -> struct_pack(pos := i, x := CAST(embedding[i] AS DOUBLE)))) AS u "
            f"FROM a{i}) GROUP BY cid, u.pos)"
        )
        parts.append(
            f"n{i} AS (SELECT cid, list(m ORDER BY pos) AS cent FROM g{i} "
            "GROUP BY cid)"
        )
        parts.append(
            f"c{i} AS (SELECT p.cid, coalesce(q.cent, p.cent) AS cent "
            f"FROM c{i - 1} p LEFT JOIN n{i} q USING (cid))"
        )
    parts.append(f"af AS ({_assign_sql(f'c{iters}')})")
    return parts


def _kmeans_sql(k: int, iters: int) -> str:
    mean_d2 = sql_det_round(
        f"{sql_dec_sum('af.d2', scale=C.MEAN_SCALE)} / COUNT(af.d2)", 4
    )
    return (
        ",\n".join(_kmeans_ctes(k, iters))
        + f"\nSELECT af.cid AS cid, COUNT(*) AS n_members, {mean_d2} AS mean_dist2, "
        + sql_det_round("max(c.cent[1])", 4)
        + f" AS cent1\nFROM af JOIN c{iters} c USING (cid) "
        "GROUP BY af.cid ORDER BY cid"
    )


KMEANS_SQL = _kmeans_sql(KMEANS_K, KMEANS_ITERS)


# --- ann_kmeans: IVF top-k over the LEARNED cells -----------------------------
# Same probe shape as ann_ivf, but the cells come from kmeans_fit instead
# of the fixture's label column — the full "train cells, then search"
# loop of a production vector index.
ANN_KMEANS_K = 3
ANN_KMEANS_N_QUERIES = 5


def ann_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_wikipedia_updates_spark.operators import similarity as S

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = C.kmeans_fit(emb, KMEANS_K, KMEANS_ITERS)
    cells = C.assignment(emb, cents).select("vec_id", "embedding", "cid")
    queries = cells.filter(F.col("vec_id") < ANN_KMEANS_N_QUERIES).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        "cid",
    )
    out = S.cosine_topk_ivf(cells, queries, k=ANN_KMEANS_K, cell_col="cid")
    return out.select(
        "q_vec_id", F.col("rank").cast("bigint").alias("rk"), "vec_id", "cos_sim"
    ).transform(total_order, "q_vec_id", "rk")


def _ann_kmeans_sql(k: int, iters: int) -> str:
    from etl_wikipedia_updates_spark.functions.arrays import sql_cosine_similarity

    cos = sql_cosine_similarity("q.qe", "e.embedding")
    return (
        ",\n".join(_kmeans_ctes(k, iters))
        + f""",
q AS (
  SELECT vec_id AS q_vec_id, embedding AS qe, cid
  FROM af WHERE vec_id < {ANN_KMEANS_N_QUERIES}
),
pairs AS (
  SELECT q.q_vec_id, e.vec_id, {cos} AS cos
  FROM af e JOIN q ON e.cid = q.cid AND e.vec_id != q.q_vec_id
)
SELECT q_vec_id,
       CAST(row_number() OVER (PARTITION BY q_vec_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rk,
       vec_id, {sql_det_round('cos', 4)} AS cos_sim
FROM pairs
QUALIFY rk <= {ANN_KMEANS_K}
ORDER BY q_vec_id, rk
"""
    )


ANN_KMEANS_SQL = _ann_kmeans_sql(KMEANS_K, KMEANS_ITERS)

CLUSTERING_QUERIES: list[DeclaredQuery] = [
    DeclaredQuery(
        "kmeans_clusters",
        kmeans_clusters,
        KMEANS_SQL,
        "distributed k-means (learned IVF cells)",
        eager=True,  # Lloyd's fit runs jobs at build time
    ),
    DeclaredQuery(
        "ann_kmeans",
        ann_kmeans,
        ANN_KMEANS_SQL,
        "IVF top-k over learned k-means cells",
        eager=True,  # Lloyd's fit runs jobs at build time
    ),
]
