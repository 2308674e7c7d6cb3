"""Persistent IVF vector index: build once, version, query many times.

ann_kmeans demonstrates the train-then-search loop inside one session
(memoized fit); a production vector index is BUILT once, PUBLISHED,
and then queried by many later sessions without retraining. This
module is that lifecycle on the engine's own pieces:

- ``build_ivf_index``: k-means fit (operators.clustering — the same
  deterministic scaled-long Lloyd's the certified queries use), then
  the full corpus assignment published as a SnapshotTable version,
  hive-partitioned by cell with the centroid matrix in the version's
  metadata. Index data and its model are one atomic publish; rebuilds
  are new versions; readers pin.
- ``query_ivf_index``: resolve (or pin) a version, read the centroid
  matrix from metadata (k x dim floats — driver-side literals, no
  Spark job), assign each query vector to its nearest cell with the
  SAME literal-matrix projection, and probe ONLY the matching cell
  partitions — the filter on the partition column prunes every other
  cell's files at the parquet source, so query cost scales with cell
  size, not corpus size.

At 100 TB this is the standard IVF serving shape: the partition prune
is what makes a trillion-vector index queryable (read k/N of the
files), and SnapshotTable's pointer gives lock-free index rebuilds
under live query traffic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_wikipedia_updates_spark.operators import clustering as C
from etl_wikipedia_updates_spark.operators import similarity as S
from etl_wikipedia_updates_spark.plans.clustering import (
    KMEANS_ITERS,
    KMEANS_K,
)
from etl_wikipedia_updates_spark.streaming.snapshot import SnapshotTable
from etl_wikipedia_updates_spark.tables import load_table, spread


def build_ivf_index(
    spark: SparkSession,
    sf_dir: str,
    out_root: str,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    keep_last: int = 2,
) -> dict:
    """Fit, assign, publish. Returns {"version": N, "k": k}."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cents = C.kmeans_fit(emb, k, iters)
    assigned = C.assignment(emb, cents).select(
        "vec_id", "embedding", F.col("cid").cast("int").alias("cell")
    )
    table = SnapshotTable(out_root)
    version = table.publish(
        assigned,
        meta={"k": k, "iters": iters, "sf_dir": sf_dir, "centroids": cents},
        partition_by=["cell"],
    )
    table.vacuum(keep_last=keep_last)
    return {"version": version, "k": k}


def query_ivf_index(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    topk: int = 5,
    version: int | None = None,
) -> DataFrame:
    """Probe a published index. queries: (q_vec_id, q_embedding).

    Output: (q_vec_id, rank, vec_id, cos_sim), ordered. The query
    cells are collected (|queries| ints — bounded driver work) and
    pushed as a partition-column filter so only the probed cells'
    files are ever read."""
    table = SnapshotTable(index_root)
    v = table.current_version() if version is None else version
    if v is None:
        raise FileNotFoundError(f"no published index under {index_root}")
    cents = table.meta_for(v)["centroids"]
    qcell = C.assignment(
        queries.select(
            F.col("q_vec_id").alias("vec_id"),
            F.col("q_embedding").alias("embedding"),
        ),
        cents,
    ).select(
        F.col("vec_id").alias("q_vec_id"),
        F.col("embedding").alias("q_embedding"),
        F.col("cid").cast("int").alias("cell"),
    )
    cells = [r["cell"] for r in qcell.select("cell").distinct().collect()]
    data = table.read(spark, v).filter(F.col("cell").isin(cells))
    out = S.cosine_topk_ivf(data, qcell, k=topk, cell_col="cell")
    return out.orderBy("q_vec_id", "rank")
