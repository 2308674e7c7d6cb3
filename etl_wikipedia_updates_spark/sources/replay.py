"""Deterministic file-replay streaming source (tests for S1-S5).

The reference replays its feed by reconnecting with ``?since=``
(/root/reference/pipeline.py:74-76); the engine's test-time equivalent
is a directory of K parquet files in event-time order consumed by the
file stream source one file per micro-batch — every run sees the same
batches in the same order, which is what makes streaming
batch-equivalence assertions exact.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_replay_splits(
    df: DataFrame, path: str, n_splits: int, order_col: str
) -> list[str]:
    """Materialize ``df`` as n_splits single-file parquet chunks in
    ``order_col`` order (chunk i holds rows with ntile i) so replay
    order is event-time order, like a well-behaved feed.

    TEST TOOLING ONLY — the ntile is a deliberate single-partition
    window (global total order is the whole point of a deterministic
    replay fixture) and the frames it tiles are test-tier sized. No
    production operator goes through here; the engine-wide audit for
    unpartitioned windows (tools/explain_audit.py) covers registered
    queries, where this shape is forbidden unless limit-bounded.

    The window orders by ``order_col`` THEN every remaining column:
    callers pass event-time columns with ties (same-second events), and
    a non-total order would let a tied row's tile assignment differ
    between jobs — duplicated into two chunks or dropped from all. The
    full-row tiebreak makes the order total for the deduplicated frames
    this replays (all columns atomic or array — no map columns). The
    tiled frame is persisted once so the n_splits chunk writes reuse
    ONE sort instead of re-running the full window sort per chunk."""
    from pyspark.sql import Window as W

    tiebreak = [c for c in df.columns if c != order_col]
    tiled = df.withColumn(
        "__tile", F.ntile(n_splits).over(W.orderBy(order_col, *tiebreak))
    ).persist()
    try:
        written = []
        for i in range(1, n_splits + 1):
            chunk_dir = os.path.join(path, f"chunk_{i:04d}")
            (
                tiled.filter(F.col("__tile") == i)
                .drop("__tile")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(chunk_dir)
            )
            written.append(chunk_dir)
    finally:
        tiled.unpersist()
    return written


def read_replay_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    files_per_trigger: int = 1,
) -> DataFrame:
    """readStream over the split directory, one chunk per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(path)
    )
