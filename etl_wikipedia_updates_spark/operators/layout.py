"""Physical-layout levers for the 100 TB deployment: bucketing,
partitioned sinks, and skew salting.

SCALE.md names these as the conf/layout changes a real cluster makes
(shuffle-free co-located joins, partition pruning on date-partitioned
facts, hot-key salting). This module makes each one executable and
test-assertable instead of prose: tests/test_layout.py checks the
resulting physical plans (no Exchange under a bucketed join; pruned
``PartitionFilters`` on a partitioned scan) and the salted results'
equality with their unsalted forms.

Reference parity: the reference app stores everything in one SQLite
file (pipeline.py writes a single table; no layout control at all) —
these operators are what replaces that file layout at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


# --- bucketing: shuffle-free co-located joins --------------------------------
def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed AND sorted by ``key``. Two tables
    bucketed the same way join with neither a shuffle nor (with sorted
    buckets) a sort — the join cost collapses to a per-bucket merge.
    The bucket count is the layout-time parallelism contract: pick it
    once per dataset family (e.g. 4096 at 100 TB) and every
    consumer inherits co-location."""
    (
        df.write.mode(mode)
        .bucketBy(buckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key.
    Catalyst sees both sides' bucket spec and plans a SortMergeJoin
    with zero Exchange operators (assert via
    tests/test_layout.py::test_bucketed_join_has_no_shuffle)."""
    return spark.table(left_table).join(spark.table(right_table), key)


# --- partitioned parquet sink: partition pruning -----------------------------
def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style directory partitioning — the standard fact-table
    layout (e.g. by event date). Queries filtering on a partition
    column scan only matching directories; the filter shows up as
    ``PartitionFilters`` in the scan node instead of row-level work."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


# --- salting: hot-key mitigation ---------------------------------------------
def salted_count(df: DataFrame, key: str, salts: int) -> DataFrame:
    """Two-phase aggregation for a skewed group key: partial counts on
    (key, salt) spread a hot key over ``salts`` reducers, the final
    merge reduces ``salts`` partials per key. Results are identical to
    a direct groupBy(key).count() — asserted in tests. Spark's partial
    aggregation already does this when the *map-side* combines well;
    explicit salting is the fix when one reducer key still dominates
    (e.g. count by a power-law user_id)."""
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count("*").alias("_c"))
    )
    return partial.groupBy(key).agg(F.sum("_c").alias("cnt"))


def salted_join(
    skewed: DataFrame, small: DataFrame, key: str, salts: int
) -> DataFrame:
    """Equi-join a skewed fact side to a non-broadcastable build side
    without one reducer absorbing the hot key: each fact row picks a
    salt in [0, salts) from its partition position (identical rows get
    different salts — hashing row *content* would keep a hot key's
    duplicate rows on one reducer; the salt value never reaches the
    output, so placement-only randomness is safe), the build side is
    replicated ``salts`` times, and the join key becomes (key, salt) —
    each hot key now spreads over ``salts`` tasks. Output equals the
    plain join (asserted in tests). Prefer AQE skew-join when it
    triggers; this is the explicit form for when it doesn't (e.g.
    skew below AQE's factor threshold but above the straggler budget,
    or non-shuffle inputs AQE has no stats for)."""
    salt_col = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    fact = skewed.withColumn("_salt", salt_col)
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = fact.join(replicated, [key, "_salt"])
    return out.drop("_salt")
