"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``etl_wikipedia_updates_spark.registry.REGISTRY``
(one ``DeclaredQuery`` per SURVEY.md §2.3 contract row); this module is
a thin adapter over it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_wikipedia_updates_spark.registry import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q5 (5-way star join) on sf0.001; driver checks rows>0."""
    return REGISTRY.queries["q5"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.3."""
    return REGISTRY.builders()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; queries without an entry get the
    driver's weaker rows-only check (non-SQL-expressible ops only)."""
    return REGISTRY.oracles()
