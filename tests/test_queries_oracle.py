"""Differential test: every declared query vs its DuckDB oracle at sf0.01.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json):
same tables, same normalization (columns sorted by name, rows compared
order-insensitively, values exact).
"""

from __future__ import annotations

import pytest

from etl_wikipedia_updates_spark.oracle import compare_frames, duckdb_connection
from etl_wikipedia_updates_spark.registry import REGISTRY

QUERIES_WITH_ORACLE = [
    q for q in REGISTRY.queries.values() if q.oracle is not None
]


@pytest.fixture(scope="module")
def duck(sf_correctness):
    con = duckdb_connection(sf_correctness)
    yield con
    con.close()


@pytest.mark.parametrize(
    "declared", QUERIES_WITH_ORACLE, ids=[q.name for q in QUERIES_WITH_ORACLE]
)
def test_query_matches_oracle(spark, sf_correctness, duck, declared):
    spark_pdf = declared.builder(spark, sf_correctness).toPandas()
    oracle_pdf = duck.sql(declared.oracle).df()
    res = compare_frames(declared.name, spark_pdf, oracle_pdf)
    assert res.ok, f"{declared.name}: {res.detail}"
    assert res.spark_rows > 0, f"{declared.name}: empty result"
