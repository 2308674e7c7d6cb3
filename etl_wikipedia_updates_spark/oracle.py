"""DuckDB-oracle differential harness (mirrors the driver's gate).

Runs a declared query on Spark and its oracle SQL on DuckDB over the same
parquet tables, normalizes both results the way the driver does
(sort columns by name, order-insensitive row compare), and reports a
cell-exact diff. Used by tests/test_queries_oracle.py.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import duckdb
import pandas as pd

from etl_wikipedia_updates_spark.tables import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = table_path(sf_dir, name)
        if os.path.isdir(path):
            # multi-file tier layout (make_tier --files > 1): the
            # {table}.parquet path is a DIRECTORY of part files —
            # glob it so DuckDB reads the same row set Spark's
            # directory scan does
            path = os.path.join(path, "*.parquet")
        elif not os.path.exists(path):
            continue
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
        )
    return con


def _canon_cell(v: object) -> object:
    """Canonicalize one cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return 0.0  # collapse -0.0
        return v
    # Array cells (Spark array columns arrive as numpy ndarrays, DuckDB
    # lists as ndarrays/lists): canonicalize elementwise. Must precede
    # the .item() scalar branch — ndarray HAS .item(), which raises on
    # size != 1, so an array column would crash the harness instead of
    # diffing; and NaN/-0.0 INSIDE arrays need the same collapsing as
    # scalars.
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon_cell(x) for x in v)
    # numpy / pandas scalar types → python
    if hasattr(v, "item"):
        return _canon_cell(v.item())
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return v


def normalize(df: pd.DataFrame) -> list[tuple]:
    """Driver-style normalization: columns sorted by name, rows sorted."""
    cols = sorted(df.columns)
    out = df[cols]
    rows = [tuple(_canon_cell(v) for v in row) for row in out.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(x)) for x in r))


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name, False, len(spark_pdf), len(oracle_pdf),
            f"column mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    a = normalize(spark_pdf)
    b = normalize(oracle_pdf)
    if len(a) != len(b):
        return CompareResult(name, False, len(a), len(b), "row count mismatch")
    for i, (ra, rb) in enumerate(zip(a, b)):
        if ra != rb:
            return CompareResult(
                name, False, len(a), len(b),
                f"first diff at sorted row {i}:\n  spark : {ra}\n  oracle: {rb}",
            )
    return CompareResult(name, True, len(a), len(b))
