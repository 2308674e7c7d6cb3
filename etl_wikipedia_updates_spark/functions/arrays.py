"""Array math as built-in higher-order functions (JVM-side, no UDFs).

Vector ops run entirely inside whole-stage codegen via ``zip_with`` /
``aggregate`` — no Python round-trip per row, which is what makes
similarity search viable over billions of embedding rows.

Determinism note (oracle hash-matching): ``F.aggregate`` is a strict
*sequential left fold in array order*, and the DuckDB oracles use
``list_reduce(list_transform(list_zip(a, b), ...), ...)`` which folds in
the same order — so the double-precision results agree bit-for-bit.
Elements are cast to double *before* multiplying so both engines do the
same IEEE ops on the same values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fold_sum(arr: Column) -> Column:
    """Sequential left-fold sum of a double array."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


def dot_product(a: Column, b: Column) -> Column:
    return _fold_sum(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        _fold_sum(F.transform(a, lambda x: x.cast("double") * x.cast("double")))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot_product(a, b) / (l2_norm(a) * l2_norm(b))


# --- DuckDB oracle-side equivalents (same fold order) ---
#
# DuckDB's list_reduce has no initial accumulator (it starts from the
# first element and errors on empty lists), so the oracle prepends the
# same 0.0 seed Spark's F.aggregate uses: identical fold sequence
# (0.0 + x1) + x2 + ..., identical result bit-for-bit, and empty arrays
# yield 0.0 on both engines.

def sql_dot_product(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, v) -> acc + v)"
    )


def sql_l2_norm(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_prepend(0.0, list_transform({a}, "
        f"x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), (acc, v) -> acc + v))"
    )


def sql_cosine_similarity(a: str, b: str) -> str:
    return f"({sql_dot_product(a, b)} / ({sql_l2_norm(a)} * {sql_l2_norm(b)}))"
