"""Deterministic, engine-portable aggregate expressions.

Why these exist: the correctness gate hash-compares Spark output against
a DuckDB oracle. Plain ``SUM(double)`` is order-dependent (floating
addition isn't associative, and Spark's partial/final aggregation order
differs run to run and engine to engine). Casting each addend to a fixed
DECIMAL first makes the sum *exact* and therefore order-independent —
two engines summing the same multiset of decimals agree bit-for-bit,
and the final ``CAST(... AS DOUBLE)`` + ``ROUND`` are deterministic
unary ops. This is also the right call at 100 TB: decimal partial
aggregates combine associatively, so map-side partial aggregation stays
correct and reproducible across any shuffle/AQE re-plan.

The accumulator is a scaled 64-bit integer, not a DECIMAL: each addend
maps to ``floor(x * 10^scale + 0.5)`` (pure IEEE double ops — identical
in both engines), the sum runs in codegen'd long arithmetic (exact,
associative, order-independent), and a single final cast+divide returns
to double. Spark's ``sum(decimal(18,s))`` escalates partials to a
precision-28 BigDecimal accumulator (measured ~2x the whole-query cost
of q3); the long path stays inside whole-stage codegen. Headroom: the
scaled sum must stay below 2^63 — at scale 6 that is |sum| < 9.2e12,
ample for the contract tables; a deployment summing past that bumps the
helper to decimal(38) or aggregates hierarchically (conf-level change).

The matching DuckDB SQL comes from the sql_* builders below — always
generate oracle SQL through them so both engines change together.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec_sum(col: Column, scale: int = 4) -> Column:
    """Exact (order-independent) sum via scaled-long accumulation."""
    s = float(10**scale)
    return F.sum(F.floor(col * s + F.lit(0.5)).cast("long")).cast("double") / s


def money_sum(col: Column, scale: int = 4, digits: int = 2) -> Column:
    """Rounded exact sum — the standard form for price/value aggregates."""
    return det_round(dec_sum(col, scale=scale), digits)


def dec_avg(col: Column, scale: int = 4) -> Column:
    """Order-independent average: exact scaled sum / non-null count."""
    return dec_sum(col, scale=scale) / F.count(col)


def money_avg(col: Column, scale: int = 4, digits: int = 2) -> Column:
    return det_round(dec_avg(col, scale=scale), digits)


def det_round(col: Column, digits: int) -> Column:
    """Deterministic cross-engine rounding for raw doubles.

    Spark's ROUND(double) rounds the double's *shortest decimal print*
    (BigDecimal.valueOf), DuckDB rounds the *binary value* — they
    disagree whenever the true value sits just under a half boundary
    that prints as exactly half (e.g. 0.5095 -> Spark .510, DuckDB
    .509). floor(x*10^d + 0.5)/10^d is pure IEEE arithmetic, so both
    engines compute bit-identical results (semantics: half toward
    +inf). Use for any rounded double that came from a double division
    or fold; decimal-backed aggregates can keep plain ROUND.
    """
    s = float(10**digits)
    return F.floor(col * s + F.lit(0.5)) / s


def sql_det_round(expr: str, digits: int) -> str:
    s = float(10**digits)
    return f"(floor(({expr}) * {s} + 0.5) / {s})"


def spark_sql_det_round(expr: str, digits: int) -> str:
    """det_round as Spark selectExpr text. Same arithmetic as
    sql_det_round, but with D-suffixed literals: Spark SQL parses a
    bare ``1000.0`` as DECIMAL(5,1) (DuckDB parses it as DOUBLE), and
    decimal arithmetic would change both the value bits and the output
    type."""
    s = float(10**digits)
    return f"(floor(({expr}) * {s}D + 0.5D) / {s}D)"


def ts_str(col: Column, micros: bool = False) -> Column:
    """Timestamp → canonical string (matches DuckDB strftime in oracles).

    Second precision by default; ``micros=True`` → 6-digit fraction
    (DuckDB ``%f``).
    """
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS" if micros else "yyyy-MM-dd HH:mm:ss"
    return F.date_format(col, fmt)


# DuckDB-side equivalents, for building oracle SQL strings.
def sql_dec_sum(expr: str, scale: int = 4) -> str:
    s = float(10**scale)
    return (
        f"(CAST(SUM(CAST(floor(({expr}) * {s} + 0.5) AS BIGINT)) AS DOUBLE) / {s})"
    )


def sql_money_sum(expr: str, scale: int = 4, digits: int = 2) -> str:
    return sql_det_round(sql_dec_sum(expr, scale=scale), digits)


def sql_money_avg(expr: str, scale: int = 4, digits: int = 2) -> str:
    return sql_det_round(f"{sql_dec_sum(expr, scale=scale)} / COUNT({expr})", digits)


def sql_ts_str(expr: str, micros: bool = False) -> str:
    fmt = "%Y-%m-%d %H:%M:%S.%f" if micros else "%Y-%m-%d %H:%M:%S"
    return f"strftime({expr}, '{fmt}')"
