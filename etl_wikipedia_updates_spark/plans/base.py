"""Query registry: each declared query = a Spark builder + a DuckDB oracle.

The driver's correctness gate runs ``queries()[name](spark, sf_dir)`` and
hash-compares against ``oracle_sql()[name]`` run in DuckDB over the same
parquet tables. Column names/types must line up, every query must have a
total ORDER BY, and float outputs must be deterministic — see
``functions.deterministic`` for the conventions.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL; None → driver records rows-only check
    doc: str = ""


@dataclass
class QueryRegistry:
    queries: dict[str, DeclaredQuery] = field(default_factory=dict)

    def add(self, q: DeclaredQuery) -> None:
        if q.name in self.queries:
            raise ValueError(f"duplicate query name {q.name!r}")
        self.queries[q.name] = q

    def extend(self, qs: list[DeclaredQuery]) -> None:
        for q in qs:
            self.add(q)

    def builders(self) -> dict[str, Builder]:
        return {n: q.builder for n, q in self.queries.items()}

    def oracles(self) -> dict[str, str]:
        return {n: q.oracle for n, q in self.queries.items() if q.oracle is not None}
