#!/usr/bin/env python
"""Time every registered oracle SQL in DuckDB — the bench baseline.

Prints one JSON line {"queries": {name: sec}, "total": sec, "sf": dir}.
Run: python tools/duckdb_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

from etl_wikipedia_updates_spark.oracle import duckdb_connection
from etl_wikipedia_updates_spark.registry import REGISTRY


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    duck = duckdb_connection(sf_dir)
    timings: dict[str, float] = {}
    for name, q in REGISTRY.queries.items():
        if not q.oracle:
            continue
        duck.sql(q.oracle).fetchall()  # warm (page cache, catalog)
        # min-of-2 timed runs — same protocol as bench.py's default
        # --repeat 2, so the Spark/DuckDB comparison stays symmetric.
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            duck.sql(q.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "queries": timings,
                "total": round(sum(timings.values()), 4),
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()
