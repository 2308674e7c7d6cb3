#!/usr/bin/env python
"""Time every registered oracle SQL in DuckDB — the bench baseline.

Prints one JSON line {"queries": {name: sec}, "total": sec,
"skipped_no_oracle": [...], "sf": 0.1}. "total" covers ONLY the
oracle-backed queries (listed names are skipped) — compare it against
the same subset of bench.py's per-query timings, NOT against bench.py's
"value", which also sums the oracle-less entries. --repeat mirrors
bench.py's knob so the min-of-N protocol stays symmetric when iterating
with a different N.

Run: python tools/duckdb_bench.py [sf_dir] [--repeat N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import time

from etl_wikipedia_updates_spark.oracle import duckdb_connection
from etl_wikipedia_updates_spark.registry import REGISTRY


def _sf_from_dir(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return sf_dir


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    duck = duckdb_connection(args.sf_dir)
    timings: dict[str, float] = {}
    skipped: list[str] = []
    for name, q in REGISTRY.queries.items():
        if not q.oracle:
            skipped.append(name)
            continue
        duck.sql(q.oracle).fetchall()  # warm (page cache, catalog)
        best = float("inf")
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            duck.sql(q.oracle).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
    print(
        json.dumps(
            {
                "queries": timings,
                "total": round(sum(timings.values()), 4),
                "skipped_no_oracle": skipped,
                "sf": _sf_from_dir(args.sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
