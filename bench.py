#!/usr/bin/env python
"""Bench harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "total_query_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Timing convention: per query, wall time of a *warm* build + execution
into the noop sink. Each query first runs once untimed at the target
SF: the first execution pays JVM lazy classloading out of the Spark
jars (seconds-to-minutes of I/O on this container's disk), Janino
codegen compilation for the AQE-chosen physical operators, and the
first uncached parquet read — one-time costs a long-running cluster
never re-pays, so they don't belong in per-query numbers. The timed
value is the MIN of --repeat (default 2) runs: single timed runs still
carry JIT-tiering and box-load noise. The DuckDB baseline
(tools/duckdb_bench.py) is timed the same way (warm + min-of-2).
Caches are cleared between warm and timed runs so the timed run
re-executes the whole plan, including its own persist() work. Session
conf is the engine's standard factory — the bench exercises the same
knobs production would use.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import time

from etl_wikipedia_updates_spark.registry import REGISTRY
from etl_wikipedia_updates_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    # --only/--repeat are the perf-iteration loop (a perf commit should
    # quote before/after numbers measured with the same flags); the
    # no-flag invocation is the driver's full-suite protocol, unchanged.
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--only",
        action="append",
        default=None,
        help="query name or comma-separated list; repeatable (values "
        "union); keeps registry (suite) order",
    )
    ap.add_argument(
        "--repeat",
        type=int,
        default=2,
        help="timed runs per query; per-query value reported is the min. "
        "Default 2: single timed runs carry ~0.5-1s of JIT-tiering and "
        "box-load noise on early queries (measured; min-of-N converges "
        "by the second run). The DuckDB baseline (tools/duckdb_bench.py) "
        "uses the same warm + min-of-2 protocol, so the comparison "
        "stays symmetric.",
    )
    args = ap.parse_args()

    spark = get_spark(app_name="bench")
    builders = REGISTRY.builders()
    if args.only:
        only = {
            q.strip()
            for part in args.only
            for q in part.split(",")
            if q.strip()
        }
        unknown = only - set(builders)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        builders = {n: b for n, b in builders.items() if n in only}

    def run(build) -> None:
        # noop sink: executes the full plan on the executors without
        # row-serializing results to the driver — measures the query,
        # not driver-side collect overhead on wide outputs.
        build(spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # Suite-position warm-up: whichever query runs FIRST absorbs the
    # JVM's C2 tiering ramp and first-touch box loading on top of its
    # own plan's warm-up (measured: q1 0.25s at position 1 vs 0.12s
    # later; tfidf 0.74s official at position 1 vs 0.65s min-of-3
    # mid-session). Untimed runs of a cheap JVM-side query, a scalar
    # pandas-UDF query (the Python worker pool + Arrow path have their
    # own cold start, measured ~0.05s on the first Arrow query) and a
    # grouped-map query pay those suite-level costs outside every
    # timing. The grouped-map entry is new in r8: FlatMapGroupsInPandas
    # has its own first-touch the scalar Arrow path doesn't absorb
    # (measured r7: grouped_zscore 0.545s official at suite position 1
    # vs 0.381s min-of-3 isolated; bm25_rank 0.595s vs 0.407s).
    all_builders = REGISTRY.builders()
    for wname in ("q1", "q28", "grouped_zscore"):
        if wname in all_builders:
            run(all_builders[wname])
            spark.catalog.clearCache()
            gc.collect()

    timings: dict[str, float] = {}
    for name, build in builders.items():
        run(build)  # warm: classload, codegen, page cache (untimed)
        spark.catalog.clearCache()
        gc.collect()  # release DF refs so localCheckpoint blocks free up
        best = float("inf")
        for _ in range(max(1, args.repeat)):
            t0 = time.perf_counter()
            run(build)
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "total_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
