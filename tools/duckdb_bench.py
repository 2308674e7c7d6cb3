#!/usr/bin/env python
"""Time every registered oracle SQL in DuckDB — the bench baseline.

Prints one JSON line {"queries": {name: sec}, "total": sec,
"skipped_no_oracle": [...], "sf": 0.1}. "total" covers ONLY the
oracle-backed queries (listed names are skipped) — compare it against
the same subset of bench.py's per-query timings, NOT against bench.py's
"value", which also sums the oracle-less entries. --repeat mirrors
bench.py's knob so the min-of-N protocol stays symmetric when iterating
with a different N. --only restricts to named queries (bench.py's
flag); --cap SECONDS runs each oracle in a KILLED-on-timeout
subprocess and records "timeout>CAP" instead of hanging the whole
suite — the SCALE.md r16 10x-tier protocol, where four near-dup
oracles never finish (an uncapped attempt ran 50 wall-minutes before
being killed). Capped entries count at the cap in "total", so the
printed total is a LOWER bound when any timeout is present.

Run: python tools/duckdb_bench.py [sf_dir] [--repeat N]
     [--only a,b,...] [--cap SECONDS]
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


def _time_one(name: str, sf_dir: str, repeat: int) -> float:
    """Warm + min-of-N for one oracle, in-process."""
    duck = duckdb_connection(sf_dir)
    q = REGISTRY.queries[name]
    duck.sql(q.oracle).fetchall()  # warm (page cache, catalog)
    best = float("inf")
    for _ in range(max(1, repeat)):
        t0 = time.perf_counter()
        duck.sql(q.oracle).fetchall()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument(
        "--only",
        action="append",
        default=None,
        help="query name or comma-separated list; repeatable",
    )
    ap.add_argument(
        "--cap",
        type=float,
        default=None,
        help="per-query wall cap in seconds; each oracle runs in a "
        "subprocess killed at the cap and recorded as 'timeout>CAP' "
        "(counted AT the cap in total, making it a lower bound)",
    )
    # internal: one-query child mode for --cap
    ap.add_argument("--one", help=argparse.SUPPRESS)
    args = ap.parse_args()
    if args.one:
        print(json.dumps(_time_one(args.one, args.sf_dir, args.repeat)))
        return
    names = [n for n, q in REGISTRY.queries.items() if q.oracle]
    skipped = [n for n, q in REGISTRY.queries.items() if not q.oracle]
    if args.only:
        only = {
            q.strip()
            for part in args.only
            for q in part.split(",")
            if q.strip()
        }
        unknown = only - set(names)
        if unknown:
            raise SystemExit(f"unknown/oracle-less queries: {sorted(unknown)}")
        names = [n for n in names if n in only]
    timings: dict[str, object] = {}
    total = 0.0
    for name in names:
        if args.cap is None:
            t = _time_one(name, args.sf_dir, args.repeat)
        else:
            import subprocess
            import sys as _sys

            try:
                r = subprocess.run(
                    [
                        _sys.executable,
                        os.path.abspath(__file__),
                        args.sf_dir,
                        "--repeat",
                        str(args.repeat),
                        "--one",
                        name,
                    ],
                    capture_output=True,
                    text=True,
                    timeout=args.cap,
                )
                out = r.stdout.strip()
                if r.returncode != 0 or not out:
                    # child died (DuckDB error, OOM kill, ...) rather
                    # than timing out — record WHICH query and why
                    # instead of crashing the whole bench run.
                    err = (r.stderr or "").strip().splitlines()
                    t = "error: rc={} {}".format(
                        r.returncode, err[-1][:200] if err else "(no stderr)"
                    )
                else:
                    try:
                        t = json.loads(out.splitlines()[-1])
                    except (json.JSONDecodeError, ValueError):
                        # rc==0 but the last stdout line isn't the
                        # timing JSON (stray warning after it): record
                        # an error row, don't crash the run (r17
                        # advice — same class as the rc!=0 hardening).
                        t = "error: non-JSON stdout tail {!r}".format(
                            out.splitlines()[-1][:200]
                        )
            except subprocess.TimeoutExpired:
                t = f"timeout>{args.cap:g}"
        timings[name] = t
        total += t if isinstance(t, float) else args.cap
    print(
        json.dumps(
            {
                "queries": timings,
                "total": round(total, 4),
                "skipped_no_oracle": skipped,
                "sf": _sf_from_dir(args.sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
