"""Dump ``explain("formatted")`` for named registered queries.

Usage: python tools/dump_plans.py <out_dir> <suffix> <query> [query ...]

Writes ``<out_dir>/<query>_<suffix>.txt`` per query — the evidence files
the optimization-round record cites (plans/r<N>/<q>_{before,after}.txt).
Uses the engine's standard session factory so the dumped plan is the
bench's plan (same AQE/broadcast/shuffle conf).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_wikipedia_updates_spark.registry import REGISTRY
from etl_wikipedia_updates_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit(__doc__)
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    queries = REGISTRY.queries
    for name in names:
        plan = (
            queries[name]
            .builder(spark, SF_DIR)
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange, "
              f"{plan.count('Scan parquet')} parquet scans)")
    spark.stop()


if __name__ == "__main__":
    main()
