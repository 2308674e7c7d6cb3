#!/usr/bin/env python
"""Materialize the 10x documents scale tier (SCALE.md's /tmp/sfx10).

The tier replicates the base SF's documents table K times: doc_id
offset by 1,000,000 per copy (keeps ids disjoint and the id->copy map
obvious), text suffix-mutated per copy (' mut{k}a mut{k}b mut{k}c') so
replicas stay NEAR- rather than exact-duplicates — the near-dup
operators see a realistic 1-original-to-(K-1)-near-dups corpus instead
of trivially-exact copies — and n_chars adjusted to match. Every other
table is copied unchanged (only the documents family is interpretable
at a different scale).

Usage:
    python tools/make_tier.py [out_dir] [--base /root/testdata/sf0.1]
                              [--copies 10]

Then measure both engines against it:
    SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
    python tools/duckdb_bench.py <out_dir>
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil

import duckdb

MUT_SUFFIX = " mut{k}a mut{k}b mut{k}c"


def make_tier(base: str, out_dir: str, copies: int = 10) -> int:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    src = os.path.join(base, "documents.parquet")
    lo, hi = con.sql(
        f"SELECT MIN(doc_id), MAX(doc_id) FROM read_parquet('{src}')"
    ).fetchone()
    # the per-copy offset keys the id->copy map; ids outside
    # [0, 1_000_000) would collide across copies and silently corrupt
    # the tier's near-dup ground truth (r16 advice).
    if lo is None or lo < 0 or hi >= 1_000_000:
        raise SystemExit(
            f"base doc_id range [{lo}, {hi}] incompatible with the "
            "1,000,000 per-copy offset — tier would have colliding ids"
        )
    parts = []
    for k in range(copies):
        suffix = MUT_SUFFIX.format(k=k)
        parts.append(
            f"""
SELECT doc_id + {k * 1_000_000} AS doc_id,
       CASE WHEN {k} = 0 THEN text
            ELSE text || '{suffix}' END AS text,
       lang, source,
       CAST(CASE WHEN {k} = 0 OR text IS NULL THEN n_chars
                 ELSE n_chars + {len(suffix)} END AS BIGINT) AS n_chars
FROM read_parquet('{src}')"""
        )
    out = os.path.join(out_dir, "documents.parquet")
    con.sql(
        "COPY ("
        + " UNION ALL ".join(parts)
        + f") TO '{out}' (FORMAT PARQUET)"
    )
    for t in glob.glob(os.path.join(base, "*.parquet")):
        if os.path.basename(t) != "documents.parquet":
            shutil.copy(t, os.path.join(out_dir, os.path.basename(t)))
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{out}')").fetchone()[0]
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/sfx10")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    args = ap.parse_args()
    n = make_tier(args.base, args.out_dir, args.copies)
    print(f"{args.out_dir}: documents rows = {n}")


if __name__ == "__main__":
    main()
