#!/usr/bin/env python
"""Materialize a 10x scale tier (SCALE.md's /tmp/sfx10 protocol).

Default (`--tables documents`) replicates the base SF's documents
table K times: doc_id offset by 1,000,000 per copy (keeps ids disjoint
and the id->copy map obvious), text suffix-mutated per copy
(' mut{k}a mut{k}b mut{k}c') so replicas stay NEAR- rather than exact-
duplicates — the near-dup operators see a realistic
1-original-to-(K-1)-near-dups corpus instead of trivially-exact copies
— and n_chars adjusted to match. This is the r16 protocol and keeps
SCALE.md's per-round 10x numbers comparable.

`--tables documents,events,orders` additionally replicates the
events/orders tables (r17, for the q22 as-of join and percentiles 10x
rows): ids offset by 10,000,000 per copy, timestamps nudged +k seconds
per copy (denser per-key timelines without exact K-way ties — the
realistic scale shape: same key cardinality, K times the rows per
key), every other column carried through. Non-selected tables are
copied unchanged (only these three are interpretable at a different
scale).

Usage:
    python tools/make_tier.py [out_dir] [--base /root/testdata/sf0.1]
                              [--copies 10] [--tables documents]

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
# the same suffix as a DuckDB expression over the copy-index column k
_SUFFIX_EXPR = "(' mut'||k||'a mut'||k||'b mut'||k||'c')"

# per-table replication spec: (id column, per-copy id offset,
# SELECT-body template over read_parquet x the copies(k) relation —
# r18: a range(K) cross join instead of a K-way UNION ALL, which hit
# DuckDB's max_expression_depth at K=1000; output content is
# identical, row order is now deterministic (ORDER BY k, id))
_DOC_SELECT = f"""
SELECT doc_id + k * {{offset}} AS doc_id,
       CASE WHEN k = 0 THEN text
            ELSE text || {_SUFFIX_EXPR} END AS text,
       lang, source,
       CAST(CASE WHEN k = 0 OR text IS NULL THEN n_chars
                 ELSE n_chars + length({_SUFFIX_EXPR}) END AS BIGINT)
           AS n_chars
FROM read_parquet('{{src}}') CROSS JOIN copies"""

_EVENTS_SELECT = """
SELECT event_id + k * {offset} AS event_id,
       ts + to_seconds(k) AS ts,
       user_id, event_type, value, props
FROM read_parquet('{src}') CROSS JOIN copies"""

_ORDERS_SELECT = """
SELECT o_orderkey + k * {offset} AS o_orderkey,
       o_custkey, o_orderstatus, o_totalprice,
       o_orderdate + to_seconds(k) AS o_orderdate,
       o_orderpriority
FROM read_parquet('{src}') CROSS JOIN copies"""

SPECS = {
    "documents": ("doc_id", 1_000_000, _DOC_SELECT),
    "events": ("event_id", 10_000_000, _EVENTS_SELECT),
    "orders": ("o_orderkey", 10_000_000, _ORDERS_SELECT),
}


def _replicate(
    con: duckdb.DuckDBPyConnection,
    table: str,
    src: str,
    out: str,
    copies: int,
    files: int = 1,
) -> None:
    id_col, offset, template = SPECS[table]
    lo, hi = con.sql(
        f"SELECT MIN({id_col}), MAX({id_col}) FROM read_parquet('{src}')"
    ).fetchone()
    # the per-copy offset keys the id->copy map; ids outside
    # [0, offset) would collide across copies and silently corrupt the
    # tier's ground truth (r16 advice).
    if lo is None or lo < 0 or hi >= offset:
        raise SystemExit(
            f"{table}: base {id_col} range [{lo}, {hi}] incompatible "
            f"with the {offset:,} per-copy offset — tier would have "
            "colliding ids"
        )
    body = template.format(offset=offset, src=src)

    def copy_slice(k_lo: int, k_hi: int, dest: str) -> None:
        con.sql(
            "COPY (WITH copies AS "
            f"(SELECT unnest(range({k_lo}, {k_hi})) AS k) "
            f"{body} ORDER BY k, {id_col}"
            f") TO '{dest}' (FORMAT PARQUET)"
        )

    if files <= 1:
        # a prior multi-file run leaves {table}.parquet as a DIRECTORY
        # — DuckDB's COPY TO a file path would fail on it
        if os.path.isdir(out):
            shutil.rmtree(out)
        copy_slice(0, copies, out)
        return
    # cluster-shaped layout (r18 verdict #2): a 100 TB table is
    # thousands of HDFS/S3 objects, never one file — a single-file
    # tier caps Spark's scan parallelism at size/maxPartitionBytes
    # splits (a ~600 MB 1000x documents file = ~5 tasks on 32 cores)
    # while DuckDB parallelizes the same file by row group. Writing
    # the tier as `files` parquet parts under a {table}.parquet/
    # DIRECTORY gives both engines the shape a cluster reads:
    # Spark one split per part, DuckDB the same row-group
    # parallelism it already had. Content is identical to the
    # single-file tier (same rows, same k,id order; part f holds the
    # contiguous copy slice [f*copies/files, (f+1)*copies/files)).
    if os.path.isfile(out):
        os.remove(out)
    elif os.path.isdir(out):
        # rebuild from empty: a re-run with fewer --files would
        # otherwise leave the old run's higher-numbered part files in
        # place, silently inflating the tier's row count (every bench
        # on it would read duplicated copy slices)
        shutil.rmtree(out)
    os.makedirs(out, exist_ok=True)
    for f in range(files):
        k_lo = f * copies // files
        k_hi = (f + 1) * copies // files
        if k_lo == k_hi:
            continue  # files > copies: empty slice, no file
        copy_slice(k_lo, k_hi, os.path.join(out, f"part-{f:05d}.parquet"))


def make_tier(
    base: str,
    out_dir: str,
    copies: int = 10,
    tables: tuple[str, ...] = ("documents",),
    files: int = 1,
) -> int:
    if not tables:
        raise SystemExit("--tables must name at least one table")
    if copies < 1:
        # range(0) would silently write an EMPTY tier parquet that
        # downstream benches consume without error (r18 review — the
        # old UNION ALL form crashed on malformed SQL instead)
        raise SystemExit(f"--copies must be >= 1, got {copies}")
    if files < 1:
        raise SystemExit(f"--files must be >= 1, got {files}")
    unknown = set(tables) - set(SPECS)
    if unknown:
        raise SystemExit(f"no replication spec for tables: {sorted(unknown)}")
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in tables:
        _replicate(
            con,
            t,
            os.path.join(base, f"{t}.parquet"),
            os.path.join(out_dir, f"{t}.parquet"),
            copies,
            files=files,
        )
    for t in glob.glob(os.path.join(base, "*.parquet")):
        if os.path.basename(t)[:-8] not in tables:
            dest = os.path.join(out_dir, os.path.basename(t))
            # same stale-layout hazard as _replicate (r19 review #2):
            # a table REPLICATED multi-file in a prior run and now
            # merely passed through would have shutil.copy write the
            # base file NESTED inside the stale part directory,
            # leaving the old replicated rows in the tier
            if os.path.isdir(dest):
                shutil.rmtree(dest)
            shutil.copy(t, dest)
    first = os.path.join(out_dir, f"{tables[0]}.parquet")
    pat = f"{first}/*.parquet" if os.path.isdir(first) else first
    n = con.sql(f"SELECT COUNT(*) FROM read_parquet('{pat}')").fetchone()[0]
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", nargs="?", default="/tmp/sfx10")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        default="documents",
        help="comma-separated subset of documents,events,orders",
    )
    ap.add_argument(
        "--files",
        type=int,
        default=1,
        help="parquet part-files per replicated table (>1 writes a "
        "{table}.parquet/ directory — the cluster-shaped layout; "
        "default 1 keeps the r16-r18 single-file protocol)",
    )
    args = ap.parse_args()
    tables = tuple(t.strip() for t in args.tables.split(",") if t.strip())
    n = make_tier(args.base, args.out_dir, args.copies, tables, args.files)
    print(f"{args.out_dir}: {tables[0]} rows = {n}")


if __name__ == "__main__":
    main()
