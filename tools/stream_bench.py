#!/usr/bin/env python
"""Streaming ingest throughput bench (BASELINE.md bench contract).

Replays the events table through the file-replay source into the
foreachBatch parquet sink and reports sustained events/s. The bar is
>=100x the Wikimedia recentchange SSE rate (~10-40 ev/s publicly
observed => >=4000 ev/s; /root/reference/config.py:10). Then replays
the documents table through each streaming dedup/curation mode
(plain MinHash, quality-gated, Jaccard-verified, span-veto) and
reports docs/s per mode.

Prints one JSON line per measurement. With ``--out PATH`` it also
writes the combined object to PATH — the per-round regression
artifact (STREAMBENCH_r{N}.json at the repo root, r17 verdict #4:
the SCALE.md §8 throughput numbers were session-local prose before
this, so a regression there was invisible to round-over-round diffs).

Run: python tools/stream_bench.py [sf_dir] [--out PATH]
     [--modes neardup,quality,verified,span]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import tempfile
import time

from etl_wikipedia_updates_spark.session import get_spark
from etl_wikipedia_updates_spark.sources.replay import (
    read_replay_stream,
    write_replay_splits,
)
from etl_wikipedia_updates_spark.streaming.ingest import (
    ingest_with_retention,
    read_sink,
)
from etl_wikipedia_updates_spark.tables import load_table

WIKIMEDIA_EV_S = 40  # upper end of the publicly observed SSE rate
N_SPLITS = 8  # micro-batches; each batch pays trigger+commit overhead
TIMEOUT_S = 600


def _await_or_die(q, what: str) -> None:
    """A timed-out replay must FAIL the bench, not report a partial
    sink as a result (and the still-running query would then race the
    TemporaryDirectory cleanup)."""
    if not q.awaitTermination(TIMEOUT_S):
        q.stop()
        raise SystemExit(
            f"{what}: replay did not finish within {TIMEOUT_S}s; "
            "no benchmark result (partial sink discarded)"
        )


def _replay_docs(spark, docs, start, what: str):
    """Replay ``docs`` through a doc-mode ingest starter; return
    (elapsed_sec, rows_kept)."""
    with tempfile.TemporaryDirectory() as tmp:
        replay = f"{tmp}/replay"
        write_replay_splits(docs, replay, N_SPLITS, "doc_id")
        stream = read_replay_stream(spark, replay, docs.schema)
        t0 = time.perf_counter()
        q = start(stream, f"{tmp}/sink", f"{tmp}/ckpt")
        _await_or_die(q, what)
        elapsed = time.perf_counter() - t0
        kept = read_sink(spark, f"{tmp}/sink").count()
    return elapsed, kept


def main() -> None:
    from etl_wikipedia_updates_spark.streaming.neardup import (
        ingest_with_neardup,
        ingest_with_quality_neardup,
        ingest_with_span_neardup,
        ingest_with_verified_neardup,
    )

    doc_modes = {
        # metric-name prefix -> (starter, one-line cost note)
        "neardup": (
            ingest_with_neardup,
            "shingle+MinHash per batch + bucket-store collision join",
        ),
        "quality": (
            ingest_with_quality_neardup,
            "quality gate, then the MinHash dedup path",
        ),
        "verified": (
            ingest_with_verified_neardup,
            "MinHash nomination + exact bottom-k Jaccard verify",
        ),
        "span": (
            ingest_with_span_neardup,
            "exact-substring veto: span hashes ARE the store rows",
        ),
    }
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=None,
        help="also write the combined JSON object here "
        "(STREAMBENCH_r{N}.json per-round artifact)",
    )
    ap.add_argument(
        "--modes",
        default=",".join(doc_modes),
        help="comma-separated doc-mode subset (default: all)",
    )
    args = ap.parse_args()
    sf_dir = args.sf_dir
    selected = [m for m in args.modes.split(",") if m]
    unknown = set(selected) - set(doc_modes)
    if unknown:
        raise SystemExit(f"unknown modes: {sorted(unknown)}")

    results: list[dict] = []

    def emit(obj: dict) -> None:
        print(json.dumps(obj), flush=True)
        results.append(obj)

    spark = get_spark(app_name="stream_bench", shuffle_partitions=8)
    events = load_table(spark, sf_dir, "events")
    n_events = events.count()
    with tempfile.TemporaryDirectory() as tmp:
        replay = f"{tmp}/replay"
        write_replay_splits(events, replay, N_SPLITS, "ts")
        stream = read_replay_stream(spark, replay, events.schema)
        t0 = time.perf_counter()
        q = ingest_with_retention(stream, f"{tmp}/sink", f"{tmp}/ckpt")
        _await_or_die(q, "stream_ingest")
        elapsed = time.perf_counter() - t0
        sunk = read_sink(spark, f"{tmp}/sink").count()
    ev_s = sunk / elapsed
    emit(
        {
            "metric": "stream_ingest_events_per_sec",
            "value": round(ev_s, 1),
            "unit": "events/sec",
            "events": sunk,
            "expected_events": n_events,
            "elapsed_sec": round(elapsed, 2),
            "micro_batches": N_SPLITS,
            "x_wikimedia": round(ev_s / WIKIMEDIA_EV_S, 1),
            "meets_100x_bar": ev_s >= 100 * WIKIMEDIA_EV_S,
            "sf": sf_dir,
        }
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    for mode in selected:
        start, note = doc_modes[mode]
        elapsed, kept = _replay_docs(spark, docs, start, f"{mode}_ingest")
        emit(
            {
                "metric": f"{mode}_ingest_docs_per_sec",
                "value": round(n_docs / elapsed, 1),
                "unit": "docs/sec",
                "docs_in": n_docs,
                "docs_kept": kept,
                "elapsed_sec": round(elapsed, 2),
                "micro_batches": N_SPLITS,
                "note": note,
                "sf": sf_dir,
            }
        )

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {
                    "sf": sf_dir,
                    "micro_batches": N_SPLITS,
                    "measurements": results,
                },
                f,
                indent=1,
            )
        print(f"wrote {args.out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
