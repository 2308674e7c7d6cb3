#!/usr/bin/env python
"""Streaming ingest throughput bench (BASELINE.md bench contract).

Replays the events table through the file-replay source into the
foreachBatch parquet sink and reports sustained events/s. The bar is
>=100x the Wikimedia recentchange SSE rate (~10-40 ev/s publicly
observed => >=4000 ev/s; /root/reference/config.py:10).

Prints one JSON line. Run: python tools/stream_bench.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
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
    print(
        json.dumps(
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
    )

    # Second line: document ingest WITH ingest-time near-dup dedup
    # (streaming/neardup.py) — shingle+MinHash per batch plus the
    # bucket-store collision join on top of the plain append path.
    from etl_wikipedia_updates_spark.streaming.neardup import (
        ingest_with_neardup,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    with tempfile.TemporaryDirectory() as tmp:
        replay = f"{tmp}/replay"
        write_replay_splits(docs, replay, N_SPLITS, "doc_id")
        stream = read_replay_stream(spark, replay, docs.schema)
        t0 = time.perf_counter()
        q = ingest_with_neardup(stream, f"{tmp}/sink", f"{tmp}/ckpt")
        _await_or_die(q, "neardup_ingest")
        elapsed = time.perf_counter() - t0
        kept = read_sink(spark, f"{tmp}/sink").count()
    print(
        json.dumps(
            {
                "metric": "neardup_ingest_docs_per_sec",
                "value": round(n_docs / elapsed, 1),
                "unit": "docs/sec",
                "docs_in": n_docs,
                "docs_kept": kept,
                "elapsed_sec": round(elapsed, 2),
                "micro_batches": N_SPLITS,
                "sf": sf_dir,
            }
        )
    )

    # Third line: span-mode dedup ingest (r17) — exact-substring veto;
    # the per-batch cost is the span hashing (one Generate, ~n_tok/HOP
    # rows per doc) plus the same store collision join, i.e. a larger
    # store row count than MinHash's fixed bands-per-doc in exchange
    # for exact span semantics.
    from etl_wikipedia_updates_spark.streaming.neardup import (
        ingest_with_span_neardup,
    )

    with tempfile.TemporaryDirectory() as tmp:
        replay = f"{tmp}/replay"
        write_replay_splits(docs, replay, N_SPLITS, "doc_id")
        stream = read_replay_stream(spark, replay, docs.schema)
        t0 = time.perf_counter()
        q = ingest_with_span_neardup(stream, f"{tmp}/sink", f"{tmp}/ckpt")
        _await_or_die(q, "span_ingest")
        elapsed = time.perf_counter() - t0
        kept = read_sink(spark, f"{tmp}/sink").count()
    print(
        json.dumps(
            {
                "metric": "span_ingest_docs_per_sec",
                "value": round(n_docs / elapsed, 1),
                "unit": "docs/sec",
                "docs_in": n_docs,
                "docs_kept": kept,
                "elapsed_sec": round(elapsed, 2),
                "micro_batches": N_SPLITS,
                "sf": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
