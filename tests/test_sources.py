"""Source connector surface tests (no network: registration + replay)."""

from __future__ import annotations

from etl_wikipedia_updates_spark.sources.replay import (
    read_replay_stream,
    write_replay_splits,
)
from etl_wikipedia_updates_spark.sources.sse import (
    SSE_SCHEMA_DDL,
    SSEStreamReader,
    register_sse_source,
)
from etl_wikipedia_updates_spark.tables import load_table


def test_sse_source_registers(spark):
    assert register_sse_source(spark) is True


def test_sse_reader_offsets_roundtrip():
    r = SSEStreamReader({"since": "2026-01-08T22:35:51Z", "url": "http://unused"})
    assert r.initialOffset() == {"since": "2026-01-08T22:35:51Z"}
    r.commit({"since": "2026-01-09T00:00:00Z"})
    assert r.initialOffset() == {"since": "2026-01-09T00:00:00Z"}
    assert "value" in SSE_SCHEMA_DDL and "event" in SSE_SCHEMA_DDL


def test_replay_splits_cover_input(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    chunks = write_replay_splits(events, str(tmp_path), 3, "ts")
    assert len(chunks) == 3
    total = sum(spark.read.parquet(c).count() for c in chunks)
    assert total == events.count()
    stream = read_replay_stream(spark, str(tmp_path), events.schema)
    assert stream.isStreaming