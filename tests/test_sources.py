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


def test_sse_end_to_end_loopback(spark, tmp_path):
    """R1 live: a loopback SSE server serves the wiki fixture; the
    engine consumes it through spark.readStream.format('sse') and the
    sink must hold every served payload. (The transform itself is
    covered by wiki_pipeline/W1-W5 — this exercises the network source.)
    """
    import http.server
    import threading
    import time

    from etl_wikipedia_updates_spark.plans.wiki import FIXTURE_LINES

    served = {"n": 0}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 - stdlib naming
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.end_headers()
            if served["n"] == 0:
                served["n"] += 1
                for line in FIXTURE_LINES:
                    self.wfile.write(f"event: message\ndata: {line}\n\n".encode())
            # later reconnects get an empty stream and EOF

        def log_message(self, *args):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        register_sse_source(spark)
        stream = (
            spark.readStream.format("sse")
            .option("url", f"http://127.0.0.1:{srv.server_address[1]}/stream")
            .load()
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("sse_e2e")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="1 second")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.sql("SELECT COUNT(*) n FROM sse_e2e").first()["n"] >= len(
                FIXTURE_LINES
            ):
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        got = {r.value for r in spark.sql("SELECT value FROM sse_e2e").collect()}
        assert got == set(FIXTURE_LINES)
    finally:
        srv.shutdown()


def test_replay_splits_cover_input(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    chunks = write_replay_splits(events, str(tmp_path), 3, "ts")
    assert len(chunks) == 3
    total = sum(spark.read.parquet(c).count() for c in chunks)
    assert total == events.count()
    stream = read_replay_stream(spark, str(tmp_path), events.schema)
    assert stream.isStreaming