"""SSE (Server-Sent-Events) streaming DataSource — the reference's live
source (R1: sse_event_generator, /root/reference/pipeline.py:60-102)
as a Spark 4 Python Data Source.

Offsets are the reference's ``?since=`` resume semantics (R2,
pipeline.py:74-76): the offset is the last event timestamp delivered,
and reconnects pass it back to the endpoint so no event is skipped;
duplicate redelivery across the overlap is absorbed downstream by the
natural-key dedup (R10), exactly the reference's recovery recipe
(SURVEY §4.2). Network-dependent — registered but not exercised by the
test tiers (the deterministic ``replay`` source covers the streaming
contract S1-S5).

Uses only stdlib HTTP so the connector imports everywhere; partitions=1
because SSE is a single ordered feed (like the reference's single
generator) — parallelism comes from everything downstream.
"""

from __future__ import annotations

import http.client
import json
from collections.abc import Iterator

try:
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    _DATASOURCE_API = True
except ImportError:  # pragma: no cover - pyspark < 4
    _DATASOURCE_API = False

    class DataSource:  # type: ignore[no-redef]
        pass

    class DataSourceStreamReader:  # type: ignore[no-redef]
        pass

    class InputPartition:  # type: ignore[no-redef]
        def __init__(self, value=None):
            self.value = value


SSE_SCHEMA_DDL = "value string, event string"


def _iter_sse_lines(
    url: str,
    user_agent: str,
    since: str | None,
    timeout: float | None = None,
) -> Iterator[dict]:
    """Minimal SSE protocol client over stdlib urllib: yields
    {'event': ..., 'data': ...} per message, like sseclient does for the
    reference (pipeline.py:82-85). ``timeout`` is the socket read
    timeout: a quiet-but-open stream raises socket.timeout (an OSError)
    instead of blocking the trigger forever."""
    import urllib.request

    full = url if not since else f"{url}?since={since}"
    req = urllib.request.Request(full, headers={
        "User-Agent": user_agent,
        "Accept": "text/event-stream",
    })
    with urllib.request.urlopen(  # noqa: S310 - declared SSE endpoint
        req, timeout=timeout
    ) as resp:
        event: dict = {}
        data_lines: list[str] = []
        for raw in resp:
            line = raw.decode("utf-8", errors="replace").rstrip("\n").rstrip("\r")
            if not line:
                if data_lines:
                    event["data"] = "\n".join(data_lines)
                    yield event
                event, data_lines = {}, []
                continue
            if line.startswith(":"):
                continue
            field, _, value = line.partition(":")
            value = value.removeprefix(" ")
            if field == "event":
                event["event"] = value
            elif field == "data":
                data_lines.append(value)


class SSEStreamReader(DataSourceStreamReader):
    """Offsets = last delivered event timestamp (meta.dt), mirroring the
    reference's MAX(event_timestamp) resume lookup (pipeline.py:226-227).

    ONE persistent connection serves every trigger — the generator stays
    suspended between micro-batches with the HTTP response open, exactly
    the reference's long-lived ``EventSource`` (pipeline.py:53-58). The
    ``?since=`` resume parameter is the RECOVERY path only: it is sent
    when (re)connecting — first trigger, server EOF, or socket error —
    never per trigger. Each micro-batch drains up to max_events_per_batch
    events; on failure Spark retries the batch and the ?since= reconnect
    replays the overlap (at-least-once; dedup downstream absorbs it)."""

    def __init__(self, options: dict):
        self._url = options.get(
            "url", "https://stream.wikimedia.org/v2/stream/recentchange"
        )
        self._user_agent = options.get("userAgent", "etl-wikipedia-updates-spark")
        self._max_per_batch = int(options.get("maxEventsPerBatch", "1000"))
        # Socket read timeout per trigger drain: without one, a
        # quiet-but-open stream blocks latestOffset (and therefore every
        # trigger) indefinitely. Timing out surfaces as socket.timeout
        # (an OSError), i.e. end-of-drain + reconnect-with-?since=.
        self._timeout = float(options.get("readTimeoutSec", "30"))
        self._since = options.get("since") or None
        self._buffer: list[tuple[str, str]] = []
        self._it: Iterator[dict] | None = None
        self.connect_count = 0  # observable for tests/diagnostics

    def _connect(self) -> None:
        self._it = _iter_sse_lines(
            self._url, self._user_agent, self._since, timeout=self._timeout
        )
        self.connect_count += 1

    def _disconnect(self) -> None:
        if self._it is not None:
            close = getattr(self._it, "close", None)
            if close is not None:
                close()  # GeneratorExit -> urlopen context manager exits
            self._it = None

    def initialOffset(self) -> dict:
        return {"since": self._since or ""}

    def latestOffset(self) -> dict:
        # Drain up to max_per_batch events from the live connection; the
        # newest event time seen becomes the new offset.
        last = self._since or ""
        self._buffer = []
        try:
            if self._it is None:
                self._connect()
            stream_open = False
            for msg in self._it:
                data = msg.get("data", "")
                self._buffer.append((data, msg.get("event", "")))
                try:
                    dt = json.loads(data).get("meta", {}).get("dt")
                    if dt:
                        last = dt
                except (json.JSONDecodeError, AttributeError):
                    pass
                if len(self._buffer) >= self._max_per_batch:
                    stream_open = True  # generator suspends, socket stays up
                    break
            if not stream_open:
                # server closed the stream (EOF): reconnect next trigger
                # with ?since= so the overlap replays
                self._disconnect()
        except (OSError, http.client.HTTPException):
            # Connection died or went quiet mid-drain (socket.timeout is
            # an OSError; IncompleteRead and friends are HTTPException,
            # not OSError): whatever was buffered still ships this
            # batch; next trigger reconnects with ?since= (reference's
            # backoff+resume, pipeline.py:53-58/74-76).
            self._disconnect()
        return {"since": last}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [InputPartition(self._buffer)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        yield from partition.value

    def commit(self, end: dict) -> None:
        self._since = end.get("since") or None

    def stop(self) -> None:
        self._disconnect()


class SSEDataSource(DataSource):
    """spark.readStream.format("sse").option("url", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "sse"

    def schema(self) -> str:
        return SSE_SCHEMA_DDL

    def streamReader(self, schema) -> SSEStreamReader:
        return SSEStreamReader(self.options)


def register_sse_source(spark) -> bool:
    """Register the connector (Spark 4+). Returns False when the Python
    Data Source API is unavailable."""
    if not _DATASOURCE_API:
        return False
    spark.dataSource.register(SSEDataSource)
    return True
