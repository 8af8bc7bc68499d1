"""Wikimedia EventStreams SSE source (SURVEY.md §2.1 S1-S3, §7 step 6).

A custom Python streaming DataSource (pyspark.sql.datasource) that speaks
the SSE wire protocol the reference consumes via the `eventsource` npm
package (/root/reference/index.js:295-305): one JSON document per `data:`
field from https://stream.wikimedia.org/v2/stream/recentchange.

Components:
- ``iter_sse_events``  — incremental SSE line-protocol parser (WHATWG
  EventSource semantics: data:/event:/id:/retry:, comment lines, blank-line
  dispatch, multi-line data joined with newlines).
- ``SSEStreamReader``  — SimpleDataSourceStreamReader. Live mode keeps a
  background reader thread feeding a queue; each micro-batch drains what
  arrived. Reconnect watchdog (S3, /root/reference/index.js:349-356): if no
  event for ``timeout_after_s`` the connection is torn down and rebuilt
  with a Last-Event-ID header, the SSE-native resume.
- ``file://`` transport — replays a local SSE transcript through the SAME
  parser and reader path; this is what tests exercise (no network in CI).
- ``rc_from_sse``      — S2: from_json with the pinned RC_EVENT_SCHEMA,
  flattened to the engine's internal flat event shape.

The raw row shape is (event, id, value): the SSE envelope with the JSON
payload left as a string, so schema application is an explicit, pruned
`from_json` projection rather than source magic.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader
from pyspark.sql.types import StructType

from ..schemas import RC_EVENT_SCHEMA

RAW_SSE_SCHEMA = "event string, id string, value string"


# ---------------------------------------------------------------------------
# SSE wire-protocol parser
# ---------------------------------------------------------------------------

def iter_sse_events(lines: Iterable[str]) -> Iterator[dict]:
    """Parse an SSE line stream into events {event, id, data}.

    Follows the EventSource dispatch rules: fields accumulate until an
    empty line; `data` lines concatenate with '\\n'; lines starting with
    ':' are comments (Wikimedia sends them as keep-alives); a field with
    no colon is a field name with empty value.
    """
    event_type, event_id, data_lines = None, None, []
    for raw in lines:
        line = raw.rstrip("\n").rstrip("\r")
        if line == "":
            if data_lines:
                yield {
                    "event": event_type or "message",
                    "id": event_id,
                    "data": "\n".join(data_lines),
                }
            event_type, data_lines = None, []
            continue
        if line.startswith(":"):
            continue
        field, _, value = line.partition(":")
        value = value[1:] if value.startswith(" ") else value
        if field == "data":
            data_lines.append(value)
        elif field == "event":
            event_type = value
        elif field == "id":
            event_id = value
        # 'retry' is a hint for reconnect backoff; tracked by the caller
    if data_lines:
        yield {"event": event_type or "message", "id": event_id,
               "data": "\n".join(data_lines)}


# ---------------------------------------------------------------------------
# transports
# ---------------------------------------------------------------------------

def _open_lines(url: str, last_event_id: str | None,
                connect_timeout_s: float) -> Iterator[str]:
    """Yield decoded lines from the SSE endpoint. file:// replays a local
    transcript (tests); http(s):// opens a real streaming response with
    Last-Event-ID resume."""
    if url.startswith("file://"):
        with open(url[len("file://"):], encoding="utf-8") as f:
            yield from f
        return
    import urllib.request

    req = urllib.request.Request(url, headers={
        "Accept": "text/event-stream",
        "Cache-Control": "no-cache",
        **({"Last-Event-ID": last_event_id} if last_event_id else {}),
    })
    resp = urllib.request.urlopen(req, timeout=connect_timeout_s)
    for raw in resp:
        yield raw.decode("utf-8", errors="replace")


class _LiveFeed:
    """Background reader thread + queue + reconnect watchdog (S3)."""

    def __init__(self, url: str, timeout_after_s: float,
                 connect_timeout_s: float = 30.0):
        self.url = url
        self.timeout_after_s = timeout_after_s
        self.connect_timeout_s = connect_timeout_s
        self.q: queue.Queue = queue.Queue()
        self.last_event_id: str | None = None
        self.last_event_time = time.monotonic()
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def _run(self, stop: threading.Event) -> None:
        # `stop` is THIS thread's own event, captured at spawn: the
        # watchdog replaces self._stop when it rebuilds the reader, and a
        # replaced reader still blocked in a socket read must keep seeing
        # its own (set) event — reading self._stop here would un-stop it
        # and leave a zombie reader feeding the queue alongside the new one
        while not stop.is_set():
            try:
                lines = _open_lines(self.url, self.last_event_id,
                                    self.connect_timeout_s)
                for ev in iter_sse_events(lines):
                    if stop.is_set():
                        return
                    self.last_event_id = ev["id"] or self.last_event_id
                    self.last_event_time = time.monotonic()
                    self.q.put(ev)
                if self.url.startswith("file://"):
                    return  # transcript exhausted; no reconnect loop
            except Exception:
                pass  # fall through to backoff + reconnect
            time.sleep(min(5.0, self.connect_timeout_s / 6))

    def ensure_running(self) -> None:
        stale = (time.monotonic() - self.last_event_time) > self.timeout_after_s
        dead = self._thread is None or not self._thread.is_alive()
        if dead or (stale and not self.url.startswith("file://")):
            # watchdog parity (/root/reference/index.js:349-356): rebuild
            # the socket when the feed goes quiet for timeout_after.
            if self._thread is not None and self._thread.is_alive():
                self._stop.set()
                self._thread.join(timeout=2.0)
                self._stop = threading.Event()
            if not (self.url.startswith("file://") and self._thread is not None):
                self._thread = threading.Thread(
                    target=self._run, args=(self._stop,), daemon=True
                )
                self._thread.start()
            self.last_event_time = time.monotonic()

    def drain(self, max_events: int, wait_s: float) -> list[dict]:
        out: list[dict] = []
        deadline = time.monotonic() + wait_s
        while len(out) < max_events:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                out.append(self.q.get(timeout=min(remaining, 0.25)))
            except queue.Empty:
                if self._thread is not None and not self._thread.is_alive():
                    break  # transcript done: don't sit out the full wait
        return out

    def stop(self) -> None:
        self._stop.set()


class SSEStreamReader(SimpleDataSourceStreamReader):
    """Simple-API stream reader: runs on the driver, prefetched by Spark.

    Offsets are a monotone event counter plus the last SSE id, so a restart
    resumes the live connection with Last-Event-ID (the stream itself is
    the system of record; replay between arbitrary offsets is served from
    Spark's simple-reader cache, matching SSE's at-least-once nature).
    """

    def __init__(self, options: dict):
        self.url = options.get(
            "url",
            "https://stream.wikimedia.org/v2/stream/recentchange",
        )
        self.max_batch = int(options.get("maxeventsperbatch", "10000"))
        self.batch_wait_s = float(options.get("batchwaitseconds", "1.0"))
        self.timeout_after_s = float(options.get("timeoutafterseconds", "300"))
        self._feed: _LiveFeed | None = None

    def initialOffset(self) -> dict:
        return {"n": 0, "last_event_id": None}

    def read(self, start: dict):
        if self._feed is None:
            self._feed = _LiveFeed(self.url, self.timeout_after_s)
            self._feed.last_event_id = start.get("last_event_id")
        self._feed.ensure_running()
        events = self._feed.drain(self.max_batch, self.batch_wait_s)
        rows = [(ev["event"], ev["id"], ev["data"]) for ev in events]
        end = {"n": start["n"] + len(rows),
               "last_event_id": self._feed.last_event_id}
        return iter(rows), end

    def commit(self, end: dict) -> None:
        pass


class WikimediaSSEDataSource(DataSource):
    """spark.readStream.format("wikimedia_sse").option("url", ...).load()"""

    @classmethod
    def name(cls) -> str:
        return "wikimedia_sse"

    def schema(self) -> str:
        return RAW_SSE_SCHEMA

    def simpleStreamReader(self, schema: StructType) -> SSEStreamReader:
        return SSEStreamReader(dict(self.options))


def register_sse_source(spark: SparkSession) -> None:
    spark.dataSource.register(WikimediaSSEDataSource)


# ---------------------------------------------------------------------------
# S2: JSON decode + flatten to the engine's internal event shape
# ---------------------------------------------------------------------------

def rc_from_sse(raw: DataFrame, project: str = "*") -> DataFrame:
    """Raw SSE rows -> flat rc events (RC_EVENT_FLAT_SCHEMA shape).

    `from_json` with the pinned schema prunes the ~30-field Wikimedia
    payload to the ~10 fields the engine reads (SURVEY.md §4.2); the
    F1-F3 filter runs here so dropped events never reach the shuffle.
    """
    from ..functions import classify

    j = raw.select(F.from_json(F.col("value"), RC_EVENT_SCHEMA).alias("e"))
    flat = j.select(
        "e.title", "e.comment", "e.namespace", "e.user", "e.bot", "e.type",
        F.col("e.length.new").alias("length_new"),
        F.col("e.length.old").alias("length_old"),
        "e.wiki", "e.server_name", "e.log_type", "e.log_action",
        F.col("e.log_params.target").alias("log_target"),
        "e.log_action_comment",
        # the live wire payload has no 'ts'/'seq' pins — derive them:
        # epoch-seconds 'timestamp', else the envelope's RFC3339 meta.dt;
        # seq from the Kafka offset in meta. Without any of these (a
        # malformed event) ts stays null and the F1-F3 filter semantics
        # still apply; ordering falls back to arrival order (seq 0).
        F.coalesce(
            F.col("e.ts"),
            F.timestamp_seconds(F.col("e.timestamp")),
            F.to_timestamp(F.col("e.meta.dt")),
        ).alias("ts"),
        F.coalesce(F.col("e.seq"), F.col("e.meta.offset"), F.lit(0)).alias(
            "seq"
        ),
    )
    return flat.filter(
        classify.keep_event(
            F.col("namespace"), F.col("server_name"), F.col("comment"), project
        )
    )
