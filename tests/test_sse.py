"""SSE source tests (S1-S3): wire-protocol parser, file-transcript replay
through the registered DataSource, JSON decode + flatten (S2)."""

from __future__ import annotations

import json
import time

from pyspark.sql import functions as F

from wikitrender_spark.sources import sse


def test_sse_parser_dispatch_rules():
    lines = [
        ": keep-alive comment\n",
        "event: message\n",
        "id: [{\"topic\":\"x\",\"offset\":1}]\n",
        "data: {\"a\": 1,\n",
        "data:  \"b\": 2}\n",
        "\n",
        "data:no-space-value\n",
        "\n",
        "retry: 3000\n",
        "data: tail-without-trailing-blank",
    ]
    evs = list(sse.iter_sse_events(lines))
    assert len(evs) == 3
    assert evs[0]["event"] == "message"
    assert evs[0]["id"] == '[{"topic":"x","offset":1}]'
    assert evs[0]["data"] == '{"a": 1,\n "b": 2}'  # multi-line join, 1 sp strip
    assert evs[1]["data"] == "no-space-value"
    assert evs[2]["data"] == "tail-without-trailing-blank"


def _write_transcript(path, payloads):
    with open(path, "w", encoding="utf-8") as f:
        f.write(": welcome\n\n")
        for i, p in enumerate(payloads):
            f.write("event: message\n")
            f.write(f"id: [{{\"offset\":{i}}}]\n")
            f.write(f"data: {json.dumps(p)}\n\n")


def _payload(i, **over):
    p = dict(
        title=f"T{i}", comment="yo", namespace=0, user="Jon", bot=False,
        type="edit", length={"new": 2 + i, "old": 1}, wiki="enwiki",
        server_name="en.wikipedia.org", log_type=None, log_action=None,
        log_params=None, log_action_comment=None,
        ts="2024-01-01T00:00:%02d" % i, seq=i,
    )
    p.update(over)
    return p


def test_sse_datasource_file_replay(spark, tmp_path):
    payloads = [_payload(i) for i in range(5)]
    # one event the F1 filter must drop (non-mainspace), one fixup (F3)
    payloads.append(_payload(5, namespace=2))
    payloads.append(_payload(6, comment="Fixed error in infobox"))
    transcript = tmp_path / "stream.sse"
    _write_transcript(transcript, payloads)

    sse.register_sse_source(spark)
    raw = (
        spark.readStream.format("wikimedia_sse")
        .option("url", f"file://{transcript}")
        .option("batchwaitseconds", "2.0")
        .load()
    )
    rc = sse.rc_from_sse(raw)
    name = "sse_replay_test"
    q = (
        rc.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 5:
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table(name).orderBy("seq").collect()
    assert [r["title"] for r in got] == [f"T{i}" for i in range(5)]
    assert got[0]["length_new"] == 2 and got[0]["length_old"] == 1
    assert all(r["namespace"] == 0 for r in got)


def test_rc_from_sse_flattens_log_events(spark):
    payload = _payload(0, log_type="log", log_action="move",
                       log_params={"target": "New_Title"})
    raw = spark.createDataFrame(
        [("message", "id0", json.dumps(payload))],
        "event string, id string, value string",
    )
    row = sse.rc_from_sse(raw).first()
    assert row["log_target"] == "New_Title"
    assert row["log_action"] == "move"
    assert row["ts"] is not None


def test_rc_from_sse_derives_ts_seq_from_wire_payload(spark):
    """The live Wikimedia payload has no ts/seq pins — they derive from
    epoch-seconds 'timestamp' (or meta.dt) and the envelope's offset."""
    import json

    from wikitrender_spark.sources.sse import rc_from_sse

    payload = json.dumps({
        "title": "X", "comment": "c", "namespace": 0, "user": "U",
        "bot": False, "type": "edit", "wiki": "enwiki",
        "server_name": "en.wikipedia.org",
        "length": {"new": 10, "old": 4},
        "timestamp": 1704067200,
        "meta": {"id": "u1", "dt": "2024-01-01T00:00:00Z", "offset": 42},
    })
    raw = spark.createDataFrame(
        [("message", "id1", payload)], "event string, id string, value string"
    )
    row = rc_from_sse(raw).first()
    assert row["seq"] == 42
    assert row["ts"] is not None and row["ts"].year == 2024
    # meta.dt fallback when 'timestamp' is absent
    p2 = json.loads(payload)
    del p2["timestamp"]
    p2["meta"]["offset"] = None
    raw2 = spark.createDataFrame(
        [("message", "id1", json.dumps(p2))],
        "event string, id string, value string",
    )
    row2 = rc_from_sse(raw2).first()
    assert row2["ts"] is not None and row2["ts"].year == 2024
    assert row2["seq"] == 0


def test_rc_from_sse_drops_malformed_json(spark):
    """Unparseable payloads yield an all-null struct whose namespace
    fails F1 — malformed wire data degrades to a dropped event, never a
    crashed batch."""
    import json

    from wikitrender_spark.sources.sse import rc_from_sse

    good = json.dumps({
        "title": "X", "comment": "c", "namespace": 0, "user": "U",
        "bot": False, "type": "edit", "wiki": "enwiki",
        "server_name": "en.wikipedia.org", "timestamp": 1704067200,
    })
    raw = spark.createDataFrame(
        [("message", "1", good),
         ("message", "2", "{not json"),
         ("message", "3", "")],
        "event string, id string, value string",
    )
    rows = rc_from_sse(raw).collect()
    assert len(rows) == 1 and rows[0]["title"] == "X"


# --- live HTTP transport (S1/S3 end-to-end over a local server) -------------
class _SSEServer:
    """Minimal scripted text/event-stream HTTP server.

    ``script(conn_idx, last_event_id)`` returns the actions for one
    connection: ("send", id, data) writes one SSE event; ("hang", secs)
    holds the connection open silently (idle feed — watchdog bait). The
    connection closes when the actions run out (reconnect bait). Every
    connection's Last-Event-ID request header is recorded in
    ``self.last_ids``.
    """

    def __init__(self, script):
        import http.server
        import threading

        srv = self

        class Handler(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def do_GET(self):  # noqa: N802
                with srv._lock:
                    idx = srv.n_connections
                    srv.n_connections += 1
                last_id = self.headers.get("Last-Event-ID")
                srv.last_ids.append(last_id)
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                try:
                    for action in srv.script(idx, last_id):
                        if action[0] == "hang":
                            deadline = time.time() + action[1]
                            while (time.time() < deadline
                                   and not srv._stopping.is_set()):
                                time.sleep(0.05)
                        else:
                            _, ev_id, data = action
                            self.wfile.write(
                                f"id: {ev_id}\ndata: {data}\n\n".encode()
                            )
                            self.wfile.flush()
                except (BrokenPipeError, ConnectionResetError):
                    pass  # client tore the socket down (watchdog rebuild)

            def log_message(self, *args):  # quiet
                pass

        import threading as _th

        self.script = script
        self.last_ids: list = []
        self.n_connections = 0
        self._lock = _th.Lock()
        self._stopping = _th.Event()
        self.httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.port = self.httpd.server_address[1]
        self._thread = _th.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()

    def url(self) -> str:
        return f"http://127.0.0.1:{self.port}/sse"

    def stop(self) -> None:
        self._stopping.set()
        self.httpd.shutdown()
        self.httpd.server_close()


def _drain_feed(feed, want, timeout_s=20.0):
    """Pump ensure_running+drain (what SSEStreamReader.read does per
    micro-batch) until ``want`` events arrived or the deadline passes."""
    events = []
    deadline = time.time() + timeout_s
    while len(events) < want and time.time() < deadline:
        feed.ensure_running()
        events += feed.drain(want - len(events), 0.5)
    return events


def test_sse_http_reconnect_resumes_with_last_event_id():
    """S3 reconnect: the server closes the connection after 3 events; the
    reader must reconnect carrying Last-Event-ID of the last seen event
    and continue the stream without loss."""
    def script(idx, last_id):
        if idx == 0:
            return [("send", str(i), f'{{"n":{i}}}') for i in (1, 2, 3)]
        start = int(last_id) + 1
        return [("send", str(i), f'{{"n":{i}}}')
                for i in range(start, start + 3)] + [("hang", 30)]

    srv = _SSEServer(script)
    feed = sse._LiveFeed(srv.url(), timeout_after_s=60.0,
                         connect_timeout_s=5.0)
    try:
        events = _drain_feed(feed, 6)
        assert [e["id"] for e in events] == ["1", "2", "3", "4", "5", "6"]
        assert srv.last_ids[0] is None and srv.last_ids[1] == "3"
    finally:
        feed.stop()
        srv.stop()


def test_sse_http_watchdog_rebuilds_idle_connection():
    """S3 watchdog (/root/reference/index.js:349-356): a connection that
    goes silent past timeout_after is torn down and rebuilt (with resume),
    even though the socket is still open."""
    def script(idx, last_id):
        if idx == 0:
            return [("send", "1", "{}"), ("send", "2", "{}"), ("hang", 60)]
        return [("send", "3", "{}"), ("send", "4", "{}"), ("hang", 60)]

    srv = _SSEServer(script)
    feed = sse._LiveFeed(srv.url(), timeout_after_s=1.0,
                         connect_timeout_s=5.0)
    try:
        events = _drain_feed(feed, 4)
        assert [e["id"] for e in events] == ["1", "2", "3", "4"]
        assert srv.n_connections >= 2        # the watchdog really rebuilt
        assert srv.last_ids[1] == "2"        # ...and resumed, not restarted
    finally:
        feed.stop()
        srv.stop()


def test_sse_http_datasource_end_to_end(spark, tmp_path):
    """The registered DataSource consuming a live local HTTP SSE endpoint
    through a real streaming query — the full S1->S2 path over the http
    transport (file:// replay covers only the parser/reader)."""
    def script(idx, last_id):
        return ([("send", str(i), json.dumps(_payload(i)))
                 for i in range(1, 5)] + [("hang", 120)])

    srv = _SSEServer(script)
    sse.register_sse_source(spark)
    raw = (
        spark.readStream.format("wikimedia_sse")
        .option("url", srv.url())
        .option("batchwaitseconds", "0.5")
        .load()
    )
    rc = sse.rc_from_sse(raw)
    name = "t_sse_http_e2e"
    q = (
        rc.writeStream.format("memory").queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append").start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table(name).count() < 4:
            time.sleep(0.5)
    finally:
        q.stop()
        srv.stop()
    got = spark.table(name).orderBy("seq").collect()
    assert [r["title"] for r in got[:4]] == [f"T{i}" for i in range(1, 5)]
