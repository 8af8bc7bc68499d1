"""Streaming core tests (SURVEY.md §5.2-5): batch-stream equivalence,
purge policy P2 across micro-batches, safe-list control events, state
blob round-trip."""

from __future__ import annotations

import datetime as dt
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from wikitrender_spark.operators import lifecycle
from wikitrender_spark.operators.derive import rc_events
from wikitrender_spark.sources.replay import chunked_event_stream, rc_event_stream
from wikitrender_spark.streaming import fold, processor

SF_DIR = "/root/testdata/sf0.001"

def _group():
    # needs an active SparkContext -> built lazily inside tests
    return F.concat(
        F.col("wiki"), F.lit("#"), F.regexp_extract(F.col("title"), r"_(\d+)$", 1)
    )


def _run(cl, name, ckpt):
    return processor.run_changelog_to_memory(cl, name, ckpt)


@pytest.fixture(scope="module")
def batch_state(spark):
    return sorted(
        map(tuple, lifecycle.replay_lifecycle(rc_events(spark, SF_DIR), _group()).collect())
    )


def test_stream_equals_batch_single_batch(spark, batch_state):
    with tempfile.TemporaryDirectory() as d:
        cl = processor.page_state_changelog(rc_event_stream(spark, SF_DIR), _group())
        t = _run(cl, "t_eq_1", d + "/ckpt")
        got = sorted(map(tuple, processor.final_state(t).collect()))
    assert got == batch_state


def test_stream_equals_batch_chunked(spark, batch_state):
    """5 micro-batches with state carried in the state store between them;
    includes delete->recreate and move->adopt transitions mid-stream."""
    with tempfile.TemporaryDirectory() as d:
        cl = processor.page_state_changelog(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=5), _group()
        )
        t = _run(cl, "t_eq_5", d + "/ckpt")
        assert t.agg(F.max("_ver")).first()[0] > 1  # really incremental
        got = sorted(map(tuple, processor.final_state(t).collect()))
    assert got == batch_state


def test_stream_purge_matches_inprocess_fold(spark):
    """Streaming purge (P2 at each micro-batch, now = group's batch max
    event time) must equal the same fold+purge driven in-process."""
    params = fold.PurgeParams(
        max_lifespan=40000.0, max_inactivity=6000.0,
        min_speed=0.00015, min_purge_time=5.0,
    )
    n_chunks = 4
    with tempfile.TemporaryDirectory() as d:
        cl = processor.page_state_changelog(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=n_chunks),
            _group(), purge=params,
        )
        t = _run(cl, "t_purge", d + "/ckpt")
        got = sorted(map(tuple, processor.final_state(t).collect()))
        tombstones = t.filter(F.col("_deleted")).count()

    # expected: same chunks folded in-process, purged per group at the
    # group's max ts of each chunk. Chunk boundaries replicate the source's:
    # (ts, event_id) row-ranges over the RAW events table (pre-filter).
    from wikitrender_spark.operators.derive import read_events_raw

    raw = (read_events_raw(spark, SF_DIR).select("event_id", "ts")
           .toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True))
    step = (len(raw) + n_chunks - 1) // n_chunks
    chunk_of = {eid: i // step for i, eid in enumerate(raw["event_id"])}

    rc = rc_events(spark, SF_DIR).withColumn("_grp", _group())
    pdf = rc.toPandas().sort_values(["ts", "seq"]).reset_index(drop=True)
    state_by_grp: dict[str, dict] = {}
    for i in range(n_chunks):
        chunk = pdf[pdf["seq"].map(chunk_of) == i]
        for grp, gpdf in chunk.groupby("_grp"):
            titles = state_by_grp.setdefault(grp, {})
            fold.fold_pdf(titles, gpdf.drop(columns=["_grp"]))
            fold.purge_titles(titles, gpdf["ts"].max(), params)
    exp_rows = []
    for titles in state_by_grp.values():
        for p in titles.values():
            r = fold.page_record(p)
            exp_rows.append(tuple(
                pd.Timestamp(v).to_pydatetime() if k in ("start", "updated") else v
                for k, v in r.items()
            ))
    assert tombstones > 0  # the thresholds actually evict something
    assert sorted(got) == sorted(exp_rows)


def test_control_stream_marksafe(spark):
    """A7: markSafe exempts a page from the speed/inactivity purge but not
    from max_lifespan (/root/reference/index.js:93-100,409-411)."""
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for page in ("Keep", "Lose"):
        rows.append(dict(title=page, ts=t0, type="new"))
        rows.append(dict(title=page, ts=t0 + dt.timedelta(minutes=1), user="B"))
    # control event: markSafe Keep
    titles: dict = {}
    pdf = pd.DataFrame([
        dict(seq=i, ts=r["ts"], title=r["title"], wiki="enwiki",
             user=r.get("user", "Jon"), bot=False, type=r.get("type", "edit"),
             comment="yo", length_new=2, length_old=1, log_type=None,
             log_action=None, log_target=None, log_action_comment=None)
        for i, r in enumerate(rows)
    ])
    fold.fold_pdf(titles, pdf)
    ctrl = pd.DataFrame([
        dict(seq=99, ts=t0 + dt.timedelta(minutes=2), title="Keep",
             wiki="enwiki", user="ops", bot=False, type="edit", comment="",
             length_new=None, length_old=None, log_type="control",
             log_action="markSafe", log_target=None, log_action_comment=None)
    ])
    fold.fold_pdf(titles, ctrl)
    assert titles["Keep"]["safe"] and not titles["Lose"]["safe"]

    # speed purge at +30min: Lose evicted (0.066 epm < 3), Keep survives
    params = fold.PurgeParams()
    evicted = fold.purge_titles(titles, t0 + dt.timedelta(minutes=30), params)
    assert evicted == {"Lose"}
    # lifespan purge evicts even safe pages
    evicted = fold.purge_titles(titles, t0 + dt.timedelta(minutes=2000), params)
    assert evicted == {"Keep"}


def test_state_blob_roundtrip():
    t0 = pd.Timestamp("2024-01-01 12:00:00.123456")
    titles = {"X": fold.fresh_page("X", "dewiki", "X", t0)}
    titles["X"]["distribution"] = {"a": 2, "b": 1}
    titles["X"]["anon_set"] = {"1.2.3.4"}
    titles["X"]["contrib_set"] = {"a", "b"}
    titles["X"]["edits"] = 3
    back = fold.deserialize_titles(fold.serialize_titles(titles))
    assert back == titles


def test_epm_clamp():
    """D3 clamp (/root/reference/index.js:80-88): raw count below 1 minute
    of age or at zero count."""
    page = dict(edits=5)
    assert fold.edits_per_minute(page, 0.5) == 5.0
    assert fold.edits_per_minute(page, 10.0) == 0.5
    assert fold.edits_per_minute(dict(edits=0), 10.0) == 0.0


# --- event-time windowed aggregation (watermark + tumbling window) ----------
def _batch_windowed(spark):
    from wikitrender_spark.operators.page_state import classified_edit_events
    from wikitrender_spark.streaming import windows

    return windows.windowed_activity_agg(
        classified_edit_events(rc_events(spark, SF_DIR))
    )


def test_windowed_stream_append_equals_batch(spark):
    """Watermarked two-level window agg (multi-stateful chain) across 4
    micro-batches, append mode: every emitted (finalized) window matches
    the batch formulation exactly, and all windows comfortably below the
    final watermark are present."""
    from wikitrender_spark.streaming import windows

    batch_rows = {r[0]: tuple(r) for r in _batch_windowed(spark).collect()}
    with tempfile.TemporaryDirectory() as d:
        win = windows.windowed_activity_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4),
            watermark_delay="2 hours",
        )
        t = windows.run_windowed_to_memory(
            win, "t_win_append", d + "/ckpt", mode="append"
        )
        got = {r[0]: tuple(r) for r in t.collect()}
    assert got  # something finalized
    for start_us, row in got.items():
        assert batch_rows[start_us] == row  # emitted == batch, exactly
    # every window older than (max event time - delay - slack) must emit
    max_us = max(batch_rows)
    horizon = max_us - (2 + 1 + 1) * 3600 * 1000000
    missing = [s for s in batch_rows if s < horizon and s not in got]
    assert not missing


def test_session_stream_append_equals_batch(spark):
    """Streaming sessionization across 4 micro-batches: sessions merge
    via keyed session state; every emitted (closed) session matches the
    batch formulation, and sessions well below the final watermark all
    emit."""
    from wikitrender_spark.operators.page_state import classified_edit_events
    from wikitrender_spark.streaming import windows

    batch = {
        (r["id"], r["session_start_us"]): tuple(r)
        for r in windows.session_activity_agg(
            classified_edit_events(rc_events(spark, SF_DIR)).select("id", "ts")
        ).collect()
    }
    with tempfile.TemporaryDirectory() as d:
        sess = windows.session_activity_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4),
            watermark_delay="2 hours",
        )
        t = windows.run_windowed_to_memory(
            sess, "t_sess_append", d + "/ckpt", mode="append"
        )
        got = {(r["id"], r["session_start_us"]): tuple(r) for r in t.collect()}
    assert got
    for key, row in got.items():
        assert batch[key] == row
    # sessions whose last event is older than delay+gap+slack must be closed
    max_last = max(r[2] for r in batch.values())
    horizon = max_last - (2 + windows.SESSION_GAP_HOURS + 1) * 3600 * 1000000
    missing = [k for k, r in batch.items() if r[2] < horizon and k not in got]
    assert not missing


def test_stream_stream_interval_join_equals_batch(spark):
    """Stream-stream event-time interval join across 4 micro-batches:
    inner-join matches always emit (watermarks only bound state), and the
    replay is in ts order (no late data), so stream == batch exactly —
    including pairs whose two sides arrive in different micro-batches."""
    from wikitrender_spark.streaming import joins

    sf_dir = "/root/testdata/sf0.01"  # sf0.001 is too sparse for pairs
    batch = sorted(
        map(tuple, joins.edit_protect_pairs_batch(rc_events(spark, sf_dir)).collect())
    )
    with tempfile.TemporaryDirectory() as d:
        rc_a = chunked_event_stream(spark, sf_dir, d + "/a", n_chunks=4)
        rc_b = chunked_event_stream(spark, sf_dir, d + "/b", n_chunks=4)
        j = joins.edit_protect_pairs_stream(rc_a, rc_b)
        q = (
            j.writeStream.format("memory")
            .queryName("t_ss_join")
            .outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = sorted(map(tuple, spark.table("t_ss_join").collect()))
    assert got == batch
    assert len(batch) > 0


def test_transform_with_state_equals_apply_in_pandas(spark, batch_state):
    """The transformWithStateInPandas processor (Spark-4 API, RocksDB
    state store) produces the same final state as the
    applyInPandasWithState one and the batch replay — three-way
    agreement across both arbitrary-state APIs.

    Requires google.protobuf (the TWS Python worker speaks a protobuf
    state protocol) — skipped where it isn't installed; the
    applyInPandasWithState engine path needs no such dependency."""
    pytest.importorskip("google.protobuf")
    from wikitrender_spark.streaming import processor_tws

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        processor_tws.ROCKSDB_PROVIDER,
    )
    try:
        with tempfile.TemporaryDirectory() as d:
            cl = processor_tws.page_state_changelog_tws(
                chunked_event_stream(spark, SF_DIR, d, n_chunks=3), _group()
            )
            t = _run(cl, "t_tws", d + "/ckpt")
            assert t.agg(F.max("_ver")).first()[0] > 1  # really incremental
            got = sorted(map(tuple, processor.final_state(t).collect()))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    assert got == batch_state


def test_streaming_dedup_drops_replayed_events(spark):
    """dropDuplicatesWithinWatermark admission layer: replaying whole
    chunks (at-least-once delivery after a socket rebuild, S3) yields
    exactly the unique event set."""
    import glob
    import os
    import shutil
    import time as _t

    from wikitrender_spark.streaming import windows

    with tempfile.TemporaryDirectory() as d:
        rc = chunked_event_stream(spark, SF_DIR, d, n_chunks=2)
        # duplicate both chunks with later mtimes -> re-delivered batches
        for i, c in enumerate(sorted(glob.glob(d + "/chunks/chunk_*"))):
            dst = c + "_replay"
            shutil.copytree(c, dst)
            ts = _t.time() + 10 + i
            for root, _dirs, files in os.walk(dst):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))
        ded = windows.dedup_events_stream(rc)
        q = (
            ded.writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = spark.table("t_dedup")
        n_unique = rc_events(spark, SF_DIR).count()
        assert got.count() == n_unique
        assert got.select("seq").distinct().count() == n_unique


def test_multi_chunk_groups_fold_in_order(spark, batch_state):
    """A group larger than one Arrow batch arrives as multiple chunks;
    the processor must concatenate them before the (ts, seq)-ordered fold
    or later events can apply first. Forced by shrinking
    arrow.maxRecordsPerBatch so nearly every group spans chunks."""
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        with tempfile.TemporaryDirectory() as d:
            cl = processor.page_state_changelog(
                rc_event_stream(spark, SF_DIR), _group()
            )
            t = _run(cl, "t_chunked_arrow", d + "/ckpt")
            got = sorted(map(tuple, processor.final_state(t).collect()))
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    assert got == batch_state


def test_telemetry_listener_captures_batches(spark):
    """P3: the StreamingQueryListener surface records per-batch input
    rows and state rows; the changelog's own version groups account for
    live vs tombstoned rows."""
    from wikitrender_spark.streaming import telemetry

    cap = telemetry.attach(spark)
    try:
        with tempfile.TemporaryDirectory() as d:
            cl = processor.page_state_changelog(
                chunked_event_stream(spark, SF_DIR, d, n_chunks=3), _group()
            )
            t = _run(cl, "t_telemetry", d + "/ckpt")
            counts = {r["_ver"]: (r["n_live_rows"], r["n_tombstones"])
                      for r in telemetry.purge_counts(t).collect()}
        # listener delivery is asynchronous — wait for it to catch up
        import time as _t

        deadline = _t.monotonic() + 30
        while (_t.monotonic() < deadline
               and len([b for b in cap.batches if b.num_input_rows > 0]) < 3):
            _t.sleep(0.2)
    finally:
        telemetry.detach(spark, cap)
    # listener saw the micro-batches with real input rows and state
    seen = [b for b in cap.batches if b.num_input_rows > 0]
    assert len(seen) >= 3
    assert any(b.state_rows for b in seen)
    # changelog accounting: every version has live rows; deletes/moves in
    # the replay produce at least one tombstone overall
    assert all(n_live > 0 for n_live, _ in counts.values())
    assert sum(t for _, t in counts.values()) > 0
