"""Streaming core tests (SURVEY.md §5.2-5): batch-stream equivalence,
purge policy P2 across micro-batches, safe-list control events, state
blob round-trip."""

from __future__ import annotations

import datetime as dt
import tempfile
from contextlib import contextmanager

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


@contextmanager
def rocksdb_provider(spark):
    """Set the RocksDB state-store provider for one test, restoring the
    previous value (or unsetting) afterwards — one home for the
    save/set/restore dance the TWS tests all need, so a missed restore
    branch can't leak the provider into the shared session."""
    from wikitrender_spark.streaming.processor_tws import ROCKSDB_PROVIDER

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


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

    with rocksdb_provider(spark):
        with tempfile.TemporaryDirectory() as d:
            cl = processor_tws.page_state_changelog_tws(
                chunked_event_stream(spark, SF_DIR, d, n_chunks=3), _group()
            )
            t = _run(cl, "t_tws", d + "/ckpt")
            assert t.agg(F.max("_ver")).first()[0] > 1  # really incremental
            got = sorted(map(tuple, processor.final_state(t).collect()))
    assert got == batch_state


def test_tws_wall_clock_cleaner_end_to_end(spark, batch_state):
    """The ProcessingTime-timer cleaner through a REAL streaming query:
    a 1 ms interval makes the timer armed in micro-batch 1 expire before
    the later batches, so the framework actually invokes
    handleExpiredTimer under its real protocol (keyword arguments — the
    r07 review found snake_case names crash exactly here, which an
    in-process positional fake cannot catch). The purge thresholds are
    chosen to evict NOTHING, so however many sweeps fire, the final
    state must equal the no-purge batch replay; a crash in the timer
    path fails the query instead.

    Requires google.protobuf — skipped where it isn't installed; the
    in-process test below covers the sweep logic everywhere."""
    pytest.importorskip("google.protobuf")
    from wikitrender_spark.streaming import processor_tws

    never_evict = fold.PurgeParams(
        max_lifespan=1e9, max_inactivity=1e9,
        min_speed=0.0, min_purge_time=0.0,
    )
    with rocksdb_provider(spark):
        with tempfile.TemporaryDirectory() as d:
            cl = processor_tws.page_state_changelog_tws(
                chunked_event_stream(spark, SF_DIR, d, n_chunks=3),
                _group(), purge=never_evict,
                cleaner_interval_ms=1,
            )
            t = _run(cl, "t_tws_wallclock", d + "/ckpt")
            got = sorted(map(tuple, processor.final_state(t).collect()))
    assert got == batch_state


def test_transform_with_state_purge_parity(spark):
    """PurgeParams-enabled equivalence (r05 ask #6): the TWS processor
    with the P2 cleaner active must produce the same final state AND the
    same tombstone count as the applyInPandasWithState processor under
    identical purge thresholds — the purge branch of processor_tws
    (batch-boundary purge off the event-time clock) gets the same parity
    guarantee the pure fold already has.

    Requires google.protobuf (the TWS Python worker speaks a protobuf
    state protocol) — skipped where it isn't installed."""
    pytest.importorskip("google.protobuf")
    from wikitrender_spark.streaming import processor_tws

    params = fold.PurgeParams(
        max_lifespan=40000.0, max_inactivity=6000.0,
        min_speed=0.00015, min_purge_time=5.0,
    )

    from contextlib import nullcontext

    def run(make_changelog, use_rocksdb=False, tag=""):
        with rocksdb_provider(spark) if use_rocksdb else nullcontext():
            with tempfile.TemporaryDirectory() as d:
                cl = make_changelog(
                    chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
                )
                t = _run(cl, "t_tws_purge" + tag, d + "/ckpt")
                state = sorted(map(tuple, processor.final_state(t).collect()))
                tombstones = t.filter(F.col("_deleted")).count()
                return state, tombstones

    tws_state, tws_tombs = run(
        lambda rc: processor_tws.page_state_changelog_tws(
            rc, _group(), purge=params
        ),
        use_rocksdb=True, tag="_t",
    )
    aip_state, aip_tombs = run(
        lambda rc: processor.page_state_changelog(rc, _group(), purge=params),
        tag="_a",
    )
    assert tws_tombs > 0  # the thresholds actually evict something
    assert tws_tombs == aip_tombs
    assert tws_state == aip_state


def test_tws_purge_branch_inprocess_parity(spark):
    """The TWS purge branch, attested WITHOUT protobuf: PageStateProcessor
    is plain Python over pandas, so drive handleInputRows directly with a
    fake value-state handle over the same chunked groups the streaming
    tests replay — final state must equal the fold+purge recipe that
    test_stream_purge_matches_inprocess_fold already proved equal to the
    applyInPandasWithState streaming run. This closes the chain
    TWS == in-process fold == streaming on hosts where the full TWS
    worker (google.protobuf) can't run; the end-to-end streaming parity
    test above still runs where it can."""
    from wikitrender_spark.streaming import processor_tws

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _FakeHandle:
        def __init__(self):
            self.states = {}

        def getValueState(self, name, schema):
            return self.states.setdefault(name, _FakeValueState())

    params = fold.PurgeParams(
        max_lifespan=40000.0, max_inactivity=6000.0,
        min_speed=0.00015, min_purge_time=5.0,
    )
    n_chunks = 4

    # chunk boundaries replicate the replay source's (ts, event_id)
    # row-ranges over the RAW table — same recipe as the purge test above
    from wikitrender_spark.operators.derive import read_events_raw

    raw = (read_events_raw(spark, SF_DIR).select("event_id", "ts")
           .toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True))
    step = (len(raw) + n_chunks - 1) // n_chunks
    chunk_of = {eid: i // step for i, eid in enumerate(raw["event_id"])}

    rc = rc_events(spark, SF_DIR).withColumn("_grp", _group())
    pdf = rc.toPandas().sort_values(["ts", "seq"]).reset_index(drop=True)

    # drive the TWS processor per (chunk, group) exactly as the engine
    # would hand it micro-batch groups
    handles: dict[str, tuple] = {}
    for i in range(n_chunks):
        chunk = pdf[pdf["seq"].map(chunk_of) == i]
        for grp, gpdf in chunk.groupby("_grp"):
            if grp not in handles:
                proc = processor_tws.PageStateProcessor(purge=params)
                h = _FakeHandle()
                proc.init(h)
                handles[grp] = (proc, h)
            proc, _h = handles[grp]
            list(proc.handleInputRows(grp, iter([gpdf]), None))

    got = []
    for proc, h in handles.values():
        blob = h.states["fold"].get()
        for p in fold.deserialize_titles(blob[0]).values():
            got.append(tuple(fold.page_record(p).values()))

    # expected: the in-process fold+purge (already proved equal to the
    # streaming applyInPandasWithState run by the purge test above)
    state_by_grp: dict[str, dict] = {}
    for i in range(n_chunks):
        chunk = pdf[pdf["seq"].map(chunk_of) == i]
        for grp, gpdf in chunk.groupby("_grp"):
            titles = state_by_grp.setdefault(grp, {})
            fold.fold_pdf(titles, gpdf.drop(columns=["_grp"]))
            fold.purge_titles(titles, gpdf["ts"].max(), params)
    exp = []
    for titles in state_by_grp.values():
        for p in titles.values():
            exp.append(tuple(fold.page_record(p).values()))

    assert len(exp) > 0
    assert sorted(map(repr, got)) == sorted(map(repr, exp))


def test_tws_wall_clock_cleaner_inprocess(spark):
    """The timer-based P1 cleaner (reference setInterval, index.js:399):
    in wall-clock mode handleInputRows must NOT purge (it only folds and
    arms exactly one timer per key), and handleExpiredTimer must evict
    exactly what a batch-boundary purge at the same event-time clock
    would, emit those ids as tombstones, bump _ver, and re-arm. Driven
    in-process with a fake handle — no protobuf needed."""
    from wikitrender_spark.streaming import processor_tws

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _FakeHandle:
        def __init__(self):
            self.states = {}
            self.timers = []

        def getValueState(self, name, schema):
            return self.states.setdefault(name, _FakeValueState())

        def registerTimer(self, ms):
            self.timers.append(ms)

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, ms):
            self.timers.remove(ms)

    class _FakeTimerValues:
        def __init__(self, ms):
            self._ms = ms

        def getCurrentProcessingTimeInMs(self):
            return self._ms

    params = fold.PurgeParams(
        max_lifespan=40000.0, max_inactivity=6000.0,
        min_speed=0.00015, min_purge_time=5.0,
    )
    rc = rc_events(spark, SF_DIR).withColumn("_grp", _group())
    pdf = rc.toPandas().sort_values(["ts", "seq"]).reset_index(drop=True)

    total_tombstones = 0
    for grp, gpdf in pdf.groupby("_grp"):
        proc = processor_tws.PageStateProcessor(
            purge=params, cleaner_interval_ms=20_000
        )
        h = _FakeHandle()
        proc.init(h)
        out = list(proc.handleInputRows(grp, iter([gpdf]), _FakeTimerValues(1_000)))
        # wall-clock mode: the ONLY tombstones at the batch boundary are
        # lifecycle evictions (A4/A5 deletes/moves) — none from P2
        exp_titles: dict = {}
        exp_lifecycle_removed: set = set()
        fold.fold_pdf(exp_titles, gpdf.drop(columns=["_grp"]),
                      set(), exp_lifecycle_removed)
        got_batch_tombs = set()
        for o in out:
            if len(o):
                got_batch_tombs |= set(o[o["_deleted"]]["id"])
        assert got_batch_tombs == exp_lifecycle_removed - exp_titles.keys()
        # ...and exactly one armed timer at now + interval
        assert h.timers == [21_000]

        # a second input batch must NOT re-arm or postpone the pending
        # timer (fixed-period setInterval, not an idle-debounce — the
        # r07 review caught the unconditional re-arm variant)
        list(proc.handleInputRows(grp, iter([gpdf.iloc[0:0]]),
                                  _FakeTimerValues(5_000)))
        assert h.timers == [21_000]

        # expected sweep result: purge a COPY of the state at its clock
        blob, clock, ver = h.states["fold"].get()
        titles_copy = fold.deserialize_titles(blob)
        exp_removed = fold.purge_titles(
            titles_copy, pd.Timestamp(clock, unit="us"), params
        )

        def fire(ms):
            """Mimic the framework: keyword-arg callback (PySpark calls
            handleExpiredTimer(key=..., timerValues=...,
            expiredTimerInfo=...) — positional-only fakes masked a
            snake_case crash), then auto-delete the expired timer."""
            out = list(proc.handleExpiredTimer(
                grp, timerValues=_FakeTimerValues(ms),
                expiredTimerInfo=None,
            ))
            h.timers.remove(ms)
            return out

        swept = fire(21_000)
        got_removed = set()
        for o in swept:
            got_removed |= set(o[o["_deleted"]]["id"])
        assert got_removed == exp_removed
        total_tombstones += len(got_removed)
        # the sweep re-armed BEFORE the framework deleted the expired
        # timer, so exactly the next period's timer remains
        assert h.timers == [41_000]
        if exp_removed:
            _b, _c, v2 = h.states["fold"].get()
            assert v2 == ver + 1  # sweep bumped the version
            # idempotent: a second sweep at the same clock removes nothing
            assert fire(41_000) == []
            assert h.timers == [61_000]
    assert total_tombstones > 0  # thresholds actually evict something


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


# --- dead-group TTL state reclamation (the streaming state-leak fix) --------
def _flat_rows(spark, rows):
    """Synthetic flat rc events: minimal overrides over a plain-edit base."""
    from wikitrender_spark.engine import RC_FLAT_SCHEMA

    base = dict(
        title="Page_1", comment="", namespace=0, user="Jon", bot=False,
        type="edit", length_new=1010, length_old=1000, wiki="enwiki",
        server_name="en.wikipedia.org", log_type=None, log_action=None,
        log_target=None, log_action_comment=None,
    )
    return spark.createDataFrame([{**base, **r} for r in rows], RC_FLAT_SCHEMA)


def _write_chunk(spark, chunk_dir, idx, rows):
    import os
    import time as _t

    path = os.path.join(chunk_dir, f"chunk_{idx:04d}")
    _flat_rows(spark, rows).coalesce(1).write.mode("overwrite").parquet(path)
    ts = _t.time() + idx
    for root, _dirs, files in os.walk(path):
        for f in files:
            os.utime(os.path.join(root, f), (ts, ts))


def _flat_stream(spark, chunk_dir):
    from wikitrender_spark.engine import RC_FLAT_SCHEMA

    return (
        spark.readStream.schema(RC_FLAT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )


def _run_resumable(spark, cl, out_dir, ckpt):
    """Run a changelog stream to completion into an appended parquet dir.
    Unlike the memory sink, foreachBatch supports checkpoint RECOVERY, so
    tests can stop and resume the same query (the TTL tests below need
    multiple sequential AvailableNow passes over one state store).
    Returns the batch's accumulated changelog as a pandas frame (only
    rows appended by THIS run), plus nothing else."""
    import glob

    before = set(glob.glob(out_dir + "/*.parquet"))
    q = (
        cl.writeStream.foreachBatch(
            lambda df, _bid: df.write.mode("append").parquet(out_dir)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    new = [f for f in glob.glob(out_dir + "/*.parquet")
           if f not in before]
    if not new:
        import pandas as _pd

        return _pd.DataFrame(columns=processor._CHANGELOG_COLUMNS)
    return spark.read.parquet(*new).toPandas()


def test_dead_group_ttl_reclaims_state_and_revival_orders(spark):
    """dead_group_ttl_min: a group whose page set is purged/deleted empty
    has its state row reclaimed once the watermark passes clock+ttl, and a
    post-TTL revival (whose _ver restarts at 1) still resolves over the
    old tombstone in final_state via the (_ts, _ver) ordering."""
    t0 = dt.datetime(2024, 1, 1)
    M = dt.timedelta(minutes=1)
    with tempfile.TemporaryDirectory() as d:
        chunks = d + "/chunks"
        # batch 0: Page_1 created+edited then deleted -> group empty,
        # group clock = t0+2m, ttl deadline = t0+12m
        _write_chunk(spark, chunks, 0, [
            dict(title="Page_1", type="new", ts=t0, seq=1),
            dict(title="Page_1", ts=t0 + M, seq=2),
            dict(title="Page_1", log_type="log", log_action="delete",
                 log_action_comment='deleted &quot;[[Page_1]]&quot; per '
                                    'discussion',
                 ts=t0 + 2 * M, seq=3),
            dict(title="Page_2", ts=t0 + 2 * M, seq=4),
        ])
        # batch 1 advances the watermark past the deadline...
        _write_chunk(spark, chunks, 1,
                     [dict(title="Page_2", ts=t0 + 30 * M, seq=5)])
        # ...and batch 2 (any later batch) delivers the fired timeout
        _write_chunk(spark, chunks, 2,
                     [dict(title="Page_2", ts=t0 + 31 * M, seq=6)])
        cl = processor.page_state_changelog(
            _flat_stream(spark, chunks), _group(), dead_group_ttl_min=10.0
        )
        ta = _run_resumable(spark, cl, d + "/out", d + "/ckpt")
        assert ta[(ta["id"] == "Page_1") & ta["_deleted"]].shape[0] == 1

        # phase B (checkpoint resume): revive the page after the reclaim
        _write_chunk(spark, chunks, 3, [
            dict(title="Page_1", type="new", ts=t0 + 40 * M, seq=7,
                 user="Revive"),
            dict(title="Page_1", ts=t0 + 41 * M, seq=8, user="Revive"),
        ])
        cl2 = processor.page_state_changelog(
            _flat_stream(spark, chunks), _group(), dead_group_ttl_min=10.0
        )
        tb = _run_resumable(spark, cl2, d + "/out", d + "/ckpt")
        revived = tb[(tb["id"] == "Page_1") & ~tb["_deleted"]]
        assert len(revived) == 1
        # _ver restarted at 1 == the state row was actually removed (a
        # surviving row would resume at its stored ver and emit 2)
        assert revived["_ver"].iloc[0] == 1
        assert revived["edits"].iloc[0] == 2 and revived["isNew"].iloc[0]

        # the union of both phases must resolve the revival over the old
        # tombstone despite the smaller _ver (clock _ts dominates)
        both = spark.createDataFrame(pd.concat([ta, tb], ignore_index=True))
        final = {r["id"]: r for r in processor.final_state(both).collect()}
        assert "Page_1" in final and final["Page_1"]["edits"] == 2
        assert final["Page_2"]["edits"] == 3


def test_ttl_control_commands_do_not_poison_watermark(spark):
    """Engine-shape union (watermarked event leg ∪ unwatermarked control
    leg): a control command stamped with the submitter's wall clock must
    not advance the event-time watermark — replayed history arriving
    after it still folds. Also drives the eager-reclaim branch (deadline
    already <= watermark when the group empties) and post-TTL revival."""
    import os

    from wikitrender_spark.engine import RC_FLAT_SCHEMA

    t0 = dt.datetime(2024, 1, 1)
    M = dt.timedelta(minutes=1)
    wall = dt.datetime(2026, 6, 1)
    with tempfile.TemporaryDirectory() as d:
        ev_dir, ctl_dir = d + "/ev", d + "/ctl"
        os.makedirs(ctl_dir)

        def changelog():
            ev = _flat_stream(spark, ev_dir).withWatermark("ts", "0 seconds")
            ctl = (spark.readStream.schema(RC_FLAT_SCHEMA)
                   .parquet(ctl_dir))
            return processor.page_state_changelog(
                ev.unionByName(ctl), _group(), dead_group_ttl_min=10.0,
                watermark_delay=None,
            )

        def run(tag):
            return _run_resumable(spark, changelog(), d + "/out", d + "/ckpt")

        def control(seq, action, ts):
            _flat_rows(spark, [dict(title="Page_1", user="ops",
                                    log_type="control", log_action=action,
                                    ts=ts, seq=seq)]
                       ).coalesce(1).write.mode("append").parquet(ctl_dir)

        _write_chunk(spark, ev_dir, 0, [
            dict(title="Page_1", type="new", ts=t0, seq=1),
            dict(title="Page_1", ts=t0 + M, seq=2),
        ])
        run(1)                       # watermark -> t0+1m
        control(99, "markSafe", wall)  # wall-clock control row
        t2 = run(2)
        assert t2[t2["id"] == "Page_1"]["safe"].iloc[0]
        # the footgun pin: an event OLDER than the control's wall clock
        # must still fold (a union-level watermark would drop it as late)
        _write_chunk(spark, ev_dir, 1, [dict(title="Page_1", ts=t0 + 2 * M,
                                             seq=3)])
        t3 = run(3)
        p1 = t3[t3["id"] == "Page_1"]
        assert len(p1) == 1 and p1["edits"].iloc[0] == 3

        # advance the watermark far past Page_1's clock+ttl
        _write_chunk(spark, ev_dir, 2, [dict(title="Page_2", ts=t0 + 40 * M,
                                             seq=4)])
        run(4)
        _write_chunk(spark, ev_dir, 3, [dict(title="Page_2", ts=t0 + 41 * M,
                                             seq=5)])
        run(5)                       # watermark -> t0+41m
        # drop empties the group with deadline (t0+12m) already below the
        # watermark: the state row must be reclaimed in the SAME batch
        control(100, "drop", wall + M)
        t6 = run(6)
        assert t6[(t6["id"] == "Page_1") & t6["_deleted"]].shape[0] == 1
        # revival: _ver==1 proves the eager remove really dropped the row
        _write_chunk(spark, ev_dir, 4, [dict(title="Page_1", type="new",
                                             ts=t0 + 50 * M, seq=6)])
        t7 = run(7)
        revived = t7[(t7["id"] == "Page_1") & ~t7["_deleted"]]
        assert len(revived) == 1 and revived["_ver"].iloc[0] == 1


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


def test_stream_static_enrichment_join(spark):
    """Stream-static broadcast enrichment (SURVEY §2.7): the rc stream
    joined to a static dimension inside the streaming query; the final
    counts equal the batch formulation exactly."""
    static = spark.createDataFrame(
        [("enwiki", "tier1"), ("dewiki", "tier2")], "wiki string, tier string"
    )
    batch = {
        r["tier"]: r["n"]
        for r in rc_events(spark, SF_DIR)
        .join(F.broadcast(static), "wiki")
        .groupBy("tier")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    with tempfile.TemporaryDirectory() as d:
        j = (
            rc_event_stream(spark, SF_DIR)
            .join(F.broadcast(static), "wiki")
            .groupBy("tier")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            j.writeStream.format("memory")
            .queryName("t_stream_static")
            .outputMode("complete")
            .option("checkpointLocation", d + "/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r["tier"]: r["n"] for r in spark.table("t_stream_static").collect()}
    assert got == batch and len(got) == 2


def test_tws_timer_sweeps_compose_with_moves_inprocess(spark):
    """SURVEY §7's two hard parts COMPOSED (r07 ask #5): A4 renames
    interleaved with P1/P2 timer sweeps through the TWS wall-clock
    cleaner. The replay is chunked; after every chunk's fold a timer
    sweep fires, so later chunks' moves run against swept state (and
    some moves re-key pages the sweep already evicted — the
    tombstone+adopt protocol over a purged source). Parity target: the
    in-process fold with a purge-at-clock after each chunk — the same
    recipe the batch/streaming purge tests pin — must match the
    processor's final state AND its per-sweep tombstone sets."""
    from wikitrender_spark.operators.derive import read_events_raw
    from wikitrender_spark.streaming import processor_tws

    class _FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class _FakeHandle:
        def __init__(self):
            self.states = {}
            self.timers = []

        def getValueState(self, name, schema):
            return self.states.setdefault(name, _FakeValueState())

        def registerTimer(self, ms):
            self.timers.append(ms)

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, ms):
            self.timers.remove(ms)

    class _FakeTimerValues:
        def __init__(self, ms):
            self._ms = ms

        def getCurrentProcessingTimeInMs(self):
            return self._ms

    params = fold.PurgeParams(
        max_lifespan=40000.0, max_inactivity=6000.0,
        min_speed=0.00015, min_purge_time=5.0,
    )
    n_chunks = 4

    raw = (read_events_raw(spark, SF_DIR).select("event_id", "ts")
           .toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True))
    step = (len(raw) + n_chunks - 1) // n_chunks
    chunk_of = {eid: i // step for i, eid in enumerate(raw["event_id"])}

    rc = rc_events(spark, SF_DIR).withColumn("_grp", _group())
    pdf = rc.toPandas().sort_values(["ts", "seq"]).reset_index(drop=True)

    handles: dict[str, tuple] = {}
    got_sweep_removed: list[set] = [set() for _ in range(n_chunks)]
    clock_ms = 0
    for i in range(n_chunks):
        chunk = pdf[pdf["seq"].map(chunk_of) == i]
        clock_ms += 20_000
        for grp, gpdf in chunk.groupby("_grp"):
            if grp not in handles:
                proc = processor_tws.PageStateProcessor(
                    purge=params, cleaner_interval_ms=20_000
                )
                h = _FakeHandle()
                proc.init(h)
                handles[grp] = (proc, h)
            proc, h = handles[grp]
            list(proc.handleInputRows(grp, iter([gpdf]),
                                      _FakeTimerValues(clock_ms)))
        # the periodic sweep: fire EVERY key's pending timer (quiet keys
        # are swept too, like the reference's setInterval over the whole
        # collection), framework-style keyword call + auto-delete
        for grp, (proc, h) in handles.items():
            for ms in list(h.timers):
                if ms <= clock_ms + 20_000:
                    out = list(proc.handleExpiredTimer(
                        grp, timerValues=_FakeTimerValues(ms),
                        expiredTimerInfo=None,
                    ))
                    h.timers.remove(ms)
                    for o in out:
                        got_sweep_removed[i] |= set(o[o["_deleted"]]["id"])

    got = []
    for proc, h in handles.values():
        blob = h.states["fold"].get()
        for p in fold.deserialize_titles(blob[0]).values():
            got.append(tuple(fold.page_record(p).values()))

    # expected: fold each chunk, then purge at each group's event-time
    # clock — the recipe already proved equal to the streaming runs
    state_by_grp: dict[str, dict] = {}
    clock_by_grp: dict[str, int] = {}
    exp_sweep_removed: list[set] = [set() for _ in range(n_chunks)]
    n_moves_after_evicting_sweep = 0
    n_moves_of_swept_source = 0
    evicted_so_far: set = set()
    any_eviction_yet = False
    for i in range(n_chunks):
        chunk = pdf[pdf["seq"].map(chunk_of) == i]
        # non-degeneracy accounting BEFORE folding this chunk
        moves = chunk[(chunk["log_type"] == "log")
                      & (chunk["log_action"] == "move")]
        if any_eviction_yet and len(moves):
            n_moves_after_evicting_sweep += len(moves)
        for _, mrow in moves.iterrows():
            if fold.page_id(mrow["wiki"], mrow["title"]) in evicted_so_far:
                n_moves_of_swept_source += 1
        for grp, gpdf in chunk.groupby("_grp"):
            titles = state_by_grp.setdefault(grp, {})
            fold.fold_pdf(titles, gpdf.drop(columns=["_grp"]))
            ev = gpdf[gpdf["log_type"] != "control"]
            if len(ev):
                clock_by_grp[grp] = max(
                    clock_by_grp.get(grp, 0), fold._ts_us(ev["ts"].max())
                )
        for grp, titles in state_by_grp.items():
            clock = clock_by_grp.get(grp, 0)
            if clock == 0:
                continue
            removed = fold.purge_titles(
                titles, pd.Timestamp(clock, unit="us"), params
            )
            exp_sweep_removed[i] |= removed
            evicted_so_far |= removed
        if exp_sweep_removed[i]:
            any_eviction_yet = True
    exp = []
    for titles in state_by_grp.values():
        for p in titles.values():
            exp.append(tuple(fold.page_record(p).values()))

    assert sorted(map(repr, got)) == sorted(map(repr, exp))
    assert got_sweep_removed == exp_sweep_removed
    # composition is non-degenerate: sweeps evicted before the replay
    # ended, moves ran after an evicting sweep, and at least one move
    # re-keyed a page an earlier sweep had purged
    assert any(exp_sweep_removed[:-1])
    assert n_moves_after_evicting_sweep > 0
    assert n_moves_of_swept_source > 0


def test_trending_update_stream_equals_batch(spark):
    """Continuous (production) trending form — VERDICT r8 ask #6: the
    UPDATE-mode per-(window, page) aggregation fed through foreachBatch
    into the TrendingReport upsert store across 4 micro-batches. On an
    in-order replay every count's final update arrives, so the store's
    per-window top-k equals the batch relation EXACTLY — no sentinel
    needed (the exact finalization gate lives in wt_stream_trending);
    live deployments get the usual watermark contract instead."""
    from wikitrender_spark.operators.page_state import classified_edit_events
    from wikitrender_spark.streaming import windows

    batch = (
        classified_edit_events(rc_events(spark, SF_DIR))
        .groupBy(
            F.unix_micros(
                F.date_trunc("hour", F.col("ts"))
            ).alias("window_start_us"),
            "id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .collect()
    )
    want_windows: dict[int, dict[str, int]] = {}
    for r in batch:
        want_windows.setdefault(r["window_start_us"], {})[r["id"]] = r[
            "n_events"
        ]
    want = {
        ws: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[
            : windows.TRENDING_TOPK
        ]
        for ws, d in want_windows.items()
    }

    report = windows.TrendingReport()
    with tempfile.TemporaryDirectory() as d:
        counts = windows.trending_counts_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
        )
        windows.run_trending_update(counts, report, d + "/ckpt")
    assert report.top() == want

    # horizon eviction bounds the store: replaying into a 6h-horizon
    # report must keep only windows within 6h of the newest start
    bounded = windows.TrendingReport(horizon_us=6 * 3600 * 1_000_000)
    with tempfile.TemporaryDirectory() as d:
        counts = windows.trending_counts_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
        )
        windows.run_trending_update(counts, bounded, d + "/ckpt")
    max_start = max(want)
    kept = set(bounded.windows)
    assert kept <= {
        ws for ws in want if ws >= max_start - 6 * 3600 * 1_000_000
    }
    assert max_start in kept
    for ws in kept:
        assert bounded.top()[ws] == want[ws]


def test_parquet_trending_store_equals_report(spark):
    """ParquetTrendingStore (VERDICT r9 ask #6): the parquet-backed
    upsert store replayed over the same 4-chunk stream must serve
    exactly the in-driver TrendingReport's per-window top-k — and a
    FRESH store object pointed at the same path must serve it too (the
    persistence claim: the report survives the driver)."""
    from wikitrender_spark.streaming import windows

    report = windows.TrendingReport()
    with tempfile.TemporaryDirectory() as d:
        counts = windows.trending_counts_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
        )
        windows.run_trending_update(counts, report, d + "/ckpt")
    want = report.top()
    assert want  # the replay must produce windows for this to test anything

    with tempfile.TemporaryDirectory() as d:
        store = windows.ParquetTrendingStore(d + "/store")
        counts = windows.trending_counts_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
        )
        windows.run_trending_update(counts, store, d + "/ckpt")
        assert store.top(spark) == want
        reopened = windows.ParquetTrendingStore(d + "/store")
        assert reopened.top(spark) == want


def test_parquet_trending_store_horizon_equals_report(spark):
    """Horizon eviction parity: under the same horizon_us both stores
    keep exactly the same windows with the same top-k, and the parquet
    store's partition dirs are the kept windows — eviction really
    removes bytes, not just rows from a view."""
    import os

    from wikitrender_spark.streaming import windows

    hz = 6 * 3600 * 1_000_000
    bounded = windows.TrendingReport(horizon_us=hz)
    with tempfile.TemporaryDirectory() as d:
        counts = windows.trending_counts_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
        )
        windows.run_trending_update(counts, bounded, d + "/ckpt")

    with tempfile.TemporaryDirectory() as d:
        store = windows.ParquetTrendingStore(d + "/store", horizon_us=hz)
        counts = windows.trending_counts_stream(
            chunked_event_stream(spark, SF_DIR, d, n_chunks=4)
        )
        windows.run_trending_update(counts, store, d + "/ckpt")
        assert store.top(spark) == bounded.top()
        on_disk = {
            int(p.split("=", 1)[1])
            for p in os.listdir(d + "/store")
            if p.startswith("window_start_us=")
        }
        assert on_disk == set(bounded.windows)


def test_corpus_admission_stream_equals_batch_and_drops_dupes(spark, tmp_path):
    """The document-side ingest chain (round 10): a chunked replay with
    injected cross-batch duplicate CONTENT (same text, fresh doc_ids in
    a later micro-batch) must admit exactly the batch pipeline's
    survivors, keep the FIRST-arrival doc_ids, and never re-admit
    content whose digest is already in state."""
    import os

    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # the corpus is digit-free word salad (no organic PII), so plant a
    # deterministic email per doc — the gated tx_pii_scrub's adapter
    # idiom — BEFORE building the duplicate re-emission, so the copies
    # carry identical planted text and remain exact content dups
    src = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" mail u"), F.col("doc_id").cast("string"),
            F.lit("@example.org"),
        ),
    )
    redo = src.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    # PII-differing copies: same body, DIFFERENT planted email — the
    # digest is taken over the REDACTED text, so these must dedup away
    # exactly like verbatim copies (the documented contract)
    pii_variant = src.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.regexp_replace(
            F.col("text"), r"u[0-9]+@example\.org", "other9@example.org"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    chunk_dir = str(tmp_path / "doc_chunks")
    write_ordered_chunks((src, redo, pii_variant), chunk_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    admitted = corpus.corpus_admission_replay_to_memory(
        stream, "corpus_admit_t", str(tmp_path / "ckpt")
    )
    got_ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}

    # batch twin over the ORIGINAL corpus only: the re-emitted copies
    # are exact content dups, so first-arrival admission equals the
    # batch pipeline on the first batch (keeper = the original doc_id,
    # which is unique per digest in this corpus slice)
    batch = corpus.corpus_admission_stream(src)
    want = {r["doc_id"] for r in batch.select("doc_id").collect()}
    assert got_ids == want
    assert got_ids, "admission gate rejected everything — degenerate test"
    assert len(want) < src.count(), "gate admitted everything — no filter bite"
    # no re-emitted id survived: their content digests were already in
    # state — including the PII-VARIANT copies (>= 20M), whose raw text
    # differs but whose redacted digest collapses onto the original
    assert not {i for i in got_ids if i >= 10_000_000}
    # the stream's emitted rows carry the scrubbed columns
    row = admitted.limit(1).collect()[0]
    assert {"n_email", "n_phone", "n_ip", "redacted", "quality"} <= set(
        admitted.columns
    )
    assert row["n_email"] >= 1  # every doc gains a planted email
    assert "[EMAIL]" in row["redacted"]


def test_corpus_admission_cards_first_dedups_card_variants(spark, tmp_path):
    """scrub_cards composed into the streaming admission chain (VERDICT
    r11 ask #3): with scrub_cards_first the digest covers the cards+PII
    redaction, so a later micro-batch carrying the SAME content with a
    DIFFERENT card number must dedup onto the original admission — the
    tx_pii_scrub digest lesson extended to cards. Both planted numbers
    are Luhn-valid test PANs; the digest store stays the only state."""
    import os

    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    # plant a Luhn-valid card per doc (the corpus is digit-free word
    # salad, so the card is the only digit run)
    src = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).withColumn(
        "text", F.concat(F.col("text"), F.lit(" pay 4111111111111111 ok"))
    )
    # card-differing copies in a LATER micro-batch: same body, another
    # Luhn-valid PAN — must collapse onto the original's digest
    # the per-pair digest-group reasoning below assumes no two corpus
    # docs share identical text — assert it instead of trusting the
    # corpus (the extended-PII test's discipline; review r12)
    assert src.count() == src.select("text").distinct().count()
    card_variant = src.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 40_000_000).alias("doc_id"),
        F.regexp_replace(
            F.col("text"), "4111111111111111", "5555555555554444"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    chunk_dir = str(tmp_path / "card_chunks")
    write_ordered_chunks((src, card_variant), chunk_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    admitted = corpus.corpus_admission_replay_to_memory(
        stream, "corpus_cards_t", str(tmp_path / "ckpt"),
        scrub_cards_first=True,
    )
    got_ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    assert got_ids, "admission gate rejected everything — degenerate test"
    # no card-variant id survived: the cards-redacted digest was
    # already in state from the original's micro-batch
    assert not {i for i in got_ids if i >= 40_000_000}
    row = admitted.limit(1).collect()[0]
    assert {"n_card_candidates", "n_cards", "redacted"} <= set(
        admitted.columns
    )
    assert row["n_cards"] == 1 and row["n_card_candidates"] == 1
    assert "[CARD]" in row["redacted"]
    assert "4111111111111111" not in row["redacted"]
    # the discriminating half: WITHOUT the card stage, the two PANs
    # keep distinct digests, so each admitted original's variant is
    # also admitted (batch form suffices — same digest logic)
    base = corpus.corpus_admission_stream(src.unionByName(card_variant))
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    admitted_originals = {
        i for i in base_ids if i < 40_000_000 and i % 3 == 0
    }
    surviving_variants = {
        i - 40_000_000 for i in base_ids if i >= 40_000_000
    }
    assert surviving_variants == admitted_originals
    assert admitted_originals, "no original/variant pair passed the gate"
    assert "n_cards" not in base.columns


def test_corpus_admission_nll_gate(spark, tmp_path):
    """The perplexity gate in the streaming admission chain (round
    12): documents score against a TRAINED bigram model inside the
    stateless front (zero added streaming state), and only docs at or
    under the per-bigram NLL ceiling admit. The replay must admit
    exactly the batch form's survivors, the nll column must ride the
    output, and the gate must genuinely bite (a planted word-salad doc
    with unseen transitions scores above the ceiling and is
    rejected)."""
    import os

    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    model = ngram_model(base)
    # a high-perplexity outlier: an unseen word interleaved between
    # every token of a doc the BASE gate admits. The original words
    # survive, so the language gate stays green (measured: quality
    # 0.83, pred en); every bigram becomes (seen, zzqq) ~ ln(U+V) or
    # (zzqq, seen) ~ ln(V), unit NLL ~5.15 vs the training corpus's
    # tight 3.26-3.60 band — reversal alone does NOT work here (the
    # 31-word vocabulary has nearly all transitions trained, measured
    # in this test's first draft)
    admitted_base = corpus.corpus_admission_stream(base).select("doc_id")
    seed = base.join(admitted_base, "doc_id").limit(1)
    weird = seed.select(
        F.lit(9_999_999).alias("doc_id"),
        F.array_join(
            F.flatten(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.array(w, F.lit("zzqq")),
                )
            ),
            " ",
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    both = base.unionByName(weird)
    from wikitrender_spark.functions.text import ngram_nll_scorer

    # ceiling: the training corpus's max per-bigram NLL — every
    # training doc passes, the outlier must exceed it
    scorer_col = ngram_nll_scorer(*model)(F.col("text"))
    stats = (
        base.select(scorer_col.alias("s"))
        .filter(F.col("s.n_bigrams") > 0)
        .agg(F.max(F.col("s.nll") / F.col("s.n_bigrams")))
        .collect()[0][0]
    )
    ceiling = stats  # max training per-bigram NLL

    chunk_dir = str(tmp_path / "nll_chunks")
    write_ordered_chunks((both,), chunk_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    admitted = corpus.corpus_admission_replay_to_memory(
        stream, "corpus_nll_t", str(tmp_path / "ckpt"),
        nll_model=model, max_unit_nll=ceiling,
    )
    got_ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    want_ids = {
        r["doc_id"]
        for r in corpus.corpus_admission_stream(
            both, nll_model=model, max_unit_nll=ceiling
        ).select("doc_id").collect()
    }
    assert got_ids == want_ids
    assert got_ids, "gate rejected everything — degenerate"
    # the outlier is rejected by the NLL gate specifically: without
    # the gate (model attached, no ceiling) it IS admitted
    assert 9_999_999 not in got_ids
    ungated = {
        r["doc_id"]
        for r in corpus.corpus_admission_stream(both, nll_model=model)
        .select("doc_id").collect()
    }
    assert 9_999_999 in ungated, (
        "outlier fell to the language/quality gate, not the NLL gate"
    )
    assert "nll" in admitted.columns


def test_nll_udf_scores_survivors_once_after_gate(spark):
    """Plan pins for ADVICE r12 low #3 and the double-eval defect the
    fix exposed: the UDF path's executed plan must carry EXACTLY ONE
    ArrowEvalPython node (the optimizer clones a deterministic UDF
    expression through the NLL filter — the asNondeterministic planning
    pin stops it), and that node must sit ABOVE the lang/quality gate
    filter so rejected documents never reach Python."""
    import os

    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.streaming import corpus

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    model = ngram_model(base)
    out = corpus.corpus_admission_stream(
        base, nll_model=model, max_unit_nll=4.0
    )
    lines = out._jdf.queryExecution().executedPlan().toString().split("\n")
    arrow = [i for i, l in enumerate(lines) if "ArrowEvalPython" in l]
    gate = [
        i for i, l in enumerate(lines)
        if "Filter" in l and "lower(text" in l  # the quality/lang gate
    ]
    assert len(arrow) == 1, f"UDF planned {len(arrow)} times: {arrow}"
    # the printed tree is top-down: a LARGER index executes EARLIER
    assert gate and arrow[0] < gate[0], (arrow, gate)


def test_nll_join_gate_bit_matches_udf(spark):
    """The JVM join-form perplexity scorer (round 13, VERDICT r12 ask
    #2) is BIT-compatible with the UDF scorer: on the full sf0.001
    corpus plus a planted high-perplexity outlier, both forms admit the
    same documents and produce bit-identical nll doubles — the sorted
    run-length fold reproduces the scorer's exact addition order, and
    portable pln keeps each term IEEE-identical."""
    import os

    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.streaming import corpus

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    model = ngram_model(base)
    udf = corpus.corpus_admission_stream(
        base, nll_model=model, max_unit_nll=4.0
    )
    join = corpus.corpus_admission_stream(
        base, nll_model=model, max_unit_nll=4.0, nll_gate="join"
    )
    # the documented output contract is shared verbatim
    assert udf.columns == join.columns
    u = {r["doc_id"]: r["nll"] for r in udf.collect()}
    j = {r["doc_id"]: r["nll"] for r in join.collect()}
    assert set(u) == set(j)
    assert u, "ceiling rejected everything — degenerate"
    for d, nll in u.items():
        # exact float equality ON PURPOSE: the bit contract is the test
        assert j[d] == nll, (d, j[d].hex(), nll.hex())


def test_nll_join_gate_zero_bigram_and_backoff(spark):
    """Unit pins on _nll_join_score's edge semantics, matched against
    the UDF scorer on the same texts: a doc with < 2 tokens scores
    (n_bigrams=0, nll=0.0) and trivially passes; unseen bigrams back
    off through the left-unigram relation and unseen left words
    through pln(v) — all three classes bit-equal to the scorer."""
    from wikitrender_spark.functions.text import ngram_nll_scorer
    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.streaming import corpus

    train = spark.createDataFrame(
        [(0, "en", "aa bb aa bb cc"), (1, "en", "bb cc bb aa")],
        "doc_id long, lang string, text string",
    )
    model = ngram_model(train)
    texts = [
        "solo",              # zero bigrams
        "",                  # empty
        "aa bb cc",          # all-seen bigrams
        "aa cc",             # unseen bigram, seen left word
        "zz qq aa",          # unseen left words
        "aa bb aa bb aa bb", # repeated bigrams (the xf>1 fold path)
    ]
    front = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, _text string"
    )
    got = {
        r["doc_id"]: (r["_n_bigrams"], r["nll"])
        for r in corpus._nll_join_score(front, model).collect()
    }
    scorer = ngram_nll_scorer(*model)(F.col("_text"))
    want = {
        r["doc_id"]: (r["s"]["n_bigrams"], r["s"]["nll"])
        for r in front.select("doc_id", scorer.alias("s")).collect()
    }
    assert got == want
    assert got[0] == (0, 0.0) and got[1] == (0, 0.0)
    assert got[5][0] == 5  # occurrences, not distinct bigrams


def test_nll_join_gate_streaming_watermark_replay(spark, tmp_path):
    """The join form in the STREAMING deployment it is documented for:
    the watermark moves before the scorer, the per-doc re-group
    aggregates on (ingest_ts, doc_id), and the digest dedup chains
    downstream as a second stateful operator. Pins: (a) admitted nll
    values are bit-equal to the batch UDF form; (b) a cross-batch
    duplicate COLLAPSES to one admission (representative arbitrary —
    copies can emit from the agg in the same flush batch, so the
    batch-dedup caveat applies, not first-arrival identity); (c) a
    row whose ingest_ts the watermark never passes does NOT emit (the
    documented append-mode aggregation latency trade)."""
    import os

    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    sch = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, ingest_ts timestamp"
    )
    base = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).limit(30)
    model = ngram_model(base)
    t0 = dt.datetime(2026, 1, 1)
    withts = base.withColumn("ingest_ts", F.lit(t0))
    admitted_rows = (
        base.join(
            corpus.corpus_admission_stream(base).select("doc_id"), "doc_id"
        )
        .orderBy("doc_id")
        .limit(2)
        .collect()
    )
    assert len(admitted_rows) == 2
    orig, flush_seed = admitted_rows
    # batch 2: a copy of an admitted doc's content 30 s later; batch 3:
    # a gate-passing row 700 s later whose event time advances the
    # watermark past t0 (700 - 600 > 0), flushing every t0 group out of
    # the append-mode aggregation — itself never emitted (nothing ever
    # passes ITS timestamp)
    dup = spark.createDataFrame(
        [(777_777, orig["text"], orig["lang"], orig["source"],
          orig["n_chars"], t0 + dt.timedelta(seconds=30))], sch)
    flush = spark.createDataFrame(
        [(888_888, flush_seed["text"], flush_seed["lang"],
          flush_seed["source"], flush_seed["n_chars"],
          t0 + dt.timedelta(seconds=700))], sch)
    chunk_dir = str(tmp_path / "nll_join_chunks")
    write_ordered_chunks((withts, dup, flush), chunk_dir)
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    out = corpus.corpus_admission_stream_within_watermark(
        stream, horizon="10 minutes",
        nll_model=model, max_unit_nll=50.0, nll_gate="join",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("nll_join_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("nll_join_wm").collect()
    spark.catalog.dropTempView("nll_join_wm")
    got_ids = {r["doc_id"] for r in got}
    # (c) the flush row's own group never passes the watermark
    assert 888_888 not in got_ids
    # (b) digest collapse: exactly ONE of {original, copy} admitted
    assert len({orig["doc_id"], 777_777} & got_ids) == 1
    # (a) bit-equal nll against the batch UDF form, keyed by digest-
    # equivalent doc (the copy carries the original's text)
    want = {
        r["doc_id"]: r["nll"]
        for r in corpus.corpus_admission_stream(
            base, nll_model=model, max_unit_nll=50.0
        ).collect()
    }
    got_nll = {
        (r["doc_id"] if r["doc_id"] != 777_777 else orig["doc_id"]): r["nll"]
        for r in got
    }
    assert set(got_nll) == set(want)
    for d, nll in want.items():
        assert got_nll[d] == nll, (d, got_nll[d].hex(), nll.hex())
    # the documented column order (ts after lang) holds on the join path
    assert out.columns[:6] == [
        "doc_id", "lang", "ingest_ts", "n_tokens", "quality", "nll"
    ]


def test_nll_join_gate_composes_with_cards_and_extended_pii(spark):
    """The join gate must compose with the other two admission options
    exactly like the UDF gate: same columns in the same documented
    order (nll after quality; card counts before the per-pattern
    counts), same admitted set, bit-equal nll — the
    _admission_column_order reorder is where a drift would hide."""
    import os

    from wikitrender_spark.functions.text import PII_PATTERNS_EXTENDED
    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.streaming import corpus

    base = spark.read.parquet(
        os.path.join(SF_DIR, "documents.parquet")
    ).limit(120)
    model = ngram_model(base)
    kw = dict(
        patterns=PII_PATTERNS_EXTENDED,
        scrub_cards_first=True,
        nll_model=model,
        max_unit_nll=50.0,
    )
    udf = corpus.corpus_admission_stream(base, **kw)
    join = corpus.corpus_admission_stream(base, **kw, nll_gate="join")
    assert join.columns == udf.columns
    cols = join.columns
    assert cols.index("quality") < cols.index("nll")
    assert cols.index("nll") < cols.index("n_card_candidates")
    assert cols.index("n_cards") < cols.index("n_email")
    u = {r["doc_id"]: r for r in udf.collect()}
    j = {r["doc_id"]: r for r in join.collect()}
    assert set(u) == set(j) and u
    for d in u:
        assert j[d]["nll"] == u[d]["nll"]
        assert j[d]["redacted"] == u[d]["redacted"]


def test_corpus_admission_neardup_chain(spark, tmp_path):
    """The full near-dup admission chain (round 13): gate -> scrub ->
    MinHash/LSH band admission over the REDACTED text -> digest dedup,
    THREE engine-native stateful operators under one event-time
    watermark. Pins: a cross-batch near-dup (original + one word) and
    an exact copy are blocked at the BAND stage; a short doc (<3
    tokens, no shingles) passes the band stage unchecked and its exact
    dup collapses at the DIGEST stage (representative
    cohort-arbitrary); originals admit; the flush row never passes its
    own timestamp; output carries (n_fresh_bands, neardup_checked)
    after redacted."""
    import os

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    sch = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, ingest_ts timestamp"
    )
    t0 = dt.datetime(2026, 1, 1)
    base = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .limit(25)
        .withColumn("ingest_ts", F.lit(t0))
        # re-label with the predicted lang so the gate passes on
        # quality alone (the sibling watermark test's convention)
        .withColumn("lang", T.predict_lang(F.col("text")))
    )
    seeds = (
        base.join(
            corpus.corpus_admission_stream(
                base.drop("ingest_ts")
            ).select("doc_id"),
            "doc_id",
        )
        .orderBy("doc_id")
        .limit(2)
        .collect()
    )
    assert len(seeds) == 2
    orig, fseed = seeds

    def mk(rows_):
        return spark.createDataFrame(rows_, sch).withColumn(
            "lang", T.predict_lang(F.col("text"))
        )

    def row(i, txt, s):
        import datetime as _dt

        return (i, txt, "en", "src", len(txt),
                t0 + _dt.timedelta(seconds=s))

    chunk_dir = str(tmp_path / "nd_chain_chunks")
    write_ordered_chunks(
        (
            base.unionByName(mk([row(500, "the of", 0)])),
            mk([row(601, orig["text"] + " tailword", 30),
                row(602, orig["text"], 30)]),
            mk([row(603, "the of", 60)]),
            mk([row(999, fseed["text"], 700)]),
        ),
        chunk_dir,
    )
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    out = corpus.corpus_admission_stream_within_watermark(
        stream, horizon="10 minutes", neardup=True
    )
    assert out.columns[-3:] == ["redacted", "n_fresh_bands",
                                "neardup_checked"]
    q = (
        out.writeStream.format("memory")
        .queryName("nd_chain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["doc_id"]: (r["n_fresh_bands"], r["neardup_checked"])
        for r in spark.table("nd_chain").collect()
    }
    spark.catalog.dropTempView("nd_chain")
    assert orig["doc_id"] in got and fseed["doc_id"] in got
    # short docs pass the band stage unchecked (per-doc sentinel
    # bucket) and collapse at the DIGEST stage: exactly one of the two
    # "the of" copies admits. Which one is cohort-arbitrary — both
    # emit from the re-group in the same watermark-flush batch, the
    # established batch-dedup caveat (assert collapse, never identity)
    short_ids = {500, 603} & set(got)
    assert len(short_ids) == 1, sorted(got)
    assert got[short_ids.pop()] == (0, False)
    assert 601 not in got              # near-dup: band stage blocks
    assert 602 not in got              # exact copy: band stage blocks
    assert 999 not in got              # flush never passes its own ts
    for d, (nf, checked) in got.items():
        if checked:
            assert nf == 4, (d, nf)


def test_nll_join_gate_guards(spark):
    """The unbounded streaming variant must REFUSE the join form (an
    append-mode aggregation needs event time) with a pointer to the
    watermark variant, and a typo'd nll_gate must error, not silently
    run the UDF path."""
    from wikitrender_spark.streaming import corpus

    model = ({}, {}, 1)
    stream = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="within_watermark"):
        corpus.corpus_admission_stream(
            stream, nll_model=model, nll_gate="join"
        )
    batch = spark.createDataFrame(
        [(0, "en", "x")], "doc_id long, lang string, text string"
    )
    with pytest.raises(ValueError, match="nll_gate"):
        corpus.corpus_admission_stream(batch, nll_model=model, nll_gate="jvm")
    with pytest.raises(ValueError, match="nll_gate"):
        corpus.corpus_admission_stream_within_watermark(
            batch, nll_model=model, nll_gate="jvm"
        )


def test_corpus_admission_all_options_compose(spark, tmp_path):
    """The admission chain's three options TOGETHER (extended PII +
    cards-first + NLL gate) in one replay — the pairwise tests can't
    catch interaction bugs (column ordering, digest-scope drift, a
    gate consuming another's column). The digest must cover the
    cards+extended-PII redaction (a copy differing in BOTH a card and
    an IPv6 dedups away), the schema must carry every option's
    columns in the documented order, and the NLL gate must still
    bite."""
    import os

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    schema = "doc_id long, text string, lang string, source string, n_chars long"
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    model = ngram_model(base)
    planted = base.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" pay 4111 1111 1111 1111 peer 2001:db8:0:0:0:0:0:"),
            (F.col("doc_id") % 9 + 1).cast("string"),
        ),
    )
    # copies differing in BOTH plantings: must dedup onto the original
    variant = planted.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 50_000_000).alias("doc_id"),
        F.regexp_replace(
            F.regexp_replace(
                F.col("text"), "4111 1111 1111 1111", "5555-5555-5555-4444"
            ),
            r"2001:db8:0:0:0:0:0:[0-9]", "2001:db8:0:0:0:0:0:ffff",
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    assert planted.count() == planted.select("text").distinct().count()
    chunk_dir = str(tmp_path / "combo_chunks")
    write_ordered_chunks((planted, variant), chunk_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    # generous NLL ceiling: the plantings add unseen transitions to
    # every doc, so the gate must not reject the whole corpus — but it
    # must stay attached (schema + lineage)
    admitted = corpus.corpus_admission_replay_to_memory(
        stream, "corpus_combo_t", str(tmp_path / "ckpt"),
        patterns=T.PII_PATTERNS_EXTENDED, scrub_cards_first=True,
        nll_model=model, max_unit_nll=8.0,
    )
    got_ids = {r["doc_id"] for r in admitted.select("doc_id").collect()}
    assert got_ids, "combined gates rejected everything — degenerate"
    # no variant survived: the digest covers the FULL redaction chain
    assert not {i for i in got_ids if i >= 50_000_000}
    # documented column order: nll after quality, card counts before
    # the per-pattern counts
    cols = admitted.columns
    assert cols.index("quality") < cols.index("nll")
    assert cols.index("nll") < cols.index("n_card_candidates")
    assert cols.index("n_cards") < cols.index("n_email")
    row = admitted.limit(1).collect()[0]
    assert row["n_cards"] == 1
    assert "[CARD]" in row["redacted"] and "[IPV6]" in row["redacted"]
    assert "4111" not in row["redacted"]
    assert row["nll"] > 0.0


def test_corpus_admission_extended_pii_patterns(spark):
    """The widened PII table threads through the admission chain: the
    output carries one n_{kind} per extended pattern, and the dedup
    digest is taken over the EXTENDED redaction — two copies that
    differ only in a planted IPv6 address collapse to one admission
    (under the default three-pattern table they would NOT, since IPv6
    survives that redaction)."""
    import os

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.streaming import corpus

    src = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" peer 2001:db8:0:0:0:0:0:"),
            # decimal digits are valid hex, so the per-doc suffix keeps
            # the planted address in the full 8-group form
            (F.col("doc_id") % 9 + 1).cast("string"),
        ),
    )
    variant = src.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 30_000_000).alias("doc_id"),
        F.regexp_replace(
            F.col("text"), r"2001:db8:0:0:0:0:0:[0-9]", "2001:db8:0:0:0:0:0:ffff"
        ).alias("text"),
        "lang", "source", "n_chars",
    )
    # make the per-pair digest-group assumption explicit and loud: the
    # slice must carry no exact-duplicate texts (else groups span pairs)
    assert src.count() == src.select("text").distinct().count()
    both = src.unionByName(variant)
    ext = corpus.corpus_admission_stream(both, T.PII_PATTERNS_EXTENDED)
    assert {f"n_{k}" for k, _, _ in T.PII_PATTERNS_EXTENDED} <= set(ext.columns)
    ext_ids = {r["doc_id"] for r in ext.select("doc_id").collect()}
    assert ext_ids, "extended admission rejected everything"
    # extended digest collapses each original/variant pair to ONE
    # admission. Batch dropDuplicates keeps an ARBITRARY representative
    # (first-arrival is a streaming-replay contract), so assert pair
    # collapse, not which member survived (self-review r11)
    for o in {i % 30_000_000 for i in ext_ids if i % 4 == 0}:
        assert len(ext_ids & {o, o + 30_000_000}) == 1, o
    # the default table does NOT redact IPv6, so both pair members keep
    # distinct digests and BOTH are admitted when the text passes the
    # gate — the discriminating half of the contract (gating is
    # text-level, and the exact-dup assert above pins group = pair)
    base_ids = {
        r["doc_id"]
        for r in corpus.corpus_admission_stream(both).select("doc_id").collect()
    }
    admitted_originals = {i for i in base_ids if i < 30_000_000 and i % 4 == 0}
    surviving_variants = {i - 30_000_000 for i in base_ids if i >= 30_000_000}
    assert surviving_variants == admitted_originals
    assert len(ext_ids) == len(base_ids) - len(admitted_originals)
    row = ext.limit(1).collect()[0]
    assert "[IPV6]" in row["redacted"]


def test_corpus_admission_watermark_readmits_expired_drops_live(spark, tmp_path):
    """Bounded-state corpus admission: with a 60 s ingest-time horizon,
    a copy of content whose digest state EXPIRED before the previous
    batch's eviction sweep is re-admitted (the watermark freshness
    trade), while a copy of still-live content is dropped."""
    import os

    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    # three real corpus texts that pass the admission gate, made
    # digest-distinct by construction (distinct text)
    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    texts = [
        r["text"]
        for r in corpus.corpus_admission_stream(base)
        .join(base.select("doc_id", "text"), "doc_id")
        .select("text")
        .distinct()
        .orderBy("text")
        .limit(3)
        .collect()
    ]
    assert len(texts) == 3
    ta, tb, tc = texts
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*items):
        return spark.createDataFrame(
            [
                (i, txt, "en", "src", len(txt), t0 + dt.timedelta(seconds=s))
                for (i, txt, s) in items
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ingest_ts timestamp",
        )

    # batch 1: A and B at t0. batch 2: C at t0+300 — its END advances
    # the watermark to t0+240, but the eviction sweep runs with the
    # PREVIOUS batch's watermark (the same one-batch lag the
    # events-side replay handles with a sentinel batch,
    # streaming/dedup.py replay_events_with_late_dupes). batch 3: a
    # sentinel re-emission of C (still live -> dropped, and its batch
    # boundary applies the t0+240 sweep, evicting A/B whose expiry is
    # t0+60). batch 4: A-copy (state expired -> RE-ADMITTED) and
    # another C-copy (state live, expiry t0+360 -> dropped), at t0+300
    # (never late).
    chunk_dir = str(tmp_path / "wm_chunks")
    write_ordered_chunks(
        (
            rows((1, ta, 0), (2, tb, 0)),
            rows((3, tc, 300)),
            rows((99, tc, 300)),
            rows((100, ta, 300), (101, tc, 300)),
        ),
        chunk_dir,
    )
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ingest_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    # the lang of real corpus texts may not be 'en' — bypass nothing:
    # re-label each row with its PREDICTED lang so the gate passes on
    # text quality alone (the gate itself is covered by the sibling
    # test; this one pins the watermark dedup semantics)
    from wikitrender_spark.functions import text as T

    stream = stream.withColumn("lang", T.predict_lang(F.col("text")))
    q = (
        corpus.corpus_admission_stream_within_watermark(
            stream, horizon="60 seconds"
        )
        .writeStream.format("memory")
        .queryName("corpus_admit_wm")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"] for r in spark.table("corpus_admit_wm").collect()}
    spark.catalog.dropTempView("corpus_admit_wm")
    assert got == {1, 2, 3, 100}, got


def test_corpus_admission_full_option_chain(spark, tmp_path):
    """The FULL-OPTION production configuration, correctness-pinned
    (round 14 — the configuration tools/corpus_throughput_probe.py
    --full prices): cards-first scrub + EXTENDED PII + the JVM
    join-form NLL gate + near-dup band admission + digest dedup —
    FOUR engine-native stateful operators under one event-time
    watermark. Pins, in stage order: (a) the NLL gate bites (a planted
    word-salad doc with unseen transitions exceeds the training
    corpus's max unit NLL and is rejected); (b) near-dup admission
    runs over the REDACTED text — a copy of an admitted doc differing
    ONLY in its planted card + IPv6 redacts to identical text, bands
    identically, and is blocked at the band stage even though its raw
    digest differs; (c) a cross-batch near-dup (+1 word) and an exact
    raw copy are blocked; (d) admitted rows carry the full option
    column set in the documented order with the card/IPv6 redaction
    applied; (e) the flush row never passes its own timestamp."""
    import os

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.functions.text import ngram_nll_scorer
    from wikitrender_spark.plans.pipeline_queries import ngram_model
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    sch = (
        "doc_id long, text string, lang string, source string, "
        "n_chars long, ingest_ts timestamp"
    )
    t0 = dt.datetime(2026, 1, 1)
    full = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    model = ngram_model(full)
    scorer_col = ngram_nll_scorer(*model)(F.col("text"))
    corpus_max = (
        full.select(scorer_col.alias("s"))
        .filter(F.col("s.n_bigrams") > 0)
        .agg(F.max(F.col("s.nll") / F.col("s.n_bigrams")))
        .collect()[0][0]
    )

    base25 = (
        full.limit(25)
        .withColumn("ingest_ts", F.lit(t0))
        .withColumn("lang", T.predict_lang(F.col("text")))
    )
    seeds = (
        base25.join(
            corpus.corpus_admission_stream(
                base25.drop("ingest_ts")
            ).select("doc_id"),
            "doc_id",
        )
        .orderBy("doc_id")
        .limit(3)
        .collect()
    )
    assert len(seeds) == 3
    orig, fseed, cseed = seeds
    # cseed's ORIGINAL row leaves the base so the card-planted double
    # (doc 490) has no same-batch near-dup to race against (same-batch
    # band winners are cohort-arbitrary — the documented caveat)
    base = base25.filter(F.col("doc_id") != cseed["doc_id"])

    def mk(rows_):
        return spark.createDataFrame(rows_, sch).withColumn(
            "lang", T.predict_lang(F.col("text"))
        )

    def row(i, txt, s):
        return (i, txt, "en", "src", len(txt),
                t0 + dt.timedelta(seconds=s))

    plant_a = " pay 4111 1111 1111 1111 peer 2001:db8:0:0:0:0:0:1"
    plant_b = " pay 5555-5555-5555-4444 peer 2001:db8:0:0:0:0:0:ffff"
    salad = " ".join(
        w for tok in orig["text"].split(" ") for w in (tok, "zzqq")
    )
    # ceiling: midway between the worst ADMITTED text (the planted
    # rows add a few unseen transitions, nudging them past the clean
    # corpus's max) and the word-salad outlier — every intended row
    # passes, the outlier must not. Computed from the scorer itself so
    # the pin never rides on hand-tuned constants.
    def unit_nll(txt):
        s = (
            spark.createDataFrame([(txt,)], "text string")
            .select(scorer_col.alias("s"))
            .collect()[0]["s"]
        )
        return s["nll"] / s["n_bigrams"]

    worst_pass = max(corpus_max, unit_nll(cseed["text"] + plant_a),
                     unit_nll(cseed["text"] + plant_b),
                     unit_nll(orig["text"] + " tailword"))
    salad_nll = unit_nll(salad)
    assert worst_pass < salad_nll, (worst_pass, salad_nll)
    ceiling = (worst_pass + salad_nll) / 2
    chunk_dir = str(tmp_path / "full_chain_chunks")
    write_ordered_chunks(
        (
            # 490 rides ALONE in the first chunk: it claims its band
            # buckets first, so its admission is deterministic (inside
            # the base chunk it could lose a same-batch band race to a
            # natural near-dup — this corpus is 31-word salad, the
            # first draft of this test measured exactly that)
            mk([row(490, cseed["text"] + plant_a, 0)]),
            base.withColumn(
                "ingest_ts",
                F.lit(t0 + dt.timedelta(seconds=10)),
            ),
            mk([
                # card/IPv6 double of 490: raw digest differs, REDACTED
                # text identical -> identical bands -> band stage blocks
                row(604, cseed["text"] + plant_b, 30),
                # plain cross-batch near-dup and exact raw copy of orig
                row(601, orig["text"] + " tailword", 30),
                row(602, orig["text"], 30),
                # the NLL outlier: unseen transitions around every token
                row(603, salad, 30),
            ]),
            # STAGGERED watermark advancement — the property this test
            # DISCOVERED (now documented on the chain's docstring): in
            # the join form the NLL re-group emits rows only at
            # watermark release, so docs from different ingest batches
            # whose timestamps fall in ONE release interval reach the
            # band stage together and race same-batch (the first draft
            # used a single flush and watched doc 604 arbitrarily beat
            # 490). Advancing the watermark past t0+10 FIRST commits
            # the originals' bands a batch before the blockers emit,
            # restoring deterministic cross-batch blocking.
            mk([row(998, fseed["text"], 615)]),
            mk([row(999, fseed["text"], 700)]),
        ),
        chunk_dir,
    )
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    out = corpus.corpus_admission_stream_within_watermark(
        stream,
        horizon="10 minutes",
        patterns=T.PII_PATTERNS_EXTENDED,
        scrub_cards_first=True,
        nll_model=model,
        max_unit_nll=float(ceiling),
        nll_gate="join",
        neardup=True,
    )
    assert out.columns[-2:] == ["n_fresh_bands", "neardup_checked"]
    cols = out.columns
    assert cols.index("quality") < cols.index("nll")
    assert cols.index("nll") < cols.index("n_card_candidates")
    assert cols.index("n_cards") < cols.index("n_email")
    q = (
        out.writeStream.format("memory")
        .queryName("full_chain")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["doc_id"]: r for r in spark.table("full_chain").collect()}
    spark.catalog.dropTempView("full_chain")
    assert orig["doc_id"] in got and fseed["doc_id"] in got
    assert 490 in got, sorted(got)        # the card-planted double admits
    r490 = got[490]
    assert r490["n_cards"] == 1
    assert "[CARD]" in r490["redacted"] and "[IPV6]" in r490["redacted"]
    assert "4111" not in r490["redacted"]
    assert r490["n_fresh_bands"] == 4 and r490["neardup_checked"]
    assert 604 not in got   # PII-only variant: band stage blocks (b)
    assert 601 not in got   # near-dup (+1 word): band stage blocks (c)
    assert 602 not in got   # exact raw copy: blocked (c)
    assert 603 not in got   # word-salad: the join-form NLL gate bites (a)
    assert 998 not in got and 999 not in got  # flush rows never pass (e)
    for r in got.values():
        if r["neardup_checked"]:
            assert r["n_fresh_bands"] == 4


def test_soak_drain_records_per_batch_state_and_evicts(spark, tmp_path):
    """Plumbing pin for the round-15 soak (tools/
    corpus_throughput_probe.py --soak): the per-batch drain must
    surface every stateful operator's rows for every micro-batch, and
    with ingest spacing at half the horizon the engine must EVICT
    mid-run — the series cannot grow monotonically, and the
    watermark-advancing flush must drain state to (near) nothing. The
    sf0.1 measurement lives in BASELINE.md; this pins the machinery
    at sf0.001 scale so a telemetry or eviction regression fails CI,
    not a round measurement."""
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "corpus_throughput_probe_soak",
        _os.path.join(
            _os.path.dirname(__file__), "..", "tools",
            "corpus_throughput_probe.py",
        ),
    )
    probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(probe)
    probe.SF_DIR = "/root/testdata/sf0.001"

    res = probe.soak_state_bounded(
        spark, str(tmp_path), batch_size=300, n_batches=7,
        horizon="20 minutes", spacing_s=600,
    )
    full = [b for b in res["per_batch"] if b["input_rows"] >= 300]
    assert len(full) == 7
    # the udf+neardup chain is THREE stateful operators, visible in
    # every full batch's telemetry
    assert all(len(b["state"]) == 3 for b in full)
    series = res["plateau"]["series"]
    totals = [sum(r for _n, r in b["state"]) for b in full]
    assert series[: len(totals)] == totals
    peak = max(totals)
    assert peak > 300  # state from more than one batch coexists
    # eviction fired mid-run: a 20-minute horizon over 10-minute
    # spacing cannot sustain monotone growth across seven batches
    assert any(b2 <= b1 for b1, b2 in zip(totals, totals[1:]))
    # and the flush (watermark + 48 h) drains state to near nothing
    final_total = sum(r for _n, r in res["per_batch"][-1]["state"])
    assert final_total <= peak // 5


def test_corpus_admission_restart_from_checkpoint_equals_uninterrupted(
    spark, tmp_path
):
    """Checkpoint recovery must be invisible (round 15 — the one
    operational property of the watermarked admission chain no test
    exercised): a second query started on the SAME checkpoint must
    (a) resume source offsets — phase-A docs are not re-emitted;
    (b) recover dedup STATE — a copy of still-live content is dropped
    AFTER the restart; (c) recover and keep advancing the WATERMARK —
    a copy of content whose state expired post-restart re-admits; and
    (d) the union of both phases' admissions must equal a fresh
    UNINTERRUPTED run over the same ordered chunks. AvailableNow's
    clean stop stands in for the crash; offsets/state/watermark all
    come from the checkpoint either way. The sink is the PARQUET file
    sink — the deployment-realistic one — because the memory sink
    refuses recovery ("does not support recovering from checkpoint
    location"); admissions are read back through the sink's own
    _spark_metadata commit log, so the assert also covers the file
    sink's exactly-once contract across the restart."""
    import datetime as dt
    import os
    import time as _time

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    texts = [
        r["text"]
        for r in corpus.corpus_admission_stream(base)
        .join(base.select("doc_id", "text"), "doc_id")
        .select("text")
        .distinct()
        .orderBy("text")
        .limit(4)
        .collect()
    ]
    assert len(texts) == 4
    ta, tb, tc, td = texts
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*items):
        return spark.createDataFrame(
            [
                (i, txt, "en", "src", len(txt), t0 + dt.timedelta(seconds=s))
                for (i, txt, s) in items
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ingest_ts timestamp",
        )

    def append_chunks(parts, chunk_dir, start):
        # mirrors sources/replay.write_ordered_chunks' mtime recipe
        # WITHOUT its clean-dir reset — the restart phase must ADD
        # chunks to a dir the first phase already drained; kept local
        # so the production helper stays byte-untouched (registry
        # stale-by-code-change rule 4)
        for j, part in enumerate(parts):
            i = start + j
            path = os.path.join(chunk_dir, f"chunk_{i:04d}")
            part.coalesce(1).write.mode("overwrite").parquet(path)
            ts = _time.time() + i
            for root, _dirs, files in os.walk(path):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))

    # phase A: fresh admits only. phase B (appended after the restart)
    # walks the dedup's measured batch mechanics (verified against the
    # engine's per-batch watermark/state telemetry building this test:
    # a duplicate does NOT refresh its key's expiry, the batch-N
    # eviction sweep runs at batch END with the watermark COMPUTED
    # FROM batch N-1, and a duplicate arriving in the sweep batch
    # itself still sees pre-sweep state):
    # chunk 2 = a copy of ta (state LIVE — drops iff state survived
    # the restart) + fresh td (admits); chunk 3 = a tc re-emission at
    # t0+300 (live -> dropped; its END computes watermark t0+240);
    # chunk 4 = another tc copy (still sees pre-sweep state ->
    # dropped, while THIS batch's end-of-batch sweep, running under
    # the t0+240 watermark, evicts every phase-A/B key — expiries are
    # all <= t0+90); chunk 5 = an ta copy and a tc copy, both against
    # EVICTED state -> both RE-ADMITTED (the watermark freshness
    # trade, now exercised across a restart).
    phase_a = (rows((1, ta, 0), (2, tb, 0)), rows((3, tc, 30)))
    phase_b = (
        rows((50, ta, 30), (51, td, 30)),
        rows((99, tc, 300)),
        rows((98, tc, 300)),
        rows((100, ta, 300), (101, tc, 300)),
    )

    def drain(chunk_dir, ckpt, out_dir):
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string, "
                "n_chars long, ingest_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(chunk_dir)
        )
        stream = stream.withColumn("lang", T.predict_lang(F.col("text")))
        q = (
            corpus.corpus_admission_stream_within_watermark(
                stream, horizon="60 seconds"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # read back through the sink's _spark_metadata commit log —
        # only COMMITTED files count (the exactly-once contract)
        return {
            r["doc_id"] for r in spark.read.parquet(out_dir).collect()
        }

    chunk_dir = str(tmp_path / "restart_chunks")
    ckpt = str(tmp_path / "restart_ckpt")
    out_dir = str(tmp_path / "restart_out")
    write_ordered_chunks(phase_a, chunk_dir)
    got_a = drain(chunk_dir, ckpt, out_dir)
    assert got_a == {1, 2, 3}, got_a

    append_chunks(phase_b, chunk_dir, start=len(phase_a))
    got_all = drain(chunk_dir, ckpt, out_dir)
    got_b = got_all - got_a
    # offsets recovered (no phase-A re-emission: the cumulative sink
    # holds each admit once), state recovered (50 and 99/98 dropped
    # against pre-restart digests), watermark recovered and advancing
    # (100/101 re-admit after the post-restart sweep)
    assert got_b == {51, 100, 101}, got_all
    # row count, not just set membership: a re-emitted phase-A doc
    # would land as a duplicate ROW in the sink
    assert spark.read.parquet(out_dir).count() == 6

    # and the two phases together are indistinguishable from never
    # having stopped
    unint_dir = str(tmp_path / "unint_chunks")
    write_ordered_chunks(phase_a + phase_b, unint_dir)
    got_u = drain(
        unint_dir, str(tmp_path / "unint_ckpt"), str(tmp_path / "unint_out")
    )
    assert got_u == got_all, (got_u, got_all)


def test_neardup_chain_restart_equals_uninterrupted(spark, tmp_path):
    """Recovery across the MULTI-STATEFUL chain (neardup=True: band
    dedup -> per-doc re-group -> digest dedup under one watermark) —
    three state stores plus propagated watermark must all restore
    from one checkpoint. Pure equivalence form: no hand-derived
    per-batch expectations (the sibling digest test pins those
    mechanics); just restarted-phases == uninterrupted, as sets AND
    row counts, through the parquet sink's commit log. A 48 h flush
    text closes both runs so the append-mode re-group emits
    everything admitted."""
    import datetime as dt
    import os
    import time as _time

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    texts = [
        r["text"]
        for r in corpus.corpus_admission_stream(base)
        .join(base.select("doc_id", "text"), "doc_id")
        .select("text")
        .distinct()
        .orderBy("text")
        .limit(5)
        .collect()
    ]
    assert len(texts) == 5
    ta, tb, tc, td, tflush = texts
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*items):
        return spark.createDataFrame(
            [
                (i, txt, "en", "src", len(txt), t0 + dt.timedelta(seconds=s))
                for (i, txt, s) in items
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ingest_ts timestamp",
        )

    phase_a = (rows((1, ta, 0), (2, tb, 0)), rows((3, tc, 30)))
    phase_b = (
        rows((50, ta, 30), (51, td, 30)),
        rows((99, tc, 300)),
        rows((100, ta, 300)),
        rows((999, tflush, 48 * 3600)),
    )

    def drain(chunk_dir, ckpt, out_dir):
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string, "
                "n_chars long, ingest_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(chunk_dir)
        )
        stream = stream.withColumn("lang", T.predict_lang(F.col("text")))
        q = (
            corpus.corpus_admission_stream_within_watermark(
                stream, horizon="60 seconds", neardup=True
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows_ = spark.read.parquet(out_dir).collect()
        return sorted(r["doc_id"] for r in rows_)

    def append_chunks(parts, chunk_dir, start):
        for j, part in enumerate(parts):
            i = start + j
            path = os.path.join(chunk_dir, f"chunk_{i:04d}")
            part.coalesce(1).write.mode("overwrite").parquet(path)
            ts = _time.time() + i
            for root, _dirs, files in os.walk(path):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))

    chunk_dir = str(tmp_path / "nd_restart_chunks")
    write_ordered_chunks(phase_a, chunk_dir)
    got_a = drain(
        chunk_dir, str(tmp_path / "nd_ckpt"), str(tmp_path / "nd_out")
    )
    append_chunks(phase_b, chunk_dir, start=len(phase_a))
    got_restarted = drain(
        chunk_dir, str(tmp_path / "nd_ckpt"), str(tmp_path / "nd_out")
    )
    # phase A's emissions are a prefix of the cumulative sink
    assert set(got_a) <= set(got_restarted)

    unint_dir = str(tmp_path / "nd_unint_chunks")
    write_ordered_chunks(phase_a + phase_b, unint_dir)
    got_unint = drain(
        unint_dir, str(tmp_path / "nd_unint_ckpt"),
        str(tmp_path / "nd_unint_out"),
    )
    assert got_restarted == got_unint, (got_restarted, got_unint)
    assert len(got_restarted) >= 4  # the admitted originals did emit


def test_soak_restart_state_curve_equals_uninterrupted(spark, tmp_path):
    """Soak x recovery composition in miniature (round 16, VERDICT r15
    next-round #4): the r15 soak measured eviction and the r15 restart
    pins measured recovery, separately; this pins their INTERACTION —
    a restart must neither LEAK horizon state (the post-restart curve
    would sit higher than the uninterrupted one) nor RESET it (the
    curve would dip and re-climb, re-admitting live duplicates). Eight
    single-doc batches: four originals inside one horizon, restart,
    then four COPIES — the first two arriving while their originals'
    state is still live (drop iff state survived the restart; the
    second also pins the one-batch sweep lag across a restart), the
    last two after the post-restart sweep (re-admit iff the watermark
    kept advancing). Asserted: (a) admitted set == the uninterrupted
    run's;
    (b) the per-batch state-ROW series from the engine's own progress
    telemetry is IDENTICAL between the restarted run (merged phases)
    and the uninterrupted run — same batch ids, same state rows; and
    (c) the series actually decreases somewhere (the eviction is in
    frame, so the equality is not vacuous). Clean AvailableNow stop
    stands in for the crash, as in the sibling restart pins; the
    HARD-kill variant of the same composition is the probe's
    --soak-restart mode (tools/corpus_throughput_probe.py), whose
    sf0.1 record lives in BASELINE.md."""
    import os
    import time as _time

    from wikitrender_spark.functions import text as T
    from wikitrender_spark.sources.replay import write_ordered_chunks
    from wikitrender_spark.streaming import corpus

    base = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    texts = [
        r["text"]
        for r in corpus.corpus_admission_stream(base)
        .join(base.select("doc_id", "text"), "doc_id")
        .select("text")
        .distinct()
        .orderBy("text")
        .limit(4)
        .collect()
    ]
    assert len(texts) == 4
    ta, tb, tc, td = texts
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)

    def rows(*items):
        return spark.createDataFrame(
            [
                (i, txt, "en", "src", len(txt), t0 + dt.timedelta(seconds=s))
                for (i, txt, s) in items
            ],
            "doc_id long, text string, lang string, source string, "
            "n_chars long, ingest_ts timestamp",
        )

    # phase A: four originals, 30 s apart under a 60 s horizon
    phase_a = (
        rows((1, ta, 0)), rows((2, tb, 30)),
        rows((3, tc, 60)), rows((4, td, 90)),
    )
    # phase B (appended after the restart), walking the pinned batch
    # mechanics (sweep at batch END under the PREVIOUS batch's
    # watermark; duplicates never refresh expiry): doc 11 (ta copy,
    # t=240) drops AGAINST RECOVERED STATE — batch 3's end sweep ran
    # under batch-2's watermark t=0, so every phase-A key is live when
    # batch 4 processes it. Doc 12 (tb, t=270) ALSO drops: batch 4's
    # end sweep used batch-3's watermark (t=30), evicting nothing.
    # Batch 5's end sweep finally runs under batch-4's watermark
    # (t=180) and evicts all four phase-A keys, so docs 13/14 RE-ADMIT
    # through the recovered-and-advancing watermark.
    phase_b = (
        rows((11, ta, 240)), rows((12, tb, 270)),
        rows((13, tc, 300)), rows((14, td, 330)),
    )

    def drain(chunk_dir, ckpt, out_dir):
        stream = (
            spark.readStream.schema(
                "doc_id long, text string, lang string, source string, "
                "n_chars long, ingest_ts timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .option("recursiveFileLookup", "true")
            .parquet(chunk_dir)
        )
        stream = stream.withColumn("lang", T.predict_lang(F.col("text")))
        q = (
            corpus.corpus_admission_stream_within_watermark(
                stream, horizon="60 seconds"
            )
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        curve = [
            (
                p["batchId"],
                sum(
                    op.get("numRowsTotal") or 0
                    for op in p.get("stateOperators", [])
                ),
            )
            for p in q.recentProgress
            if p.get("numInputRows", 0) > 0
        ]
        admits = sorted(
            r["doc_id"] for r in spark.read.parquet(out_dir).collect()
        )
        return admits, curve

    def append_chunks(parts, chunk_dir, start):
        for j, part in enumerate(parts):
            i = start + j
            path = os.path.join(chunk_dir, f"chunk_{i:04d}")
            part.coalesce(1).write.mode("overwrite").parquet(path)
            ts = _time.time() + i
            for root, _dirs, files in os.walk(path):
                for f in files:
                    os.utime(os.path.join(root, f), (ts, ts))

    chunk_dir = str(tmp_path / "soakrst_chunks")
    write_ordered_chunks(phase_a, chunk_dir)
    admits_a, curve_a = drain(
        chunk_dir, str(tmp_path / "srst_ckpt"), str(tmp_path / "srst_out")
    )
    assert admits_a == [1, 2, 3, 4]
    append_chunks(phase_b, chunk_dir, start=len(phase_a))
    admits_r, curve_b = drain(
        chunk_dir, str(tmp_path / "srst_ckpt"), str(tmp_path / "srst_out")
    )
    merged = dict(curve_a)
    merged.update(dict(curve_b))
    curve_restarted = sorted(merged.items())

    unint_dir = str(tmp_path / "srst_unint_chunks")
    write_ordered_chunks(phase_a + phase_b, unint_dir)
    admits_u, curve_u = drain(
        unint_dir, str(tmp_path / "srst_unint_ckpt"),
        str(tmp_path / "srst_unint_out"),
    )

    # (a) admitted-set equivalence: 11 AND 12 dropped against
    # recovered live state (the sweep lag), 13/14 re-admitted through
    # the recovered watermark
    assert admits_r == admits_u, (admits_r, admits_u)
    assert admits_r == [1, 2, 3, 4, 13, 14]
    # (b) the state curve is indistinguishable from never stopping —
    # compared as the SERIES of per-input-batch state totals, not by
    # batchId: the restarted query spends one empty batch (no input
    # rows) re-establishing offsets/watermark from the checkpoint, so
    # phase-2 data batches run one id later than the uninterrupted
    # run's (observed: restarted ids 0-3,5-8 vs 0-7; values identical)
    series = [s for _b, s in curve_restarted]
    series_u = [s for _b, s in sorted(curve_u)]
    assert series == series_u, (curve_restarted, curve_u)
    # (c) eviction is in frame: the series decreases somewhere
    assert any(b < a for a, b in zip(series, series[1:])), series
