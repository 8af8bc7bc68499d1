"""Event-time windowed aggregations over the rc stream (SURVEY.md §2.7:
watermarks / tumbling windows / late-data handling — absent in the
reference, which is processing-time only; free in Structured Streaming).

One aggregation spec shared by the batch query (plans/wikitrender_queries
.q_windowed_activity) and the watermarked streaming form, so
batch–stream equivalence is testable (tests/test_streaming.py).

The distinct-page count makes this a TWO-LEVEL aggregation — streaming
disallows count_distinct, so level 1 groups by (window, id) and level 2
rolls partials up per window; in streaming that is the Spark-4
multiple-stateful-operator chain (second window over window_time of the
first). Batch and stream share both levels, so they agree row-for-row.

Scale notes: bounded state per (window, live page) at level 1, per window
at level 2; the watermark closes windows and evicts their state after
`delay` — the bounded-state guarantee the reference's cumulative map
lacks. Both exchanges are on the window key with map-side partials.
"""

from __future__ import annotations

import atexit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WINDOW_DURATION = "1 hour"


def _level1(e: DataFrame) -> DataFrame:
    """(window, id) partials over classified edit events."""
    return e.groupBy(F.window("ts", WINDOW_DURATION), "id").agg(
        F.count(F.lit(1)).alias("p_events"),
        F.sum(F.when(F.col("eligible"), 1).otherwise(0)).alias("p_edits"),
        F.sum(F.col("is_revert").cast("int")).alias("p_reverts"),
        F.sum(
            F.when(F.col("is_revert") | ~F.col("is_bot"), F.col("delta")).otherwise(
                0
            )
        ).alias("p_delta"),
    )


def _rollup(l1_grouped) -> DataFrame:
    out = l1_grouped.agg(
        F.sum("p_events").cast("long").alias("n_events"),
        F.sum("p_edits").cast("long").alias("n_edits"),
        F.sum("p_reverts").cast("long").alias("n_reverts"),
        F.count(F.lit(1)).alias("n_pages"),
        F.sum("p_delta").cast("long").alias("total_delta"),
    )
    return out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        F.unix_micros(F.col("window.end")).alias("window_end_us"),
        "n_events",
        "n_edits",
        "n_reverts",
        "n_pages",
        "total_delta",
    )


def windowed_activity_agg(e: DataFrame) -> DataFrame:
    """Batch form: tumbling 1-hour activity rollup over classified edit
    events (operators/page_state.classified_edit_events shape)."""
    return _rollup(_level1(e).groupBy("window"))


def windowed_activity_stream(
    rc_stream: DataFrame, watermark_delay: str = "2 hours"
) -> DataFrame:
    """Watermarked streaming form: same two levels; level 2 re-windows on
    window_time(level-1 window) so event time propagates through the
    stateful chain. Late events beyond `watermark_delay` are dropped."""
    from ..operators.page_state import classified_edit_events

    e = classified_edit_events(rc_stream).withWatermark("ts", watermark_delay)
    l1 = _level1(e)
    return _rollup(
        l1.groupBy(F.window(F.window_time("window"), WINDOW_DURATION))
    )


SESSION_GAP_HOURS = 12


def session_activity_agg(e: DataFrame, gap_hours: int = SESSION_GAP_HOURS) -> DataFrame:
    """Per-page session windows (dynamic-gap grouping): same spec for the
    batch query and the watermarked stream. A session's state closes (and
    in streaming, is evicted) once the watermark passes last_ts + gap."""
    return (
        e.groupBy(F.session_window("ts", f"{gap_hours} hours"), F.col("id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("ts").alias("last_ts"))
        .select(
            "id",
            F.unix_micros(F.col("session_window.start")).alias("session_start_us"),
            F.unix_micros("last_ts").alias("last_us"),
            "n_events",
        )
    )


def session_activity_stream(
    rc_stream: DataFrame,
    gap_hours: int = SESSION_GAP_HOURS,
    watermark_delay: str = "2 hours",
) -> DataFrame:
    """Streaming sessionization: sessions merge across micro-batches via
    keyed session state; append mode emits each session exactly once,
    when the watermark closes it."""
    from ..operators.page_state import classified_edit_events

    e = (
        classified_edit_events(rc_stream)
        .select("id", "ts")
        .withWatermark("ts", watermark_delay)
    )
    return session_activity_agg(e, gap_hours)


def dedup_events_stream(
    rc_stream: DataFrame, watermark_delay: str = "2 hours"
) -> DataFrame:
    """Streaming exact dedup: drop re-delivered events by seq within the
    watermark (dropDuplicatesWithinWatermark). This is the admission
    layer for at-least-once sources — the reference's watchdog rebuilds
    the SSE socket on stall (S3, /root/reference/index.js:349-356) and
    can re-receive events; state is bounded by the watermark horizon
    rather than growing with the whole stream."""
    return rc_stream.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        ["seq"]
    )


def run_windowed_to_memory(
    windowed: DataFrame, name: str, checkpoint: str, mode: str = "append",
    state_partitions: int | None = None,
    scan_split_bytes: int | None = None,
) -> DataFrame:
    """Run the windowed stream to a memory sink with AvailableNow and
    return the sink table. `append` emits only watermark-finalized
    windows — required for a multi-stateful chain, and the
    late-data-safe output. ``state_partitions`` scopes the query's
    state-store partition count (round 17; streaming/sizing.py — the
    scale-adaptive replacement for inheriting the local core count)."""
    from .sizing import state_partition_conf

    with state_partition_conf(
        windowed.sparkSession, state_partitions, scan_split_bytes
    ):
        q = (
            windowed.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return windowed.sparkSession.table(name)


#: per-window trending cut for the streaming trending query.
TRENDING_TOPK = 3
#: far-future shift for the finalization sentinels (must exceed every
#: real window end + the watermark delay by a wide margin).
TRENDING_SENTINEL_DAYS = 30


def trending_counts_stream(
    rc_stream: DataFrame, watermark_delay: str = "2 hours"
) -> DataFrame:
    """CONTINUOUS (production) form of the trending aggregation — the
    update-mode sibling of the replay+sentinel gate harness
    (trending_replay_to_memory): watermarked per-(hour window, page)
    event counts that emit a row whenever a count CHANGES, instead of
    once at finalization. Pair with run_trending_update + a
    TrendingReport to get the reference's periodic trending render
    (examples/index.js:19-71) as an event-time push — the S8
    console/report sink's successor: the reference re-renders its whole
    cache every 10 wall-clock seconds whether or not anything changed;
    this pushes exactly the changed (window, page) rows.

    State is bounded per (window, page) and evicted once the watermark
    passes window end + delay — the same bound the append form carries;
    correctness for a window requires its late data to arrive within
    the watermark (the standard streaming contract; the batch
    equivalence test replays in order, where equality is exact)."""
    from ..operators.page_state import classified_edit_events

    e = classified_edit_events(rc_stream).withWatermark(
        "ts", watermark_delay
    )
    return (
        e.groupBy(F.window("ts", WINDOW_DURATION), "id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "id",
            "n_events",
        )
    )


class TrendingReport:
    """Driver-side upsert store + per-window top-k view — what the
    reference's setInterval render loop keeps in its page cache
    (examples/index.js:19-71), maintained by update-mode pushes instead
    of wall-clock polling. `horizon_us` bounds memory: windows older
    than (newest window start - horizon) are evicted, mirroring the
    upstream watermark eviction — the store holds only live windows.

    Production note: this in-driver dict stands in for the KV/report
    store a deployment would upsert (the reference also renders from
    in-process memory); the foreachBatch feed is bounded per batch by
    the number of CHANGED (window, page) pairs, not by stream volume."""

    def __init__(
        self, topk: int = TRENDING_TOPK, horizon_us: int | None = None
    ) -> None:
        self.topk = topk
        self.horizon_us = horizon_us
        self.windows: dict[int, dict[str, int]] = {}
        self.max_start = None

    def update(self, rows) -> None:
        for r in rows:
            ws = r["window_start_us"]
            # drop updates for windows already past the horizon instead
            # of re-inserting them (ADVICE r9): a late row would
            # resurrect the evicted window holding ONLY the changed
            # pages, so top() would silently serve an incomplete top-k
            # for it — horizon_us is not tied to the stream's watermark
            # delay, making that reachable in a live deployment
            if (
                self.horizon_us is not None
                and self.max_start is not None
                and ws < self.max_start - self.horizon_us
            ):
                continue
            self.windows.setdefault(ws, {})[r["id"]] = r["n_events"]
            if self.max_start is None or ws > self.max_start:
                self.max_start = ws
        if self.horizon_us is not None and self.max_start is not None:
            cut = self.max_start - self.horizon_us
            for ws in [w for w in self.windows if w < cut]:
                del self.windows[ws]

    def top(self) -> dict[int, list[tuple[str, int]]]:
        return {
            ws: sorted(d.items(), key=lambda kv: (-kv[1], kv[0]))[
                : self.topk
            ]
            for ws, d in self.windows.items()
        }


class ParquetTrendingStore:
    """Parquet-backed sibling of TrendingReport (VERDICT r9 ask #6):
    the same upsert-store + per-window top-k contract, persisted to a
    window-partitioned parquet directory instead of driver memory — the
    report survives driver restarts and is readable by any consumer
    with the path, completing the S8 production story (the reference
    renders from in-process memory; examples/index.js:19-71).

    Upsert = per-batch DYNAMIC PARTITION OVERWRITE: only the window
    partitions touched by the batch's changed (window, page) rows are
    rewritten — current rows for those windows are kept via one
    anti-join, so write volume is bounded by the batch's affected
    windows, never the store. Horizon eviction drops whole window
    partitions past (newest window start - horizon_us), and late rows
    already past the horizon are dropped on arrival (same rule as
    TrendingReport — an evicted window must not resurrect holding only
    its changed pages). At cluster scale the same shape is a Delta/
    Iceberg MERGE with replaceWhere + retention; the filesystem
    partition listing/removal here is the local-path stand-in.

    Equivalence with TrendingReport is pytest-pinned on a replay
    (tests/test_streaming.py)."""

    def __init__(
        self,
        path: str,
        topk: int = TRENDING_TOPK,
        horizon_us: int | None = None,
    ) -> None:
        self.path = path
        self.topk = topk
        self.horizon_us = horizon_us

    def _window_dirs(self) -> dict[int, str]:
        import os

        out = {}
        if os.path.isdir(self.path):
            for d in os.listdir(self.path):
                if d.startswith("window_start_us="):
                    out[int(d.split("=", 1)[1])] = os.path.join(
                        self.path, d
                    )
        return out

    def update_batch(self, batch_df: DataFrame) -> None:
        import os

        spark = batch_df.sparkSession
        # eager checkpoint: the merge below reads self.path while the
        # write overwrites it — materialize first so the plan never
        # scans the directory it is replacing
        changed = batch_df.select(
            "window_start_us", "id", "n_events"
        ).localCheckpoint(eager=True)
        wins = [
            r[0]
            for r in changed.select("window_start_us").distinct().collect()
        ]
        if not wins:
            return
        dirs = self._window_dirs()
        mx = max(wins + list(dirs))
        cut = (
            mx - self.horizon_us if self.horizon_us is not None else None
        )
        if cut is not None:
            wins = [w for w in wins if w >= cut]
            if not wins:
                return
            changed = changed.filter(F.col("window_start_us") >= cut)
        live = [w for w in wins if w in dirs]
        if live:
            # read ONLY the affected window dirs (basePath keeps the
            # partition column): reading the store root would re-list
            # every window partition each batch — O(store age) listing
            # per micro-batch on an unbounded-horizon store (self-review
            # r10). The anti-join preserves unchanged pages there.
            keep = (
                spark.read.option("basePath", self.path)
                .parquet(*[dirs[w] for w in live])
                .join(
                    changed.select("window_start_us", "id"),
                    ["window_start_us", "id"],
                    "left_anti",
                )
            )
            merged = keep.select(
                "window_start_us", "id", "n_events"
            ).unionByName(changed)
        else:
            merged = changed
        merged = merged.localCheckpoint(eager=True)
        (
            merged.repartition("window_start_us")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("window_start_us")
            .parquet(self.path)
        )
        if cut is not None:
            import shutil

            for w, d in self._window_dirs().items():
                if w < cut:
                    shutil.rmtree(d, ignore_errors=True)

    def top(self, spark) -> dict[int, list[tuple[str, int]]]:
        import os

        from pyspark.sql import Window as W

        if not os.path.isdir(self.path) or not self._window_dirs():
            return {}
        w = W.partitionBy("window_start_us").orderBy(
            F.desc("n_events"), F.asc("id")
        )
        rows = (
            spark.read.parquet(self.path)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= self.topk)
            .collect()
        )
        out: dict[int, list[tuple[str, int]]] = {}
        for r in sorted(rows, key=lambda r: (r["window_start_us"], r["rn"])):
            out.setdefault(int(r["window_start_us"]), []).append(
                (r["id"], r["n_events"])
            )
        return out


def run_trending_update(
    windowed: DataFrame, report, ckpt: str
) -> None:
    """Drive the update-mode trending stream into a TrendingReport (or
    ParquetTrendingStore) via foreachBatch (availableNow drains
    whatever the source holds; swap the trigger for a processing-time
    one in a live deployment). For the in-driver report the per-batch
    collect() is the feed — bounded by changed pairs per batch (see
    TrendingReport); the parquet store consumes the batch DataFrame
    directly and collects only its distinct window starts."""

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        if hasattr(report, "update_batch"):
            report.update_batch(batch_df)
        else:
            report.update(batch_df.collect())

    q = (
        windowed.writeStream.outputMode("update")
        .foreachBatch(process)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


#: process-lifetime cache of the trending replay's ordered chunk dirs,
#: keyed by (sf_dir, n_chunks) -> (chunk_dir, sentinel_cut_us). The
#: chunk relation is a PURE function of the input table, so rebuilding
#: it per call (global row_number sort, count/max aggs, sentinel first(),
#: parquet writes) only re-derives identical bytes — at ~9.5 s/call the
#: harness cost was ~all chunk prep (VERDICT r8 ask #8). Checkpoints and
#: memory sinks are NOT cached: every call still replays the stream
#: through a fresh query, so the measured semantics are untouched.
#: Caveats (r09 review): (a) the dirs are removed at interpreter exit
#: (atexit below) so repeated processes don't leak /tmp parquet; (b) the
#: key does not fingerprint the table's CONTENT — if the parquet at
#: sf_dir were regenerated within one process the stale chunks would
#: replay; no code path does that (testdata changes only between driver
#: rounds, i.e. between processes).
_CHUNK_CACHE: dict[tuple[str, int], tuple[str, int]] = {}


def _purge_chunk_cache() -> None:
    import shutil

    for chunk_dir, _cut in _CHUNK_CACHE.values():
        shutil.rmtree(chunk_dir, ignore_errors=True)
    _CHUNK_CACHE.clear()


atexit.register(_purge_chunk_cache)


def trending_replay_to_memory(
    spark, sf_dir: str, name: str, ckpt: str,
    n_chunks: int = 2,
):
    """Replay the events table as ordered micro-batches through the
    WATERMARKED per-(hour-window, page) streaming aggregation, with TWO
    far-future sentinel batches appended so the watermark finalizes
    EVERY real window (append mode emits a window only once the
    watermark passes it, and state eviction lags the watermark by one
    batch — the measured semantics the ingest-dedup replay pinned; the
    second sentinel batch is the boundary at which the jumped watermark
    actually sweeps). Returns (survivors DataFrame, sentinel_cut_us):
    survivors hold every REAL window exactly once; rows at or beyond
    sentinel_cut_us are the sentinels' own (never-finalized or
    irrelevant) windows and must be filtered by the caller."""
    import os
    import tempfile

    from pyspark.sql import Window as W

    from ..operators.derive import read_events_raw
    from ..operators.page_state import classified_edit_events
    from ..sources.replay import EVENTS_SCHEMA, _derive, write_ordered_chunks

    cached = _CHUNK_CACHE.get((sf_dir, n_chunks))
    if cached is not None and os.path.isdir(cached[0]) and os.listdir(
        cached[0]
    ):
        chunk_dir, cut_us = cached
    else:
        if cached is not None:
            # stale entry (dir vanished or is empty): reclaim whatever
            # remains before the fresh mkdtemp replaces the cache slot,
            # or the old path leaks until reboot — atexit only purges
            # dirs still referenced here (ADVICE r9)
            import shutil

            shutil.rmtree(cached[0], ignore_errors=True)
        src = read_events_raw(spark, sf_dir).withColumn(
            "_rn", F.row_number().over(W.orderBy("ts", "event_id")) - 1
        )
        n_rows = src.count()
        max_us = src.agg(F.max(F.unix_micros("ts"))).first()[0]
        cut_us = max_us + 24 * 3600 * 1_000_000
        step = max(1, (n_rows + n_chunks - 1) // n_chunks)
        shift_us = TRENDING_SENTINEL_DAYS * 24 * 3600 * 1_000_000
        # the sentinel must SURVIVE the rc derivation filter or it never
        # reaches the watermarked operator and the watermark never jumps
        # (measured: the raw max-ts row passes the F1-F3 filters at
        # sf0.001 but not sf0.01 — the last delay-window hours then
        # silently never finalize). Pick the latest row the derivation
        # provably keeps.
        from ..operators.derive import rc_events

        # ... and the watermark operator sits downstream of
        # classified_edit_events' log-branch filter too (ADVICE r8):
        # rc_events still carries log rows, and if the latest rc row
        # were a log row both sentinel batches would be dropped BEFORE
        # the EventTimeWatermark node — the watermark would never jump
        # and the trailing delay-window hours would silently never
        # finalize. Pick the latest EDIT-branch row so the sentinel
        # provably survives every filter upstream of the watermark.
        keep_id = (
            rc_events(spark, sf_dir)
            .filter(F.col("log_type").isNull())
            .orderBy(F.desc("ts"), F.desc("seq"))
            .select("seq")
            .first()[0]
        )
        sentinel = (
            src.filter(F.col("event_id") == keep_id).drop("_rn")
            .withColumn(
                "ts",
                F.timestamp_micros(F.unix_micros("ts") + F.lit(shift_us)),
            )
        )
        # the cached dir lives outside the caller's work_dir (which is
        # rmtree'd per call) for the life of the process — a few MB of
        # parquet per (sf_dir, n_chunks) key
        chunk_dir = tempfile.mkdtemp(prefix="wt_trend_chunks_")
        parts = [
            src.filter(
                (F.col("_rn") >= i * step) & (F.col("_rn") < (i + 1) * step)
            ).drop("_rn")
            for i in range(n_chunks)
        ]
        write_ordered_chunks((*parts, sentinel, sentinel), chunk_dir)
        _CHUNK_CACHE[(sf_dir, n_chunks)] = (chunk_dir, cut_us)
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    rc = _derive(spark, raw, "wtr_trending_stream")
    e = classified_edit_events(rc).withWatermark("ts", "2 hours")
    counts = (
        e.groupBy(F.window("ts", WINDOW_DURATION), "id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("window.start")).alias("window_start_us"),
            "id",
            "n_events",
        )
    )
    from .sizing import (
        adaptive_state_partitions,
        dir_bytes,
        replay_scan_split,
    )

    nb = dir_bytes(chunk_dir)
    out = run_windowed_to_memory(
        counts, name, ckpt, mode="append",
        # scale-adaptive state partitions + scan split, derived from
        # the replay chunk bytes (round 17; streaming/sizing.py)
        state_partitions=adaptive_state_partitions(nb),
        scan_split_bytes=replay_scan_split(spark, nb),
    )
    survivors = out.localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return survivors, cut_us
