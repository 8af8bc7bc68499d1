"""Streaming exact deduplication over a document stream — the online
twin of operators/dedup.exact_dedup_groups for ingest-time pipelines
(dedupe as data arrives instead of as a batch pass).

Spark-first shape: `dropDuplicates` on the content digest rides the
engine's native streaming-dedup state (one state row per distinct
digest, incremental across micro-batches, checkpoint-recoverable) — no
custom stateful processor needed. Two variants:

- `dedup_stream`: global exact dedup, state grows with distinct
  content. Correct-by-construction; at 100 TB-of-ingest scale the state
  is O(distinct digests) x 16 bytes + key overhead, which RocksDB state
  stores handle but never reclaim.
- `dedup_stream_within_watermark`: `dropDuplicatesWithinWatermark` —
  state bounded by the event-time horizon (duplicates are only filtered
  within the watermark window). This is the production default for an
  unbounded firehose, trading tail-duplicate recall for bounded state —
  the same trade the purge policy (SURVEY.md §2.5) makes for page rows.

Batch-stream equivalence (the Structured Streaming correctness argument)
is pinned by tests/test_streaming_dedup.py: replaying the documents
table as N ordered micro-batches yields exactly one survivor per
distinct digest — the same digest set as the batch dedup relation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: every event whose id is divisible by this is re-emitted in the second
#: micro-batch of the ingest-dedup replay — a deterministic ~14% dupe
#: rate at every SF, so the dedup check is never degenerate
INGEST_DUP_MOD = 7

#: narrow replay schema: ingest dedup needs only the identity key and
#: the grouping column; the stream never carries the wide row
_INGEST_SCHEMA = "event_id long, event_type string"

#: guard band (µs) around the watermark-survival cutoff: rows whose
#: event time is within this band of `max_ts - 2*horizon` are excluded
#: from the late-dupe re-emission, so the replay outcome never rides on
#: the engine's eviction boundary strictness (measured: eviction fires
#: at expiry <= watermark) or on Spark's ms-precision watermark
#: truncation against µs event times
WATERMARK_GUARD_US = 1_000_000


def replay_events_with_dupes(
    spark: SparkSession, sf_dir: str, work_dir: str, dup_mod: int = INGEST_DUP_MOD
) -> DataFrame:
    """Two-micro-batch file-source replay of the events table with
    injected duplicates: batch 1 is the full table, batch 2 re-emits
    every event with ``event_id % dup_mod == 0``. Mirrors
    sources/replay.chunked_event_stream's mtime-ordered chunk layout so
    Trigger.AvailableNow processes the batches in order and the dedup
    state is exercised ACROSS micro-batches, not within one."""
    from ..sources.replay import write_ordered_chunks

    src = (
        spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        .select("event_id", "event_type")
    )
    chunk_dir = os.path.join(work_dir, "ingest_chunks")
    write_ordered_chunks(
        (src, src.filter(F.col("event_id") % dup_mod == 0)), chunk_dir
    )
    return (
        spark.readStream.schema(_INGEST_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )


def drain_to_memory(deduped: DataFrame, name: str, ckpt: str) -> DataFrame:
    """The ONE home of the append-mode memory-sink drain discipline
    (previously copy-pasted per call site — self-review r10): run the
    streaming relation to exhaustion under Trigger.AvailableNow, then
    materialize the result OFF the memory-sink view (eager local
    checkpoint) and drop the view immediately — the returned relation
    stays valid for the caller's lifetime with no per-run temp view
    accumulating in the session catalog, and no trap where a later
    invocation's cleanup invalidates an earlier invocation's result."""
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = deduped.sparkSession
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


def ingest_dedup_to_memory(
    spark: SparkSession, sf_dir: str, work_dir: str, name: str, ckpt: str
) -> DataFrame:
    """Run the injected-dupe replay through streaming ``dropDuplicates``
    on the event identity key into a memory sink (append mode — dedup
    emits each surviving row exactly once); returns the survivor
    relation. State is one row per distinct event_id — the engine's
    native streaming-dedup state, checkpoint-recoverable; production
    ingest with an unbounded firehose uses the watermark-bounded variant
    (dedup_stream_within_watermark) instead."""
    deduped = replay_events_with_dupes(spark, sf_dir, work_dir).dropDuplicates(
        ["event_id"]
    )
    return drain_to_memory(deduped, name, ckpt)


def replay_events_with_late_dupes(
    spark: SparkSession, sf_dir: str, work_dir: str, dup_mod: int = INGEST_DUP_MOD
) -> tuple[DataFrame, str]:
    """Three-micro-batch replay that makes the WATERMARK-BOUNDED dedup
    outcome fully deterministic (and so oracle-expressible). With
    horizon H = span/4 (whole seconds):

    - batch 1: the full events table at its real event times;
    - batch 2: one sentinel row (event_id = -1) at max_ts — its only
      job is the batch boundary: streaming-dedup state is evicted at
      the END of a batch with that batch's watermark (measured — a
      dupe arriving in the very next batch after the watermark passes
      its key's expiry still sees live state), so the engine needs one
      batch at watermark ``max_ts - H`` before the late dupes arrive;
    - batch 3: every event with ``event_id % dup_mod == 0`` re-emitted
      at max_ts (never late), EXCLUDING rows within WATERMARK_GUARD_US
      of the survival cutoff.

    A batch-3 dupe survives iff its original's state expired before the
    batch-2 eviction sweep: ``ts + H <= max_ts - H``, i.e.
    ``ts <= max_ts - 2H``. The guard band keeps boundary rows out of
    the replay entirely, so the survivor set is exactly
    ``{ts <= cutoff - guard}`` — a pure filter the DuckDB twin states
    verbatim (sqlgen.ingest_dedup_watermark_oracle).

    Returns (stream, horizon_string). The min/max scan is replay
    CONSTRUCTION (one 2-value first()), not operator work."""
    from ..operators.derive import read_events_raw
    from ..sources.replay import write_ordered_chunks

    src = read_events_raw(spark, sf_dir).select("event_id", "event_type", "ts")
    lo, hi = src.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    h_s = (hi - lo) // 4 // 1_000_000
    h_us = h_s * 1_000_000
    cutoff = hi - 2 * h_us
    max_ts = F.timestamp_micros(F.lit(hi))
    sentinel = spark.range(1).select(
        F.lit(-1).cast("long").alias("event_id"),
        F.lit("sentinel").alias("event_type"),
        max_ts.alias("ts"),
    )
    us = F.unix_micros("ts")
    late_dupes = src.filter(
        (F.col("event_id") % dup_mod == 0)
        & (
            (us <= F.lit(cutoff - WATERMARK_GUARD_US))
            | (us >= F.lit(cutoff + WATERMARK_GUARD_US))
        )
    ).select("event_id", "event_type", max_ts.alias("ts"))
    chunk_dir = os.path.join(work_dir, "ingest_wm_chunks")
    write_ordered_chunks((src, sentinel, late_dupes), chunk_dir)
    stream = (
        spark.readStream.schema("event_id long, event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )
    return stream, f"{h_s} seconds"


def ingest_dedup_watermark_to_memory(
    spark: SparkSession, sf_dir: str, work_dir: str, name: str, ckpt: str
) -> DataFrame:
    """Run the late-dupe replay through ``dropDuplicatesWithinWatermark``
    on the event identity key into a memory sink; returns the survivor
    relation (sentinel included — callers filter ``event_id >= 0``).
    This is the PRODUCTION ingest-dedup variant: state bounded by the
    event-time horizon instead of growing with distinct keys forever,
    at the declared cost that a duplicate arriving after its original's
    horizon expires is re-admitted — which the replay pins as exact,
    deterministic survivors."""
    stream, horizon = replay_events_with_late_dupes(spark, sf_dir, work_dir)
    deduped = stream.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return drain_to_memory(deduped, name, ckpt)


def with_digest(docs: DataFrame) -> DataFrame:
    """Attach the 128-bit content digest (the dedup key). Narrow
    projection: the digest is computed once at ingest and the document
    bytes never enter dedup state."""
    return docs.withColumn("digest", F.md5("text"))


def dedup_stream(docs: DataFrame) -> DataFrame:
    """First arrival per distinct content survives; later copies are
    dropped incrementally across micro-batches."""
    return with_digest(docs).dropDuplicates(["digest"])


def dedup_stream_within_watermark(
    docs: DataFrame, ts_col: str, horizon: str = "10 minutes"
) -> DataFrame:
    """Bounded-state variant: duplicates are filtered only within the
    event-time watermark horizon; state for expired digests is
    reclaimed by the engine."""
    return (
        with_digest(docs)
        .withWatermark(ts_col, horizon)
        .dropDuplicatesWithinWatermark(["digest"])
    )
