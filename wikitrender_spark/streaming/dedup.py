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
    q = (
        deduped.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # materialize the survivors OFF the memory-sink view (eager local
    # checkpoint), then drop the view immediately: the returned relation
    # stays valid for the caller's lifetime with no per-run temp view
    # accumulating in the session catalog — and no trap where a later
    # invocation's cleanup invalidates an earlier invocation's result
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


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
