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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
