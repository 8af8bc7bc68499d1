"""Streaming telemetry (SURVEY.md §2.5 P3): the reference logs live vs
purged page counts per cleaner pass (/root/reference/index.js:393); the
Spark-native surface is a StreamingQueryListener capturing per-batch
progress — input rows, batch duration, state-store rows/memory — plus the
changelog's own tombstone counts for purge accounting.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.listener import StreamingQueryListener


@dataclass
class BatchMetrics:
    batch_id: int
    num_input_rows: int
    duration_ms: int | None
    state_rows: int | None


@dataclass
class ProgressCapture(StreamingQueryListener):
    """Collects one BatchMetrics per completed micro-batch. Register with
    spark.streams.addListener(capture); remove when done."""

    batches: list = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: D102
        pass

    def onQueryProgress(self, event) -> None:  # noqa: D102
        p = event.progress
        state_rows = None
        if p.stateOperators:
            state_rows = sum(s.numRowsTotal for s in p.stateOperators)
        self.batches.append(
            BatchMetrics(
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=p.batchDuration,
                state_rows=state_rows,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: D102
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: D102
        pass


def attach(spark: SparkSession) -> ProgressCapture:
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    return cap


def detach(spark: SparkSession, cap: ProgressCapture) -> None:
    spark.streams.removeListener(cap)


def purge_counts(changelog: DataFrame) -> DataFrame:
    """P3 purge accounting from the changelog itself: live upserts vs
    tombstones per emitted version (the reference's 'X live, Y purged'
    debug line, aggregated instead of printed)."""
    return changelog.groupBy("_ver").agg(
        F.sum((~F.col("_deleted")).cast("long")).alias("n_live_rows"),
        F.sum(F.col("_deleted").cast("long")).alias("n_tombstones"),
    )
