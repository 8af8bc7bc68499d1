"""Stream-stream event-time interval join (SURVEY.md §2.7 joins — absent
in the reference; a flagship Structured Streaming capability): edit
events joined to protect log actions on the same page within the
following PROTECT_WINDOW_HOURS.

Batch and stream share the join spec; the streaming form watermarks both
sides, which bounds join state: an edit's row is evicted once the
watermark passes e_ts + window + delay, a protect's once it passes p_ts
+ delay. Inner-join matches always emit (the watermark only bounds
state/lateness), so on an in-order replay stream==batch exactly —
tests/test_streaming.py asserts that.

Scale notes: the equi key (id) drives the shuffle; the interval is a
post-condition on the co-partitioned state — the same shape the batch
range join (rel_signup_burst) uses, plus state eviction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 48h keeps the joined pair set non-trivial at the oracle scale factors
# (the synthetic stream averages one edit per page per ~15h at sf0.01)
PROTECT_WINDOW_HOURS = 48


def _edits(rc: DataFrame) -> DataFrame:
    from ..operators.page_state import classified_edit_events

    return classified_edit_events(rc).select(
        "id", F.col("ts").alias("e_ts"), F.col("seq").alias("e_seq")
    )


def _protects(rc: DataFrame) -> DataFrame:
    from ..operators.lifecycle import log_events

    return log_events(rc).filter(F.col("log_action") == "protect").select(
        F.col("id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("seq").alias("p_seq"),
    )


def _join(e: DataFrame, p: DataFrame) -> DataFrame:
    cond = (
        (F.col("id") == F.col("p_id"))
        & (F.col("p_ts") >= F.col("e_ts"))
        & (
            F.col("p_ts")
            <= F.col("e_ts") + F.expr(f"INTERVAL {PROTECT_WINDOW_HOURS} HOURS")
        )
    )
    return e.join(p, cond).select(
        "id",
        "e_seq",
        "p_seq",
        (
            (F.unix_micros("p_ts") - F.unix_micros("e_ts")) / 60000000.0
        ).alias("gap_min"),
    )


def edit_protect_pairs_batch(rc: DataFrame) -> DataFrame:
    return _join(_edits(rc), _protects(rc))


def edit_protect_pairs_stream(
    rc_edits: DataFrame, rc_logs: DataFrame, watermark_delay: str = "2 hours"
) -> DataFrame:
    """Both inputs are rc event streams (typically two readers over the
    same source); watermarks on both sides bound the join state."""
    e = _edits(rc_edits).withWatermark("e_ts", watermark_delay)
    p = _protects(rc_logs).withWatermark("p_ts", watermark_delay)
    return _join(e, p)
