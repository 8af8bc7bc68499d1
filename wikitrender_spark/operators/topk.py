"""Q1-Q3 rankings + purge policy P2 (SURVEY.md §2.5/§2.6).

orderBy(metric).limit(k) compiles to TakeOrderedAndProject — per-partition
partial top-k then a single-partition merge of k*numPartitions rows. No
global sort shuffle, so the cost at 100 TB is one scan + tiny merge.

Sort pin (SURVEY.md §2.6): the reference's JS comparator is an unstable
descending sort with no tiebreak (/root/reference/examples/index.js:22-24);
we pin ORDER BY metric DESC, id ASC for deterministic golden outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Reference purge defaults (/root/reference/index.js:110-113).
MAX_LIFESPAN_MIN = 60 * 24
MAX_INACTIVITY_MIN = 60
MIN_SPEED_EPM = 3.0
MIN_PURGE_TIME_MIN = 5.0


def most_edited(state_with_metrics: DataFrame, k: int = 5) -> DataFrame:
    """Q1 (/root/reference/examples/index.js:20-27)."""
    return (
        state_with_metrics.select("id", "title", "edits", "edits_per_minute")
        .orderBy(F.desc("edits_per_minute"), F.asc("id"))
        .limit(k)
    )


def biggest_movers(state_with_metrics: DataFrame, k: int = 5) -> DataFrame:
    """Q2 (/root/reference/examples/index.js:28-34)."""
    return (
        state_with_metrics.select("id", "title", "bytesChanged")
        .orderBy(F.desc("bytesChanged"), F.asc("id"))
        .limit(k)
    )


def most_vibrant(state_with_metrics: DataFrame, k: int = 5) -> DataFrame:
    """Q3 (/root/reference/examples/index.js:36-42)."""
    return (
        state_with_metrics.select("id", "title", "bias")
        .orderBy(F.desc("bias"), F.asc("id"))
        .limit(k)
    )


def purge_survivors(
    state_with_metrics: DataFrame,
    max_lifespan: float = MAX_LIFESPAN_MIN,
    max_inactivity: float = MAX_INACTIVITY_MIN,
    min_speed: float = MIN_SPEED_EPM,
    min_purge_time: float = MIN_PURGE_TIME_MIN,
    safe_col: str | None = None,
) -> DataFrame:
    """P2 eviction predicate (/root/reference/index.js:362-398), applied as
    a filter over a state snapshot: a page SURVIVES unless
      age > min_purge_time AND (
        (not safe AND (epm < min_speed OR inactive > max_inactivity))
        OR age > max_lifespan )
    Note editsPerMinute() is the no-arg call — reverts/anons excluded
    (/root/reference/index.js:374,80-88).
    """
    age = F.col("age_min")
    epm = F.col("edits_per_minute")
    inactive = F.col("last_updated_min")
    safe = F.col(safe_col) if safe_col else F.lit(False)
    purged = (age > min_purge_time) & (
        (~F.coalesce(safe, F.lit(False)) & ((epm < min_speed) | (inactive > max_inactivity)))
        | (age > max_lifespan)
    )
    return state_with_metrics.filter(~purged)
