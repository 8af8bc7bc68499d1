"""Derived analytics D1-D4 (SURVEY.md §2.4) as pure Column expressions.

Clock pin (SURVEY.md §2.9-1): the reference calls `new Date()` per row
(/root/reference/index.js:64-88); we take one logical `now` per snapshot
(batch/trigger time or an injected literal) so results are deterministic
and oracle-comparable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_MICROS_PER_MINUTE = 60_000_000.0


def minutes_between(now: Column, then: Column) -> Column:
    """Float minutes, microsecond precision (reference millisecond
    arithmetic, /root/reference/index.js:66)."""
    return (F.unix_micros(now) - F.unix_micros(then)) / F.lit(_MICROS_PER_MINUTE)


def age_minutes(now: Column, start: Column) -> Column:
    """D1 (/root/reference/index.js:64-67)."""
    return minutes_between(now, start)


def last_updated_minutes(now: Column, updated: Column) -> Column:
    """D2 (/root/reference/index.js:72-75)."""
    return minutes_between(now, updated)


def edits_per_minute(
    edits: Column,
    reverts: Column,
    anon_edits: Column,
    age_min: Column,
    include_reverts: bool = False,
    include_anons: bool = False,
) -> Column:
    """D3 (/root/reference/index.js:80-88). Returns the raw count when
    age < 1 minute (anti-div-by-small guard) or the count is 0."""
    count = edits
    if include_reverts:
        count = count + reverts
    if include_anons:
        count = count + anon_edits
    count_d = count.cast("double")
    return F.when((age_min < 1.0) | (count_d == 0.0), count_d).otherwise(
        count_d / age_min
    )


def bias_from_distribution(distribution: Column) -> Column:
    """D4 (/root/reference/index.js:57-59; contract SURVEY.md §1.4).

    Pinned concentration metric: max single-author share
    `max(values) / sum(values)`; 0.0 for an empty map. Higher-order map
    functions only — no UDF."""
    values = F.map_values(distribution)
    total = F.aggregate(values, F.lit(0).cast("long"), lambda a, x: a + x)
    return F.when(F.size(values) == 0, F.lit(0.0)).otherwise(
        F.array_max(values).cast("double") / total.cast("double")
    )


def bias_from_counts(max_user_edits: Column, total_user_edits: Column) -> Column:
    """D4 on pre-aggregated per-user counts (the two-level-aggregation
    formulation used by the batch page_state operator — cheaper at scale
    than materializing the map first)."""
    return F.when(
        F.coalesce(total_user_edits, F.lit(0)) == 0, F.lit(0.0)
    ).otherwise(max_user_edits.cast("double") / total_user_edits.cast("double"))
