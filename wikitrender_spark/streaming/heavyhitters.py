"""Streaming heavy hitters: a per-key SpaceSaving summary (Metwally et
al. 2005, "Efficient Computation of Frequent and Top-k Elements in Data
Streams") through ``applyInPandasWithState`` — the STREAMING member of
the frequency-sketch family (batch Count-Min lives in
operators/sketches.py).

Why SpaceSaving and not a streamed CMS: CMS answers point queries but
cannot enumerate the heavy hitters without a candidate set; SpaceSaving
maintains the candidates themselves in O(capacity) state with the
classic guarantees — for every tracked item, ``est`` is an UPPER bound
on its true count and ``est - err`` a LOWER bound; any item whose true
count exceeds N/capacity is guaranteed to be tracked. With capacity >=
distinct items per key the summary is EXACT (err = 0 everywhere),
which is what lets the streaming query share a DuckDB oracle with the
batch top-k (the wt_stream_replay four-way-agreement precedent).

Scale shape: state per key is O(capacity), independent of stream
length; the shuffle is one exchange on the key. Each trigger emits the
key's current summary (update semantics) so the latest emission per
key IS the final answer — a production deployment with huge capacities
would emit only the top-(k + slack) per trigger and keep the full
summary in state; the full-summary emission here is what makes the
final collapse exact and oracle-checkable.

Determinism pin: eviction picks the minimum (count, item) entry — the
item tie-break makes replayed streams byte-identical.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "key string, item string, est long, err long, n_updates long"
)
_STATE_SCHEMA = (
    "items array<string>, counts array<long>, errs array<long>, "
    "n_updates long"
)


def spacesaving_update(
    summary: dict[str, list[int]], items, capacity: int
) -> None:
    """Fold ``items`` into a SpaceSaving ``summary`` {item: [est, err]}
    in place — the pure algorithm, extracted so its invariants are
    hypothesis-testable without a Spark session
    (tests/test_heavyhitters.py)."""
    for it in items:
        it = str(it)
        if it in summary:
            summary[it][0] += 1
        elif len(summary) < capacity:
            summary[it] = [1, 0]
        else:
            evict = min(summary, key=lambda x: (summary[x][0], x))
            m = summary.pop(evict)[0]
            # the newcomer inherits the evicted count as its error
            # bound: est is an upper bound, est - err a lower bound on
            # the true count
            summary[it] = [m + 1, m]


def _mk_process(capacity: int):
    def _process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.exists:
            items, counts, errs, n_up = state.get
            summary = {i: [c, e] for i, c, e in zip(items, counts, errs)}
        else:
            summary, n_up = {}, 0
        for pdf in pdfs:
            spacesaving_update(summary, pdf["item"], capacity)
        n_up += 1
        ordered = sorted(summary)
        state.update(
            (
                ordered,
                [summary[i][0] for i in ordered],
                [summary[i][1] for i in ordered],
                n_up,
            )
        )
        yield pd.DataFrame(
            [(k, i, summary[i][0], summary[i][1], n_up) for i in ordered],
            columns=["key", "item", "est", "err", "n_updates"],
        )

    return _process


def heavy_hitter_stream(
    items: DataFrame, capacity: int
) -> DataFrame:
    """``items`` (streaming, columns ``key``/``item``) -> update stream
    of per-key SpaceSaving summaries."""
    return items.groupBy("key").applyInPandasWithState(
        _mk_process(capacity),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def final_topk(emissions: DataFrame, k: int) -> DataFrame:
    """Collapse an emissions table to each key's LATEST summary (max
    n_updates) and rank its top-k by (est desc, item asc)."""
    latest = emissions.withColumn(
        "_mx", F.max("n_updates").over(Window.partitionBy("key"))
    ).filter(F.col("n_updates") == F.col("_mx"))
    w = Window.partitionBy("key").orderBy(F.desc("est"), F.asc("item"))
    return (
        latest.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("key", "item", "est", "err", F.col("rnk").cast("int"))
    )


def run_to_memory(summaries: DataFrame, name: str, ckpt: str) -> DataFrame:
    """Drive the summary stream to a memory sink (availableNow) and
    return the emissions table — the shared update-mode driver in
    streaming/processor.py (one implementation to maintain)."""
    from .processor import run_changelog_to_memory

    return run_changelog_to_memory(summaries, name, ckpt)
