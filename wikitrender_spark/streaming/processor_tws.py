"""transformWithStateInPandas variant of the keyed stateful processor
(the Spark-4 arbitrary-state API, SURVEY.md §1.1/§2.3 'preferred' form).

Same event fold, same changelog contract, same state blob as
processor.py (applyInPandasWithState) — the two implementations are
equivalence-tested in tests/test_streaming.py, so the engine can run on
either API. This is the migration target because transformWithState
adds, beyond what the fold uses today: multiple named state variables,
state TTL, and processing-time/event-time timers — the natural home for
a wall-clock P2 cleaner (reference's 20 s setInterval,
/root/reference/index.js:399-400) in a live deployment, where today's
deterministic variant purges at micro-batch boundaries.

Requires the RocksDB state-store provider (set by run helpers/tests via
spark.sql.streaming.stateStore.providerClass) and the google.protobuf
package (the TWS Python worker speaks a protobuf state protocol; absent
in this container, so the equivalence test import-skips and the default
engine path stays on applyInPandasWithState, which has no such
dependency).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from . import fold
from .processor import _STATE_SCHEMA, CHANGELOG_SCHEMA, _changelog_rows

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


class PageStateProcessor(StatefulProcessor):
    def __init__(self, purge: fold.PurgeParams | None = None):
        self._purge = purge

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("fold", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timer_values
    ) -> Iterator[pd.DataFrame]:
        existing = self._state.get() if self._state.exists() else None
        titles = fold.deserialize_titles(existing[0]) if existing else {}
        clock = existing[1] if existing else 0
        ver = (existing[2] if existing else 0) + 1

        changed: set = set()
        removed: set = set()
        batch_max_ts = None
        # concatenate ALL Arrow chunks before the single ordered fold —
        # see processor.py for why chunk-at-a-time folding is wrong
        chunks = [pdf.drop(columns=["_grp"]) for pdf in rows if len(pdf)]
        if chunks:
            whole = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            fold.fold_pdf(titles, whole, changed, removed)
            # event-time purge clock only (see processor.py)
            ev = whole[whole["log_type"] != "control"]
            if len(ev):
                batch_max_ts = ev["ts"].max()
                clock = max(clock, fold._ts_us(batch_max_ts))

        if self._purge is not None and batch_max_ts is not None:
            removed |= fold.purge_titles(titles, batch_max_ts, self._purge)

        # ver stays monotone for the group's lifetime (see processor.py)
        self._state.update((fold.serialize_titles(titles), clock, ver))

        out = _changelog_rows(titles, changed, removed, clock, ver)
        if len(out):
            yield out

    def close(self) -> None:
        pass


def page_state_changelog_tws(
    rc: DataFrame, group_col: Column, purge: fold.PurgeParams | None = None
) -> DataFrame:
    """Changelog stream via transformWithStateInPandas (update mode, no
    timers — the deterministic batch-boundary purge variant)."""
    return (
        rc.withColumn("_grp", group_col)
        .groupBy("_grp")
        .transformWithStateInPandas(
            statefulProcessor=PageStateProcessor(purge),
            outputStructType=CHANGELOG_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
