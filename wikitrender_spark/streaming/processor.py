"""Streaming stateful page-state processor (SURVEY.md §7 step 5).

The Spark-native form of the reference's whole engine loop: keyed state
updated per event (updateFromRCStream, /root/reference/index.js:174-273),
log routing (move/delete/protect, index.js:320-342), control-stream
markSafe (A7), and the periodic cleaner P2 (index.js:362-398) — expressed
as ``groupBy(group).applyInPandasWithState`` over micro-batches, with the
titles map carried in the state store between batches.

Semantics are shared with the batch replay through streaming/fold.py, so
batch–stream equivalence (SURVEY.md §5.2-5) holds by construction and is
asserted in tests/test_streaming.py — the prefix-consistency argument of
the Structured Streaming paper (SIGMOD'18, PAPERS.md): every micro-batch
run folds a prefix of the same event order the batch run folds.

Design notes (100 TB shape):
- State is partitioned by a *group key* that closes over move events (the
  same contract as operators/lifecycle.replay_lifecycle): rename motion
  A4 then never crosses state partitions, avoiding the tombstone/adopt
  two-phase protocol entirely. Groups are small (one page plus its move
  targets), so state rows stay bounded and skew is limited to genuinely
  hot pages (AQE/state-store rebalancing territory).
- Output is a CHANGELOG in update mode: one row per page touched in the
  batch (_deleted=false) and one tombstone per page evicted/re-keyed away
  (_deleted=true), versioned by a per-group monotonic _ver. This is the
  S7 'edit' event surface (emitter.emit('edit', ...),
  /root/reference/index.js:341) — consumers see exactly the changed rows.
- The purge clock is the group's max event time in the batch — one logical
  ``now`` per micro-batch (pin, SURVEY.md §2.9-1), so replays are
  deterministic and oracle-checkable; a wall-clock variant would only
  change the ``now`` source.
- The state blob is JSON per group (streaming/fold.serialize_titles) —
  incremental and fault-tolerant via the checkpoint, replacing the
  reference's whole-map LevelDB blob (S4-S6, index.js:118-141,395-397).
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from . import fold

#: changelog row = page-state row + safe flag + version + tombstone marker.
CHANGELOG_SCHEMA = fold.STATE_SCHEMA + ", safe boolean, _ver long, _deleted boolean"
_CHANGELOG_COLUMNS = fold.STATE_COLUMNS + ["safe", "_ver", "_deleted"]

#: per-group state: serialized titles map + emission version counter.
_STATE_SCHEMA = "blob string, ver long"


def _changelog_rows(titles: dict, changed: set, removed: set, ver: int
                    ) -> pd.DataFrame:
    rows: list[dict[str, Any]] = []
    for pid in sorted(changed & titles.keys()):
        r = fold.page_record(titles[pid])
        r.update(safe=titles[pid]["safe"], _ver=ver, _deleted=False)
        rows.append(r)
    for pid in sorted(removed - titles.keys()):
        rows.append({c: None for c in fold.STATE_COLUMNS}
                    | dict(id=pid, safe=None, _ver=ver, _deleted=True))
    return pd.DataFrame(rows, columns=_CHANGELOG_COLUMNS)


def _make_processor(purge: fold.PurgeParams | None):
    def process(key, pdfs: Iterable[pd.DataFrame], state: GroupState
                ) -> Iterator[pd.DataFrame]:
        if state.exists:
            blob, ver = state.get
            titles = fold.deserialize_titles(blob)
        else:
            titles, ver = {}, 0
        ver += 1

        changed: set = set()
        removed: set = set()
        batch_max_ts = None
        # a group larger than one Arrow batch arrives as MULTIPLE chunks in
        # arbitrary fetch order; fold_pdf sorts only within its input, so
        # the whole micro-batch must be concatenated before the single
        # (ts, seq)-ordered fold — chunk-at-a-time folding would apply
        # later events first and break batch-stream equivalence
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = chunks[0] if len(chunks) == 1 else pd.concat(
                chunks, ignore_index=True
            )
            fold.fold_pdf(titles, whole, changed, removed)
            # the purge clock advances on EVENT time only: control commands
            # are stamped with the submitter's wall clock (engine inbox),
            # and letting that drive batch_max_ts would age the whole group
            # against real time and mass-purge it on replayed history
            ev = whole[whole["log_type"] != "control"]
            if len(ev):
                batch_max_ts = ev["ts"].max()

        if purge is not None and batch_max_ts is not None:
            removed |= fold.purge_titles(titles, batch_max_ts, purge)

        # keep the state row even when all pages are gone: ver must stay
        # monotone across the group's whole lifetime, or a page recreated
        # after a delete would version below its own tombstone and lose in
        # final_state. The empty-map row is ~2 bytes of blob; a live
        # deployment would reclaim long-dead groups with a state TTL.
        state.update((fold.serialize_titles(titles), ver))

        out = _changelog_rows(titles, changed, removed, ver)
        if len(out):
            yield out

    return process


def page_state_changelog(rc: DataFrame, group_col: Column,
                         purge: fold.PurgeParams | None = None) -> DataFrame:
    """The streaming engine: rc event stream -> keyed stateful fold ->
    changelog stream (update output mode).

    ``group_col`` must assign every event of a move-connected component to
    one group (see module docstring). ``purge`` enables the P2 cleaner at
    each micro-batch boundary.
    """
    return (
        rc.withColumn("_grp", group_col)
        .groupBy("_grp")
        .applyInPandasWithState(
            _make_processor(purge),
            outputStructType=CHANGELOG_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def final_state(changelog: DataFrame) -> DataFrame:
    """Collapse a changelog (all emitted rows) to the final live state:
    latest version per id, tombstones filtered out. Static helper for
    memory-sink results in tests and the driver query surface."""
    latest = changelog.groupBy("id").agg(
        F.max_by(F.struct(*[c for c in changelog.columns if c != "id"]),
                 F.col("_ver")).alias("s")
    )
    return (
        latest.select("id", "s.*")
        .filter(~F.col("_deleted"))
        .drop("_ver", "_deleted", "safe")
    )


def run_changelog_to_memory(changelog: DataFrame, name: str,
                            checkpoint_dir: str) -> DataFrame:
    """Execute a changelog stream to completion over all available input
    (Trigger.AvailableNow — multiple micro-batches when the source is
    chunked) into an in-memory table; returns the accumulated changelog."""
    q = (
        changelog.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return changelog.sparkSession.table(name)
