"""Streaming EWMA over hourly event counts — the incremental form of
plans/relational_queries.hourly_ewma (same recurrence, same dyadic
alpha), keyed by event_type through ``applyInPandasWithState``.

Spark disallows an arbitrary-stateful stage AFTER a streaming window
aggregation, so the hour bucketing and the event-time finalization both
live inside the one keyed stateful stage: state carries the OPEN hour
buckets plus the last finalized EWMA; when the per-key event-time
high-water mark passes ``hour_end + DELAY`` the hour finalizes IN HOUR
ORDER, threading the recurrence across micro-batches, and its row is
emitted exactly once (append semantics). Rows older than an already
finalized hour are dropped.

The frontier is deliberately per KEY, which is stricter than a global
watermark in one way and weaker in another: a key never finalizes on
other keys' progress (no cross-key reordering risk), but a key that
goes QUIET keeps its open hours in state, unemitted, until it speaks
again — unlike a global watermark, which closes every key's windows as
any data advances it. Pass ``flush_quiet_keys=True`` (requires a
``withWatermark`` on ``ts``) to ALSO finalize on the global watermark:
each key arms an EventTimeTimeout at its earliest open hour's
finalization point, and the timed-out invocation closes every hour the
watermark has passed — quiet keys emit without further data of their
own, at the cost of other keys' progress driving their clock. The
default (False) keeps the pure per-key frontier the equivalence test
pins.

Scale shape: state per key is O(open hours) — bounded by the delay, not
by the stream length; finalized rows leave the store immediately. The
shuffle is one exchange on event_type (or any coarser key the caller
pre-aggregates to).

Batch-stream equivalence (tests/test_streaming_ewma.py): on an ordered
replay the emitted rows equal the batch hourly_ewma relation restricted
to finalizable hours — proving the state genuinely carries the EWMA
recurrence across micro-batches.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: must match relational_queries.EWMA_ALPHA (asserted in the test)
ALPHA = 0.25
#: event-time finalization delay (the watermark analogue)
DELAY_US = 3_600_000_000
HOUR_US = 3_600_000_000

OUT_SCHEMA = "event_type string, hour timestamp, n_events long, ewma double"
_STATE_SCHEMA = (
    "open_hours array<long>, open_counts array<long>, "
    "last_ewma double, has_ewma boolean, max_seen_us long, frontier_us long"
)


def _mk_process(flush: bool):
    def _process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        if state.exists:
            (open_hours, open_counts, last_ewma, has_ewma, max_seen,
             frontier) = state.get
            buckets = dict(zip(open_hours, open_counts))
        else:
            buckets, last_ewma, has_ewma, max_seen, frontier = (
                {}, 0.0, False, 0, 0
            )

        for pdf in pdfs:
            # hour_us / ts_us are computed JVM-side (unix_micros), so the
            # processor never guesses the Arrow timestamp unit
            if len(pdf):
                max_seen = max(max_seen, int(pdf["ts_us"].max()))
            for h, c in pdf["hour_us"].value_counts().items():
                h = int(h)
                if h < frontier:
                    continue  # late past the finalization frontier: dropped
                buckets[h] = buckets.get(h, 0) + int(c)

        out_rows = []
        horizon = max_seen - DELAY_US
        if flush:
            # quiet-key flush: the GLOBAL watermark also advances this
            # key's horizon (a timed-out invocation arrives with no data,
            # so max_seen alone would never move again). The watermark
            # ALREADY encodes the configured lateness allowance — no
            # event older than it will arrive — so hours ending at or
            # before it are safe to finalize as-is; subtracting DELAY_US
            # again would double-delay quiet keys by an extra hour.
            wm_us = state.getCurrentWatermarkMs() * 1000
            horizon = max(horizon, wm_us)
        for h in sorted(buckets):
            if h + HOUR_US > horizon:
                break  # hours finalize strictly in order
            c = buckets.pop(h)
            frontier = h + HOUR_US
            last_ewma = (
                ALPHA * c + (1 - ALPHA) * last_ewma if has_ewma else float(c)
            )
            has_ewma = True
            out_rows.append(
                (etype, pd.Timestamp(h, unit="us"), c, last_ewma)
            )

        hs = sorted(buckets)
        state.update(
            (hs, [buckets[h] for h in hs], last_ewma, has_ewma, max_seen,
             frontier)
        )
        if flush and hs:
            # arm the timeout at the earliest open hour's end: once the
            # watermark (which already carries the lateness allowance)
            # passes it, the hour is finalizable. EventTimeTimeout
            # requires a timestamp strictly beyond the current watermark
            due_ms = (hs[0] + HOUR_US) // 1000
            state.setTimeoutTimestamp(
                max(due_ms, state.getCurrentWatermarkMs() + 1)
            )
        if out_rows:
            yield pd.DataFrame(
                out_rows, columns=["event_type", "hour", "n_events", "ewma"]
            )

    return _process


def streaming_hourly_ewma(
    events: DataFrame,
    flush_quiet_keys: bool = False,
    watermark_delay: str | None = "1 hour",
) -> DataFrame:
    """events (with `event_type`, `ts`) -> append stream of finalized
    (event_type, hour, n_events, ewma) rows.

    ``flush_quiet_keys=True`` additionally finalizes open hours when the
    GLOBAL watermark passes them (EventTimeTimeout). The watermark is
    applied HERE with ``watermark_delay`` (default "1 hour"); a caller
    that already put ``withWatermark("ts", ...)`` on the input must pass
    ``watermark_delay=None`` so its own (possibly longer) lateness
    allowance is not overridden by a nearer watermark node."""
    src = events
    if flush_quiet_keys and watermark_delay is not None:
        src = src.withWatermark("ts", watermark_delay)
    cols = src.select(
        "event_type",
        F.unix_micros(F.date_trunc("hour", F.col("ts"))).alias("hour_us"),
        F.unix_micros(F.col("ts")).alias("ts_us"),
        # the watermark rides on ts; keep it in the projection so the
        # stateful operator sees an event-time column
        *(["ts"] if flush_quiet_keys else []),
    )
    return cols.groupBy("event_type").applyInPandasWithState(
        _mk_process(flush_quiet_keys),
        outputStructType=OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.EventTimeTimeout
            if flush_quiet_keys
            else GroupStateTimeout.NoTimeout
        ),
    )
