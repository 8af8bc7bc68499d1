"""Lifecycle operators A4-A7 + batch replay (SURVEY.md §2.3, §7 step 4).

The reference mutates keyed state in arrival order:
- delete (A5): drop the page's state row (/root/reference/index.js:328-337,
  427-430) — later edits recreate the page from scratch;
- move (A4): re-key the accumulated state to the target id, overwriting
  whatever was there; fresh pages are created for never-seen titles
  (renamePage, /root/reference/index.js:154-167);
- protect (A6): set isProtected if the page currently exists
  (/root/reference/index.js:417-422; normalized-id pin, SURVEY.md §2.9);
- markSafe (A7): external control input — modeled as a broadcast-joined
  safe-list (control_command stream, FIXTURES.md A3).

Two implementations:

1. ``page_state_lifecycle`` — declarative DataFrame formulation.
   Replay order is (ts, seq). "Cuts" (deletes + move-outs) partition each
   page's event sequence into lifetimes; only the final lifetime
   contributes to final state. Log events are a tiny fraction of the
   stream, so every join against cut/move/protect sets is a broadcast —
   the only wide operations are the same two hash aggregations as
   page_state. Restriction (documented, holds for the derived oracle
   workload and is the overwhelmingly common real-world shape): move
   targets are not themselves re-moved/deleted and receive no direct
   edits (no rename chains). The general case is handled by (2).

2. ``replay_lifecycle`` — exact ordered fold via applyInPandas over
   *closed page groups* (each group contains every id reachable through
   its move events), reproducing updateFromRCStream + log routing
   event-for-event. Arrow-batched, one group per pandas frame, fully
   parallel across groups — this is the batch twin of the streaming
   stateful processor and the semantics oracle for (1).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..barrier import corpus_barrier
from ..functions import classify
from ..streaming import fold
from .page_state import aggregate_classified, classified_edit_events

_NEG_INF = -1  # sentinel: "no cut" (seq are non-negative)


def log_events_columns(rc: DataFrame) -> DataFrame:
    """REFERENCE Column form of the log-branch router — the pinned twin
    of log_events' SQL-text rendering (round 17; optimized-plan
    sameResult asserted in tests/test_plans.py). Not on any query
    path."""
    return rc.filter(F.col("log_type").isNotNull()).select(
        classify.page_id(F.col("wiki"), F.col("title")).alias("id"),
        F.when(
            F.col("log_action") == "move",
            classify.page_id(F.col("wiki"), F.col("log_target")),
        ).alias("move_dst"),
        F.when(
            F.col("log_action") == "delete",
            classify.page_id(
                F.col("wiki"), classify.delete_target(F.col("log_action_comment"))
            ),
        ).alias("delete_id"),
        F.col("log_action"),
        F.col("log_target"),
        F.col("wiki"),
        F.col("ts"),
        F.col("seq"),
    )


#: log-branch router rendered once as SQL strings (round 17 — the
#: classified_edit_events precedent; generated from the same classify
#: constants, optimized-plan sameResult pinned in tests/test_plans.py).
_LOG_SELECT_SQL: tuple[str, ...] = (
    f"{classify.page_id_sql('wiki', 'title')} AS id",
    "CASE WHEN log_action = 'move' THEN "
    f"{classify.page_id_sql('wiki', 'log_target')} END AS move_dst",
    "CASE WHEN log_action = 'delete' THEN "
    + classify.page_id_sql('wiki', f"({classify.delete_target_sql('log_action_comment')})")
    + " END AS delete_id",
    "log_action",
    "log_target",
    "wiki",
    "ts",
    "seq",
)


def log_events(rc: DataFrame) -> DataFrame:
    """The routed log branch (F4) with normalized ids (SQL-text
    rendering; log_events_columns is the pinned Column reference)."""
    return rc.filter(F.col("log_type").isNotNull()).selectExpr(
        *_LOG_SELECT_SQL
    )


def _cuts(logs: DataFrame) -> DataFrame:
    """(id, seq) pairs at which a page's state row is removed: deletes of
    the page + moves out of the page."""
    deletes = logs.filter(F.col("log_action") == "delete").select(
        F.col("delete_id").alias("id"), "seq"
    )
    moves = logs.filter(F.col("log_action") == "move").select("id", "seq")
    return deletes.unionByName(moves)


def page_state_lifecycle(rc: DataFrame, with_collections: bool = False) -> DataFrame:
    """Final page_state after applying deletes, moves and protects in
    replay order (declarative formulation; see module docstring).

    Scan economics: log events are a sliver of the stream (~0.1% here; the
    same on the real firehose) but feed ~10 subtrees (cuts, last-cut,
    moves, protect windows). They are materialized once per plan (lazy
    localCheckpoint — not .cache(), whose CacheManager entry would
    outlive the query) — every later use is a broadcast off the
    materialized sliver instead of a fresh scan of the full event set. Edit events are scanned exactly ONCE (round 16; guide
    §2.4): each event is tagged with its lifetime branch (direct —
    after the page's last cut — or adopted — inside the last move's
    window; the branches are provably disjoint because the move IS a
    cut, so mv_seq <= cut_seq) against one broadcast bounds relation,
    and ONE branch-keyed two-level aggregation covers both lifetimes.
    The two tiny fan-out relations (window_bounds: one row per moved-out
    page; the branch aggregate: one row per (branch, page)) are
    localCheckpoint'd — before round 16 the physical plan recomputed
    last_move's max_by aggregation five times and scanned/aggregated the
    edit set once per branch. `first_edit_seq` rides along inside the
    main aggregation (with_first_seq) rather than a third scan +
    groupBy + join."""
    e = classified_edit_events(rc)
    # a BARRIER, not .cache() (round 17, VERDICT r16 #3): the cache
    # entry lived in the session CacheManager forever (never
    # unpersisted — at 100 TB that pins ~0.1% of the stream for the
    # session lifetime, and cross-pass cache hits flatter any bench row
    # sharing the subtree). corpus_barrier gives the same compute-once
    # fan-out guarantee per plan, its blocks are released with the
    # DataFrame, and the sliver is stream-proportional so it rides the
    # reliable-checkpoint scale switch.
    logs = corpus_barrier(log_events(rc), eager=False)
    cuts = _cuts(logs)

    last_cut = cuts.groupBy("id").agg(F.max("seq").alias("cut_seq"))

    protects = logs.filter(F.col("log_action") == "protect").select(
        "id", F.col("seq").alias("pr_seq")
    )

    # --- adopted-lifetime bounds: last move per source ---------------------
    moves = logs.filter(F.col("log_action") == "move")
    last_move = moves.groupBy("id").agg(
        F.max_by(F.struct("seq", "ts", "move_dst", "log_target", "wiki"), "seq").alias(
            "mv"
        )
    ).select(
        F.col("id"),
        F.col("mv.seq").alias("mv_seq"),
        F.col("mv.ts").alias("mv_ts"),
        F.col("mv.move_dst").alias("dst_id"),
        F.col("mv.log_target").alias("dst_title"),
        F.col("mv.wiki").alias("mv_wiki"),
    )
    # previous cut strictly before the last move
    prev_cut = (
        cuts.join(F.broadcast(last_move.select("id", "mv_seq")), "id")
        .filter(F.col("seq") < F.col("mv_seq"))
        .groupBy("id")
        .agg(F.max("seq").alias("prev_cut_seq"))
    )
    # one row per moved-out page; feeds three subtrees (branch bounds,
    # protect window, final remap) — localCheckpoint so the max_by
    # aggregation runs once, not once per consumer
    window_bounds = corpus_barrier(  # one row per moved-out page
        last_move.join(F.broadcast(prev_cut), "id", "left").withColumn(
            "prev_cut_seq", F.coalesce(F.col("prev_cut_seq"), F.lit(_NEG_INF))
        ),
        eager=False,
    )

    # --- ONE pass over the edit set: tag each event's lifetime branch ------
    # left join suffices: a move IS a cut for its source id (_cuts unions
    # the move rows), so window_bounds ids are always present in last_cut
    bounds = last_cut.join(
        F.broadcast(window_bounds.select("id", "prev_cut_seq", "mv_seq")),
        "id", "left",
    )
    direct_cond = F.col("cut_seq").isNull() | (F.col("seq") > F.col("cut_seq"))
    adopted_cond = (
        F.col("mv_seq").isNotNull()
        & (F.col("seq") > F.col("prev_cut_seq"))
        & (F.col("seq") <= F.col("mv_seq"))
    )
    tagged = (
        e.join(F.broadcast(bounds), "id", "left")
        .withColumn(
            "_branch",
            F.when(direct_cond, F.lit(0)).when(adopted_cond, F.lit(1)),
        )
        .filter(F.col("_branch").isNotNull())
        .select("_branch", *e.columns)
    )
    # one row per (branch, page); read by both union branches below
    states = corpus_barrier(  # one row per (branch, live page)
        aggregate_classified(
            tagged, with_collections, with_first_seq=True,
            extra_keys=("_branch",),
        ),
        eager=False,
    )
    base = states.filter(F.col("_branch") == 0).drop("_branch")
    adopted_state = states.filter(F.col("_branch") == 1).drop("_branch")

    # protect applies only if the page exists when the log event arrives:
    # some edit of the current lifetime precedes it.
    pr = (
        protects.join(F.broadcast(last_cut), "id", "left")
        .filter((F.col("cut_seq").isNull()) | (F.col("pr_seq") > F.col("cut_seq")))
        .groupBy("id")
        .agg(F.max("pr_seq").alias("max_pr_seq"))
    )
    direct = (
        base.join(F.broadcast(pr), "id", "left")
        .withColumn(
            "isProtected",
            F.coalesce(
                F.col("max_pr_seq") > F.col("first_edit_seq"), F.lit(False)
            ),
        )
        .drop("first_edit_seq", "max_pr_seq")
    )

    adopted_pr = (
        protects.join(F.broadcast(window_bounds), "id")
        .filter((F.col("pr_seq") > F.col("prev_cut_seq")) & (F.col("pr_seq") <= F.col("mv_seq")))
        .groupBy("id")
        .agg(F.max("pr_seq").alias("max_pr_seq"))
    )

    zero = F.lit(0).cast("long")
    adopted = (
        # both sides are tiny checkpointed relations (one row per moved
        # page); without the hint the planner sees no stats on the
        # ExistingRDD scans and falls back to a sort-merge join
        window_bounds.join(F.broadcast(adopted_state), "id", "left")
        .join(F.broadcast(adopted_pr), "id", "left")
        .select(
            F.col("dst_id").alias("id"),
            F.when(F.col("mv_wiki") == "enwiki", F.lit(""))
            .otherwise(F.col("mv_wiki"))
            .alias("wiki"),
            F.col("dst_title").alias("title"),
            *[
                F.coalesce(F.col(c), zero).alias(c)
                for c in (
                    "edits",
                    "anonEdits",
                    "notabilityFlags",
                    "volatileFlags",
                    "reverts",
                    "bytesChanged",
                )
            ],
            F.coalesce(F.col("isNew"), F.lit(False)).alias("isNew"),
            # fresh page created by the move itself when the source had no
            # live edits (renamePage -> getPage, index.js:155-156,443)
            F.coalesce(F.col("start"), F.col("mv_ts")).alias("start"),
            # renamePage stamps updated = now (index.js:164)
            F.col("mv_ts").alias("updated"),
            *(
                [
                    F.coalesce(F.col("contributors"), F.array().cast("array<string>")).alias("contributors"),
                    F.coalesce(F.col("anons"), F.array().cast("array<string>")).alias("anons"),
                    F.coalesce(
                        F.col("distribution"),
                        F.map_from_arrays(
                            F.array().cast("array<string>"),
                            F.array().cast("array<long>"),
                        ),
                    ).alias("distribution"),
                ]
                if with_collections
                else [
                    F.coalesce(F.col("n_contributors"), zero).alias("n_contributors"),
                    F.coalesce(F.col("n_anons"), zero).alias("n_anons"),
                    F.col("max_user_edits"),
                    F.col("total_user_edits"),
                ]
            ),
            F.coalesce(
                F.col("max_pr_seq") > F.col("first_edit_seq"), F.lit(False)
            ).alias("isProtected"),
        )
    )
    return direct.unionByName(adopted, allowMissingColumns=False)


# ---------------------------------------------------------------------------
# exact ordered replay (authoritative semantics; general move graphs)
# ---------------------------------------------------------------------------

_REPLAY_SCHEMA = fold.STATE_SCHEMA


def _replay_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Fold one closed page group in (ts, seq) order — the pandas twin of
    the reference's event loop (updateFromRCStream + log routing). The
    fold itself lives in streaming/fold.py, shared verbatim with the
    streaming stateful processor (batch-stream equivalence by
    construction, SURVEY.md §5.2-5)."""
    titles: dict[str, dict] = {}
    fold.fold_pdf(titles, pdf)
    return fold.titles_to_pdf(titles)


def replay_lifecycle(rc: DataFrame, group_col) -> DataFrame:
    """Exact ordered replay, parallel across closed page groups.

    ``group_col`` must assign every event of a move-connected component to
    the same group (for workloads without rename chains, wiki + base title
    modulo the rename mapping). Shuffles once on the group key, then folds
    each group in one Arrow batch — no driver collect, scales with the
    number of groups.
    """
    return rc.withColumn("_grp", group_col).groupBy("_grp").applyInPandas(
        lambda pdf: _replay_group(pdf.drop(columns=["_grp"])), _REPLAY_SCHEMA
    )


def apply_safe_list(state: DataFrame, control: DataFrame) -> DataFrame:
    """A7 markSafe, batch formulation: latest command per id wins
    (broadcast join — the control stream is human-issued and tiny). The
    streaming engine routes commands through the keyed fold instead
    (engine.py control inbox); tie-break matches the fold's (ts, seq)
    replay order so the two formulations can never disagree."""
    latest = control.groupBy("id").agg(
        F.max_by(F.col("command"), F.struct("ts", "seq")).alias("_cmd")
    )
    return (
        state.join(F.broadcast(latest), "id", "left")
        .withColumn("safe", F.coalesce(F.col("_cmd") == "markSafe", F.lit(False)))
        .drop("_cmd")
    )
