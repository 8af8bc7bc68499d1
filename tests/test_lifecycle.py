"""Reference tests 3 (drop) and 4 (rename) (/root/reference/test/tests.js:
53-78) plus lifecycle edge cases, through BOTH the declarative formulation
and the exact replay — the two must agree with each other and with the
hand-computed expectations.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikitrender_spark.operators.lifecycle import (
    page_state_lifecycle,
    replay_lifecycle,
)

from .fixtures import MOVE_LOG, RAW_EDIT, make_events

DELETE_LOG = {
    **RAW_EDIT,
    "comment": "Because",
    "log_type": "log",
    "log_action": "delete",
    "log_action_comment": 'deleted &quot;[[Foo]]&quot; per afd',
    "length_new": None,
    "length_old": None,
}
PROTECT_LOG = {
    **RAW_EDIT,
    "comment": "Because",
    "log_type": "log",
    "log_action": "protect",
    "length_new": None,
    "length_old": None,
}

def both_states(spark, events):
    df = make_events(spark, events)
    decl = {r["id"]: r.asDict() for r in page_state_lifecycle(df).collect()}
    # single closed group for fixture-scale tests
    repl = {r["id"]: r.asDict() for r in replay_lifecycle(df, F.lit("g")).collect()}
    # replay is authoritative; declarative must match it exactly
    assert decl.keys() == repl.keys()
    for k in decl:
        assert decl[k] == repl[k], f"mismatch for {k}:\n{decl[k]}\n{repl[k]}"
    return repl


# test 3 — drop removes the page (/root/reference/test/tests.js:53-61)
def test_drop(spark):
    st = both_states(spark, [RAW_EDIT, DELETE_LOG])
    assert st == {}


def test_drop_then_recreate(spark):
    st = both_states(spark, [RAW_EDIT, RAW_EDIT, DELETE_LOG, RAW_EDIT])
    assert list(st) == ["Foo"]
    assert st["Foo"]["edits"] == 1  # counters reset by the delete


# test 4 — rename keeps exactly one page (/root/reference/test/tests.js:63-78)
def test_rename(spark):
    st = both_states(spark, [RAW_EDIT, MOVE_LOG])
    assert list(st) == ["FoO"]
    page = st["FoO"]
    assert page["title"] == "FoO"
    assert page["edits"] == 1  # accumulated state adopted
    assert page["bytesChanged"] == 1


def test_rename_unseen_page_creates_fresh(spark):
    st = both_states(spark, [MOVE_LOG])
    assert list(st) == ["FoO"]
    page = st["FoO"]
    assert page["edits"] == 0
    assert page["start"] == page["updated"]


def test_rename_overwrites_target_state(spark):
    # edits to FoO before the move are lost — the adopted object overwrites
    # titles[new id] (/root/reference/index.js:166)
    st = both_states(
        spark,
        [
            {**RAW_EDIT, "title": "FoO", "user": "Alice"},
            {**RAW_EDIT, "title": "FoO", "user": "Bob"},
            RAW_EDIT,
            MOVE_LOG,
        ],
    )
    assert list(st) == ["FoO"]
    assert st["FoO"]["edits"] == 1
    assert st["FoO"]["n_contributors"] == 1


def test_protect_sets_flag(spark):
    st = both_states(spark, [RAW_EDIT, PROTECT_LOG])
    assert st["Foo"]["isProtected"] is True


def test_protect_missing_page_noop(spark):
    st = both_states(spark, [PROTECT_LOG, RAW_EDIT])
    # protect arrived before the page existed -> flag not set
    assert st["Foo"]["isProtected"] is False


def test_protect_enwiki_normalization_pin(spark):
    # reference bug: protectPage uses un-normalized id and never matches
    # enwiki pages (/root/reference/index.js:418); we pin normalized-id
    # behavior (SURVEY.md §2.9-3) so the flag DOES stick on enwiki.
    st = both_states(spark, [RAW_EDIT, PROTECT_LOG])
    assert st["Foo"]["isProtected"] is True


def test_delete_after_protect_clears(spark):
    st = both_states(spark, [RAW_EDIT, PROTECT_LOG, DELETE_LOG, RAW_EDIT])
    assert st["Foo"]["isProtected"] is False


def test_move_then_recreate_both_branches(spark):
    # one source id with BOTH lifetime branches live at once: the move
    # adopts the pre-move edits into FoO, the post-move edits recreate
    # Foo from scratch. Pins the round-16 one-pass branch-tagged
    # aggregation (operators/page_state.aggregate_classified extra_keys):
    # a single id's events must split cleanly across the direct and
    # adopted branches within one grouped pass.
    st = both_states(
        spark,
        [RAW_EDIT, RAW_EDIT, MOVE_LOG, RAW_EDIT, RAW_EDIT, RAW_EDIT],
    )
    assert sorted(st) == ["FoO", "Foo"]
    assert st["FoO"]["edits"] == 2   # adopted lifetime
    assert st["Foo"]["edits"] == 3   # fresh direct lifetime


def test_move_after_delete_window(spark):
    # delete cuts, two fresh edits, then move adopts only the post-delete
    # state
    st = both_states(
        spark,
        [RAW_EDIT, RAW_EDIT, RAW_EDIT, DELETE_LOG, RAW_EDIT, RAW_EDIT, MOVE_LOG],
    )
    assert list(st) == ["FoO"]
    assert st["FoO"]["edits"] == 2


def test_apply_safe_list_latest_command_wins(spark):
    import datetime as dt

    from wikitrender_spark.operators.lifecycle import apply_safe_list

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    state = spark.createDataFrame(
        [("A", 3), ("B", 1), ("C", 2)], "id string, edits long"
    )
    control = spark.createDataFrame(
        [
            ("A", "markSafe", t0, 1),
            ("B", "markSafe", t0, 1),
            ("B", "markUnsafe", t0, 2),   # ts tie -> higher seq wins
        ],
        "id string, command string, ts timestamp, seq long",
    )
    got = {r["id"]: r["safe"] for r in apply_safe_list(state, control).collect()}
    assert got == {"A": True, "B": False, "C": False}


def test_purge_with_safe_list_clause_matrix(spark):
    # A7 through P2 (the wt_purge_safe_list query path): safe pages dodge
    # the speed/inactivity clause but NOT the max-lifespan override
    import datetime as dt

    from wikitrender_spark.operators.lifecycle import apply_safe_list
    from wikitrender_spark.operators.topk import purge_survivors

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    # (id, age_min, last_updated_min, edits_per_minute)
    state = spark.createDataFrame(
        [
            ("slow_unsafe", 100.0, 10.0, 0.1),   # epm < min_speed -> purged
            ("slow_safe", 100.0, 10.0, 0.1),     # same metrics, safe -> kept
            ("old_safe", 5000.0, 10.0, 9.0),     # age > max_lifespan -> purged even safe
            ("active", 100.0, 10.0, 9.0),        # healthy -> kept
            ("young", 2.0, 1.0, 0.0),            # age < min_purge_time -> kept
        ],
        "id string, age_min double, last_updated_min double, edits_per_minute double",
    )
    control = spark.createDataFrame(
        [("slow_safe", "markSafe", t0, 1), ("old_safe", "markSafe", t0, 1)],
        "id string, command string, ts timestamp, seq long",
    )
    surv = purge_survivors(
        apply_safe_list(state, control),
        max_lifespan=1440.0, max_inactivity=60.0, min_speed=3.0,
        min_purge_time=5.0, safe_col="safe",
    )
    assert sorted(r["id"] for r in surv.collect()) == [
        "active", "slow_safe", "young"
    ]
