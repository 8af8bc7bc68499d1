"""Canonical fixture events from the reference's test suite
(/root/reference/test/tests.js:4-26,68-75; FIXTURES.md A1), in the flat
rc_event shape, plus a builder for ad-hoc event streams."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from wikitrender_spark.schemas import RC_EVENT_FLAT_SCHEMA

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)

_DEFAULTS = dict(
    title="Foo",
    comment="yo",
    namespace=0,
    user="Jon",
    bot=False,
    type="edit",
    length_new=2,
    length_old=1,
    wiki="enwiki",
    server_name="en.wikipedia.org",
    log_type=None,
    log_action=None,
    log_target=None,
    log_action_comment=None,
)


def make_events(spark: SparkSession, rows: list[dict]) -> DataFrame:
    """Build an rc_event DataFrame; fills defaults, auto-assigns ts/seq in
    list order (1 second apart) when absent."""
    full = []
    for i, row in enumerate(rows):
        r = dict(_DEFAULTS)
        r.update(row)
        r.setdefault("seq", i)
        r.setdefault("ts", T0 + dt.timedelta(seconds=i))
        full.append(tuple(r[f.name] for f in RC_EVENT_FLAT_SCHEMA.fields))
    return spark.createDataFrame(full, RC_EVENT_FLAT_SCHEMA)


# the reference's named fixtures
RAW_EDIT = dict(_DEFAULTS)
AFD = {**_DEFAULTS, "user": "Vandal", "comment": "Nominated page for deletion"}
RAW_REVERT = {**_DEFAULTS, "user": "Reverter", "comment": "reverted"}
BOT_EDIT = {**_DEFAULTS, "bot": True}
BOT_REVERT = {**RAW_REVERT, "bot": True}
MOVE_LOG = {
    **_DEFAULTS,
    "comment": "Because",
    "log_type": "log",
    "log_action": "move",
    "log_target": "FoO",
    "length_new": None,
    "length_old": None,
}
