"""End-to-end tests of the WikiTrenderCollection facade — the reference's
public API surface (/root/reference/index.js:103-460) driven the way a
reference consumer would: construct, process, subscribe, markSafe, drop,
read pages."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikitrender_spark import engine
from wikitrender_spark.operators import lifecycle
from wikitrender_spark.operators.derive import rc_events

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def collection(spark, tmp_path):
    return engine.WikiTrenderCollection(
        spark, str(tmp_path / "wt"), sf_dir=SF_DIR
    )


def test_pages_match_batch_replay(spark, collection):
    collection.process_available()
    got = {
        r["id"]: (r["edits"], r["reverts"], r["bytesChanged"])
        for r in collection.pages().collect()
    }
    group = F.concat(
        F.col("wiki"), F.lit("#"), F.regexp_extract(F.col("title"), r"_(\d+)$", 1)
    )
    want = {
        r["id"]: (r["edits"], r["reverts"], r["bytesChanged"])
        for r in lifecycle.replay_lifecycle(rc_events(spark, SF_DIR), group).collect()
    }
    assert got == want


def test_mark_safe_roundtrip(spark, collection):
    collection.process_available()
    some_id = collection.pages().orderBy("id").first()["id"]
    assert not collection.pages().filter(F.col("id") == some_id).first()["safe"]
    collection.mark_safe(some_id)
    collection.process_available()  # picks up only the control inbox
    assert collection.pages().filter(F.col("id") == some_id).first()["safe"]
    collection.mark_safe(some_id, unsafe=True)
    collection.process_available()
    assert not collection.pages().filter(F.col("id") == some_id).first()["safe"]


def test_drop_removes_page(spark, collection):
    collection.process_available()
    victim = (
        collection.pages().filter(F.col("wiki") == "").orderBy("id").first()
    )
    collection.drop(victim["title"])  # enwiki default
    collection.process_available()
    assert collection.pages().filter(F.col("id") == victim["id"]).count() == 0


def test_on_edit_callback_fires(spark, tmp_path):
    c = engine.WikiTrenderCollection(spark, str(tmp_path / "wt2"), sf_dir=SF_DIR)
    seen = []
    c.on_edit(lambda row: seen.append(row["id"]))
    c.process_available()
    assert len(seen) > 0
    assert set(seen) <= {r["id"] for r in c.pages().collect()}


def test_is_ip_export():
    assert engine.is_ip("10.0.0.1")
    assert engine.is_ip("2001:DB8:85A3:8D3:1319:8A2E:370:7348")
    assert not engine.is_ip("Jon")


def test_engine_purge_bounds_state(spark, tmp_path):
    from wikitrender_spark.streaming import fold

    full = engine.WikiTrenderCollection(spark, str(tmp_path / "full"), sf_dir=SF_DIR)
    full.process_available()
    n_full = full.pages().count()

    purged = engine.WikiTrenderCollection(
        spark, str(tmp_path / "purged"), sf_dir=SF_DIR,
        purge=fold.PurgeParams(
            max_lifespan=42000.0, max_inactivity=5000.0,
            min_speed=0.0002, min_purge_time=5.0,
        ),
    )
    purged.process_available()
    n_purged = purged.pages().count()
    assert 0 < n_purged < n_full


def test_mark_safe_with_purge_does_not_mass_purge(spark, tmp_path):
    """Control commands are stamped with wall-clock time; the purge clock
    must advance on EVENT time only, or a mark_safe over replayed history
    would age every page in the group to 'now' and purge it."""
    from wikitrender_spark.streaming import fold

    c = engine.WikiTrenderCollection(
        spark, str(tmp_path / "wtp"), sf_dir=SF_DIR,
        purge=fold.PurgeParams(
            max_lifespan=42000.0, max_inactivity=5000.0,
            min_speed=0.0002, min_purge_time=5.0,
        ),
    )
    c.process_available()
    before = {r["id"] for r in c.pages().collect()}
    target = sorted(before)[0]
    c.mark_safe(target)
    victim = sorted(before)[1]
    c.drop(victim.split("/", 1)[1] if "/" in victim else victim,
           wiki=victim.split("/", 1)[0] if "/" in victim else "enwiki")
    c.process_available()  # control-only batch: no event time -> no purge
    after = {r["id"] for r in c.pages().collect()}
    assert after == before - {victim}  # drop removed ONLY its target
    assert c.pages().filter(F.col("id") == target).first()["safe"]


def test_late_callback_sees_only_new_batches(spark, tmp_path):
    """on_edit after earlier passes must NOT replay history (the
    reference's subscribe-from-now semantics): the single snapshot query
    advances the checkpoint every pass."""
    c = engine.WikiTrenderCollection(spark, str(tmp_path / "wtl"), sf_dir=SF_DIR)
    c.process_available()          # full history, no callbacks
    n_pages = c.pages().count()
    seen = []
    c.on_edit(lambda row: seen.append(row["id"]))
    some_id = c.pages().orderBy("id").first()["id"]
    c.mark_safe(some_id)
    c.process_available()          # only the control batch is new
    assert len(seen) < n_pages     # no full-history replay
    assert some_id in seen         # but the touched page did fire


def test_bulk_mark_safe_and_drop(spark, collection):
    """mark_safe_many / drop_many: one snapshot join resolves every id,
    one control file carries every command — same semantics as the
    per-command path."""
    collection.process_available()
    pages = [r["id"] for r in collection.pages().orderBy("id").take(3)]
    collection.mark_safe_many(pages[:2])
    collection.process_available()
    safe = {
        r["id"]: r["safe"]
        for r in collection.pages().filter(F.col("id").isin(pages)).collect()
    }
    assert safe[pages[0]] and safe[pages[1]] and not safe[pages[2]]
    collection.drop_many(pages[:2])
    collection.process_available()
    left = {r["id"] for r in collection.pages()
            .filter(F.col("id").isin(pages)).collect()}
    assert left == {pages[2]}
