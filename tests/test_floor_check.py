"""The floor rule, mechanized (round 11): uniform host drift must not
fail the check; an idiosyncratic single-row blowup must. No Spark."""
from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "floor_check",
    os.path.join(os.path.dirname(__file__), "..", "tools", "floor_check.py"),
)
floor_check = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and floor_check)

FLOORS = {"a": 1.0, "b": 2.0, "c": 4.0, "d": 0.5}


def test_clean_run_passes():
    v, a, med = floor_check.check(FLOORS, {"a": 1.1, "b": 2.1, "c": 4.2}, {})
    assert not v and not a
    assert 1.0 < med < 1.1


def test_uniform_drift_is_advisory_not_violation():
    # every row 1.6x its floor: raw rule exceeded everywhere, but the
    # session median drift IS 1.6x, so nothing is idiosyncratic — the
    # round-11 slow-host scenario
    suite = {"a": 1.6, "b": 3.2, "c": 6.4, "d": 0.8}
    v, a, med = floor_check.check(FLOORS, suite, {})
    assert not v
    assert len(a) == 4 and all("host state" in x for x in a)
    assert abs(med - 1.6) < 1e-9


def test_single_row_regression_fails_even_with_mild_drift():
    # the r9 recursive-months scenario: one row blows up while the rest
    # of the suite sits near its floors
    suite = {"a": 1.1, "b": 2.2, "c": 4.3, "d": 5.0}  # d = 10x floor
    v, a, med = floor_check.check(FLOORS, suite, {})
    assert len(v) == 1 and "d" in v[0] and "REGRESSION" in v[0]


def test_new_row_and_sweep_are_advisory():
    v, a, _ = floor_check.check(FLOORS, {"zz": 3.0}, {"c": 11.0})
    assert not v
    assert any(x.startswith("NEW") for x in a)
    assert any("re-measure solo" in x for x in a)


def test_half_suite_regression_not_self_masked():
    # a shared-helper regression hitting half the suite must not
    # normalize itself away: each row's baseline is the LOO median of
    # the OTHERS (self-review r11)
    floors = {f"q{i}": 1.0 for i in range(12)}
    suite = {f"q{i}": (2.0 if i < 6 else 1.05) for i in range(12)}
    v, a, _ = floor_check.check(floors, suite, {})
    assert len(v) == 6 and all("REGRESSION" in x for x in v)


def test_degenerate_single_row_suite_still_fails():
    v, a, _ = floor_check.check({"a": 1.0}, {"a": 10.0}, {})
    assert len(v) == 1  # no other rows to hide behind: LOO floor is 1.0


def test_bad_floor_is_advisory_not_crash():
    v, a, _ = floor_check.check({"a": 0.0, "b": 2.0}, {"a": 1.0, "b": 2.1}, {})
    assert not v
    assert any("BAD FLOOR" in x for x in a)


def test_repin_is_a_ratchet():
    out = floor_check.repin(FLOORS, {"a": 0.8, "b": 9.9}, {"e": 1.5})
    assert out["a"] == 0.8      # lowered
    assert out["b"] == 2.0      # never raised
    assert out["e"] == 1.5      # seated
    assert FLOORS["a"] == 1.0   # input untouched
    # sub-millisecond readings must not seat a zero floor
    assert floor_check.repin({}, {"z": 0.0004}, {})["z"] == 0.001


def test_repin_sweep_seats_but_never_lowers():
    """ADVICE r11 low #4: a sweep reading is ONE cold sample — it may
    seat a floor for a row that has none, but an anomalously fast
    single-shot must not permanently tighten an existing floor (the
    ratchet has no mechanism to move back up)."""
    out = floor_check.repin({"a": 1.0}, {}, {"a": 0.2, "e": 1.5})
    assert out["a"] == 1.0      # sweep single-shot cannot lower
    assert out["e"] == 1.5      # but can seat a missing floor
    # suite medians retain the lowering right
    assert floor_check.repin({"a": 1.0}, {"a": 0.2}, {})["a"] == 0.2


def test_drifted_session_predicate():
    # calibration spread over 1.3 OR median floor-drift over 1.25
    assert floor_check.session_is_drifted(FLOORS, {"a": 1.05}, 1.53)
    assert not floor_check.session_is_drifted(FLOORS, {"a": 1.05}, 1.1)
    drifted = {"a": 1.4, "b": 2.8, "c": 5.6}
    assert floor_check.session_is_drifted(FLOORS, drifted, None)
    assert not floor_check.session_is_drifted(FLOORS, {"a": 1.1}, None)


def test_solo_candidates_any_session_suite_and_sweep():
    """Round-14 rule: a suite row exceeding both rules is a solo
    CANDIDATE in ANY session (the calm-session extended-phase
    inflation class measured r14: in-suite 1.63-1.69x, solo 1.09-1.38x
    on byte-identical code — a real plan regression reproduces solo,
    so the solo read adjudicates). Round-16 widening (VERDICT r15
    next-round #6): sweep-envelope breaches are candidates in ANY
    session too — the sweep runs post-suite, where the drift median
    cannot see its contention (mm_audio_vad read 9.2x its floor in a
    session the classifier called borderline; the solo read was
    0.99x) — with suite violations always ordered first so the bench
    solo budget spends on the gate before the advisories."""
    floors = {f"q{i}": 1.0 for i in range(8)} | {"dd_x": 1.0}
    drifted = {f"q{i}": 1.35 for i in range(8)} | {"dd_x": 2.2}
    # drifted by calibration spread: dd_x (2.2x > 1.5 and > 1.35*1.25)
    assert floor_check.solo_candidates(floors, drifted, {}, 1.53) == ["dd_x"]
    # same numbers, calm calibration, but median drift 1.35 > 1.25
    # still marks the session drifted
    assert floor_check.solo_candidates(floors, drifted, {}, 1.0) == ["dd_x"]
    # CALM session: the suite blowup is STILL a candidate (r14 rule)
    calm = {f"q{i}": 1.05 for i in range(8)} | {"dd_x": 2.2}
    assert floor_check.solo_candidates(floors, calm, {}, 1.0) == ["dd_x"]
    # sweep rows without a floor are never candidates
    got = floor_check.solo_candidates(
        floors, drifted, {"sw": 2.6, "q0_s": 1.0} | {}, 1.53
    )
    assert got == ["dd_x"]
    floors["sw"] = 1.0
    got = floor_check.solo_candidates(floors, drifted, {"sw": 2.6}, 1.53)
    assert got == ["dd_x", "sw"]
    # r16: the sweep blowup is a candidate in a CALM session as well,
    # still ordered after the suite violation
    got = floor_check.solo_candidates(floors, calm, {"sw": 2.6}, 1.0)
    assert got == ["dd_x", "sw"]
    # under the envelope the sweep row never joins
    got = floor_check.solo_candidates(floors, calm, {"sw": 2.4}, 1.0)
    assert got == ["dd_x"]


def test_solo_remeasure_adjudicates_drifted_flags():
    """The flag stands only if the solo read confirms: a clean solo
    median downgrades the violation to an advisory carrying both
    readings; a confirming solo keeps the violation and stamps it."""
    floors = {f"q{i}": 1.0 for i in range(8)} | {"dd_x": 1.0}
    drifted = {f"q{i}": 1.35 for i in range(8)} | {"dd_x": 2.2}
    # without a solo reading: violation (the pre-r13 behavior)
    v, a, _ = floor_check.check(floors, drifted, {})
    assert len(v) == 1 and "dd_x" in v[0]
    # clean solo (1.1x floor): downgraded, both readings visible
    v, a, _ = floor_check.check(floors, drifted, {}, {"dd_x": 1.1})
    assert not v
    note = next(x for x in a if "flag cleared (solo)" in x)
    assert "dd_x" in note and "2.20x" in note and "1.10x" in note
    # confirming solo (1.9x floor): violation stands, stamped
    v, a, _ = floor_check.check(floors, drifted, {}, {"dd_x": 1.9})
    assert len(v) == 1 and "CONFIRMS" in v[0]
    # sweep-envelope advisory embeds the solo verdict both ways
    floors["sw"] = 1.0
    _, a, _ = floor_check.check(floors, drifted, {"sw": 2.6},
                                {"dd_x": 1.1, "sw": 1.2})
    assert any("sw" in x and "cold-sample noise" in x for x in a)
    _, a, _ = floor_check.check(floors, drifted, {"sw": 2.6},
                                {"dd_x": 1.1, "sw": 2.8})
    assert any("sw" in x and "STILL OVER" in x for x in a)


def test_floors_cover_every_registered_query():
    import json

    from wikitrender_spark.plans import registry

    doc = json.load(
        open(os.path.join(os.path.dirname(__file__), "..", "tools",
                          "bench_floors.json"))
    )
    missing = set(registry.all_queries()) - set(doc["floors"])
    assert not missing, (
        f"registered queries without a floor: {sorted(missing)} — run "
        "bench.py (the sweep covers new rows), then "
        "`python tools/floor_check.py --repin` to seat them"
    )


def test_bench_sweep_override_resolution(tmp_path, capsys):
    """The three branches of bench.sweep_dir_for (review r12): plain
    rows pass through; an override with an existing sibling dir
    applies; a missing sibling falls back LOUDLY with a SKIPPED tag
    (the row's floor lives at the override scale, so silence would
    read as a perf anomaly)."""
    import bench

    base = tmp_path / "sf0.1"
    base.mkdir()
    # plain row: untouched
    d, tag = bench.sweep_dir_for("tx_ngram_nll", str(base))
    assert d == str(base) and tag is None
    # override with the sibling present
    (tmp_path / "sf0.01").mkdir()
    d, tag = bench.sweep_dir_for("dd_simhash_tuning", str(base))
    assert d == str(tmp_path / "sf0.01") and tag == "sf0.01"
    # override with the sibling missing: loud skip, headline dir
    lonely = tmp_path / "only" / "sf0.1"
    lonely.mkdir(parents=True)
    d, tag = bench.sweep_dir_for("dd_simhash_tuning", str(lonely))
    assert d == str(lonely) and tag == "SKIPPED:sf0.01"
    assert "SKIPPED" in capsys.readouterr().err


def test_suite_violation_rows_is_the_shared_predicate():
    """ADVICE r13 low #4: solo candidates and REGRESSION messages both
    derive from suite_violation_rows' structured (name, ratio) tuples —
    message wording can change without breaking candidate extraction."""
    floors = {f"q{i}": 1.0 for i in range(8)} | {"dd_x": 1.0}
    drifted = {f"q{i}": 1.35 for i in range(8)} | {"dd_x": 2.2}
    rows = floor_check.suite_violation_rows(floors, drifted)
    assert rows == [("dd_x", 2.2)]
    # check() flags exactly the same names (messages derive from rows)
    v, _, _ = floor_check.check(floors, drifted, {})
    assert len(v) == 1 and "dd_x" in v[0]
    # and solo_candidates consumes the structured rows, not the text
    assert floor_check.solo_candidates(floors, drifted, {}, 1.53) == ["dd_x"]
    # clean suite -> no structured rows
    assert floor_check.suite_violation_rows(floors, {"q0": 1.1}) == []


def test_solo_provenance_filter():
    """Round-14 provenance guard (the ADVICE r13 low #3 fix's final
    form): a solo reading adjudicates only when its recorded flagged
    value matches the samples file's own current reading — stale or
    spliced blocks drop with a message, fresh ones pass, sweep rows
    match against the sweep reading."""
    rec = {
        "a": {"flagged": 2.2, "solo_median": 1.1},
        "b": {"flagged": 9.9, "solo_median": 1.0},   # stale: suite says 3.0
        "sw": {"flagged": 2.6, "solo_median": 1.2},
        "gone": {"flagged": 5.0, "solo_median": 1.0},  # not in readings
    }
    solo = {n: r["solo_median"] for n, r in rec.items()}
    kept, dropped = floor_check.filter_solo_by_provenance(
        solo, rec, {"a": 2.2, "b": 3.0}, {"sw": 2.6}
    )
    assert kept == {"a": 1.1, "sw": 1.2}
    assert len(dropped) == 2
    assert any("b" in m for m in dropped) and any("gone" in m for m in dropped)


def test_newest_samples_path_prefers_latest_archive(tmp_path):
    """Session-keyed sample archiving (VERDICT r14 next-round #4): the
    checker reads the NEWEST bench_runs archive — lexicographic name
    order IS chronological for the UTC-stamp naming — and falls back
    to the legacy single file only when no archive exists."""
    runs = tmp_path / "bench_runs"
    fallback = tmp_path / "bench_samples.json"
    fallback.write_text("{}")
    # no archive dir at all -> fallback
    assert floor_check.newest_samples_path(
        str(runs), str(fallback)
    ) == str(fallback)
    runs.mkdir()
    # empty archive dir -> fallback
    assert floor_check.newest_samples_path(
        str(runs), str(fallback)
    ) == str(fallback)
    (runs / "samples-20260815T120000-10.json").write_text("{}")
    (runs / "samples-20260816T090000-99.json").write_text("{}")
    (runs / "samples-20260816T080000-11.json").write_text("{}")
    (runs / "not-a-sample.txt").write_text("x")
    assert floor_check.newest_samples_path(
        str(runs), str(fallback)
    ) == str(runs / "samples-20260816T090000-99.json")


def test_bench_write_samples_archives_per_session(tmp_path, monkeypatch):
    """bench.write_samples writes BOTH the latest-run view and a
    never-overwritten per-session archive with identical payloads plus
    the session key — the r14 mid-round overwrite class (a second
    same-code run clobbering the only samples file before a repin)
    cannot recur."""
    import json as _json

    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    paths = bench.write_samples({"samples": {"q": [1.0]}, "sf": 0.1})
    assert len(paths) == 2
    latest, archive = paths
    assert latest == str(tmp_path / "bench_samples.json")
    assert os.path.dirname(archive) == str(tmp_path / "bench_runs")
    a, b = _json.load(open(latest)), _json.load(open(archive))
    assert a == b
    assert a["samples"] == {"q": [1.0]} and "session" in a
    assert os.path.basename(archive) == f"samples-{a['session']}.json"
    # and floor_check's selector finds exactly the archive just written
    assert floor_check.newest_samples_path(
        str(tmp_path / "bench_runs"), latest
    ) == archive


def test_newest_samples_path_same_second_tiebreak_by_mtime(tmp_path):
    """ADVICE r15: two runs landing in the same UTC second used to
    tie-break by lexicographic pid string ('-412' > '-3648'), which
    could adjudicate the OLDER file. The tie now breaks by mtime: the
    most recently written archive wins regardless of pid spelling."""
    runs = tmp_path / "bench_runs"
    runs.mkdir()
    older = runs / "samples-20260817T120000-412.json"
    newer = runs / "samples-20260817T120000-3648.json"
    older.write_text("{}")
    newer.write_text("{}")
    os.utime(older, (1000, 1000))
    os.utime(newer, (2000, 2000))
    assert floor_check.newest_samples_path(
        str(runs), str(tmp_path / "none.json")
    ) == str(newer)
    # and the timestamp still dominates mtime: a lexically-newer stamp
    # with an older mtime (e.g. restored from backup) is still newest
    stamped = runs / "samples-20260817T120001-1.json"
    stamped.write_text("{}")
    os.utime(stamped, (500, 500))
    assert floor_check.newest_samples_path(
        str(runs), str(tmp_path / "none.json")
    ) == str(stamped)


def test_bench_write_samples_is_atomic_and_archive_first(
    tmp_path, monkeypatch
):
    """ADVICE r15: write_samples goes temp-file + os.rename (readers
    never see a truncated payload) and writes the ARCHIVE before the
    latest view (a crash between the two leaves the per-session record
    intact). Simulated crash: the second json.dump raises — the
    archive must exist and parse; the pre-existing latest view must be
    untouched; no temp litter either way."""
    import json as _json

    import bench

    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    # seed a previous latest view
    prev = {"samples": {"old": [9.9]}, "sf": 0.1}
    (tmp_path / "bench_samples.json").write_text(_json.dumps(prev))
    calls = {"n": 0}
    real_dump = bench.json.dump

    def crashing_dump(obj, f, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("disk full")
        return real_dump(obj, f, **kw)

    monkeypatch.setattr(bench.json, "dump", crashing_dump)
    try:
        bench.write_samples({"samples": {"q": [1.0]}, "sf": 0.1})
    except OSError:
        pass
    else:
        raise AssertionError("crash did not propagate")
    monkeypatch.setattr(bench.json, "dump", real_dump)
    # the archive (written first) survived the crash and parses
    archives = list((tmp_path / "bench_runs").glob("samples-*.json"))
    assert len(archives) == 1
    assert _json.load(open(archives[0]))["samples"] == {"q": [1.0]}
    # the latest view still holds the PREVIOUS payload, not a truncate
    assert _json.load(open(tmp_path / "bench_samples.json")) == prev
    # no temp litter anywhere
    assert not list(tmp_path.glob("*.tmp-*"))
    assert not list((tmp_path / "bench_runs").glob("*.tmp-*"))


def test_composition_id_is_membership_stable():
    """VERDICT r15 next-round #5: the extended-suite membership stamp.
    Order-insensitive (the id names a SET of rows), sensitive to any
    add/drop/swap, and 10 hex chars so it fits the final bench line's
    1900-byte budget."""
    import bench

    a = bench._composition_id(["q_b", "q_a", "q_c"])
    assert a == bench._composition_id(["q_a", "q_c", "q_b"])
    assert a != bench._composition_id(["q_a", "q_b"])
    assert a != bench._composition_id(["q_a", "q_b", "q_d"])
    assert len(a) == 10 and all(c in "0123456789abcdef" for c in a)
    # the live extended suite gets a well-formed id too
    live = bench._composition_id(bench.EXTENDED)
    assert len(live) == 10
