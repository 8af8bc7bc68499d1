"""Mechanize the per-query floor rule (round 11 — the primary perf
instrument after the calibration ratio's demotion, see BASELINE.md):
compare a bench run's per-query readings against the committed floors
in tools/bench_floors.json and separate GENUINE regressions from
uniform host drift.

The round-11 lesson that shaped the logic: a slow host state moves
EVERY row by a similar factor (measured median 1.305, max 1.62 across
the whole suite on byte-identical code), while a genuine regression
moves ONE row (r9's recursive-months read 16-29 s against a ~1 s
plan). So a raw 1.5x-of-floor exceedance alone is ambiguous; the
checker also normalizes each row by the run's own median drift and
fails only rows that exceed BOTH the raw 1.5x rule AND 1.25x of the
session's median drift — a row that is slow the way the whole session
is slow is drift; a row that is slow on its own is a regression.

Usage:
  python tools/floor_check.py            # checks the newest bench_runs/
                                         # session archive (fallback:
                                         # bench_samples.json)
  python tools/floor_check.py --repin    # also ratchet floors DOWN to
                                         # any faster clean readings
Exit 1 on a drift-adjusted suite violation; sweep singles are
report-only (they are recorded-not-banded by bench methodology).
"""
from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOORS_PATH = os.path.join(REPO, "tools", "bench_floors.json")
SAMPLES_PATH = os.path.join(REPO, "bench_samples.json")
RUNS_DIR = os.path.join(REPO, "bench_runs")


def newest_samples_path(
    runs_dir: str = RUNS_DIR, fallback: str = SAMPLES_PATH
) -> str:
    """Pick the recorded artifact to adjudicate from (VERDICT r14
    next-round #4): the NEWEST session archive bench.write_samples
    wrote — names sort lexicographically == chronologically
    (samples-<UTC %Y%m%dT%H%M%S>-<pid>.json) — falling back to the
    legacy single bench_samples.json when no archive exists. Repins
    and adjudications therefore always read a per-session record that
    a concurrent second run cannot have overwritten."""
    try:
        names = [
            n for n in os.listdir(runs_dir)
            if n.startswith("samples-") and n.endswith(".json")
        ]
    except FileNotFoundError:
        names = []
    if names:
        # Primary key: the UTC timestamp embedded in the name (sorts
        # lexicographically == chronologically). Tie-break same-second
        # runs by file mtime, not by the pid suffix — pid strings sort
        # lexicographically ('-412' > '-3648'), so two runs landing in
        # the same second could adjudicate the older file (ADVICE r15).
        def key(n: str):
            stamp = n[len("samples-"):].split("-")[0]
            return (stamp, os.path.getmtime(os.path.join(runs_dir, n)), n)

        return os.path.join(runs_dir, max(names, key=key))
    return fallback

RAW_RULE = 1.5        # the established 1.5x-of-floor rule (BASELINE.md)
DRIFT_MARGIN = 1.25   # must also exceed the session's median drift by this
SWEEP_ENVELOPE = 2.5  # cold single-sample advisory threshold
#: a session is DRIFTED — its banded medians untrustworthy for
#: adjudication — when the calibration probe's within-run spread
#: exceeds this (the bench methodology's own "calibration ran under
#: contention" threshold) or the suite's median floor-ratio exceeds
#: DRIFT_MARGIN. In a drifted session, a flagged row triggers an
#: automatic solo re-measure (round 13, VERDICT r12 ask #5 — the
#: adjudication step NOTES.md prescribed by hand after
#: dd_cross_source_dups drew the noisy straw in two sessions with
#: clean solo re-measures both times).
DRIFTED_CALIB_SPREAD = 1.3


def session_is_drifted(
    floors: dict[str, float],
    suite: dict[str, float],
    calib_spread: float | None,
) -> bool:
    """The drifted-session predicate (pure, pytest-covered): trust
    floors over ratios when the calibration probe itself ran under
    contention, or when the whole suite moved together."""
    if calib_spread is not None and calib_spread > DRIFTED_CALIB_SPREAD:
        return True
    ratios = [
        v / floors[n] for n, v in suite.items()
        if n in floors and floors[n] > 0
    ]
    return bool(ratios) and statistics.median(ratios) > DRIFT_MARGIN


def solo_candidates(
    floors: dict[str, float],
    suite: dict[str, float],
    sweep: dict[str, float],
    calib_spread: float | None,
) -> list[str]:
    """Rows bench.py should solo re-measure before the flag is
    trusted: every suite row that would violate the two-rule check
    (ANY session — round 14 evolution, see below), plus every sweep
    row over its advisory envelope (ANY session since round 16).

    Round-13 rule history: suite violations were re-measured only in
    drifted sessions, on the theory that a calm-session flag is
    already trustworthy. Round 14 measured the counterexample on
    byte-identical code: a CALM session (median drift 1.06x,
    calibration spread 1.20) flagged the three heaviest EXTENDED rows
    at 1.63-1.69x of their floors while their solo re-measures read
    1.09-1.38x — tail-phase JVM state the headline-dominated LOO
    median cannot register as drift. A genuine PLAN regression (the
    r9 class: same plan, same data) reproduces under a solo run, so
    the solo read is the adjudicator in both session classes; the
    laundering risk the old rule guarded against is bounded by the
    raw 1.5x rule still applying to the solo reading itself.

    Sweep rows dropped the drifted-only condition in round 16 (VERDICT
    r15 next-round #6): mm_audio_vad's 12.73 s single sample (9.2x
    floor, pure post-suite contention — solo re-measure 1.37 s vs a
    1.38 s floor) sat unexplained in a drift-borderline archive until
    the judge re-measured it by hand. The session classifier cannot
    see post-suite contention (the sweep runs AFTER the phases the
    drift median is computed from), so a sweep blowup gets its solo
    adjudication recorded in the archive unconditionally — the
    candidate list orders suite violations first so the bench solo
    budget always spends on the gate before the advisories."""
    # structured rows, not message-parsing (ADVICE r13 low #4): the
    # candidate list and check()'s human messages now both derive from
    # suite_violation_rows, so a wording change cannot silently break
    # candidate extraction
    out = [n for n, _r in suite_violation_rows(floors, suite)]
    for n, v in sorted(sweep.items()):
        if n in floors and floors[n] > 0 and v > floors[n] * SWEEP_ENVELOPE:
            out.append(n)
    return out


def suite_violation_rows(
    floors: dict[str, float],
    suite: dict[str, float],
) -> list[tuple[str, float]]:
    """Structured (name, ratio) tuples for every suite row that exceeds
    BOTH the raw 1.5x rule and 1.25x of the leave-one-out session
    median — the two-rule violation predicate, before any solo
    adjudication. check() derives its REGRESSION messages from this
    list and solo_candidates derives its candidate names from it
    (ADVICE r13 low #4: the candidate list used to string-parse the
    messages, so any wording change silently broke extraction)."""
    ratios = {
        n: v / floors[n] for n, v in suite.items()
        if n in floors and floors[n] > 0
    }
    out = []
    for n in sorted(ratios):
        r = ratios[n]
        others = [x for m, x in ratios.items() if m != n]
        loo = max(statistics.median(others) if others else 1.0, 1.0)
        if r > RAW_RULE and r > loo * DRIFT_MARGIN:
            out.append((n, r))
    return out


def check(
    floors: dict[str, float],
    suite: dict[str, float],
    sweep: dict[str, float],
    solo: dict[str, float] | None = None,
) -> tuple[list[str], list[str], float]:
    """Pure comparison logic (pytest-covered without Spark). Returns
    (violations, advisories, median_drift). `suite` readings are
    medians (headline + extended — banded); `sweep` are single samples
    (report-only). Rows without a floor are advisories ("new row —
    repin to seat a floor"), never violations; a non-positive floor is
    a corrupt-data advisory, never a crash (the gate must not go dark
    on anomalous data — self-review r11).

    Each row's drift baseline is the LEAVE-ONE-OUT median of the OTHER
    rows' ratios, floored at 1.0: including a row in its own baseline
    let any regression touching >= half the suite normalize itself away
    (a shared-helper regression hits many rows at once — the r9 HOF-
    inlining class). LOO closes that for anything up to half the suite;
    a regression uniform across EVERY row is still indistinguishable
    from host drift within one session — that residual case needs a
    second session/host, and the docstring says so rather than
    pretending otherwise.

    `solo` maps row name -> the solo re-measure median bench.py
    recorded for rows it flagged in a drifted session (round 13,
    VERDICT r12 ask #5): a would-be violation whose solo reading sits
    within RAW_RULE of its floor DOWNGRADES to an advisory — the flag
    stands only if the solo read confirms it (solo runs carry no
    session-drift context, so the raw rule alone adjudicates them)."""
    ratios = {
        n: v / floors[n] for n, v in suite.items() if n in floors and floors[n] > 0
    }
    # single source of truth for the two-rule predicate: the structured
    # rows solo_candidates also consumes (ADVICE r13 low #4)
    viol_names = {n for n, _r in suite_violation_rows(floors, suite)}
    violations = []
    advisories = []
    med = statistics.median(ratios.values()) if ratios else 1.0
    for n, v in sorted(suite.items()):
        if n not in floors:
            advisories.append(f"NEW   {n}: {v:.2f}s has no floor (--repin seats it)")
            continue
        if floors[n] <= 0:
            advisories.append(
                f"BAD FLOOR {n}: floor {floors[n]!r} is not positive — "
                "fix tools/bench_floors.json"
            )
            continue
        r = ratios[n]
        others = [x for m, x in ratios.items() if m != n]
        loo = max(statistics.median(others) if others else 1.0, 1.0)
        if n in viol_names:
            solo_v = (solo or {}).get(n)
            if solo_v is not None and solo_v <= floors[n] * RAW_RULE:
                # session-agnostic wording (review r14): since the
                # round-14 rule widening, calm-session flags are solo
                # re-measured too — "in a drifted session" would
                # mislabel exactly the calm tail-phase class that
                # motivated the widening
                advisories.append(
                    f"flag cleared (solo) {n}: {v:.2f}s = {r:.2f}x floor "
                    f"in-suite, but solo re-measure "
                    f"{solo_v:.2f}s = {solo_v / floors[n]:.2f}x is clean — "
                    "session/host state, not a plan regression"
                )
                continue
            confirm = (
                f"; solo re-measure {solo_v:.2f}s CONFIRMS"
                if solo_v is not None else ""
            )
            violations.append(
                f"REGRESSION {n}: {v:.2f}s = {r:.2f}x floor "
                f"{floors[n]:.2f}s (rest-of-session drift {loo:.2f}x)"
                f"{confirm}"
            )
        elif r > RAW_RULE:
            advisories.append(
                f"drift {n}: {v:.2f}s = {r:.2f}x floor, within "
                f"{DRIFT_MARGIN}x of the rest-of-session median {loo:.2f}x — "
                "host state, not a plan regression"
            )
    for n, v in sorted(sweep.items()):
        if n not in floors:
            advisories.append(f"NEW   {n}: sweep {v:.2f}s has no floor")
        elif v > floors[n] * SWEEP_ENVELOPE:
            solo_v = (solo or {}).get(n)
            if solo_v is not None:
                verdict = (
                    "clean — cold-sample noise"
                    if solo_v <= floors[n] * SWEEP_ENVELOPE
                    else "STILL OVER — promote to the extended suite"
                )
                advisories.append(
                    f"sweep {n}: single sample {v:.2f}s > {SWEEP_ENVELOPE}x "
                    f"floor {floors[n]:.2f}s; solo re-measure "
                    f"{solo_v:.2f}s {verdict}"
                )
            else:
                advisories.append(
                    f"sweep {n}: single sample {v:.2f}s > {SWEEP_ENVELOPE}x "
                    f"floor {floors[n]:.2f}s — re-measure solo before judging"
                )
    return violations, advisories, med


def filter_solo_by_provenance(
    solo: dict[str, float],
    rec: dict[str, dict],
    suite: dict[str, float],
    sweep: dict[str, float],
) -> tuple[dict[str, float], list[str]]:
    """Provenance guard (ADVICE r13 low #3, evolved in round 14): a
    solo reading may adjudicate a flag only if it demonstrably came
    from THIS samples file's own run — its recorded "flagged" value
    must equal the file's current suite/sweep reading for that row
    (bench.py rewrites the whole file atomically each run, so a fresh
    block always matches; a stale or hand-spliced block almost surely
    does not). The r13 drifted-session precondition was dropped for
    SUITE rows after round 14 measured a calm-session flag class that
    solo-clears on byte-identical code (see solo_candidates'
    docstring); the stale-block laundering hole the advice named
    stays closed by this value-match instead. Pure; pytest-covered.
    Returns (kept, drop_messages)."""
    kept: dict[str, float] = {}
    dropped: list[str] = []
    for n, v in solo.items():
        current = suite.get(n, sweep.get(n))
        if current is not None and rec.get(n, {}).get("flagged") == current:
            kept[n] = v
        else:
            dropped.append(
                f"solo reading for {n} dropped — its recorded flagged "
                f"value {rec.get(n, {}).get('flagged')!r} does not match "
                f"this file's current reading {current!r} (stale or "
                "spliced block)"
            )
    return kept, dropped


def repin(
    floors: dict[str, float],
    suite: dict[str, float],
    sweep: dict[str, float],
) -> dict[str, float]:
    """Ratchet: floors only ever move DOWN (or seat for new rows), but
    never to a non-positive value — a sub-millisecond reading would
    otherwise seat a 0.0 floor and poison every later ratio.

    Provenance rule (ADVICE r11 low #4): only SUITE readings — medians
    of N samples — may LOWER an existing floor. A sweep reading is one
    cold sample; an anomalously fast one (cache hit, empty-input
    anomaly) would permanently tighten the ratchet and generate
    spurious REGRESSION failures in later sessions, with hand-editing
    tools/bench_floors.json the only recovery (the ratchet never moves
    up). So sweep samples may SEAT a floor for a row that has none
    (some floor beats no floor, and the 2.5x sweep envelope is
    advisory-only anyway) but never tighten one that exists."""
    out = dict(floors)
    for n, v in suite.items():
        out[n] = max(round(min(out.get(n, v), v), 3), 0.001)
    for n, v in sweep.items():
        if n not in out:
            out[n] = max(round(v, 3), 0.001)
    return out


def main() -> int:
    args = set(sys.argv[1:])
    unknown = args - {"--repin"}
    if unknown:
        sys.exit(f"floor_check.py: unknown flag(s) {sorted(unknown)}")
    doc = json.load(open(FLOORS_PATH))
    floors = doc["floors"]
    samples_path = newest_samples_path()
    print(f"reading {os.path.relpath(samples_path, REPO)}")
    bs = json.load(open(samples_path))
    suite = {
        n: round(statistics.median(v), 3)
        for n, v in bs.get("samples", {}).items()
        if v
    }
    suite.update(bs.get("extended_queries", {}))
    sweep = bs.get("sweep_queries", {})
    if not suite and not sweep:
        sys.exit(f"{samples_path} holds no readings — run bench.py first")
    solo = {
        n: rec["solo_median"]
        for n, rec in bs.get("solo_remeasure", {}).items()
        if rec.get("solo_median") is not None
    }
    solo, dropped = filter_solo_by_provenance(
        solo, bs.get("solo_remeasure", {}), suite, sweep
    )
    for msg in dropped:
        print(f"note: {msg}")
    violations, advisories, med = check(floors, suite, sweep, solo)
    print(
        f"{len(suite)} suite rows, {len(sweep)} sweep rows vs "
        f"{len(floors)} floors; session median drift {med:.2f}x"
    )
    for a in advisories:
        print(f"  note  {a}")
    for v in violations:
        print(f"  FAIL  {v}")
    if "--repin" in args:
        doc["floors"] = repin(floors, suite, sweep)
        lowered = sum(
            1 for n in doc["floors"] if doc["floors"][n] < floors.get(n, 1e18)
        )
        seated = len(doc["floors"]) - len(floors)
        json.dump(doc, open(FLOORS_PATH, "w"), indent=1)
        print(f"repinned: {lowered} floors lowered, {seated} seated")
    if not violations:
        print("floor check: OK")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
