"""Hand solo re-measure (the round-15 recipe, scripted in round 16 so
the adjudication runs are reproducible): median-of-3 solo per named
query, warm pass excluded, PLUS bench.py's own calibration probe run
first — so the archive itself proves whether the session was calm
(spread <= ~1.3 and a calibration near the ~4.3 s builder-host level)
instead of the calmness being asserted in prose. Writes
bench_runs/hand-solo-<session>.json in the established format.

Usage: python tools/hand_solo.py QUERY [QUERY ...]
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (the calibration probe + sweep_dir_for)
from wikitrender_spark.plans import registry  # noqa: E402
from wikitrender_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: python tools/hand_solo.py QUERY [QUERY ...]")
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wikitrender-hand-solo", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calib, calib_spread, _ = bench._calibration(spark)
    rows: dict[str, dict] = {}
    for name in names:
        sdir, _tag = bench.sweep_dir_for(name, sf_dir)
        samples = []
        warm = None
        for pass_i in range(4):  # pass 0 warm, excluded
            t0 = time.perf_counter()
            queries[name](spark, sdir).write.mode("overwrite").format(
                "noop"
            ).save()
            dt = round(time.perf_counter() - t0, 3)
            if pass_i == 0:
                warm = dt
            else:
                samples.append(dt)
        rows[name] = {
            "warm": warm,
            "solo_samples": samples,
            "solo_median": round(statistics.median(samples), 3),
        }
        print(json.dumps({name: rows[name]}), flush=True)
    session = time.strftime("%Y%m%dT%H%M%S", time.gmtime()) + f"-{os.getpid()}"
    payload = {
        "record": "hand_solo_remeasure",
        "sf": 0.1 if "sf0.1" in sf_dir else sf_dir,
        "methodology": "median-of-3 solo, warm pass excluded; "
        "calibration = bench.py's pinned probe, min-of-5 "
        "(spread > ~1.3 means the session was NOT calm)",
        "calibration": calib,
        "calibration_spread": calib_spread,
        "rows": rows,
        "session": session,
    }
    out = os.path.join(REPO, "bench_runs", f"hand-solo-{session}.json")
    tmp = out + f".tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.rename(tmp, out)
    print(json.dumps({"written": os.path.relpath(out, REPO),
                      "calibration": calib,
                      "calibration_spread": calib_spread}))


if __name__ == "__main__":
    main()
