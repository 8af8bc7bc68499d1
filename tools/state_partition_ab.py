"""Round-17 evidence probe: interleaved A/B of the replay drains at the
OLD state-partition behavior (WTR_STATE_PARTITIONS=32 — the session
default every drain inherited before round 17) versus the round-17
scale-adaptive derivation (env unset). Interleaving alternates the two
configurations within one process and one pass index, so host drift
hits both sides equally — the same discipline as the round-16
eager/lazy checkpoint A/B.

Usage: python tools/state_partition_ab.py QUERY [QUERY ...]
Prints one JSON line per query: {"query", "old32": [...], "adaptive":
[...], medians}; archives to bench_runs/state-ab-<session>.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402
from wikitrender_spark.plans import registry  # noqa: E402
from wikitrender_spark.session import get_spark  # noqa: E402
from wikitrender_spark.streaming.sizing import (  # noqa: E402
    STATE_PARTITIONS_ENV,
)


def main() -> None:
    names = sys.argv[1:]
    if not names:
        sys.exit("usage: python tools/state_partition_ab.py QUERY ...")
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("state-partition-ab", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calib, calib_spread, _ = bench._calibration(spark)
    out = {}
    for name in names:
        samples: dict[str, list[float]] = {"old32": [], "adaptive": []}
        for pass_i in range(4):  # pass 0 warm, excluded
            for mode in ("old32", "adaptive"):
                if mode == "old32":
                    os.environ[STATE_PARTITIONS_ENV] = "32"
                else:
                    os.environ.pop(STATE_PARTITIONS_ENV, None)
                t0 = time.perf_counter()
                queries[name](spark, sf_dir).write.mode(
                    "overwrite"
                ).format("noop").save()
                dt = round(time.perf_counter() - t0, 3)
                if pass_i:
                    samples[mode].append(dt)
        row = {
            "old32": samples["old32"],
            "old32_median": round(statistics.median(samples["old32"]), 3),
            "adaptive": samples["adaptive"],
            "adaptive_median": round(
                statistics.median(samples["adaptive"]), 3
            ),
        }
        out[name] = row
        print(json.dumps({"query": name, **row}))
    session = time.strftime("%Y%m%dT%H%M%S", time.gmtime()) + f"-{os.getpid()}"
    payload = {
        "methodology": (
            "interleaved A/B, median-of-3, warm pass excluded; old32 = "
            "pre-round-17 session default, adaptive = sizing.py derivation"
        ),
        "calibration": calib,
        "calibration_spread": calib_spread,
        "rows": out,
        "session": session,
    }
    runs = os.path.join(REPO, "bench_runs")
    os.makedirs(runs, exist_ok=True)
    with open(os.path.join(runs, f"state-ab-{session}.json"), "w") as f:
        json.dump(payload, f)
    print(json.dumps({"written": f"bench_runs/state-ab-{session}.json",
                      "calibration": calib,
                      "calibration_spread": calib_spread}))


if __name__ == "__main__":
    main()
