"""Node-scaled graph probe (VERDICT r8 ask #5): measure pagerank and
triangle enumeration on synthetic graphs whose NODE/EDGE count actually
grows 10x/100x — closing the BASELINE.md r08 caveat that the sf1 event
replication holds the page keyspace at 211/wiki, so sf1 probes measured
10x event volume on a fixed graph, never a growing one.

Graph construction (seeded, deterministic, off the derive path — plain
column arithmetic over spark.range, no RNG): N nodes, ~4N directed
transition edges (four families of N, deduplicated) and ~4N undirected
weighted pairs, built from deterministic families so the probe
exercises the shapes the operators were designed around:

- LOCAL edges i -> (i+1) % N and i -> (i+2) % N: a ring lattice whose
  (i, i+1, i+2) closures guarantee Theta(N) triangles at every size;
- MIX edges i -> (i * 2654435761) % N: multiplicative-hash endpoints, a
  near-uniform random-graph layer (negligible extra triangles);
- HUB edges i -> i % 32: every node points at one of 32 hubs, giving the
  skewed in-degree distribution that degree-ORDERED orientation exists
  for (an id-ordered orientation would hand a hub unbounded wedge
  fanout; the lower-(degree, id) rule bounds it at O(sqrt(m))).

What to expect if the scale arguments hold: pagerank wall time grows
~linearly in edges with fixed per-iteration plan constants (K
checkpoints per iteration, K independent of N), and triangle time grows
~linearly in wedge count (bounded by sum of min-degree over edges —
near-linear here since degrees are bounded except the 32 hubs, whose
orientation sends them to the receiving side). Superlinear blowup at
100x means a hidden global sort / unbounded fanout — the regression this
probe exists to catch.

Usage: python tools/graph_scale_probe.py [--sizes 2000,20000,200000]
Prints one JSON line with per-size medians and ratios; paste into
BASELINE.md "Node-scaled graph probe".
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikitrender_spark.operators import graph
from wikitrender_spark.session import get_spark


def synth_transitions(spark, n_nodes: int):
    """~4N directed (src, dst, w) transition edges (dedup'd), node ids
    as strings to match edit_transitions' schema."""
    base = spark.range(n_nodes).select(F.col("id").alias("i"))
    fams = [
        ((F.col("i") + 1) % n_nodes),
        ((F.col("i") + 2) % n_nodes),
        ((F.col("i") * F.lit(2654435761)) % n_nodes),
        (F.col("i") % 32),
    ]
    edges = None
    for fam in fams:
        e = base.select(F.col("i").alias("s"), fam.alias("d"))
        edges = e if edges is None else edges.unionByName(e)
    return (
        edges.filter(F.col("s") != F.col("d"))
        .groupBy("s", "d")
        .agg(F.count(F.lit(1)).alias("w"))
        .select(
            F.concat(F.lit("n"), F.col("s")).alias("src"),
            F.concat(F.lit("n"), F.col("d")).alias("dst"),
            F.col("w").cast("long").alias("w"),
        )
    )


def synth_pairs(spark, n_nodes: int):
    """~4N undirected weighted pairs (page_a < page_b, n_coeditors) with
    guaranteed ring triangles and 32 hub nodes."""
    t = synth_transitions(spark, n_nodes)
    a = F.least("src", "dst")
    b = F.greatest("src", "dst")
    return (
        t.groupBy(a.alias("page_a"), b.alias("page_b"))
        .agg((1 + F.sum("w") % 5).cast("long").alias("n_coeditors"))
    )


def _median_time(fn, n: int = 3) -> float:
    times = []
    for _ in range(n + 1):  # warm pass excluded, same as bench.py
        t0 = time.perf_counter()
        fn().write.mode("overwrite").format("noop").save()
        times.append(time.perf_counter() - t0)
    return round(statistics.median(times[1:]), 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="2000,20000,200000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("graph-scale-probe", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"sizes": sizes, "pagerank": {}, "triangles": {}, "stats": {}}
    for n in sizes:
        trans = synth_transitions(spark, n).localCheckpoint()
        pairs = synth_pairs(spark, n).localCheckpoint()
        n_edges = trans.count()
        n_pairs = pairs.count()
        out["stats"][n] = {"edges": n_edges, "pairs": n_pairs}
        out["pagerank"][n] = _median_time(
            lambda: graph.pagerank_topk(trans, k=20)
        )
        out["triangles"][n] = _median_time(
            lambda: graph.triangles_from_pairs(pairs, k=10)
        )
    for key in ("pagerank", "triangles"):
        base = out[key][sizes[0]]
        out[f"{key}_ratios"] = {
            n: round(out[key][n] / base, 2) for n in sizes[1:]
        }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
