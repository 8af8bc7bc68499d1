"""Hot-user skew probe for the co-occurrence family (r08): one user
contributing 90% of all edits across MANY distinct pages is the
quadratic threat to co-editor pair generation — uncapped, that user
alone would contribute C(distinct_pages, 2) pairs. The per-user cap
(operators/graph.COEDIT_CAP) claims to bound any user's contribution at
C(cap, 2) regardless of heat; this probe measures it instead of
trusting the docstring.

Two synthetic classified-edit relations of equal size:
- uniform: edits spread over n_users users x n_pages pages;
- hot: the same rows, but 90% re-assigned to ONE user (who therefore
  touches every page — the worst case the cap exists for).

Times coedit_pairs and coedit_triangles on both (median-of-3,
construction+execution, like bench.py). PASS = hot within 2x of
uniform; uncapped, hot would be ~C(n_pages,2)/C(cap,2) times more pair
work (~780x at the probe's sizes), so 2x is a sharp bound.

Usage: python tools/coocc_skew_probe.py [n_rows]
Prints one JSON line; exits 1 if the bound is violated.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikitrender_spark.operators import graph
from wikitrender_spark.session import get_spark

N_ROWS = 500_000
N_USERS = 5_000
N_PAGES = 2_000
HOT_SHARE = 0.9


def synth(spark, n_rows: int, hot: bool):
    """(user, id, is_bot) classified-edit rows, deterministic."""
    base = spark.range(n_rows).select(
        F.concat(F.lit("U"), (F.col("id") % N_USERS)).alias("u_uniform"),
        F.concat(F.lit("P"), ((F.col("id") * 7919) % N_PAGES)).alias("pid"),
        F.lit(False).alias("is_bot"),
        F.col("id").alias("rid"),
    )
    if hot:
        user = F.when(
            F.col("rid") % 10 < int(HOT_SHARE * 10), F.lit("HOTUSER")
        ).otherwise(F.col("u_uniform"))
    else:
        user = F.col("u_uniform")
    return base.select(
        user.alias("user"), F.col("pid").alias("id"), "is_bot"
    ).localCheckpoint()


def timed(fn, n: int = 3) -> float:
    fn()  # warm
    samples = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return round(statistics.median(samples), 3)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else N_ROWS
    spark = get_spark("coocc-skew-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    uniform = synth(spark, n_rows, hot=False)
    hot = synth(spark, n_rows, hot=True)

    def run_pairs(ev):
        return lambda: graph.coedit_pairs(ev).write.mode(
            "overwrite"
        ).format("noop").save()

    def run_tri(ev):
        return lambda: graph.coedit_triangles(ev).write.mode(
            "overwrite"
        ).format("noop").save()

    out = {
        "metric": "coocc_hot_user_skew_seconds",
        "n_rows": n_rows,
        "hot_share": HOT_SHARE,
        "pairs_uniform": timed(run_pairs(uniform)),
        "pairs_hot": timed(run_pairs(hot)),
        "triangles_uniform": timed(run_tri(uniform)),
        "triangles_hot": timed(run_tri(hot)),
    }
    out["pairs_ratio"] = round(out["pairs_hot"] / out["pairs_uniform"], 2)
    out["triangles_ratio"] = round(
        out["triangles_hot"] / out["triangles_uniform"], 2
    )
    print(json.dumps(out))
    if out["pairs_ratio"] > 2.0 or out["triangles_ratio"] > 2.0:
        sys.exit(1)


if __name__ == "__main__":
    main()
