"""Skew probe: one 90%-hot page through four shapes of the page-state
aggregation (VERDICT r2 #7 / round-1 #4).

Generates a ~1M-row flat rc event set (sf0.1 rc events replicated 10x,
90% of rows retitled to ONE page) under .benchdata/, then times:

- naive-aqe-off : single-level groupBy(id) with distinct-editor counts —
                  the shape where the hot key lands in one reducer task
                  and map-side combine cannot help the distinct.
- naive-aqe-on  : same plan with AQE. AQE splits skewed JOIN partitions
                  and coalesces small ones, but a skewed AGGREGATE key
                  still hashes to one reducer — documented expectation is
                  little change.
- two-level     : the engine's production shape (operators/page_state):
                  groupBy(id, user) partials then merge — the hot page
                  fans out across its editors first (natural-subkey
                  salting), so no single task sees 90% of rows.
- salted        : explicit groupBy(id, pmod(hash(user), N)) partials then
                  merge — the generic fallback when no natural subkey
                  exists. Distinct-editor sets stay exact because the
                  salt is a function of the user (salt groups are
                  disjoint by construction).

Usage: python tools/skew_bench.py [--rows-factor 10] [--hot-share 0.9]
Prints one JSON line with per-variant median-of-3 wall seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikitrender_spark.operators.derive import rc_events
from wikitrender_spark.operators.page_state import (
    aggregate_classified,
    classified_edit_events,
)
from wikitrender_spark.session import get_spark

BENCH_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".benchdata")
N_SALTS = 32


def generate(spark, sf_dir: str, out: str, factor: int, hot_share: float,
             user_factor: int) -> None:
    rc = rc_events(spark, sf_dir)
    rep = rc.withColumn("_r", F.explode(F.sequence(F.lit(0), F.lit(factor - 1))))
    # deterministic hot assignment: hot_share of rows collapse onto one
    # title; the rest keep their original (seq, replica)-derived identity.
    # Hot rows also get user_factor-diversified editors — the stress case
    # is a viral page with a LARGE editor set (that's what makes the hot
    # key's reducer payload irreducible by map-side combine; with few
    # editors per page, partial combine alone absorbs any skew).
    hot = (F.pmod(F.hash("seq", "_r"), F.lit(1000)) < int(hot_share * 1000))
    skewed = (
        rep.withColumn("title", F.when(hot, F.lit("Page_HOT")).otherwise(F.col("title")))
        .withColumn(
            "user",
            F.when(
                hot,
                F.concat(F.col("user"), F.lit("#"),
                         F.pmod(F.hash("seq", "_r", F.lit(7)),
                                F.lit(user_factor))),
            ).otherwise(F.col("user")),
        )
        .withColumn("seq", F.col("seq") * factor + F.col("_r"))
        .drop("_r")
    )
    skewed.write.mode("overwrite").parquet(out)


def naive_single_level(e):
    """Single-level aggregate: every row of the hot page shuffles to ONE
    reducer; count_distinct prevents meaningful map-side combine."""
    return e.groupBy("id", "wiki", "title").agg(
        F.sum(F.when(F.col("eligible"), 1).otherwise(0)).alias("edits"),
        F.sum(F.when(F.col("eligible") & F.col("is_anon"), 1).otherwise(0)
              ).alias("anonEdits"),
        F.max("is_new").alias("isNew"),
        F.sum("notability_hit").alias("notabilityFlags"),
        F.sum("volatile_hit").alias("volatileFlags"),
        F.sum(F.when(F.col("is_revert"), 1).otherwise(0)).alias("reverts"),
        F.min("ts").alias("start"),
        F.max("ts").alias("updated"),
        F.sum(F.when(F.col("is_revert") | ~F.col("is_bot"), F.col("delta"))
              .otherwise(0)).alias("bytesChanged"),
        # collect_set, NOT count_distinct: count_distinct is rewritten by
        # Spark into a two-level expand (it would silently BE the salted
        # plan); collect_set keeps this genuinely single-level — the hot
        # page's editor set funnels into one reducer task.
        F.size(F.collect_set(
            F.when(F.col("eligible") & ~F.col("is_anon"), F.col("user"))
        )).alias("n_contributors"),
        F.size(F.collect_set(
            F.when(F.col("eligible") & F.col("is_anon"), F.col("user"))
        )).alias("n_anons"),
    )


def salted(e):
    """Explicit hash-salting: partials per (id, hash(user)%N), then merge.
    Distinct counts stay exact — a user's rows always land in one salt."""
    lvl1 = e.withColumn("_salt", F.pmod(F.hash("user"), F.lit(N_SALTS))).groupBy(
        "id", "wiki", "title", "_salt"
    ).agg(
        F.sum(F.when(F.col("eligible"), 1).otherwise(0)).alias("p_edits"),
        F.sum(F.when(F.col("eligible") & F.col("is_anon"), 1).otherwise(0)
              ).alias("p_anon"),
        F.max("is_new").alias("p_new"),
        F.sum("notability_hit").alias("p_nota"),
        F.sum("volatile_hit").alias("p_vola"),
        F.sum(F.when(F.col("is_revert"), 1).otherwise(0)).alias("p_rev"),
        F.min("ts").alias("p_start"),
        F.max("ts").alias("p_updated"),
        F.sum(F.when(F.col("is_revert") | ~F.col("is_bot"), F.col("delta"))
              .otherwise(0)).alias("p_bytes"),
        F.count_distinct(
            F.when(F.col("eligible") & ~F.col("is_anon"), F.col("user"))
        ).alias("p_contrib"),
        F.count_distinct(
            F.when(F.col("eligible") & F.col("is_anon"), F.col("user"))
        ).alias("p_anons"),
    )
    return lvl1.groupBy("id", "wiki", "title").agg(
        F.sum("p_edits").alias("edits"),
        F.sum("p_anon").alias("anonEdits"),
        F.max("p_new").alias("isNew"),
        F.sum("p_nota").alias("notabilityFlags"),
        F.sum("p_vola").alias("volatileFlags"),
        F.sum("p_rev").alias("reverts"),
        F.min("p_start").alias("start"),
        F.max("p_updated").alias("updated"),
        F.sum("p_bytes").alias("bytesChanged"),
        F.sum("p_contrib").alias("n_contributors"),  # salt groups disjoint
        F.sum("p_anons").alias("n_anons"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-factor", type=int, default=10)
    ap.add_argument("--hot-share", type=float, default=0.9)
    ap.add_argument("--user-factor", type=int, default=200)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("skew-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = os.path.join(BENCH_DIR, "skew_rc")
    generate(spark, args.sf_dir, out, args.rows_factor, args.hot_share,
             args.user_factor)
    rc = spark.read.parquet(out)
    n = rc.count()
    hot_n = rc.filter(F.col("title") == "Page_HOT").count()

    def two_level(e):
        return aggregate_classified(e, with_collections=False)

    variants = {
        "naive_aqe_off": (naive_single_level, "false"),
        "naive_aqe_on": (naive_single_level, "true"),
        "two_level": (two_level, "true"),
        "salted": (salted, "true"),
    }
    results: dict[str, list[float]] = {k: [] for k in variants}
    checks: dict[str, tuple] = {}
    for _ in range(4):  # pass 0 = warmup
        for name, (fn, aqe) in variants.items():
            spark.conf.set("spark.sql.adaptive.enabled", aqe)
            df = fn(classified_edit_events(rc))
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            results[name].append(round(time.perf_counter() - t0, 3))
            if name not in checks:
                hot_row = df.filter(F.col("title") == "Page_HOT").first()
                checks[name] = (hot_row["edits"], hot_row["n_contributors"])
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert len(set(checks.values())) == 1, f"variants disagree: {checks}"

    print(json.dumps({
        "metric": "skew90_page_state_wall_seconds",
        "rows": n, "hot_rows": hot_n,
        "hot_row_check": checks["two_level"],
        "variants": {k: {"median": round(statistics.median(v[1:]), 3),
                         "samples": v[1:]} for k, v in results.items()},
    }))
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
