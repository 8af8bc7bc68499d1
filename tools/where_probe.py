"""Where does a query's wall time go? Splits each named registry query
into CONSTRUCTION (queries()[name](spark, sf_dir) — py4j Column
building, any eager checkpoint jobs, driver loops) and EXECUTION (noop
sink save of the returned DataFrame), and reports both plus the Spark
job count each phase submitted (jobs are serial barriers at bench
scale — guide §1/§2.6). Median of 3 after one warm pass.

Usage: python tools/where_probe.py QUERY [QUERY ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikitrender_spark.plans import registry
from wikitrender_spark.session import get_spark


def main() -> None:
    names = sys.argv[1:]
    queries = registry.all_queries()
    unknown = [n for n in names if n not in queries]
    if unknown or not names:
        sys.exit(f"usage: where_probe.py QUERY...; unknown={unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("where-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    def job_count() -> int:
        # DAGScheduler.nextJobId is the total jobs ever submitted; Scala
        # access modifiers are invisible to py4j's Java reflection.
        try:
            return sc._jsc.sc().dagScheduler().nextJobId().get()
        except Exception:  # noqa: BLE001 — probe-only fallback
            return 0

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        fn = queries[name]
        cons, execs, jobs_c, jobs_e = [], [], 0, 0
        for it in range(4):  # pass 0 = warm, excluded
            j0 = job_count()
            sc.setJobDescription(f"{name}: construction")
            t0 = time.monotonic()
            df = fn(spark, sf_dir)
            t1 = time.monotonic()
            j1 = job_count()
            sc.setJobDescription(f"{name}: execution")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            j2 = job_count()
            sc.setJobDescription(None)
            if it:
                cons.append(t1 - t0)
                execs.append(t2 - t1)
                jobs_c, jobs_e = j1 - j0, j2 - j1
        print(
            f"{name:32s} construct={statistics.median(cons):6.3f}s"
            f" (jobs={jobs_c:3d})  execute={statistics.median(execs):6.3f}s"
            f" (jobs={jobs_e:3d})"
        )


if __name__ == "__main__":
    main()
