"""Dump .explain("formatted") for registry queries and summarize plan
shape (Exchange count, join strategies, Python-boundary nodes, scan
pushdown) — the round-16 optimization round's measurement tool
(spark_optimization_guide.md §1: capture the plan before and after).

Usage: python tools/plan_probe.py <outdir> <tag> [query ...]
       python tools/plan_probe.py plans/r16 before wt_page_state ...

Writes <outdir>/<query>_<tag>.txt with the formatted plan, and prints a
one-line shape summary per query: exchanges, joins, python nodes.
Construction runs eagerly (localCheckpoints, driver loops included), so
heavy queries cost real compute here — this is a measurement tool, not a
free lint.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wikitrender_spark.plans import registry
from wikitrender_spark.session import get_spark


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def shape_summary(text: str) -> str:
    n_ex = len(re.findall(r"^\s*[+:*-]*\s*\(?\d+\)? Exchange", text, re.M))
    n_ex = text.count(" Exchange")
    joins = re.findall(
        r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)", text
    )
    py = re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"FlatMapGroupsInPandas|MapInArrow)", text)
    aggs = re.findall(r"(HashAggregate|SortAggregate|ObjectHashAggregate)", text)
    from collections import Counter
    cj, cp, ca = Counter(joins), Counter(py), Counter(aggs)
    return (
        f"exchanges={n_ex} joins={dict(cj)} python={dict(cp)} aggs={dict(ca)}"
    )


def main() -> int:
    outdir, tag = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-probe", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    spark.sparkContext.setLogLevel("ERROR")
    queries = registry.all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            text = plan_text(df)
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {exc}")
            continue
        path = os.path.join(outdir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"{name}: {shape_summary(text)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
