"""Keyed stateful streaming throughput (BASELINE.md 'Measured'): replay
the sf0.1 events (100k) through page_state_changelog to a noop-ish sink
and report events/second — with and without the dead-group TTL path, so
the state-reclaim machinery's overhead is a measured number, not a guess.

Usage: python tools/throughput_bench.py [n_chunks]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from wikitrender_spark.operators.derive import move_closed_group, rc_events
from wikitrender_spark.session import get_spark
from wikitrender_spark.sources.replay import chunked_event_stream
from wikitrender_spark.streaming import processor

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_once(spark, work_dir: str, n_chunks: int,
             ttl_min: float | None) -> tuple[float, int]:
    stream = chunked_event_stream(spark, SF_DIR, work_dir, n_chunks=n_chunks)
    cl = processor.page_state_changelog(
        stream, move_closed_group(), dead_group_ttl_min=ttl_min
    )
    t0 = time.perf_counter()
    q = (
        cl.writeStream.format("noop")
        .outputMode("update")
        .option("checkpointLocation", work_dir + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dt = time.perf_counter() - t0
    n = rc_events(spark, SF_DIR).count()
    return dt, n


def main() -> None:
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    spark = get_spark("throughput-bench")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for tag, ttl in (("no_ttl", None), ("ttl_60min", 60.0)):
        with tempfile.TemporaryDirectory() as d:
            dt, n = run_once(spark, d, n_chunks, ttl)
        out[tag] = {"events": n, "seconds": round(dt, 2),
                    "events_per_sec": round(n / dt)}
    print(json.dumps({
        "metric": "keyed_stateful_throughput",
        "n_chunks": n_chunks,
        "sf_dir": SF_DIR,
        **out,
    }))


if __name__ == "__main__":
    main()
