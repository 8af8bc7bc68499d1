"""State-store provider probe (r05 ask #7): run the three stateful
streaming pipelines — keyed page-state changelog, SpaceSaving heavy
hitters, hourly EWMA — at sf1 under BOTH state-store providers
(default HDFS-backed in-memory vs RocksDB) and report wall/throughput.

Why: the production deployment story for large keyed state is the
RocksDB provider (state off-heap, on local SSD, changelog-checkpointed)
— at 100 TB-of-ingest the page/digest keyspace outgrows executor heap.
The probe makes "the engine runs unmodified on RocksDB state" a
measured fact rather than a claim, and puts a number on the provider
swap at bench scale.

Usage: python tools/rocksdb_probe.py [sf_dir] [n_chunks]
(default .benchdata/sf1 — generate with tools/scale_probe.py — and 8)
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

from wikitrender_spark.operators.derive import move_closed_group, read_events_raw
from wikitrender_spark.session import get_spark
from wikitrender_spark.sources import replay
from wikitrender_spark.streaming import ewma, heavyhitters, processor
from wikitrender_spark.streaming.processor_tws import ROCKSDB_PROVIDER

PROVIDERS = {
    "hdfs_default": None,  # Spark's HDFSBackedStateStoreProvider
    "rocksdb": ROCKSDB_PROVIDER,
}


def _drain(stream_df, ckpt: str, mode: str) -> float:
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return time.perf_counter() - t0


def run_pipelines(spark, sf_dir: str, n_chunks: int) -> dict:
    out = {}
    with tempfile.TemporaryDirectory() as d:
        cl = processor.page_state_changelog(
            replay.chunked_event_stream(spark, sf_dir, d + "/src", n_chunks=n_chunks),
            move_closed_group(),
        )
        out["page_state"] = _drain(cl, d + "/ckpt", "update")
    # reuse the replay module's schema pair + footer probe so the legacy
    # INT64-nanos events vintage keeps working here too
    legacy = replay._events_ts_is_legacy(sf_dir)
    schema = replay.EVENTS_SCHEMA_LEGACY_NANOS if legacy else replay.EVENTS_SCHEMA
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if legacy:
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    with tempfile.TemporaryDirectory() as d:
        hh = heavyhitters.heavy_hitter_stream(
            raw.select(
                F.col("event_type").alias("key"),
                F.col("user_id").cast("string").alias("item"),
            ),
            capacity=1024,
        )
        out["heavy_hitters"] = _drain(hh, d + "/ckpt", "update")
    with tempfile.TemporaryDirectory() as d:
        ew = ewma.streaming_hourly_ewma(raw.select("event_type", "ts"))
        out["hourly_ewma"] = _drain(ew, d + "/ckpt", "append")
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".benchdata", "sf1",
    )
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("rocksdb-probe")
    spark.sparkContext.setLogLevel("ERROR")
    n_events = read_events_raw(spark, sf_dir).count()
    results = {}
    for tag, provider in PROVIDERS.items():
        if provider is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", provider
            )
        secs = run_pipelines(spark, sf_dir, n_chunks)
        results[tag] = {
            k: {
                "seconds": round(v, 2),
                "events_per_sec": round(n_events / v),
            }
            for k, v in secs.items()
        }
    print(json.dumps({
        "metric": "state_store_provider_probe",
        "sf_dir": sf_dir,
        "n_events": n_events,
        "n_chunks": n_chunks,
        **results,
    }))


if __name__ == "__main__":
    main()
