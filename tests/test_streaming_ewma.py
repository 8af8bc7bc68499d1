"""Batch-stream equivalence for the streaming EWMA
(streaming/ewma.py): replaying the events table as ordered
micro-batches through the keyed stateful stage must emit, for every
finalizable hour, exactly the batch hourly_ewma row — the recurrence
genuinely threads through the state store across micro-batches.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wikitrender_spark.operators.derive import read_events_raw
from wikitrender_spark.plans import relational_queries as R
from wikitrender_spark.streaming import ewma as sewma

SF_DIR = "/root/testdata/sf0.001"
EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_alpha_matches_batch_constant():
    assert sewma.ALPHA == R.EWMA_ALPHA


def _chunked_events_stream(spark, work_dir, n_chunks=4):
    ev = read_events_raw(spark, SF_DIR).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    n_rows = ev.count()
    step = max(1, (n_rows + n_chunks - 1) // n_chunks)
    ranked = ev.withColumn(
        "_rn", F.row_number().over(Window.orderBy("ts", "event_id")) - 1
    )
    chunk_dir = os.path.join(work_dir, "ev_chunks")
    for i in range(n_chunks):
        part = ranked.filter(
            (F.col("_rn") >= i * step) & (F.col("_rn") < (i + 1) * step)
        ).drop("_rn")
        path = os.path.join(chunk_dir, f"chunk_{i:04d}")
        part.coalesce(1).write.mode("overwrite").parquet(path)
        ts = time.time() + i
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))
    return (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )


def test_streaming_ewma_equals_batch_on_finalizable_hours(spark, tmp_path):
    stream = _chunked_events_stream(spark, str(tmp_path))
    q = (
        sewma.streaming_hourly_ewma(stream)
        .writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["event_type"], r["hour"]): (r["n_events"], r["ewma"])
        for r in spark.sql("select * from ewma_out").collect()
    }
    assert got, "stream emitted nothing"

    ev = read_events_raw(spark, SF_DIR)
    # the operator's high-water mark is per KEY (each type's own last
    # event), so the finalization horizon is per event_type too
    horizons = {
        r["event_type"]: r["mx"] - sewma.DELAY_US
        for r in ev.groupBy("event_type")
        .agg(F.max(F.unix_micros("ts")).alias("mx"))
        .collect()
    }
    batch = R.hourly_ewma(ev)
    expected = {
        (r["event_type"], r["hour"]): (r["n_events"], r["ewma"])
        for r in batch.collect()
        if (r["hour"].timestamp() * 1_000_000 + sewma.HOUR_US)
        <= horizons[r["event_type"]]
    }
    assert set(got) == set(expected)
    for k, (n, e) in expected.items():
        gn, ge = got[k]
        assert gn == n, k
        # batch rounds to 6; the stream emits the raw recurrence value
        assert ge == pytest.approx(e, abs=5e-7), k
    # state genuinely crossed micro-batches: more than one hour emitted
    # per type, in strictly increasing hour order per type
    by_type = {}
    for (t, h) in sorted(got):
        by_type.setdefault(t, []).append(h)
    assert all(len(v) > 10 for v in by_type.values())
