"""Round-17 scale-adaptive state-partition sizing (streaming/sizing.py):
the derivation math, the env overrides, the conf scoping, and — the
load-bearing claim — that a started streaming query actually runs its
stateful operator at the scoped partition count while the outer session
conf is restored."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from wikitrender_spark.streaming import sizing


def test_derivation_clamps_both_ways(monkeypatch):
    monkeypatch.delenv(sizing.STATE_PARTITIONS_ENV, raising=False)
    monkeypatch.delenv(sizing.STATE_TARGET_BYTES_ENV, raising=False)
    monkeypatch.delenv(sizing.STATE_PARTITIONS_MAX_ENV, raising=False)
    t = sizing.STATE_TARGET_BYTES_DEFAULT
    assert sizing.adaptive_state_partitions(0) == 1
    assert sizing.adaptive_state_partitions(1) == 1
    assert sizing.adaptive_state_partitions(t) == 1
    assert sizing.adaptive_state_partitions(t + 1) == 2
    assert sizing.adaptive_state_partitions(10 * t) == 10
    # a 100 TB replay derives the cap, not a local-core-shaped number
    assert (
        sizing.adaptive_state_partitions(100 << 40)
        == sizing.STATE_PARTITIONS_MAX_DEFAULT
    )


def test_python_heavy_target_is_smaller(monkeypatch):
    monkeypatch.delenv(sizing.STATE_PARTITIONS_ENV, raising=False)
    monkeypatch.delenv(sizing.PY_STATE_TARGET_BYTES_ENV, raising=False)
    two_mb = 2 << 20
    assert sizing.adaptive_state_partitions(two_mb) == 1
    assert sizing.adaptive_state_partitions(two_mb, python_heavy=True) == 16


def test_env_overrides(monkeypatch):
    monkeypatch.setenv(sizing.STATE_PARTITIONS_ENV, "7")
    assert sizing.adaptive_state_partitions(1 << 40) == 7
    assert sizing.adaptive_state_partitions(0, python_heavy=True) == 7
    monkeypatch.delenv(sizing.STATE_PARTITIONS_ENV)
    monkeypatch.setenv(sizing.STATE_TARGET_BYTES_ENV, str(1 << 10))
    assert sizing.adaptive_state_partitions(10 << 10) == 10


def test_dir_bytes_counts_tree(tmp_path):
    (tmp_path / "a").write_bytes(b"x" * 10)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "b").write_bytes(b"y" * 5)
    assert sizing.dir_bytes(str(tmp_path)) == 15
    assert sizing.dir_bytes(str(tmp_path / "a")) == 10


def test_conf_scoped_and_restored(spark):
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    with sizing.state_partition_conf(spark, 3):
        assert spark.conf.get(key) == "3"
    assert spark.conf.get(key) == before
    with pytest.raises(RuntimeError):
        with sizing.state_partition_conf(spark, 3):
            raise RuntimeError("boom")
    assert spark.conf.get(key) == before  # restored on error too
    with sizing.state_partition_conf(spark, None):
        assert spark.conf.get(key) == before  # None is a no-op


def test_started_query_uses_scoped_count(spark):
    """A drain started under the scoped conf runs its stateful operator
    at that partition count (the engine reports it per progress under
    stateOperators[].numShufflePartitions), and the result matches the
    session-default run row-for-row — partition count must never change
    WHAT is computed."""
    from wikitrender_spark.streaming.dedup import drain_to_memory

    src_dir = tempfile.mkdtemp(prefix="sizing_src_")
    spark.range(100).select(
        (F.col("id") % 40).alias("k"), F.col("id").alias("v")
    ).coalesce(1).write.mode("overwrite").parquet(src_dir)

    def run(n):
        ckpt = tempfile.mkdtemp(prefix="sizing_ckpt_")
        stream = (
            spark.readStream.schema("k long, v long").parquet(src_dir)
        ).dropDuplicates(["k"])
        out = drain_to_memory(
            stream, f"sizing_probe_{n or 'def'}", ckpt, state_partitions=n
        )
        # the drain's query has terminated; read its last progress off
        # the most recently finished query is no longer reachable — so
        # assert via the conf-independent result and the scoped-count
        # run below, which inspects the running query's progress.
        return {r["k"] for r in out.select("k").collect()}

    assert run(2) == run(None) == set(range(40))

    # inspect a live query's reported state partition count
    ckpt = tempfile.mkdtemp(prefix="sizing_ckpt_live_")
    stream = (
        spark.readStream.schema("k long, v long").parquet(src_dir)
    ).dropDuplicates(["k"])
    with sizing.state_partition_conf(spark, 2):
        q = (
            stream.writeStream.format("memory")
            .queryName("sizing_probe_live")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    ops = [p for p in (q.lastProgress or {}).get("stateOperators", [])]
    assert ops, "no state operator progress reported"
    assert ops[0]["numShufflePartitions"] == 2
    spark.catalog.dropTempView("sizing_probe_live")
    spark.catalog.dropTempView("sizing_probe_def")
    spark.catalog.dropTempView("sizing_probe_2")


def test_replay_scan_split_derivation(spark, monkeypatch):
    monkeypatch.delenv(sizing.REPLAY_SPLIT_BYTES_ENV, raising=False)
    par = max(1, spark.sparkContext.defaultParallelism)
    # tiny replay input clamps to the 1 MiB floor (local behavior
    # unchanged: single-digit tasks per chunk)
    assert sizing.replay_scan_split(spark, 2 << 20) == 1 << 20
    # huge input clamps to the 128 MiB ceiling (cluster default)
    assert sizing.replay_scan_split(spark, 100 << 40) == 128 << 20
    # mid-range derives input/(2*parallelism)
    mid = (4 << 20) * 2 * par
    assert sizing.replay_scan_split(spark, mid) == 4 << 20
    monkeypatch.setenv(sizing.REPLAY_SPLIT_BYTES_ENV, str(8 << 20))
    assert sizing.replay_scan_split(spark, 0) == 8 << 20


def test_conf_scopes_scan_split_too(spark):
    key = "spark.sql.files.maxPartitionBytes"
    before = spark.conf.get(key)
    with sizing.state_partition_conf(spark, 2, 4 << 20):
        assert spark.conf.get(key) == str(4 << 20)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "2"
    assert spark.conf.get(key) == before
