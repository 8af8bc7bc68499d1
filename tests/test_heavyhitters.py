"""SpaceSaving streaming heavy hitters (streaming/heavyhitters.py):
multi-trigger equivalence with batch counts when capacity is ample, and
the classic bound invariants (est upper bound, est-err lower bound,
guaranteed tracking above N/capacity) when it is not."""

from __future__ import annotations

import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from wikitrender_spark.streaming import heavyhitters as hh

ITEM_SCHEMA = "key string, item string, ord long"


def _chunked_items(spark, work_dir, rows, n_chunks=3):
    """rows = [(key, item)] replayed in order across n_chunks files."""
    chunk_dir = os.path.join(work_dir, "hh_chunks")
    step = (len(rows) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        part = rows[i * step : (i + 1) * step]
        df = spark.createDataFrame(
            [(k, it, j) for j, (k, it) in enumerate(part)], ITEM_SCHEMA
        )
        path = os.path.join(chunk_dir, f"chunk_{i:04d}")
        df.coalesce(1).write.mode("overwrite").parquet(path)
        ts = time.time() + i
        for root, _dirs, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (ts, ts))
    return (
        spark.readStream.schema(ITEM_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
        .select("key", "item")
    )


def _run(spark, tmp_path, rows, capacity, name):
    stream = _chunked_items(spark, str(tmp_path), rows)
    emissions = hh.run_to_memory(
        hh.heavy_hitter_stream(stream, capacity),
        name,
        str(tmp_path / f"{name}_ckpt"),
    )
    latest = emissions.withColumn(
        "_mx", F.max("n_updates").over(Window.partitionBy("key"))
    ).filter(F.col("n_updates") == F.col("_mx"))
    return {
        (r["key"], r["item"]): (r["est"], r["err"])
        for r in latest.collect()
    }


def test_exact_when_capacity_ample_across_triggers(spark, tmp_path):
    rows = []
    for i in range(300):
        rows.append(("a", f"x{i % 7}"))
        if i % 3 == 0:
            rows.append(("b", f"y{i % 5}"))
    got = _run(spark, tmp_path, rows, capacity=64, name="hh_exact")
    true = {}
    for k, it in rows:
        true[(k, it)] = true.get((k, it), 0) + 1
    assert set(got) == set(true)
    for key, (est, err) in got.items():
        assert err == 0, key
        assert est == true[key], key
    # the summary genuinely crossed micro-batches: every item appears in
    # all 3 chunks, so per-chunk counts alone could never reach these
    assert max(est for est, _ in got.values()) > 40


def test_bounded_capacity_invariants(spark, tmp_path):
    # skewed single-key stream: 3 heavy items + a light tail, capacity
    # 5. Every hot's true count exceeds N/capacity (500/5 = 100), so
    # SpaceSaving GUARANTEES all three are tracked; tail slots churn
    # with est <= ~|tail| = 30, far under the hots' 120+ — the top-3
    # assertion below is therefore an actual guarantee, not luck.
    rows = []
    for i in range(200):
        rows.append(("k", "hot1"))
        if i % 4 != 3:
            rows.append(("k", "hot2"))  # 150
        if i % 5 != 4:
            rows.append(("k", "hot3"))  # 160
    rows += [("k", f"tail{i}") for i in range(30)]
    cap = 5
    got = _run(spark, tmp_path, rows, capacity=cap, name="hh_bounded")
    true = {}
    for k, it in rows:
        true[(k, it)] = true.get((k, it), 0) + 1
    n = len(rows)
    assert len(got) <= cap
    for key, (est, err) in got.items():
        t = true[key]
        assert est >= t, key                  # upper bound
        assert est - err <= t, key            # lower bound
    # guaranteed tracking: every item with true count > N/capacity
    for key, t in true.items():
        if t > n / cap:
            assert key in got, (key, t, n / cap)
    # the heavies rank first in the collapsed top-k
    top = {(r["key"], r["item"]) for r in hh.final_topk(
        spark.table("hh_bounded"), 3
    ).collect()}
    assert top == {("k", "hot1"), ("k", "hot2"), ("k", "hot3")}


def test_replay_determinism(spark, tmp_path):
    rows = [("k", f"i{(j * 7) % 11}") for j in range(150)]
    a = _run(spark, tmp_path / "a", rows, capacity=4, name="hh_det_a")
    b = _run(spark, tmp_path / "b", rows, capacity=4, name="hh_det_b")
    assert a == b


# --- pure-algorithm property tests (no Spark session) -----------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=30), max_size=400),
    capacity=st.integers(min_value=1, max_value=12),
    split=st.integers(min_value=0, max_value=400),
)
def test_spacesaving_invariants_hold_for_any_stream(stream, capacity, split):
    # fold in two chunks (the micro-batch boundary) — invariants must
    # hold regardless of where the state crosses a trigger
    summary = {}
    items = [f"i{x}" for x in stream]
    hh.spacesaving_update(summary, items[:split], capacity)
    hh.spacesaving_update(summary, items[split:], capacity)
    true = {}
    for it in items:
        true[it] = true.get(it, 0) + 1
    n = len(items)
    assert len(summary) <= capacity
    # total estimate mass equals the stream length exactly (SpaceSaving
    # conserves counts: every arrival nets +1 est, evictions included)
    assert sum(est for est, _ in summary.values()) == n
    for it, (est, err) in summary.items():
        t = true[it]
        assert est >= t, (it, est, t)            # upper bound
        assert est - err <= t, (it, est, err, t)  # lower bound
        assert 0 <= err < est or (err == 0 and est >= 1)
    # guaranteed tracking above N/capacity
    for it, t in true.items():
        if t > n / capacity:
            assert it in summary, (it, t, n / capacity)


@settings(max_examples=100, deadline=None)
@given(
    stream=st.lists(st.integers(min_value=0, max_value=10), max_size=200),
    capacity=st.integers(min_value=1, max_value=8),
)
def test_spacesaving_batch_split_invariance(stream, capacity):
    # folding the same stream with different micro-batch boundaries
    # yields the SAME summary (the state carries everything)
    items = [f"i{x}" for x in stream]
    one = {}
    hh.spacesaving_update(one, items, capacity)
    many = {}
    for i in range(0, len(items), 7):
        hh.spacesaving_update(many, items[i : i + 7], capacity)
    assert one == many


def _reference_scan_update(summary, items, capacity):
    """The original O(capacity)-per-eviction formulation — kept as the
    semantic reference the lazy-deletion-heap implementation must match
    byte for byte (same evict choice: min (count, item))."""
    for it in items:
        it = str(it)
        if it in summary:
            summary[it][0] += 1
        elif len(summary) < capacity:
            summary[it] = [1, 0]
        else:
            evict = min(summary, key=lambda x: (summary[x][0], x))
            m = summary.pop(evict)[0]
            summary[it] = [m + 1, m]


@given(
    stream=st.lists(st.integers(min_value=0, max_value=25), max_size=300),
    capacity=st.integers(min_value=1, max_value=8),
    chunks=st.lists(st.integers(min_value=1, max_value=40), min_size=1,
                    max_size=12),
)
@settings(max_examples=150, deadline=None)
def test_spacesaving_heap_matches_scan_reference(stream, capacity, chunks):
    """The heap-evicting fold must produce EXACTLY the reference scan's
    summary (est AND err) for any stream, any capacity, any chunking —
    the regression guard for the 71x eviction-path speedup (135 s ->
    1.9 s over 1M rows at the sf1 probe regime)."""
    a: dict = {}
    b: dict = {}
    i = 0
    ci = 0
    items = [str(x) for x in stream]
    while i < len(items):
        step = chunks[ci % len(chunks)]
        hh.spacesaving_update(a, items[i:i + step], capacity)
        _reference_scan_update(b, items[i:i + step], capacity)
        i += step
        ci += 1
    assert a == b
