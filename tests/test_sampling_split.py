"""Hand-computed and invariant tests for the sessionization, stratified
sampling, and leakage-safe split queries (plans/relational_queries.
q_sessionize, plans/pipeline_queries.q_stratified_sample /
q_leakage_split). Expected values are derived by hand in comments or
recomputed independently (hashlib md5, naive single-window reference).
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wikitrender_spark.operators import dedup
from wikitrender_spark.plans.pipeline_queries import (
    SAMPLE_K,
    SPLIT_MULT,
    SPLIT_OFFSET,
    q_leakage_split,
    q_stratified_sample,
)
from wikitrender_spark.plans.relational_queries import q_sessionize

SF001 = "/root/testdata/sf0.001"
US = 1_000_000
T0 = dt.datetime(2026, 1, 1, 0, 0, 0)
T0_US = int(dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc).timestamp()) * US


def _write_events(tmp_path, rows):
    # rows: (event_id, user_id, minutes-from-T0)
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                [T0 + dt.timedelta(minutes=r[2]) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_sessionize_hand_computed(spark, tmp_path):
    # user 1: events at 0h, 1h, 2h (gaps 1h -> one session), then 11h,
    # 11h30 (9h gap > the 8h threshold -> a second session);
    # user 2: one event at 0h (singleton session).
    sf = _write_events(
        tmp_path,
        [
            (1, 1, 0),
            (2, 1, 60),
            (3, 1, 120),
            (4, 1, 660),
            (5, 1, 690),
            (6, 2, 0),
        ],
    )
    got = [tuple(r) for r in q_sessionize(spark, sf).collect()]
    h = 3600 * US
    assert got == [
        # (user_id, start_us, end_us, n_events, duration_us, rank)
        (1, T0_US, T0_US + 2 * h, 3, 2 * h, 1),
        (1, T0_US + 11 * h, T0_US + 11 * h + 30 * 60 * US, 2, 30 * 60 * US, 2),
        (2, T0_US, T0_US, 1, 0, 3),
    ]


def test_sessionize_gap_exactly_at_threshold_stays_one_session(
    spark, tmp_path
):
    # 8h00m gap is NOT > threshold -> same session; 8h01m gap splits
    sf = _write_events(
        tmp_path, [(1, 1, 0), (2, 1, 480), (3, 1, 480 + 481)]
    )
    got = [tuple(r) for r in q_sessionize(spark, sf).collect()]
    assert [(r[0], r[3]) for r in got] == [(1, 2), (1, 1)]


def _write_docs(tmp_path, rows):
    # rows: (doc_id, lang, source, n_chars)
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_stratified_sample_hand_computed(spark, tmp_path):
    # stratum (en, s0): 20 docs -> cut at SAMPLE_K by md5(str(doc_id))
    # order; stratum (de, s1): 3 docs -> all kept, ranks 1..3
    rows = [(i, "en", "s0", 10 + i) for i in range(20)]
    rows += [(i, "de", "s1", 10 + i) for i in (100, 101, 102)]
    sf = _write_docs(tmp_path, rows)
    got = {
        (r.lang, r.source, r.rk): r.doc_id
        for r in q_stratified_sample(spark, sf).collect()
    }
    en_order = sorted(
        range(20), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )
    for rk, doc in enumerate(en_order[:SAMPLE_K], start=1):
        assert got[("en", "s0", rk)] == doc
    de_order = sorted(
        (100, 101, 102),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    assert [got[("de", "s1", rk)] for rk in (1, 2, 3)] == de_order
    assert len(got) == SAMPLE_K + 3


def test_stratified_two_phase_equals_single_window(spark):
    # the salted two-phase cut is EXACT: same rows and ranks as the
    # naive one-window-per-stratum reference on real driver data
    got = {
        (r.lang, r.source, r.rk, r.doc_id)
        for r in q_stratified_sample(spark, SF001).collect()
    }
    d = spark.read.parquet(f"{SF001}/documents.parquet").select(
        "lang", "source", "doc_id"
    )
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ref = {
        (r.lang, r.source, r.rk, r.doc_id)
        for r in d.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= SAMPLE_K)
        .collect()
    }
    assert got == ref


def _split_of(x: int) -> str:
    b = (x * SPLIT_MULT + SPLIT_OFFSET) % 1000003 % 100
    return "train" if b < 90 else ("val" if b < 95 else "test")


@pytest.fixture(scope="module")
def leakage_inputs(spark):
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    pairs = [
        (r.doc_a, r.doc_b) for r in dedup.near_duplicates(docs).collect()
    ]
    clusters = {
        r.doc_id: r.cluster_id
        for r in dedup.duplicate_clusters(docs).collect()
    }
    return docs, pairs, clusters


def test_leakage_split_never_straddles_near_dup_pairs(leakage_inputs):
    docs, pairs, clusters = leakage_inputs
    assert pairs, "sf0.001 must contain near-dup pairs for this test"
    for a, b in pairs:
        ga, gb = clusters[a], clusters[b]
        assert _split_of(ga) == _split_of(gb)  # same group -> same split
    # ... while the DOC-level rule provably straddles at least one pair
    assert any(_split_of(a) != _split_of(b) for a, b in pairs)


def test_leakage_split_totals_and_moved_column(spark, leakage_inputs):
    docs, _pairs, clusters = leakage_inputs
    out = {r.split: r for r in q_leakage_split(spark, SF001).collect()}
    n_docs_total = docs.count()
    assert sum(r.n_docs for r in out.values()) == n_docs_total
    assert sum(r.n_clustered for r in out.values()) == len(clusters)
    # n_moved recomputed independently: docs whose cluster rep routes
    # them to a different split than their own id would
    moved = sum(
        1 for d, g in clusters.items() if _split_of(g) != _split_of(d)
    )
    assert sum(r.n_moved for r in out.values()) == moved
    assert moved >= 1  # the operator must actually change assignments
