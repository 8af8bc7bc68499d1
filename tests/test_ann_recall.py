"""Recall contract for the embedding near-dup sketch (VERDICT r3 #3).

Two claims from the operator docstrings, both asserted here against the
exact all-pairs ground truth (embedding_near_duplicates_exact):

1. In the regime near-dup detection targets (cosine >= 0.9), the pinned
   8x8 banding achieves recall >= 0.9 — shown on planted high-similarity
   pairs, since the synthetic corpus tops out at cosine ~0.5.
2. At the corpus's own operating point (threshold 0.4), the sketch is a
   documented partial-recall candidate generator: output is a strict
   subset of the exact pairs with recall in the theoretical ~0.19 band.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from wikitrender_spark.operators import ann

EMB_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, EMB_SCHEMA)


def _pairs(df):
    return {(r["vec_a"], r["vec_b"]) for r in df.collect()}


@pytest.fixture(scope="module")
def planted(spark):
    """240 vectors: 160 independent + 40 planted pairs at cosine ~0.95."""
    rng = np.random.default_rng(42)
    base = rng.standard_normal((160, ann.EMB_DIM))
    a = rng.standard_normal((40, ann.EMB_DIM))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    noise = rng.standard_normal((40, ann.EMB_DIM)) * 0.33 / np.sqrt(ann.EMB_DIM)
    b = a + noise  # cos(a, b) ~ 1/sqrt(1+0.33^2) ~ 0.95
    vecs = np.vstack([base, a, b])
    return _emb_df(spark, vecs)


def test_high_threshold_recall_at_least_090(planted):
    exact = _pairs(ann.embedding_near_duplicates_exact(planted, threshold=0.9))
    sketch = _pairs(ann.embedding_near_duplicates(planted, threshold=0.9))
    assert len(exact) >= 30, "planting failed: too few true pairs"
    assert sketch <= exact, "sketch must be a subset of the exact pairs"
    recall = len(sketch & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} < 0.9 at cosine 0.9"


def test_corpus_operating_point_recall_documented_band(spark, sf_dir="/root/testdata/sf0.001"):
    emb = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
    )
    exact = _pairs(ann.embedding_near_duplicates_exact(emb))
    sketch = _pairs(ann.embedding_near_duplicates(emb))
    assert sketch <= exact, "sketch must be a subset of the exact pairs"
    assert exact, "corpus has no pairs at the default threshold"
    recall = len(sketch) / len(exact)
    # theory: 1-(1-p^8)^8 ~ 0.18-0.30 over the 0.4-0.51 sim range of the
    # surviving pairs; fail if the sketch drifts materially from the
    # documented partial-recall band in either direction
    assert 0.03 <= recall <= 0.6, f"recall {recall:.3f} outside documented band"


def test_sketch_sim_values_match_exact(planted):
    """Surviving pairs carry bit-identical sims in both operators."""
    exact = {
        (r["vec_a"], r["vec_b"]): r["sim"]
        for r in ann.embedding_near_duplicates_exact(planted, threshold=0.9).collect()
    }
    for r in ann.embedding_near_duplicates(planted, threshold=0.9).collect():
        assert exact[(r["vec_a"], r["vec_b"])] == r["sim"]


def test_pq_sql_forms_match_column_reference(spark):
    """Round 16: the SQL-string PQ expressions (_pq_codes_sql,
    _pq_query_dists_sql, _adc_distance_sql) must be value-identical to
    the Column-built reference forms they replaced (pq_codes_column_folds
    / _pq_subdist / _adc_distance) — bit-exact doubles included."""
    from wikitrender_spark.functions import similarity as S
    from wikitrender_spark.schemas import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    cents = ann.ivf_centroids(emb).localCheckpoint()
    packed = cents.agg(
        F.array_sort(
            F.collect_list(F.struct("cell", "centroid"))
        ).alias("cs")
    )
    base = (
        emb.select(
            "vec_id", S.to_double(F.col("embedding")).alias("_emb_d")
        )
        .crossJoin(F.broadcast(packed))
    )
    diff = base.select(
        "vec_id",
        F.expr(ann._pq_codes_sql()).alias("sql_codes"),
        ann.pq_codes_column_folds().alias("col_codes"),
    ).filter(F.col("sql_codes") != F.col("col_codes"))
    assert diff.count() == 0

    # query-table subdists: SQL vs Column, every (m, cell) entry
    qd = (
        emb.limit(3)
        .select(
            "vec_id", S.to_double(F.col("embedding")).alias("_emb_d")
        )
        .crossJoin(F.broadcast(cents))
    )
    col_dists = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.col("cell").alias("cell"),
                ann._pq_subdist(
                    F.col("_emb_d"), F.col("centroid"), m
                ).alias("dist"),
            )
            for m in range(ann.PQ_M)
        ]
    )
    qdiff = qd.select(
        F.expr(ann._pq_query_dists_sql()).alias("s"),
        col_dists.alias("c"),
    ).filter(F.col("s") != F.col("c"))
    assert qdiff.count() == 0

    # ADC distance: SQL vs Column on real (codes, tab) rows
    codes = ann.pq_codes(emb, cents)
    qtab = ann._pq_query_tables(emb, [1, 2], cents)
    cand = codes.crossJoin(F.broadcast(qtab)).limit(500)
    adiff = cand.select(
        F.expr(ann._adc_distance_sql()).alias("s"),
        ann._adc_distance().alias("c"),
    ).filter(~F.col("s").eqNullSafe(F.col("c")))
    assert adiff.count() == 0
