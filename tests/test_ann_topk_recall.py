"""Recall contracts for the ANN top-k operators, against the registered
brute-force ground truth (ann.brute_force_topk).

On planted clustered data (the regime ANN indexes exist for), IVF must
achieve near-perfect recall: cells are cluster-seeded, so a query's true
neighbors share its cell and nprobe>=1 scans it. Single-bucket LSH top-k
is the cheap coarse filter — its recall is governed by the all-8-planes
collision probability p^8 (p = 1 - theta/pi), ~0.2-0.3 even for tight
clusters — asserted as a band, with the multi-band (band-OR) recall path
living in embedding_near_duplicates. Corpus-measured values (sf0.01,
near-random vectors: IVF 0.38, LSH 0.08) are documented in
operators/ann.py.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from wikitrender_spark.operators import ann

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)

N_CLUSTERS = 16
PER_CLUSTER = 15
K = 10
QUERY_IDS = [0, 15, 30, 45, 60]  # one member of each of 5 clusters


@pytest.fixture(scope="module")
def clustered(spark):
    """16 clusters x 15 vectors (within-cluster cosine ~0.5-0.6, well
    above this dimension's noise floor); label = true cluster."""
    rng = np.random.default_rng(7)
    rows = []
    i = 0
    for c in range(N_CLUSTERS):
        center = rng.standard_normal(ann.EMB_DIM)
        center /= np.linalg.norm(center)
        for _ in range(PER_CLUSTER):
            v = center + rng.standard_normal(ann.EMB_DIM) * 0.12
            rows.append((i, [float(x) for x in v], c))
            i += 1
    return spark.createDataFrame(rows, SCHEMA)


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_ivf_recall_on_clustered_data(clustered):
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    ivf = _pairs(ann.ivf_topk(clustered, QUERY_IDS, K))
    assert len(bf) == len(QUERY_IDS) * K
    recall = len(ivf & bf) / len(bf)
    assert recall >= 0.95, f"IVF recall {recall:.3f} < 0.95 on clustered data"


def test_lsh_bucket_recall_band(clustered):
    """Single-bucket LSH is the coarse filter: recall bounded by the
    8-plane full-collision probability — assert the documented band, and
    that everything it returns is a true result ranked within bucket."""
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    lsh = _pairs(ann.lsh_bucketed_topk(clustered, QUERY_IDS, K))
    recall = len(lsh & bf) / len(bf)
    assert 0.05 <= recall <= 0.7, f"LSH bucket recall {recall:.3f} drifted"


def test_ivf_exact_when_nprobe_covers_all_cells(clustered):
    """nprobe = n_cells degrades IVF to exact search: recall 1.0 by
    construction — the knob's contract, pinned."""
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    ivf_all = _pairs(
        ann.ivf_topk(clustered, QUERY_IDS, K, nprobe=N_CLUSTERS)
    )
    assert ivf_all == bf


def test_ivfpq_shortlist_reranking_restores_recall(clustered):
    """IVF-PQ contract pair: the codebooks are cluster-mean slices, so
    same-cluster members share codes and the plain ADC cut ranks within
    a cell near-arbitrarily; shortlist re-ranking (Jégou et al. 2011 §V,
    R > k) exact-rescores the ADC shortlist and restores recall. Pinned
    at sf1 scale in tools/ann_recall_probe.py; this is the small planted
    fixture version."""
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    adc = _pairs(ann.ivf_pq_topk(clustered, QUERY_IDS, K))
    sl = _pairs(
        ann.ivf_pq_topk(clustered, QUERY_IDS, K, shortlist=2 * PER_CLUSTER)
    )
    r_adc = len(adc & bf) / len(bf)
    r_sl = len(sl & bf) / len(bf)
    assert r_sl >= 0.9, f"shortlist recall {r_sl:.3f} < 0.9"
    assert r_sl >= r_adc, (r_sl, r_adc)


def test_rp_shortlist_reranking_restores_recall(clustered):
    """RP contract pair (the JL analogue of the IVF-PQ pair): the
    projection preserves cluster membership but not intra-cluster
    micro-distances, so plain projected-rank-then-cut recall is low;
    shortlist re-ranking with R scaled to the corpus (a GLOBAL projected
    scan has no cell restriction, so fixed R leaks as N grows — the
    corpus-scaled contract lives in tools/ann_recall_probe.py) restores
    it. On 240 vectors R = N/3 suffices."""
    n = N_CLUSTERS * PER_CLUSTER
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    plain = _pairs(ann.rp_topk(clustered, QUERY_IDS, K))
    sl = _pairs(ann.rp_topk(clustered, QUERY_IDS, K, shortlist=n // 3))
    r_plain = len(plain & bf) / len(bf)
    r_sl = len(sl & bf) / len(bf)
    assert r_sl >= 0.9, f"RP shortlist recall {r_sl:.3f} < 0.9"
    assert r_sl >= r_plain, (r_sl, r_plain)


def test_ivf_rp_composed_recall_with_fixed_shortlist(clustered):
    """Composed IVF+RP (r07 ask #7): the coarse quantizer bounds the
    candidate pool at nprobe x cell size, so a FIXED re-rank depth of
    1.5x the cell size suffices — the corpus-scaled R the standalone RP
    contract needs is exactly what the composition removes (the 50k
    measurement lives in tools/ann_recall_probe.py)."""
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    composed = _pairs(ann.ivf_rp_topk(
        clustered, QUERY_IDS, K, shortlist=PER_CLUSTER * 3 // 2
    ))
    recall = len(composed & bf) / len(bf)
    assert recall >= 0.9, f"IVF+RP recall {recall:.3f} < 0.9"


def test_filtered_ivf_exact_when_all_cells_probed(clustered, spark):
    """ann_filtered_topk contract: with nprobe covering every cell, the
    predicate-pushdown IVF search equals the exact filtered ranking
    (every pred-passing corpus vector scored per query) — and every
    returned neighbor satisfies the predicate."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window

    pred = F.col("label") % 2 == 0
    got = ann.filtered_ivf_topk(
        clustered, QUERY_IDS, pred, K, nprobe=N_CLUSTERS
    )
    got_pairs = _pairs(got)

    qdf = spark.createDataFrame([(q,) for q in QUERY_IDS], "query_id long")
    cand = (
        clustered.filter(pred)
        .select(F.col("vec_id").alias("neighbor_id"))
        .crossJoin(qdf)
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = ann._exact_rescore(cand, clustered, QUERY_IDS)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    exp = _pairs(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
    )
    assert got_pairs == exp
    # the predicate genuinely bites: some unfiltered top-k pairs are gone
    bf = _pairs(ann.brute_force_topk(clustered, QUERY_IDS, K))
    assert bf - got_pairs
    # and every neighbor satisfies it
    even = {r["vec_id"] for r in clustered.filter(pred).collect()}
    assert {n for _q, n in got_pairs} <= even


def test_filtered_expand_fills_k_where_fixed_nprobe_underfills(
    clustered, spark
):
    """ann_filtered_expand contract (VERDICT r8 ask #3): under a
    high-selectivity predicate (one far cluster, 15 of 240 vectors) the
    fixed-nprobe form under-fills — some query returns < K rows — while
    the adaptive form probes cells in centroid-rank order until >= K
    filtered candidates accumulate and returns EXACTLY K rows per query,
    matching exact filtered brute force (the 15 survivors share one
    cluster-seeded cell, so the expanded probe set contains them all)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pred = F.col("label") == 12  # no query belongs to cluster 12
    fixed = ann.filtered_ivf_topk(clustered, QUERY_IDS, pred, K)
    fixed_counts = {
        r["query_id"]: r["count"]
        for r in fixed.groupBy("query_id").count().collect()
    }
    assert any(fixed_counts.get(q, 0) < K for q in QUERY_IDS), (
        "fixture drifted: fixed nprobe no longer under-fills", fixed_counts
    )

    got = ann.filtered_ivf_expand_topk(clustered, QUERY_IDS, pred, K)
    counts = {
        r["query_id"]: r["count"]
        for r in got.groupBy("query_id").count().collect()
    }
    assert counts == {q: K for q in QUERY_IDS}, counts

    # exactness floor: equal to brute force over the filtered corpus
    qdf = spark.createDataFrame([(q,) for q in QUERY_IDS], "query_id long")
    cand = (
        clustered.filter(pred)
        .select(F.col("vec_id").alias("neighbor_id"))
        .crossJoin(qdf)
        .filter(F.col("neighbor_id") != F.col("query_id"))
    )
    scored = ann._exact_rescore(cand, clustered, QUERY_IDS)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    exp = _pairs(
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
    )
    got_pairs = _pairs(got)
    recall = len(got_pairs & exp) / len(exp)
    assert recall >= 0.9, f"expanded filtered recall {recall:.3f} < 0.9"
