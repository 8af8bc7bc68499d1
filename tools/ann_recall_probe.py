"""IVF / IVF-PQ / RP recall contracts at sf1 scale (VERDICT r4 #7).

The pinned recall tests (tests/test_ann_topk_recall.py) run on a
240-vector planted fixture; this probe replays the same contract at the
sf1-equivalent corpus size (50k vectors = 10x the sf0.1 embeddings
table) to guard nprobe / codebook drift that only shows up when cells
hold hundreds of members: deterministic planted clusters (seed 7),
label-seeded cells, recall of ivf_topk and ivf_pq_topk against the
brute-force ground truth on one query per sampled cluster.

Contracts:
- IVF >= 0.95 (cluster-seeded cells put true neighbors in the probed
  cell by construction).
- IVF-PQ with the default ADC-rank-then-cut sits in a LOW band
  [0.05, 0.5]: the codebooks are cluster-mean slices, so every member
  of a cluster quantizes to (nearly) the same codes and ADC cannot
  order within a cell — cutting at k is then near-arbitrary (measured
  ~0.2 on 200-member clusters). The band is pinned so silent drift in
  either direction (a codebook change, a tie-break change) is caught.
- IVF-PQ with shortlist re-ranking (Jégou et al. 2011 §V, R > k) >=
  0.95: ADC pulls the whole cluster into the shortlist, the exact
  rescore orders it — the configuration a serving deployment runs.
- RP (JL random projection, 64->16) plain rank-then-cut in the LOW band
  [0.05, 0.6] — same degeneracy class as plain ADC (cluster membership
  survives the projection; intra-cluster micro-distances don't).
- RP with a CORPUS-SCALED shortlist (R = N // RP_SHORTLIST_DIVISOR —
  a global projected scan has no cell restriction, so fixed R leaks as
  N grows) >= 0.95.
- COMPOSED IVF+RP (ann.ivf_rp_topk, r07 ask #7) >= 0.95 with a FIXED
  shortlist (R = the cell size, NOT scaled to N): the coarse quantizer
  bounds the candidate pool at nprobe x cell size, so the corpus-growth
  leak that forces standalone RP's R = N/5 never happens — the measured
  argument for composing RP behind a quantizer instead of running it
  standalone.

Any violated contract exits 1.

Usage: python tools/ann_recall_probe.py [n_vectors]
Prints one JSON line; exits 1 if a contract is violated.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from wikitrender_spark.operators import ann
from wikitrender_spark.session import get_spark

N_VECTORS = 50_000
PER_CLUSTER = 200
K = 10
N_QUERIES = 20
SHORTLIST = PER_CLUSTER  # R > k re-ranking depth for the serving config
IVF_FLOOR = 0.95
IVFPQ_ADC_BAND = (0.05, 0.5)
IVFPQ_SHORTLIST_FLOOR = 0.95
#: JL random projection 64->16: the projection preserves COARSE
#: geometry (cluster membership) but not intra-cluster micro-distances,
#: so plain projected-rank-then-cut sits in a LOW band for the same
#: reason ADC does (the true top-k are same-cluster members whose tiny
#: distance differences drown in the 4x-reduction distortion; measured
#: ~0.16-0.17 at 2k-10k vectors). Shortlist re-ranking restores it,
#: but unlike IVF-PQ — whose cell restriction bounds the shortlist at
#: cluster size — a GLOBAL projected scan leaks other clusters' members
#: into any fixed-R shortlist as the corpus grows (measured: R=200
#: recall 0.89 at 2k vectors, 0.745 at 10k), so R must scale with N:
#: R = N // RP_SHORTLIST_DIVISOR (measured at 10k: R=N/5 -> 0.99,
#: R=N/10 -> 0.94, R=N/20 -> 0.855). This is exactly why production
#: stacks compose RP WITH a coarse quantizer instead of standalone.
RP_BAND = (0.05, 0.6)
RP_SHORTLIST_DIVISOR = 5  # R = n_vectors // RP_SHORTLIST_DIVISOR
RP_SHORTLIST_FLOOR = 0.95
IVF_RP_FLOOR = 0.95  # composed tier, FIXED R (below)
#: composed-tier re-rank depth: 1.5x the cell size. R must cover the
#: query's own cell PLUS margin for the second probed cell's members
#: whose projected scores edge out tail true neighbors (R = cell size
#: exactly measured 0.95 at 2k but 0.935 at 10k — the distortion loss
#: is a fixed fraction of the SECOND cell's intrusions, not of N). The
#: point of the contract is that R stays FIXED as the corpus grows —
#: vs standalone RP's R = N/5 — not that R equals the cell size.
IVF_RP_SHORTLIST = PER_CLUSTER * 3 // 2


def planted(spark, n_vectors: int):
    n_clusters = n_vectors // PER_CLUSTER
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((n_clusters, ann.EMB_DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    i = 0
    for c in range(n_clusters):
        noise = rng.standard_normal((PER_CLUSTER, ann.EMB_DIM)) * 0.12
        for v in centers[c] + noise:
            rows.append((i, [float(x) for x in v], c))
            i += 1
    return (
        spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        ),
        n_clusters,
    )


def pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def main() -> None:
    n_vectors = int(sys.argv[1]) if len(sys.argv) > 1 else N_VECTORS
    if n_vectors < 2 * PER_CLUSTER:
        sys.exit(f"n_vectors must be >= {2 * PER_CLUSTER} (2 full clusters)")
    spark = get_spark("ann-recall-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    emb, n_clusters = planted(spark, n_vectors)
    emb = emb.localCheckpoint()  # generation cost out of the timings
    n_queries = min(N_QUERIES, n_clusters)
    query_ids = [c * PER_CLUSTER for c in range(n_queries)]

    t0 = time.perf_counter()
    bf = pairs(ann.brute_force_topk(emb, query_ids, K))
    t_bf = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivf = pairs(ann.ivf_topk(emb, query_ids, K))
    t_ivf = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivfpq = pairs(ann.ivf_pq_topk(emb, query_ids, K))
    t_ivfpq = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rp = pairs(ann.rp_topk(emb, query_ids, K))
    t_rp = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    rp_sl = pairs(ann.rp_topk(
        emb, query_ids, K, shortlist=n_vectors // RP_SHORTLIST_DIVISOR
    ))
    t_rp_sl = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivfpq_sl = pairs(
        ann.ivf_pq_topk(emb, query_ids, K, shortlist=SHORTLIST)
    )
    t_ivfpq_sl = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    ivf_rp = pairs(ann.ivf_rp_topk(emb, query_ids, K, shortlist=IVF_RP_SHORTLIST))
    t_ivf_rp = round(time.perf_counter() - t0, 2)

    r_ivf = len(ivf & bf) / len(bf)
    r_rp = len(rp & bf) / len(bf)
    r_rp_sl = len(rp_sl & bf) / len(bf)
    r_ivfpq = len(ivfpq & bf) / len(bf)
    r_ivfpq_sl = len(ivfpq_sl & bf) / len(bf)
    r_ivf_rp = len(ivf_rp & bf) / len(bf)
    print(
        json.dumps(
            {
                "n_vectors": n_vectors,
                "n_clusters": n_clusters,
                "k": K,
                "n_queries": n_queries,
                "shortlist": SHORTLIST,
                "recall_ivf": round(r_ivf, 4),
                "recall_ivfpq_adc": round(r_ivfpq, 4),
                "recall_ivfpq_shortlist": round(r_ivfpq_sl, 4),
                "recall_rp": round(r_rp, 4),
                "recall_rp_shortlist": round(r_rp_sl, 4),
                "recall_ivf_rp": round(r_ivf_rp, 4),
                "ivf_rp_shortlist": IVF_RP_SHORTLIST,
                "rp_shortlist": n_vectors // RP_SHORTLIST_DIVISOR,
                "floor_ivf": IVF_FLOOR,
                "band_ivfpq_adc": IVFPQ_ADC_BAND,
                "floor_ivfpq_shortlist": IVFPQ_SHORTLIST_FLOOR,
                "band_rp": RP_BAND,
                "floor_rp_shortlist": RP_SHORTLIST_FLOOR,
                "floor_ivf_rp": IVF_RP_FLOOR,
                "sec_bruteforce": t_bf,
                "sec_ivf": t_ivf,
                "sec_ivfpq_adc": t_ivfpq,
                "sec_ivfpq_shortlist": t_ivfpq_sl,
                "sec_rp": t_rp,
                "sec_rp_shortlist": t_rp_sl,
                "sec_ivf_rp": t_ivf_rp,
            }
        )
    )
    lo, hi = IVFPQ_ADC_BAND
    ok = (
        r_ivf >= IVF_FLOOR
        and lo <= r_ivfpq <= hi
        and r_ivfpq_sl >= IVFPQ_SHORTLIST_FLOOR
        and RP_BAND[0] <= r_rp <= RP_BAND[1]
        and r_rp_sl >= RP_SHORTLIST_FLOOR
        and r_ivf_rp >= IVF_RP_FLOOR
    )
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
