"""Central registry: query name -> (spark callable, optional DuckDB oracle).

__spark_entry__.queries()/oracle_sql() are thin views over this. Modules
contribute (QUERIES, ORACLES) dict pairs; names must be unique.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(queries: dict[str, QueryFn], oracles: dict[str, str]) -> None:
    for name in queries:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name: {name}")
    _QUERIES.update(queries)
    _ORACLES.update(oracles)


def all_queries() -> dict[str, QueryFn]:
    _load()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load()
    return dict(_ORACLES)


_loaded = False

#: The driver's correctness gate checks only the FIRST 50 registered
#: queries, so window membership is load-bearing evidence. This list IS
#: the window, explicitly: _load() reorders registration so these 50
#: names come first, in this order; everything else follows in module
#: order. tests/test_registry_gate.py pins the composition — editing a
#: QUERIES dict can no longer silently change what the driver attests.
#:
#: Round-12 composition policy (the r11 window went 50/50 green; the
#: R12 promise — the 48-row r09-evidence cohort PLUS the four rows
#: displaced by round 11 — is 52 rows, paid MINUS FOUR documented
#: displacements, per the established rule: 52 + 2 new = 54 > 50, and
#: new rows are never deferred, so exactly four promised rows spill):
#: (a) the FOUR r11-displaced rows seat FIRST (their evidence is r08,
#: the registry's oldest — the displacement rule's "displacements
#: seated first" clause): rel_regional_revenue, rel_top_customers,
#: rel_rollup_orders, rel_cube_summary;
#: (b) the round-12 additions (never driver-attested):
#: mm_image_neardup_content — the content-crop perceptual fingerprint
#: VERDICT r11 ask #4 wants oracle-twinned (the declared production
#: configuration for padded corpora, with the crop box recomputed in
#: SQL and all-pairs verification) — and tx_ngram_nll, the
#: CCNet-style bigram-LM perplexity filter on the portable-ln +
#: order-pinned-fold machinery;
#: (c) 44 of the 48-row r09-evidence cohort. DISPLACED to r13:
#: ann_bruteforce_topk, wt_biggest_movers, wt_top_pages_per_wiki,
#: wt_lifecycle_replay — chosen because each has FRESH family evidence
#: in the r11 window AND sits in files untouched since its own r09
#: attestation (verified: git diff r9..HEAD is empty for
#: operators/ann.py, operators/topk.py, plans/wikitrender_queries.py,
#: and for wt_lifecycle_replay's implementation files
#: operators/lifecycle.py and operators/derive.py):
#: ann_bruteforce_topk's exact-scan shape is covered by
#: ann_filtered_topk / ann_pq_topk / ann_sq_topk (all r11, same
#: operators/ann.py surface); wt_biggest_movers and
#: wt_top_pages_per_wiki by wt_most_edited + wt_most_vibrant (r11,
#: same operators/topk.py ranked-window surface) and wt_page_state
#: (r11, the same state derivation they rank over);
#: wt_lifecycle_replay by wt_page_state_lifecycle (r11, the SAME
#: ordered per-key lifecycle fold) and wt_stream_replay (r11, the
#: replay harness). All four are named FIRST in the r13 promise
#: (tests/test_registry_gate.py R13_DEFERRED).
#:
#: Stale-by-code-change audit for the seated rows: round-12 changes
#: are pure additions (new functions/queries — the content-crop query,
#: the BPE fast path, streaming card-scrub composition), so no seated
#: row's code path changed after its evidence; dd_simhash_pairs, whose
#: operator was refactored in r10 (plan-neutral by hash), re-attests
#: in this window regardless.
#:
#: Attestation-cadence note (honest steady state): with 154 registered
#: queries and a fixed 50-row driver window, every row re-attests at
#: most every ceil(154/50) = 4 rounds in the worst case, 3 in the
#: common path — displacements seated first keeps the oldest evidence
#: bounded (the four rows seated this round carry r08 evidence, the
#: maximum age the policy allows to accumulate); enforced by
#: tests/test_registry_gate.py.
GATE_WINDOW: list[str] = [
    # (b) round-12 additions, never driver-attested
    "mm_image_neardup_content",
    "tx_ngram_nll",
    # (a) the four r11-displaced rows, r08 evidence — seated first
    "rel_regional_revenue",
    "rel_top_customers",
    "rel_rollup_orders",
    "rel_cube_summary",
    # (c) the r09-evidence cohort, minus the four documented
    # displacements (ann_bruteforce_topk, wt_biggest_movers,
    # wt_top_pages_per_wiki, wt_lifecycle_replay -> r13, seated
    # first there)
    "ann_filtered_expand",
    "ann_ivf_rp_topk",
    "ann_ivf_topk",
    "ann_ivfpq_rerank",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "ann_rp_topk",
    "dd_bloom_decontaminate",
    "dd_cdc_chunks",
    "dd_containment",
    "dd_decontaminate",
    "dd_dup_clusters",
    "dd_editdist_pairs",
    "dd_embedding_neardup",
    "dd_jaccard_histogram",
    "dd_lsh_candidates",
    "dd_minhash_est",
    "dd_minhash_signatures",
    "dd_near_duplicates",
    "dd_ngram_jaccard",
    "dd_simhash_pairs",
    "mm_audio_vad",
    "mm_frame_sample",
    "mm_media_features",
    "mm_pgm_features",
    "mm_video_keyframes",
    "rel_audience_overlap",
    "rel_dq_audit",
    "rel_hourly_anomalies",
    "rel_nation_presence",
    "rel_nation_set_ops",
    "tx_clean_corpus",
    "tx_cms_terms",
    "tx_dedup_lineage",
    "tx_filter_funnel",
    "tx_repetition",
    "tx_split",
    "tx_substring_scrub",
    "tx_token_stats",
    "tx_vocab",
    "tx_winnowing",
    "wt_state_diff",
    "wt_stream_heavy_hitters",
    "wt_stream_trending",
]
GATE_SIZE = 50


def _load() -> None:
    global _loaded
    if _loaded:
        return
    _loaded = True
    # strict imports: a broken module must fail loudly here, not silently
    # shrink the query set the driver sees
    from . import pipeline_queries, relational_queries, wikitrender_queries

    register(wikitrender_queries.QUERIES, wikitrender_queries.ORACLES)
    register(pipeline_queries.QUERIES, pipeline_queries.ORACLES)
    register(relational_queries.QUERIES, relational_queries.ORACLES)
    register(pipeline_queries.QUERIES_ROTATED, pipeline_queries.ORACLES_ROTATED)

    # Reorder so GATE_WINDOW occupies the first GATE_SIZE slots exactly.
    # Fail loudly on drift: a GATE_WINDOW name that no module registered,
    # or a window that isn't exactly GATE_SIZE long, is a bug here, not
    # something to paper over at the driver.
    if len(GATE_WINDOW) != GATE_SIZE:
        raise ValueError(
            f"GATE_WINDOW has {len(GATE_WINDOW)} names, expected {GATE_SIZE}"
        )
    missing = [n for n in GATE_WINDOW if n not in _QUERIES]
    if missing:
        raise ValueError(f"GATE_WINDOW names never registered: {missing}")
    ordered = {n: _QUERIES[n] for n in GATE_WINDOW}
    ordered.update({n: q for n, q in _QUERIES.items() if n not in ordered})
    _QUERIES.clear()
    _QUERIES.update(ordered)
