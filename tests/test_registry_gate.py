"""Pin the driver-gate window composition (ADVICE r3).

The driver's correctness gate attests only the first 50 registered
queries, so window membership is load-bearing evidence. These tests make
gate drift a CI failure instead of a round-verdict surprise: the window
must match registry.GATE_WINDOW exactly, and every query that has never
been driver-attested on current testdata must sit inside it.
"""

from __future__ import annotations

from wikitrender_spark.plans import registry

#: Queries whose most recent driver attestation is missing or stale
#: (red row, new this round, or last gated before the round-3 testdata
#: regeneration). Update each round as CORRECTNESS_r{N}.json lands.
NEVER_OR_STALE_ATTESTED = {
    # red in r03, fixed in round 4 — needs a green driver row
    "tx_pack",
    # round-4 additions, never driver-gated
    "tx_pack_split",
    "tx_pack_sharded",
    "tx_dedup_lineage",
    "tx_mix_weights",
    "dd_embedding_neardup_exact",
    "dd_minhash_est",
    "tx_rarity",
    "tx_tfidf_terms",
    "tx_boilerplate",
    "dd_semantic_dedup",
    "ann_kmeans_refine",
    "tx_filter_funnel",
    "tx_mix_sample",
    "ann_range_search",
    "mm_pgm_features",
    "mm_wav_features",
    "mm_y4m_frames",
    "tx_bpe_merges",
    "dd_substring_runs",
    "dd_containment",
    "tx_length_histogram",
    "ann_sq_topk",
    "ann_pq_topk",
    "ann_ivfpq_topk",
    "rel_window_rank_suite",
    "rel_interval_coverage",
    "rel_event_funnel",
    "rel_salted_revenue",
    "rel_hourly_anomalies",
    "rel_hourly_ewma",
    "rel_value_pareto",
    "dd_jaccard_histogram",
    "tx_substring_scrub",
    # last attested r1/r2, before the round-3 testdata regeneration
    # (rel_nation_set_ops yielded its slot to never-attested additions;
    # it stays covered by the full local gate on current testdata)
    "rel_acctbal_band_pairs",
    "rel_topk_per_brand",
    "rel_top_customers",
    "rel_regional_revenue",
    "rel_running_revenue",
    "rel_rollup_orders",
    "rel_cube_summary",
    "rel_signup_burst",
    "rel_small_quantity_revenue",
    "rel_rolling_revenue_window",
    # rel_nation_presence also yielded its slot (see registry comment)
    "rel_unpivot_presence",
    "dd_exact_groups",
    "tx_quality",
    "tx_fingerprint",
    "tx_langid",
    "dd_simhash",
}


def test_gate_window_is_exactly_first_50():
    names = list(registry.all_queries())
    assert len(registry.GATE_WINDOW) == registry.GATE_SIZE
    assert names[: registry.GATE_SIZE] == registry.GATE_WINDOW


def test_unattested_queries_are_inside_the_window():
    assert NEVER_OR_STALE_ATTESTED <= set(registry.GATE_WINDOW)


def test_every_query_has_an_oracle():
    qs = registry.all_queries()
    os_ = registry.all_oracles()
    assert set(qs) == set(os_), "every registered query needs an oracle twin"


def test_window_names_unique_and_registered():
    assert len(set(registry.GATE_WINDOW)) == len(registry.GATE_WINDOW)
    assert set(registry.GATE_WINDOW) <= set(registry.all_queries())
