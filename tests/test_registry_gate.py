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
#: (new this round, code changed after their last green attestation, or
#: last gated before the round-3 testdata regeneration). Update each
#: round as CORRECTNESS_r{N}.json lands.
NEVER_OR_STALE_ATTESTED = {
    # round-5 additions, never driver-gated
    "wt_epm_variants",
    "wt_purge_safe_list",
    "ann_ivfpq_rerank",
    "dd_bloom_decontaminate",
    "tx_cms_terms",
    "wt_stream_heavy_hitters",
    "wt_state_diff",
    "rel_dq_audit",
    # code rewritten in round 5 after the r04 attestation: the scrub's
    # coverage surgery (gap-interval fold), the duplicate_clusters
    # propagation loop and score_documents swap feeding the
    # lineage/clean-corpus/cluster/funnel rows, and the PGM oracle
    # rewrite
    "tx_substring_scrub",
    "tx_dedup_lineage",
    "tx_clean_corpus",
    "dd_dup_clusters",
    "tx_filter_funnel",
    "mm_pgm_features",
    # late round-5 LSH-scaffold change (shared dth checkpoint through
    # _candidates_with_shingle_sets) — these three consumers re-gate
    "dd_minhash_est",
    "dd_jaccard_histogram",
    "dd_containment",
    # last attested r02, before the round-3 testdata regeneration
    "rel_nation_set_ops",
    "rel_nation_presence",
}

#: The 16 rows displaced from the r05 window (all green at their last
#: attestation on current testdata, code untouched this round). They are
#: PROMISED the r06 window: next round, move them into GATE_WINDOW (and
#: into NEVER_OR_STALE_ATTESTED as stale) before anything else.
R06_DEFERRED = {
    "rel_scalar_functions",
    "rel_pivot_status",
    "rel_json_props",
    "rel_approx_segments",
    "rel_grouping_sets",
    "rel_percentiles",
    "rel_corr_subquery",
    "rel_suppliers_with_shipments",
    "rel_recursive_months",
    "rel_approx_percentiles",
    "rel_customers_without_orders",
    "rel_order_gaps",
    "rel_lateral_topk",
    "rel_pricing_summary",
    "rel_asof_last_signup",
    "tx_chunks",
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


def test_deferred_rows_are_registered_and_disjoint_from_window():
    # the r06 promise list must stay real queries, and a deferred row
    # sitting inside the window would mean the accounting is stale
    assert R06_DEFERRED <= set(registry.all_queries())
    assert not (R06_DEFERRED & set(registry.GATE_WINDOW))
