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
#: driver evidence more than two rounds old). Update each round as
#: CORRECTNESS_r{N}.json lands.
NEVER_OR_STALE_ATTESTED = {
    # never driver-gated: the round-6 additions (committed outside the
    # un-rotated r06 window) and the round-7 additions
    "wt_pagerank",
    "wt_markov_transitions",
    "rel_hourly_autocorr",
    "tx_bm25_topk",
    "tx_collocations",
    "wt_ingest_dedup",
    "tx_novelty",
    "dd_cross_source_dups",
    "ann_rp_topk",
    "dd_lsh_tuning",
    "rel_sessionize",
    "wt_coedit_pairs",
    "tx_stratified_sample",
    "tx_leakage_split",
    # code changed in round 7 after the r04 attestation (forced
    # vocab-broadcast hint removed)
    "tx_tfidf_terms",
    # last green r03 — three rounds stale, twice promised a slot
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

#: The 23 rows displaced from the r07 window (every one green at r04 on
#: current testdata — the deepest attestation history in the registry —
#: with code untouched since; the last eleven were displaced mid-round
#: by the r07 additions — tx_pack, tx_pack_split, ann_pq_topk by the
#: graph/autocorr batch; ann_sq_topk, rel_event_funnel,
#: tx_length_histogram, dd_substring_runs by the sessionize/coedit/
#: sampling/leakage-split batch — each with an in-window sibling
#: exercising the same operator module). They are PROMISED the r08
#: window: next round, move them into GATE_WINDOW (and into
#: NEVER_OR_STALE_ATTESTED as stale) before anything else.
R08_DEFERRED = {
    "ann_sq_topk",
    "rel_event_funnel",
    "tx_length_histogram",
    "dd_substring_runs",
    "tx_pack",
    "tx_pack_split",
    "ann_pq_topk",
    "dd_exact_groups",
    "dd_simhash",
    "rel_acctbal_band_pairs",
    "rel_cube_summary",
    "rel_regional_revenue",
    "rel_rolling_revenue_window",
    "rel_rollup_orders",
    "rel_running_revenue",
    "rel_signup_burst",
    "rel_small_quantity_revenue",
    "rel_top_customers",
    "rel_topk_per_brand",
    "rel_unpivot_presence",
    "tx_fingerprint",
    "tx_quality",
    "tx_langid",
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
    # the r08 promise list must stay real queries, and a deferred row
    # sitting inside the window would mean the accounting is stale
    assert R08_DEFERRED <= set(registry.all_queries())
    assert not (R08_DEFERRED & set(registry.GATE_WINDOW))
