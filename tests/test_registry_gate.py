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
    # round-9 additions, never driver-attested
    "ann_filtered_expand",
    "mm_video_keyframes",
    "mm_audio_vad",
    "tx_winnowing",
    "dd_cdc_chunks",
    "dd_simhash_pairs",
    "rel_hourly_mad",
    "rel_scd2_intervals",
    "rel_audience_overlap",
    # stale by round-9 code change (ADVICE r8 fixes touched their plan
    # or oracle after the last green attestation)
    "ann_rp_topk",
    "ann_ivf_rp_topk",
    "wt_stream_trending",
    "rel_hourly_anomalies",
}
# NOTE: the 37-row R09_DEFERRED promise (the whole r06-evidence cohort)
# is paid this round — all 37 sit in GATE_WINDOW; see
# test_r09_promise_is_paid_in_full below.

#: The 50 rows whose latest driver attestation was r07 when the r09
#: window was composed (= CORRECTNESS_r07.json's key set) — the FIXED
#: population the R10 promise covers. Two of them (ann_rp_topk,
#: rel_hourly_anomalies) re-attest in the r09 window already because
#: round-9 code changes staled them; the rest are R10_DEFERRED.
R07_COHORT = {
    "ann_ivfpq_topk", "ann_kmeans_refine", "ann_range_search",
    "ann_rp_topk", "dd_cross_source_dups", "dd_embedding_neardup_exact",
    "dd_lsh_tuning", "dd_semantic_dedup", "mm_wav_features",
    "mm_y4m_frames", "rel_approx_percentiles", "rel_approx_segments",
    "rel_asof_last_signup", "rel_corr_subquery",
    "rel_customers_without_orders", "rel_grouping_sets",
    "rel_hourly_anomalies", "rel_hourly_autocorr", "rel_hourly_ewma",
    "rel_interval_coverage", "rel_json_props", "rel_lateral_topk",
    "rel_order_gaps", "rel_percentiles", "rel_pivot_status",
    "rel_pricing_summary", "rel_recursive_months", "rel_salted_revenue",
    "rel_scalar_functions", "rel_sessionize",
    "rel_suppliers_with_shipments", "rel_value_pareto",
    "rel_window_rank_suite", "tx_bm25_topk", "tx_boilerplate",
    "tx_bpe_merges", "tx_chunks", "tx_collocations", "tx_leakage_split",
    "tx_mix_sample", "tx_mix_weights", "tx_novelty", "tx_pack_sharded",
    "tx_rarity", "tx_stratified_sample", "tx_tfidf_terms",
    "wt_coedit_pairs", "wt_ingest_dedup", "wt_markov_transitions",
    "wt_pagerank",
}

#: Every R07_COHORT row NOT re-attesting in the r09 window: their driver
#: evidence will be two rounds old after r09, so they are PROMISED the
#: r10 window — next round, move them into GATE_WINDOW (and into
#: NEVER_OR_STALE_ATTESTED as stale) before anything else. 48 rows + up
#: to 2 new r10 queries fill the window exactly; if round 10 adds more
#: than 2 queries, displaced rows become the R11 debt under the
#: established displacement rule (displaced rows are named in the
#: registry comment, new rows never deferred).
#: COMPLETENESS IS TESTED, not hand-maintained:
#: test_every_r07_row_is_windowed_or_deferred derives the required set
#: from R07_COHORT − GATE_WINDOW, so a displaced row can never fall out
#: of the accounting silently.
R10_DEFERRED = R07_COHORT - set(registry.GATE_WINDOW)

#: The 37-row R09_DEFERRED promise from round 8 (the fixed r06-evidence
#: cohort, derived there as R06_COHORT − r08 GATE_WINDOW) — kept
#: verbatim so the payment is testable against the promised names, not
#: against a recomputation that could drift with the window.
R09_PROMISE = {
    "ann_bruteforce_topk", "ann_ivf_topk", "ann_ivfpq_rerank",
    "ann_lsh_buckets", "ann_lsh_topk", "dd_bloom_decontaminate",
    "dd_containment", "dd_decontaminate", "dd_dup_clusters",
    "dd_editdist_pairs", "dd_embedding_neardup", "dd_jaccard_histogram",
    "dd_lsh_candidates", "dd_minhash_est", "dd_minhash_signatures",
    "dd_near_duplicates", "dd_ngram_jaccard", "mm_frame_sample",
    "mm_media_features", "mm_pgm_features", "rel_dq_audit",
    "rel_nation_presence", "rel_nation_set_ops", "tx_clean_corpus",
    "tx_cms_terms", "tx_dedup_lineage", "tx_filter_funnel",
    "tx_repetition", "tx_split", "tx_substring_scrub", "tx_token_stats",
    "tx_vocab", "wt_lifecycle_replay", "wt_state_diff",
    "wt_stream_heavy_hitters", "wt_top_pages_per_wiki",
    "wt_biggest_movers",
}


def test_r09_promise_is_paid_in_full():
    """Every row the r08 round promised the r09 window actually sits in
    it — the promise is paid against the promised NAMES, no derivation
    in between."""
    assert R09_PROMISE <= set(registry.GATE_WINDOW), sorted(
        R09_PROMISE - set(registry.GATE_WINDOW)
    )


def test_every_r07_row_is_windowed_or_deferred():
    """The R10 promise must be complete by construction: every
    r07-attested row is either re-attesting in the r09 window or
    explicitly deferred — and the deferred set contains nothing else."""
    expected = R07_COHORT - set(registry.GATE_WINDOW)
    assert R10_DEFERRED == expected
    # the two code-staled r07 rows re-attest now, the other 48 defer
    assert len(R10_DEFERRED) == 48, len(R10_DEFERRED)


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
    # the r10 promise list must stay real queries, and a deferred row
    # sitting inside the window would mean the accounting is stale
    assert R10_DEFERRED <= set(registry.all_queries())
    assert not (R10_DEFERRED & set(registry.GATE_WINDOW))
