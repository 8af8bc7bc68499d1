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
    # the R08_DEFERRED promise — last green r04, three-plus rounds
    # stale at rotation time (VERDICT r07 ask #1: these 23 rotate in
    # FIRST; after r08 no registry row's driver evidence is older than
    # two rounds)
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
    # round-8 additions, never driver-attested
    "wt_ingest_dedup_watermark",
    "ann_ivf_rp_topk",
    "wt_graph_degrees",
    "wt_coedit_triangles",
    "tx_source_divergence",
    "rel_weekday_profile",
    "mm_video_motion",
    "wt_edit_wars",
    "rel_retention_cohorts",
    "rel_copurchase_pairs",
    "mm_audio_energy",
    "ann_filtered_topk",
    "wt_stream_trending",
    "wt_revert_chains",
}

#: Every row of the 50-name r06-attested cohort (fixed at r08 rotation
#: time — see R06_COHORT below) that is NOT in the r08 window: the 23
#: left out at rotation plus every (c) row a round-8 addition displaced
#: mid-round. Their code is untouched and each has an in-window sibling
#: exercising the same module; they are PROMISED the r09 window — next
#: round, move them into GATE_WINDOW (and into NEVER_OR_STALE_ATTESTED
#: as stale) before anything else.
#: COMPLETENESS IS TESTED, not hand-maintained:
#: test_every_r06_row_is_windowed_or_deferred derives the required set
#: from R06_COHORT − GATE_WINDOW, so a displaced row can no longer fall
#: out of the accounting silently (two r08 review passes each caught
#: hand-maintenance omissions here).
R09_DEFERRED = {
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_ivfpq_rerank",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "dd_bloom_decontaminate",
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
    "mm_frame_sample",
    "mm_media_features",
    "mm_pgm_features",
    "rel_dq_audit",
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
    "wt_lifecycle_replay",
    "wt_state_diff",
    "wt_stream_heavy_hitters",
    "wt_top_pages_per_wiki",
    "wt_biggest_movers",
}


#: The 50 rows whose latest driver attestation was r06 when the r08
#: window was composed — the FIXED population the R09 promise covers.
R06_COHORT = {
    "wt_page_state", "wt_most_edited", "wt_biggest_movers",
    "wt_most_vibrant", "wt_top_pages_per_wiki", "wt_purge_survivors",
    "wt_epm_variants", "wt_purge_safe_list", "wt_classify_counts",
    "wt_windowed_activity", "wt_session_activity", "wt_delete_targets",
    "wt_protect_followups", "wt_page_state_lifecycle",
    "wt_lifecycle_replay", "wt_stream_replay", "wt_stream_heavy_hitters",
    "wt_state_diff", "tx_token_stats", "tx_repetition", "tx_vocab",
    "tx_split", "tx_dedup_lineage", "dd_containment",
    "dd_jaccard_histogram", "tx_substring_scrub", "ann_ivfpq_rerank",
    "dd_minhash_signatures", "dd_minhash_est", "dd_ngram_jaccard",
    "dd_lsh_candidates", "dd_near_duplicates", "dd_embedding_neardup",
    "dd_decontaminate", "dd_bloom_decontaminate", "tx_cms_terms",
    "dd_dup_clusters", "dd_editdist_pairs", "tx_clean_corpus",
    "tx_filter_funnel", "ann_bruteforce_topk", "ann_lsh_buckets",
    "ann_lsh_topk", "ann_ivf_topk", "mm_media_features",
    "mm_frame_sample", "mm_pgm_features", "rel_dq_audit",
    "rel_nation_set_ops", "rel_nation_presence",
}


def test_every_r06_row_is_windowed_or_deferred():
    """The R09 promise must be complete by construction: every
    r06-attested row is either re-attesting in the r08 window or
    explicitly deferred — and the deferred set contains nothing else."""
    from wikitrender_spark.plans import registry

    expected = R06_COHORT - set(registry.GATE_WINDOW)
    assert R09_DEFERRED == expected, (
        sorted(expected - R09_DEFERRED), sorted(R09_DEFERRED - expected))


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
    # the r09 promise list must stay real queries, and a deferred row
    # sitting inside the window would mean the accounting is stale
    assert R09_DEFERRED <= set(registry.all_queries())
    assert not (R09_DEFERRED & set(registry.GATE_WINDOW))
