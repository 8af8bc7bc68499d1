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
    # round-12 additions, never driver-attested: the content-crop
    # perceptual image fingerprint with the crop box recomputed in SQL
    # (VERDICT r11 ask #4), and the CCNet-style bigram-LM perplexity
    # filter on the portable-ln machinery
    "mm_image_neardup_content",
    "tx_ngram_nll",
    # NO stale-by-code-change rows this round: round-12 changes are
    # pure additions (new functions/queries); no attested query's code
    # path changed after its evidence.
}

#: The 52 rows promised the r12 window by round 11 (= R09_COHORT |
#: R11_DISPLACED from round 11's derivation, kept VERBATIM so the
#: payment is testable against the promised names, not a recomputation
#: that could drift with the window).
R12_PROMISE = {
    # the four r11-displaced rows (r08 evidence — seated first)
    "rel_regional_revenue", "rel_top_customers", "rel_rollup_orders",
    "rel_cube_summary",
    # the 48-row r09-evidence cohort
    "ann_bruteforce_topk", "ann_filtered_expand", "ann_ivf_rp_topk",
    "ann_ivf_topk", "ann_ivfpq_rerank", "ann_lsh_buckets",
    "ann_lsh_topk", "ann_rp_topk", "dd_bloom_decontaminate",
    "dd_cdc_chunks", "dd_containment", "dd_decontaminate",
    "dd_dup_clusters", "dd_editdist_pairs", "dd_embedding_neardup",
    "dd_jaccard_histogram", "dd_lsh_candidates", "dd_minhash_est",
    "dd_minhash_signatures", "dd_near_duplicates", "dd_ngram_jaccard",
    "dd_simhash_pairs", "mm_audio_vad", "mm_frame_sample",
    "mm_media_features", "mm_pgm_features", "mm_video_keyframes",
    "rel_audience_overlap", "rel_dq_audit", "rel_hourly_anomalies",
    "rel_nation_presence", "rel_nation_set_ops", "tx_clean_corpus",
    "tx_cms_terms", "tx_dedup_lineage", "tx_filter_funnel",
    "tx_repetition", "tx_split", "tx_substring_scrub",
    "tx_token_stats", "tx_vocab", "tx_winnowing", "wt_biggest_movers",
    "wt_lifecycle_replay", "wt_state_diff", "wt_stream_heavy_hitters",
    "wt_stream_trending", "wt_top_pages_per_wiki",
}

#: The four promised rows the r12 window could not seat (52 promised +
#: 2 new = 54 > 50; new rows are never deferred, so exactly four spill
#: under the established displacement rule). Chosen because each has
#: FRESH family evidence in the r11 window AND lives in files
#: untouched since its own r09 attestation (git diff r9..HEAD empty for
#: operators/ann.py, operators/topk.py, plans/wikitrender_queries.py,
#: and for wt_lifecycle_replay's implementation files
#: operators/lifecycle.py and operators/derive.py);
#: all four are named FIRST in the r13 promise.
R12_DISPLACED = {
    "ann_bruteforce_topk", "wt_biggest_movers", "wt_top_pages_per_wiki",
    "wt_lifecycle_replay",
}

#: The rows whose latest driver attestation was r10 when this window
#: was composed (= CORRECTNESS_r10.json keys minus CORRECTNESS_r11.json
#: keys — the FIXED population, 50 rows): their evidence will be two
#: rounds old after r12, so together with the three displaced rows they
#: are PROMISED the r13 window. 53 rows > 50 — the same steady-state
#: pressure as r11/r12: r13 must displace at least three rows even with
#: zero additions; the displaced rows seat first.
R10_COHORT = {
    "ann_ivfpq_topk", "ann_kmeans_refine", "ann_range_search",
    "dd_cross_source_dups", "dd_embedding_neardup_exact",
    "dd_lsh_tuning", "dd_semantic_dedup", "dd_simhash_tuning",
    "mm_image_neardup", "mm_wav_features", "mm_y4m_frames",
    "rel_approx_percentiles", "rel_approx_segments",
    "rel_asof_last_signup", "rel_grouping_sets", "rel_hourly_autocorr",
    "rel_hourly_ewma", "rel_hourly_mad", "rel_interval_coverage",
    "rel_json_props", "rel_lateral_topk", "rel_order_gaps",
    "rel_percentiles", "rel_pricing_summary", "rel_recursive_months",
    "rel_salted_revenue", "rel_scd2_intervals", "rel_sessionize",
    "rel_suppliers_with_shipments", "rel_value_pareto",
    "rel_window_rank_suite", "tx_bm25_topk", "tx_boilerplate",
    "tx_bpe_merges", "tx_chunks", "tx_collocations", "tx_dsir_weights",
    "tx_leakage_split", "tx_mix_sample", "tx_mix_weights",
    "tx_novelty", "tx_pack_sharded", "tx_pii_scrub", "tx_rarity",
    "tx_stratified_sample", "tx_tfidf_terms", "wt_coedit_pairs",
    "wt_ingest_dedup", "wt_markov_transitions", "wt_pagerank",
}

#: COMPLETENESS IS TESTED, not hand-maintained: every row owed the r13
#: window — the r10-evidence cohort plus the r12 displacement — minus
#: anything already re-attesting now.
R13_DEFERRED = (R10_COHORT | R12_DISPLACED) - set(registry.GATE_WINDOW)


def test_r12_promise_is_paid():
    """Every row round 11 promised the r12 window sits in it, except
    the THREE documented displacements — paid against the promised
    NAMES."""
    missing = R12_PROMISE - set(registry.GATE_WINDOW)
    assert missing == R12_DISPLACED, sorted(missing)


def test_displacement_is_minimal():
    """The displacement rule allows spill only because the window is
    genuinely full: 48 promised + 2 new = 50 exactly."""
    assert len(R12_PROMISE - R12_DISPLACED) + len(
        NEVER_OR_STALE_ATTESTED - R12_PROMISE
    ) == registry.GATE_SIZE


def test_every_owed_row_is_windowed_or_deferred():
    """The r13 promise must be complete by construction: every row with
    r10-or-older driver evidence is either re-attesting in the r12
    window or explicitly in the r13 debt — nothing falls out silently."""
    expected = (R10_COHORT | R12_DISPLACED) - set(registry.GATE_WINDOW)
    assert R13_DEFERRED == expected
    # nothing in the r10 cohort re-attests this round, so the r13 debt
    # is the full cohort plus the four displaced rows (54 > 50: the
    # steady-state cadence documented on registry.GATE_WINDOW)
    assert len(R13_DEFERRED) == 54, len(R13_DEFERRED)


def test_displaced_rows_have_fresh_family_evidence():
    """The r12 displacement rationale is itself pinned: every displaced
    row's named family neighbors re-attested in the r11 window, and the
    neighbors remain registered (oracle-checked in the local sweep)."""
    family_neighbors = {
        "ann_bruteforce_topk": ["ann_filtered_topk", "ann_pq_topk",
                                "ann_sq_topk"],
        "wt_biggest_movers": ["wt_most_edited", "wt_most_vibrant"],
        "wt_top_pages_per_wiki": ["wt_most_edited", "wt_page_state"],
        "wt_lifecycle_replay": ["wt_page_state_lifecycle",
                                "wt_stream_replay"],
    }
    assert set(family_neighbors) == R12_DISPLACED
    for neighbors in family_neighbors.values():
        for neighbor in neighbors:
            assert neighbor in registry.all_queries()


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
    # the r13 promise list must stay real queries, and a deferred row
    # sitting inside the window would mean the accounting is stale
    assert R13_DEFERRED <= set(registry.all_queries())
    assert not (R13_DEFERRED & set(registry.GATE_WINDOW))
