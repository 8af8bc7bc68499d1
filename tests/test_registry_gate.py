"""Pin the driver-gate window composition (ADVICE r3).

The driver's correctness gate attests only the first 50 registered
queries, so window membership is load-bearing evidence. These tests make
gate drift a CI failure instead of a round-verdict surprise: the window
must match registry.GATE_WINDOW exactly, and every query that has never
been driver-attested on current testdata must sit inside it.

The steady-state rotation contract itself lives on registry.GATE_WINDOW
(round 13, VERDICT r12 ask #1): new rows always seat; promised rows
overflowing GATE_SIZE displace to the next round with a per-row
rationale and seat FIRST there; maximum evidence age is bounded at
ceil(N / GATE_SIZE) + 1 rounds. The numbers below are that contract
applied to round 15.
"""

from __future__ import annotations

from wikitrender_spark.plans import registry

#: Queries whose most recent driver attestation is missing or stale
#: (new this round, code changed after their last green attestation, or
#: driver evidence more than two rounds old). Update each round as
#: CORRECTNESS_r{N}.json lands.
NEVER_OR_STALE_ATTESTED = {
    # round-15 addition, never driver-attested: the 100 TB approx
    # perplexity bucketer's deterministic shorts/rated class
    # projection (VERDICT r14 next-round #5 — the
    # dd_stream_band_buckets move: run the full sketch + broadcast
    # thresholds + map-side bucketer, gate the projection that cannot
    # depend on the partitioning-dependent thresholds)
    "tx_ngram_ppl_approx_classes",
    # stale-by-code-change (rule 4): the declared r14 opener landed —
    # ngram_ppl_buckets' 3-column scored relation now localCheckpoints
    # once so the rated/shorts union branches stop re-evaluating the
    # scoring subplan (results unchanged, code path changed)
    "tx_ngram_ppl_buckets",
    # stale-by-oracle-change (rule 4 — the oracle is half of the
    # attested artifact): BPE_ENCODE_SQL's base CTE gained the
    # empty-doc COALESCE (ADVICE r14 medium — DuckDB
    # array_to_string([], '@') is NULL, diverging from the Spark
    # contract's (0, '') on zero-token documents)
    "tx_bpe_encode",
}

#: The 58 rows promised the r15 window by round 14 (= R12_COHORT |
#: R14_DISPLACED from round 14's derivation, kept VERBATIM so the
#: payment is testable against the promised names, not a recomputation
#: that could drift with the window).
R15_PROMISE = {
    # the eight r14-displaced rows (r11 evidence — seated first)
    "ann_filtered_topk", "ann_pq_topk", "ann_sq_topk",
    "rel_corr_subquery", "rel_pivot_status", "rel_running_revenue",
    "rel_weekday_profile", "rel_scalar_functions",
    # the 50-row r12-evidence cohort
    "ann_filtered_expand", "ann_ivf_rp_topk", "ann_ivf_topk",
    "ann_ivfpq_rerank", "ann_lsh_buckets", "ann_lsh_topk",
    "ann_rp_topk", "dd_bloom_decontaminate", "dd_cdc_chunks",
    "dd_containment", "dd_decontaminate", "dd_dup_clusters",
    "dd_editdist_pairs", "dd_embedding_neardup", "dd_jaccard_histogram",
    "dd_lsh_candidates", "dd_minhash_est", "dd_minhash_signatures",
    "dd_near_duplicates", "dd_ngram_jaccard", "dd_simhash_pairs",
    "mm_audio_vad", "mm_frame_sample", "mm_image_neardup_content",
    "mm_media_features", "mm_pgm_features", "mm_video_keyframes",
    "rel_audience_overlap", "rel_cube_summary", "rel_dq_audit",
    "rel_hourly_anomalies", "rel_nation_presence", "rel_nation_set_ops",
    "rel_regional_revenue", "rel_rollup_orders", "rel_top_customers",
    "tx_clean_corpus", "tx_cms_terms", "tx_dedup_lineage",
    "tx_filter_funnel", "tx_ngram_nll", "tx_repetition", "tx_split",
    "tx_substring_scrub", "tx_token_stats", "tx_vocab", "tx_winnowing",
    "wt_state_diff", "wt_stream_heavy_hitters", "wt_stream_trending",
}

#: The eleven promised rows the r15 window could not seat (58 promised
#: + 1 new + 2 rule-4 re-attestations = 61 > 50; new and rule-4 rows
#: are never deferred, so exactly eleven promised rows spill under the
#: rotation contract). Chosen because each has FRESH family evidence
#: (r13/r14 windows, or family rows seating in the r15 window itself)
#: AND its code path is untouched since its own r12 attestation
#: (round-15 changes touch only the ngram-ppl functions, the new
#: classes query/oracle, BPE_ENCODE_SQL, and the streaming/dedup
#: mirror-check error type); all eleven are named FIRST in the r16
#: promise. Per-row rationale on registry.GATE_WINDOW.
R15_DISPLACED = {
    "ann_filtered_expand", "ann_ivfpq_rerank", "ann_lsh_buckets",
    "ann_ivf_rp_topk", "dd_simhash_pairs", "dd_minhash_est",
    "mm_image_neardup_content", "mm_frame_sample", "rel_nation_presence",
    "rel_rollup_orders", "wt_stream_trending",
}

#: The rows whose latest driver attestation was r13 when this window
#: was composed (= CORRECTNESS_r13.json keys minus CORRECTNESS_r14.json
#: keys — the FIXED population, 50 rows): their evidence will be two
#: rounds old after r15, so together with the eleven displaced rows
#: they are PROMISED the r16 window. tx_ngram_ppl_buckets is in this
#: population but re-attests NOW (rule 4), so the r16 debt is 49 + 11
#: = 60 rows > 50 — the steady-state pressure the rotation contract on
#: registry.GATE_WINDOW makes permanent: r16 must displace at least
#: ten rows even with zero additions; the displaced rows seat first.
R13_COHORT = {
    "ann_bruteforce_topk", "dd_cross_source_dups",
    "dd_embedding_neardup_exact", "dd_lsh_tuning", "dd_semantic_dedup",
    "dd_simhash_tuning", "mm_image_neardup", "mm_video_neardup",
    "mm_wav_features", "mm_y4m_frames", "rel_approx_percentiles",
    "rel_approx_segments", "rel_asof_last_signup", "rel_hourly_autocorr",
    "rel_hourly_ewma", "rel_hourly_mad", "rel_interval_coverage",
    "rel_json_props", "rel_lateral_topk", "rel_order_gaps",
    "rel_percentiles", "rel_recursive_months", "rel_salted_revenue",
    "rel_scd2_intervals", "rel_sessionize", "rel_value_pareto",
    "rel_window_rank_suite", "tx_bm25_topk", "tx_boilerplate",
    "tx_bpe_merges", "tx_chunks", "tx_collocations", "tx_dsir_weights",
    "tx_leakage_split", "tx_mix_sample", "tx_mix_weights",
    "tx_ngram_ppl_buckets", "tx_novelty", "tx_pack_sharded",
    "tx_pii_scrub", "tx_rarity", "tx_stratified_sample",
    "tx_tfidf_terms", "wt_biggest_movers", "wt_coedit_pairs",
    "wt_ingest_dedup", "wt_lifecycle_replay", "wt_markov_transitions",
    "wt_pagerank", "wt_top_pages_per_wiki",
}

#: COMPLETENESS IS TESTED, not hand-maintained: every row owed the r16
#: window — the r13-evidence cohort plus the r15 displacement — minus
#: anything already re-attesting now.
R16_DEFERRED = (R13_COHORT | R15_DISPLACED) - set(registry.GATE_WINDOW)


def test_r15_promise_is_paid():
    """Every row round 14 promised the r15 window sits in it, except
    the ELEVEN documented displacements — paid against the promised
    NAMES."""
    missing = R15_PROMISE - set(registry.GATE_WINDOW)
    assert missing == R15_DISPLACED, sorted(missing)


def test_r15_window_is_led_by_the_displaced_eight():
    """VERDICT r14 next-round #1's 'done' condition verbatim: the
    window is LED by the eight r11-evidence rows round 14 displaced —
    they hold slots 0-7, ahead even of this round's rule-4
    re-attestations and addition."""
    assert registry.GATE_WINDOW[:8] == [
        "ann_filtered_topk", "ann_pq_topk", "ann_sq_topk",
        "rel_corr_subquery", "rel_pivot_status", "rel_running_revenue",
        "rel_weekday_profile", "rel_scalar_functions",
    ]


def test_displacement_is_minimal():
    """The displacement rule allows spill only because the window is
    genuinely full: 47 promised + 1 new + 2 rule-4 = 50 exactly."""
    assert len(R15_PROMISE - R15_DISPLACED) + len(
        NEVER_OR_STALE_ATTESTED - R15_PROMISE
    ) == registry.GATE_SIZE


def test_every_owed_row_is_windowed_or_deferred():
    """The r16 promise must be complete by construction: every row with
    r13-or-older driver evidence is either re-attesting in the r15
    window or explicitly in the r16 debt — nothing falls out silently."""
    expected = (R13_COHORT | R15_DISPLACED) - set(registry.GATE_WINDOW)
    assert R16_DEFERRED == expected
    # tx_ngram_ppl_buckets re-attests this round (rule 4), so the r16
    # debt is 49 of the r13 cohort plus the eleven displaced rows
    # (60 > 50: the steady-state cadence the contract on
    # registry.GATE_WINDOW pins)
    assert len(R16_DEFERRED) == 60, len(R16_DEFERRED)


def test_evidence_age_bound_holds():
    """Rule 3 of the rotation contract, checked on this round's
    numbers: the oldest evidence seated this round (the eight r11 rows,
    age 4 at r15) and the oldest evidence deferred (the eleven r12
    rows, age 4 when they seat at r16) both sit within the contract
    bound ceil(N / GATE_SIZE) + 1."""
    import math

    n = len(registry.all_queries())
    bound = math.ceil(n / registry.GATE_SIZE) + 1
    assert 15 - 11 <= bound  # the r11 rows seated this round
    assert 16 - 12 <= bound  # the r12 rows displaced to r16


def test_displaced_rows_have_fresh_family_evidence():
    """The r15 displacement rationale is itself pinned: every displaced
    row's named family neighbors either re-attested in the r13/r14
    windows or seat in THIS window (checked), and the neighbors remain
    registered (oracle-checked in the local sweep)."""
    in_window = {
        "ann_filtered_topk", "ann_pq_topk", "ann_lsh_topk",
        "ann_rp_topk", "dd_minhash_signatures", "mm_video_keyframes",
        "rel_nation_set_ops", "rel_cube_summary",
        "wt_stream_heavy_hitters",
    }
    family_neighbors = {
        "ann_filtered_expand": ["ann_filtered_topk", "ann_range_search"],
        "ann_ivfpq_rerank": ["ann_ivfpq_topk", "ann_pq_topk"],
        "ann_lsh_buckets": ["ann_lsh_topk", "dd_stream_band_buckets"],
        "ann_ivf_rp_topk": ["ann_rp_topk", "ann_ivfpq_topk"],
        "dd_simhash_pairs": ["dd_simhash", "dd_substring_runs"],
        "dd_minhash_est": ["dd_minhash_signatures",
                           "dd_stream_band_buckets"],
        "mm_image_neardup_content": ["mm_audio_neardup",
                                     "mm_video_motion"],
        "mm_frame_sample": ["mm_video_keyframes", "mm_video_motion"],
        "rel_nation_presence": ["rel_nation_set_ops",
                                "rel_grouping_sets"],
        "rel_rollup_orders": ["rel_cube_summary", "rel_grouping_sets"],
        "wt_stream_trending": ["wt_stream_heavy_hitters",
                               "wt_windowed_activity"],
    }
    assert set(family_neighbors) == R15_DISPLACED
    for neighbors in family_neighbors.values():
        for neighbor in neighbors:
            assert neighbor in registry.all_queries()
            if neighbor in in_window:
                # "seating NOW" evidence must actually be in the window
                assert neighbor in registry.GATE_WINDOW


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
    # the r16 promise list must stay real queries, and a deferred row
    # sitting inside the window would mean the accounting is stale
    assert R16_DEFERRED <= set(registry.all_queries())
    assert not (R16_DEFERRED & set(registry.GATE_WINDOW))
