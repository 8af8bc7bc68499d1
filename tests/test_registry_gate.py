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
applied to round 16.
"""

from __future__ import annotations

from wikitrender_spark.plans import registry

#: Queries whose most recent driver attestation is missing or stale
#: (new this round, code changed after their last green attestation, or
#: driver evidence more than two rounds old). Round 16 adds no queries
#: and touches no registered query's compute path or oracle text (the
#: round's changes live in bench.py, tools/, and tests/ — the audit is
#: on registry.GATE_WINDOW), so this set is EMPTY — a first since the
#: rotation contract was stated. The rotation debt below is pure
#: age-based promise, no rule-1/rule-4 rows.
NEVER_OR_STALE_ATTESTED: set[str] = set()

#: The 60 rows promised the r16 window by round 15 (= the 49 remaining
#: r13-evidence rows | R15_DISPLACED from round 15's derivation, kept
#: VERBATIM so the payment is testable against the promised names, not
#: a recomputation that could drift with the window).
R16_PROMISE = {
    # the eleven r15-displaced rows (r12 evidence — seated first)
    "ann_filtered_expand", "ann_ivfpq_rerank", "ann_lsh_buckets",
    "ann_ivf_rp_topk", "dd_simhash_pairs", "dd_minhash_est",
    "mm_image_neardup_content", "mm_frame_sample", "rel_nation_presence",
    "rel_rollup_orders", "wt_stream_trending",
    # the 49-row r13-evidence cohort (the r13 window's 50 keys minus
    # tx_ngram_ppl_buckets, which re-attested in r15 under rule 4)
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
    "tx_novelty", "tx_pack_sharded", "tx_pii_scrub", "tx_rarity",
    "tx_stratified_sample", "tx_tfidf_terms", "wt_biggest_movers",
    "wt_coedit_pairs", "wt_ingest_dedup", "wt_lifecycle_replay",
    "wt_markov_transitions", "wt_pagerank", "wt_top_pages_per_wiki",
}

#: The ten promised rows the r16 window could not seat (60 promised +
#: 0 new + 0 rule-4 = 60 > 50, so exactly ten spill under the rotation
#: contract — the steady-state minimum). Chosen because each has FRESH
#: family evidence (r14/r15 windows, or family rows seating in the r16
#: window itself) AND its code path is untouched since its own r13
#: attestation (round-16 changes touch no registered query's code at
#: all); all ten are named FIRST in the r17 promise. Per-row rationale
#: on registry.GATE_WINDOW.
R16_DISPLACED = {
    "ann_bruteforce_topk", "dd_lsh_tuning", "dd_simhash_tuning",
    "dd_semantic_dedup", "mm_image_neardup", "mm_video_neardup",
    "rel_percentiles", "tx_bpe_merges", "rel_hourly_autocorr",
    "wt_coedit_pairs",
}

#: The rows whose latest driver attestation was r14 when this window
#: was composed (= CORRECTNESS_r14.json keys minus CORRECTNESS_r15.json
#: keys — the FIXED population, 49 rows): their evidence will be two
#: rounds old after r16, so together with the ten displaced rows they
#: are PROMISED the r17 window — 59 rows > 50, the steady-state
#: pressure again: r17 must displace at least nine rows even with zero
#: additions; the displaced rows seat first.
R14_COHORT = {
    "ann_ivfpq_topk", "ann_kmeans_refine", "ann_range_search",
    "dd_exact_groups", "dd_simhash", "dd_stream_band_buckets",
    "dd_substring_runs", "mm_audio_energy", "mm_audio_neardup",
    "mm_video_motion", "rel_acctbal_band_pairs", "rel_copurchase_pairs",
    "rel_customers_without_orders", "rel_event_funnel",
    "rel_grouping_sets", "rel_pricing_summary", "rel_retention_cohorts",
    "rel_rolling_revenue_window", "rel_signup_burst",
    "rel_small_quantity_revenue", "rel_suppliers_with_shipments",
    "rel_topk_per_brand", "rel_unpivot_presence", "tx_dsir_log",
    "tx_fingerprint", "tx_langid", "tx_length_histogram", "tx_pack",
    "tx_pack_split", "tx_quality", "tx_source_divergence",
    "wt_classify_counts", "wt_coedit_triangles", "wt_delete_targets",
    "wt_edit_wars", "wt_epm_variants", "wt_graph_degrees",
    "wt_ingest_dedup_watermark", "wt_most_edited", "wt_most_vibrant",
    "wt_page_state", "wt_page_state_lifecycle", "wt_protect_followups",
    "wt_purge_safe_list", "wt_purge_survivors", "wt_revert_chains",
    "wt_session_activity", "wt_stream_replay", "wt_windowed_activity",
}

#: COMPLETENESS IS TESTED, not hand-maintained: every row owed the r17
#: window — the r14-evidence cohort plus the r16 displacement — minus
#: anything already re-attesting now.
R17_DEFERRED = (R14_COHORT | R16_DISPLACED) - set(registry.GATE_WINDOW)


def test_r16_promise_is_paid():
    """Every row round 15 promised the r16 window sits in it, except
    the TEN documented displacements — paid against the promised
    NAMES."""
    missing = R16_PROMISE - set(registry.GATE_WINDOW)
    assert missing == R16_DISPLACED, sorted(missing)


def test_r16_window_is_led_by_the_displaced_eleven():
    """VERDICT r15 next-round #1's 'done' condition verbatim: the
    window is LED by the eleven r12-evidence rows round 15 displaced —
    they hold slots 0-10 (rule 2's 'displaced rows seat FIRST')."""
    assert registry.GATE_WINDOW[:11] == [
        "ann_filtered_expand", "ann_ivfpq_rerank", "ann_lsh_buckets",
        "ann_ivf_rp_topk", "dd_simhash_pairs", "dd_minhash_est",
        "mm_image_neardup_content", "mm_frame_sample",
        "rel_nation_presence", "rel_rollup_orders", "wt_stream_trending",
    ]


def test_displacement_is_minimal():
    """The displacement rule allows spill only because the window is
    genuinely full: 50 promised + 0 new + 0 rule-4 = 50 exactly."""
    assert len(R16_PROMISE - R16_DISPLACED) + len(
        NEVER_OR_STALE_ATTESTED - R16_PROMISE
    ) == registry.GATE_SIZE


def test_never_attested_rows_sit_in_window():
    """Rule 1: a query with no driver attestation at all must seat in
    the current window (vacuously true this round — the set is empty
    because round 16 adds nothing and stales nothing — but the test
    stays so a future addition that misses the window fails CI)."""
    assert NEVER_OR_STALE_ATTESTED <= set(registry.GATE_WINDOW)


def test_every_owed_row_is_windowed_or_deferred():
    """The r17 promise must be complete by construction: every row with
    r14-or-older driver evidence is either re-attesting in the r16
    window or explicitly in the r17 debt — nothing falls out silently."""
    expected = (R14_COHORT | R16_DISPLACED) - set(registry.GATE_WINDOW)
    assert R17_DEFERRED == expected
    # zero additions and zero rule-4 rows this round, so the r17 debt
    # is the full 49-row r14 cohort plus the ten displaced rows
    # (59 > 50: the steady-state cadence the contract on
    # registry.GATE_WINDOW pins)
    assert len(R17_DEFERRED) == 59, len(R17_DEFERRED)


def test_evidence_age_bound_holds():
    """Rule 3 of the rotation contract, checked on this round's
    numbers: the oldest evidence seated this round (the eleven r12
    rows, age 4 at r16) and the oldest evidence deferred (the ten r13
    rows, age 4 when they seat at r17) both sit within the contract
    bound ceil(N / GATE_SIZE) + 1."""
    import math

    n = len(registry.all_queries())
    bound = math.ceil(n / registry.GATE_SIZE) + 1
    assert 16 - 12 <= bound  # the r12 rows seated this round
    assert 17 - 13 <= bound  # the r13 rows displaced to r17
