"""Pin the driver-gate window composition (ADVICE r3).

The driver's correctness gate attests only the first 50 registered
queries, so window membership is load-bearing evidence. These tests make
gate drift a CI failure instead of a round-verdict surprise: the window
must match registry.GATE_WINDOW exactly, and every query that has never
been driver-attested on current code must sit inside it.

The steady-state rotation contract itself lives on registry.GATE_WINDOW
(round 13, VERDICT r12 ask #1): new rows always seat; rule 4
(stale-by-code-change) overrides age; promised rows overflowing
GATE_SIZE displace to the next round with a per-row rationale and seat
FIRST there. The numbers below are that contract applied to round 17,
the second optimization round.
"""

from __future__ import annotations

from wikitrender_spark.plans import registry

#: Rule-4 rows for round 17: round-16 rewrites whose driver evidence
#: predates the rewrite (VERDICT r16 next-round #3's list, verbatim)
#: plus the round-17 behavior-touching changes (the six streaming
#: replay rows — scale-adaptive state partitions). The corpus_barrier
#: call-site conversions are mode-default-identity (see the
#: classification note on registry.GATE_WINDOW) and do not re-seat
#: rows by themselves.
RULE4_R16 = {
    "wt_state_diff", "dd_bloom_decontaminate", "dd_decontaminate",
    "wt_purge_safe_list", "tx_clean_corpus", "dd_near_duplicates",
    "dd_lsh_candidates", "dd_minhash_signatures", "wt_coedit_pairs",
    "wt_coedit_triangles", "wt_graph_degrees", "tx_ngram_ppl_buckets",
    "tx_ngram_ppl_approx_classes", "ann_pq_topk", "ann_ivfpq_topk",
    "tx_bpe_encode",
}
RULE4_R17 = {
    "wt_stream_replay", "wt_stream_heavy_hitters", "wt_ingest_dedup",
    "wt_ingest_dedup_watermark", "wt_stream_trending",
    "dd_stream_band_buckets",
}

#: The ten rows round 16 displaced to this window (r13 evidence — the
#: registry's oldest; rule 2 seats them FIRST), verbatim from round
#: 16's derivation.
R16_DISPLACED = {
    "ann_bruteforce_topk", "dd_lsh_tuning", "dd_simhash_tuning",
    "dd_semantic_dedup", "mm_image_neardup", "mm_video_neardup",
    "rel_percentiles", "tx_bpe_merges", "rel_hourly_autocorr",
    "wt_coedit_pairs",
}

#: The rows whose latest driver attestation was r14 when round 16
#: composed its window (= CORRECTNESS_r14.json keys minus
#: CORRECTNESS_r15.json keys — the FIXED population, 49 rows): their
#: evidence is now three rounds old, so together with the r16
#: displacement they were PROMISED this window.
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

#: The r17 promise as round 16 stated it (R14_COHORT | R16_DISPLACED,
#: 59 rows).
R17_PROMISE = R14_COHORT | R16_DISPLACED

#: Rows the r17 window could not seat: 59 promised + 20 rule-4 rows
#: outside the promise is far over GATE_SIZE, so the spill is the
#: largest yet — every displaced row carries a family-evidence +
#: code-untouched rationale on registry.GATE_WINDOW and seats FIRST in
#: r18. COMPLETENESS IS TESTED, not hand-maintained.
R18_DEFERRED = (R14_COHORT | R16_DISPLACED) - set(registry.GATE_WINDOW)

#: The r15-evidence cohort (= CORRECTNESS_r15.json keys minus
#: CORRECTNESS_r16.json keys; zero overlap measured, so this is the
#: full r15 window) — their evidence goes two rounds stale after r17,
#: so whatever of it does not re-attest NOW joins the r18 promise.
R15_COHORT = {
    "ann_filtered_topk", "ann_ivf_topk", "ann_lsh_topk", "ann_pq_topk",
    "ann_rp_topk", "ann_sq_topk", "dd_bloom_decontaminate",
    "dd_cdc_chunks", "dd_containment", "dd_decontaminate",
    "dd_dup_clusters", "dd_editdist_pairs", "dd_embedding_neardup",
    "dd_jaccard_histogram", "dd_lsh_candidates", "dd_minhash_signatures",
    "dd_near_duplicates", "dd_ngram_jaccard", "mm_audio_vad",
    "mm_media_features", "mm_pgm_features", "mm_video_keyframes",
    "rel_audience_overlap", "rel_corr_subquery", "rel_cube_summary",
    "rel_dq_audit", "rel_hourly_anomalies", "rel_nation_set_ops",
    "rel_pivot_status", "rel_regional_revenue", "rel_running_revenue",
    "rel_scalar_functions", "rel_top_customers", "rel_weekday_profile",
    "tx_bpe_encode", "tx_clean_corpus", "tx_cms_terms",
    "tx_dedup_lineage", "tx_filter_funnel", "tx_ngram_nll",
    "tx_ngram_ppl_approx_classes", "tx_ngram_ppl_buckets",
    "tx_repetition", "tx_split", "tx_substring_scrub", "tx_token_stats",
    "tx_vocab", "tx_winnowing", "wt_state_diff",
    "wt_stream_heavy_hitters",
}


def test_window_is_led_by_the_displaced_ten():
    """Rule 2's 'displaced rows seat FIRST': the ten rows round 16
    displaced hold slots 0-9, in round 16's order."""
    assert registry.GATE_WINDOW[:10] == [
        "ann_bruteforce_topk", "dd_lsh_tuning", "dd_simhash_tuning",
        "dd_semantic_dedup", "mm_image_neardup", "mm_video_neardup",
        "rel_percentiles", "tx_bpe_merges", "rel_hourly_autocorr",
        "wt_coedit_pairs",
    ]


def test_every_rule4_row_is_seated():
    """Rule 4 (stale-by-code-change overrides age): every round-16
    rewrite the r16 driver window never saw, and every round-17
    behavior-touching change, re-attests NOW."""
    missing = (RULE4_R16 | RULE4_R17) - set(registry.GATE_WINDOW)
    assert not missing, sorted(missing)


def test_r17_promise_is_paid_or_documented():
    """Every row round 16 promised this window either seats or is in
    the documented r18 deferral — nothing falls out silently."""
    missing = R17_PROMISE - set(registry.GATE_WINDOW)
    assert missing == R18_DEFERRED, sorted(
        missing.symmetric_difference(R18_DEFERRED)
    )
    # the spill is exactly the 23 rows rationalized on GATE_WINDOW
    assert len(R18_DEFERRED) == 23, sorted(R18_DEFERRED)


def test_displaced_rows_carry_no_rule4_debt():
    """A row may only be displaced if its code path had no
    behavior-affecting change in rounds 16-17 — i.e. the deferral set
    and the rule-4 set are disjoint."""
    assert not R18_DEFERRED & (RULE4_R16 | RULE4_R17)


def test_window_is_exactly_gate_size_and_registered():
    assert len(registry.GATE_WINDOW) == registry.GATE_SIZE
    assert len(set(registry.GATE_WINDOW)) == registry.GATE_SIZE
    names = set(registry.all_queries())
    assert set(registry.GATE_WINDOW) <= names
    # the registry reorder puts the window in the first GATE_SIZE slots
    assert list(registry.all_queries())[: registry.GATE_SIZE] == (
        registry.GATE_WINDOW
    )


def test_r18_promise_is_complete():
    """The r18 debt: the 23 displaced rows (seat first) plus every
    r15-evidence row not re-attesting now — stated here so round 18
    inherits a testable promise exactly as rounds 13-17 did."""
    r15_not_seated = R15_COHORT - set(registry.GATE_WINDOW)
    r18_promise = R18_DEFERRED | r15_not_seated
    # sanity: the promise is the usual steady-state overflow (> 50)
    assert len(r18_promise) == len(R18_DEFERRED) + len(r15_not_seated)
    assert len(r18_promise) > registry.GATE_SIZE


def test_evidence_age_bound_holds():
    """Rule 3 on this round's numbers: the oldest evidence seated this
    round (the ten r13 rows, age 4 at r17) and the oldest deferred (the
    r14 rows seating at r18, age 4) sit within the contract bound
    ceil(N / GATE_SIZE) + 1."""
    import math

    n = len(registry.all_queries())
    bound = math.ceil(n / registry.GATE_SIZE) + 1
    assert 17 - 13 <= bound  # the r13 rows seated this round
    assert 18 - 14 <= bound  # the r14 rows displaced to r18
