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
#: Round-7 composition policy (the r06 window went 50/50 green, and the
#: r06-promised rotation was NOT delivered — r07 pays that debt first):
#: (a) the never-driver-attested rows — the round-6 additions
#: tx_bm25_topk / tx_collocations and this round's wt_ingest_dedup,
#: tx_novelty, dd_cross_source_dups, ann_rp_topk, dd_lsh_tuning;
#: (b) rows whose CODE changed this round after their last attestation —
#: tx_tfidf_terms (forced vocab-broadcast hint removed; bm25 and
#: collocations also changed but already sit in (a)) — a green r04 row
#: for old code is not evidence for new code;
#: (c) the 16 rows twice promised a slot (the r05/r06 deferral cohort:
#: rel_scalar_functions .. tx_chunks below), driver evidence three
#: rounds old at rotation time;
#: (d) 26 of the 42 remaining r04-attested rows. The 16 NOT taken —
#: dd_exact_groups, dd_simhash, rel_acctbal_band_pairs,
#: rel_cube_summary, rel_regional_revenue, rel_rolling_revenue_window,
#: rel_rollup_orders, rel_running_revenue, rel_signup_burst,
#: rel_small_quantity_revenue, rel_top_customers, rel_topk_per_brand,
#: rel_unpivot_presence, tx_fingerprint, tx_quality, tx_langid (the
#: last four displaced by the round-7 additions tx_novelty /
#: dd_cross_source_dups / ann_rp_topk / dd_lsh_tuning) —
#: are exactly the rows with the deepest multi-round green history
#: (r01+r02+r04) and untouched code; they are PROMISED the r08 window
#: (tests/test_registry_gate.py R08_DEFERRED pins the list). Adding a
#: query mid-round means adding it HERE too, displacing another (d) row
#: into R08_DEFERRED.
GATE_WINDOW: list[str] = [
    # (a) never driver-attested (incl. the round-7 additions; the
    # late-round-7 additions wt_pagerank / wt_markov_transitions /
    # rel_hourly_autocorr displaced tx_pack, tx_pack_split and
    # ann_pq_topk from (d) into R08_DEFERRED — each displaced row has an
    # in-window sibling exercising the same operator module
    # (tx_pack_sharded for the packing fold, ann_ivfpq_topk for the ADC
    # path), so no operator code path leaves the window)
    # (the continuation batch rel_sessionize / wt_coedit_pairs /
    # tx_stratified_sample / tx_leakage_split displaced ann_sq_topk,
    # rel_event_funnel, tx_length_histogram and dd_substring_runs from
    # (d) into R08_DEFERRED — ann_ivfpq_topk keeps the quantized-ANN
    # path in-window, the rel events family keeps hourly_anomalies/
    # ewma/autocorr, tx keeps a dozen siblings, and dd_substring_runs'
    # scrub sibling was attested r06)
    "rel_sessionize",
    "wt_coedit_pairs",
    "tx_stratified_sample",
    "tx_leakage_split",
    "wt_pagerank",
    "wt_markov_transitions",
    "rel_hourly_autocorr",
    "wt_ingest_dedup",
    "tx_bm25_topk",
    "tx_collocations",
    "tx_novelty",
    "dd_cross_source_dups",
    "ann_rp_topk",
    "dd_lsh_tuning",
    # (b) code changed this round after the r04 attestation
    "tx_tfidf_terms",
    # (c) the twice-promised R06_DEFERRED cohort (last green r03)
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
    # (d) the r04 cohort (two rounds stale), minus the 16 deferred
    "ann_ivfpq_topk",
    "ann_kmeans_refine",
    "ann_range_search",
    "dd_embedding_neardup_exact",
    "dd_semantic_dedup",
    "mm_wav_features",
    "mm_y4m_frames",
    "rel_hourly_anomalies",
    "rel_hourly_ewma",
    "rel_interval_coverage",
    "rel_salted_revenue",
    "rel_value_pareto",
    "rel_window_rank_suite",
    "tx_boilerplate",
    "tx_bpe_merges",
    "tx_mix_sample",
    "tx_mix_weights",
    "tx_pack_sharded",
    "tx_rarity",
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
