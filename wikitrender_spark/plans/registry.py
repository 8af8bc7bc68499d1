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
#: Round-8 composition policy (the r07 window went 50/50 green; r07's
#: R08_DEFERRED promise is paid FIRST, per VERDICT r07 ask #1):
#: (a) the 23 R08_DEFERRED rows (last green r04 — the stalest evidence
#: in the registry; after this rotation no row's driver evidence is
#: older than two rounds, for the first time since r03);
#: (b) the round-8 additions (never driver-attested) — see the top of
#: the list; each displaces a (c) row into R09_DEFERRED
#: (tests/test_registry_gate.py pins that list);
#: (c) 27 − |new| of the 50 r06-attested rows, chosen module-order-first
#: so the wt_* reference-parity family re-attests on the freshest
#: testdata. The r06 rows NOT taken are PROMISED the r09 window
#: (they would be three rounds stale by r09 — same debt class the
#: R08_DEFERRED set was).
GATE_WINDOW: list[str] = [
    # (b) round-8 additions, never driver-attested (each displaced one
    # (c) row into R09_DEFERRED — see tests/test_registry_gate.py;
    # wt_ingest_dedup_watermark displaced ann_ivfpq_rerank, whose ADC
    # re-rank module stays exercised via the r09-promised ann cohort)
    "wt_ingest_dedup_watermark",
    # ann_ivf_rp_topk displaced tx_substring_scrub (its run-hash module
    # stays in-window via dd_substring_runs); wt_graph_degrees and
    # wt_coedit_triangles displaced dd_containment and
    # dd_jaccard_histogram (both shingle-family rows with the whole dd
    # cohort promised r09)
    "ann_ivf_rp_topk",
    "wt_graph_degrees",
    "wt_coedit_triangles",
    # tx_source_divergence displaced tx_dedup_lineage (lineage packing
    # keeps tx_pack/tx_pack_split in-window from the (a) cohort);
    # rel_weekday_profile displaced tx_split (its affine bucket rule
    # stays attested via tx_leakage_split, green r07)
    "tx_source_divergence",
    "rel_weekday_profile",
    # mm_video_motion displaced tx_vocab (the vocab family keeps
    # tx_bpe_merges, green r07); wt_edit_wars and rel_retention_cohorts
    # displaced tx_repetition and tx_token_stats (per-row text stats
    # stay attested via tx_quality/tx_length_histogram in the (a)
    # cohort)
    "mm_video_motion",
    "wt_edit_wars",
    "rel_retention_cohorts",
    # rel_copurchase_pairs and mm_audio_energy displaced
    # wt_stream_heavy_hitters and wt_state_diff (both r06-green with
    # heavy pytest coverage; the whole wt cohort re-attests r09)
    "rel_copurchase_pairs",
    "mm_audio_energy",
    # ann_filtered_topk displaced wt_lifecycle_replay (the lifecycle
    # fold keeps wt_page_state_lifecycle + wt_stream_replay in-window);
    # wt_stream_trending displaced wt_top_pages_per_wiki (per-key rank
    # stays attested via rel_topk_per_brand in the (a) cohort)
    "ann_filtered_topk",
    "wt_stream_trending",
    # wt_revert_chains displaced wt_biggest_movers (Q2's delta ranking
    # stays attested via the rel window/rank family in the (a) cohort)
    "wt_revert_chains",
    # (a) the R08_DEFERRED cohort, last green r04 — the promise
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
    # (c) r06-attested rows, module-order-first (wt_* parity family
    # first), re-attesting on current testdata
    "wt_page_state",
    "wt_most_edited",
    "wt_most_vibrant",
    "wt_purge_survivors",
    "wt_epm_variants",
    "wt_purge_safe_list",
    "wt_classify_counts",
    "wt_windowed_activity",
    "wt_session_activity",
    "wt_delete_targets",
    "wt_protect_followups",
    "wt_page_state_lifecycle",
    "wt_stream_replay",
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
