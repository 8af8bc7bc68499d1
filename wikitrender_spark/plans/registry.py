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
#: Round-5 composition policy (CORRECTNESS_r04.json attested all 50
#: round-4 window rows green, so the whole window rotates): (a) the
#: round-5 additions, never attested; (b) rows whose CODE changed this
#: round after their last attestation (tx_substring_scrub's coverage
#: surgery was rewritten; duplicate_clusters' propagation loop was
#:  restructured, feeding tx_dedup_lineage / tx_clean_corpus /
#: dd_dup_clusters) — a green r04 row for old code is not evidence for
#: new code; (c) the two r02-stale rows (pre-testdata-regeneration
#: evidence); (d) the remaining slots take the 51-row r03 cohort —
#: every wt_* reference-parity row re-gates. Left for the r06 window
#: (r03-green or better, multi-round-green, stable code):
#: rel_scalar_functions, rel_pivot_status, rel_json_props,
#: rel_approx_segments, rel_grouping_sets, rel_percentiles,
#: rel_corr_subquery, rel_suppliers_with_shipments,
#: rel_recursive_months, rel_approx_percentiles,
#: rel_customers_without_orders, rel_order_gaps, rel_lateral_topk,
#: rel_pricing_summary, rel_asof_last_signup, tx_chunks — 16 rows, ALL
#: promised an r06 slot (tests/test_registry_gate.py R06_DEFERRED pins
#: the list).
GATE_WINDOW: list[str] = [
    # (a) round-5 additions, never attested
    "wt_epm_variants",
    "wt_purge_safe_list",
    "ann_ivfpq_rerank",
    "dd_bloom_decontaminate",
    "tx_cms_terms",
    "wt_stream_heavy_hitters",
    "wt_state_diff",
    "rel_dq_audit",
    # (b) code changed after last attestation — must re-gate:
    # the scrub surgery rewrite; the duplicate_clusters restructure
    # (feeds lineage/clean-corpus/clusters AND the funnel); the
    # score_documents swap (clean-corpus + funnel); the PGM oracle
    # rewrite (replacement-byte CASE removed)
    "tx_substring_scrub",
    "tx_dedup_lineage",
    "tx_clean_corpus",
    "dd_dup_clusters",
    "tx_filter_funnel",
    "mm_pgm_features",
    # (c) r02-stale (pre-regeneration evidence)
    "rel_nation_set_ops",
    "rel_nation_presence",
    # (d) the r03 cohort: 14 wt_* reference-parity rows first
    "wt_page_state",
    "wt_most_edited",
    "wt_biggest_movers",
    "wt_most_vibrant",
    "wt_top_pages_per_wiki",
    "wt_purge_survivors",
    "wt_classify_counts",
    "wt_windowed_activity",
    "wt_session_activity",
    "wt_delete_targets",
    "wt_protect_followups",
    "wt_page_state_lifecycle",
    "wt_lifecycle_replay",
    "wt_stream_replay",
    "tx_token_stats",
    "tx_repetition",
    "tx_vocab",
    "tx_split",
    "dd_minhash_signatures",
    "dd_ngram_jaccard",
    "dd_lsh_candidates",
    "dd_near_duplicates",
    "dd_embedding_neardup",
    "dd_decontaminate",
    "dd_editdist_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_buckets",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "mm_media_features",
    "mm_frame_sample",
    # late round-5 LSH-scaffold change (shared dth checkpoint) — these
    # three consumers of _candidates_with_shingle_sets re-gate too
    "dd_minhash_est",
    "dd_jaccard_histogram",
    "dd_containment",
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
