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
#: Round-10 composition policy (the r09 window went 50/50 green; the
#: R10_DEFERRED promise — the whole 48-row r07-evidence cohort — is
#: paid MINUS FOUR documented displacements, per the established rule:
#: 48 + 4 new + 2 stale = 54 > 50, and new/stale rows are never
#: deferred, so exactly four promised rows spill):
#: (a) 44 of the 48 R10_DEFERRED rows (last green r07; includes
#: rel_recursive_months, which is ALSO stale-by-code-change — its r10
#: bound-hoisting rewrite, VERDICT r9 ask #3). DISPLACED to r11:
#: rel_scalar_functions, rel_pivot_status, rel_corr_subquery,
#: rel_customers_without_orders (narrow scalar/pivot/subquery/anti-join
#: surfaces, code untouched since r07 — the lowest-risk spills; named
#: FIRST in the r11 promise, tests/test_registry_gate.py R11_DEFERRED);
#: (b) the round-10 additions (never driver-attested):
#: dd_simhash_tuning (VERDICT r9 ask #7), mm_image_neardup (perceptual
#: image dHash near-dup), tx_pii_scrub (PII redaction),
#: tx_dsir_weights (DSIR importance weighting);
#: (c) 2 rows staled mid-round by the ADVICE r9 multi-consumer-barrier
#: fix (localCheckpoint on their shared relations changed the plan):
#: rel_hourly_mad, rel_scd2_intervals.
#:
#: Attestation-cadence note (honest steady state): with 150 registered
#: queries and a fixed 50-row driver window, every row re-attests at
#: most every ceil(150/50) = 3 rounds — the "evidence never older than
#: two rounds" property of rounds 7-9 was an artifact of the registry
#: being < 150 rows with fresh additions dominating; from r10 on the
#: contract is "every row re-attests within 3 rounds, displacements
#: seated first", enforced by tests/test_registry_gate.py.
GATE_WINDOW: list[str] = [
    # (b) round-10 additions, never driver-attested
    "dd_simhash_tuning",
    "mm_image_neardup",
    "tx_pii_scrub",
    "tx_dsir_weights",
    # (c) stale-by-code-change re-attestations (ADVICE r9 fixes)
    "rel_hourly_mad",
    "rel_scd2_intervals",
    # (a) the R10_DEFERRED cohort, last green r07 — the promise, minus
    # the four documented displacements (rel_scalar_functions,
    # rel_pivot_status, rel_corr_subquery, rel_customers_without_orders
    # -> r11, seated first there)
    "rel_recursive_months",
    "rel_pricing_summary",
    "rel_json_props",
    "rel_sessionize",
    "rel_hourly_autocorr",
    "rel_hourly_ewma",
    "rel_percentiles",
    "rel_approx_percentiles",
    "rel_approx_segments",
    "rel_asof_last_signup",
    "rel_grouping_sets",
    "rel_interval_coverage",
    "rel_lateral_topk",
    "rel_order_gaps",
    "rel_salted_revenue",
    "rel_suppliers_with_shipments",
    "rel_value_pareto",
    "rel_window_rank_suite",
    "tx_bm25_topk",
    "tx_boilerplate",
    "tx_bpe_merges",
    "tx_chunks",
    "tx_collocations",
    "tx_leakage_split",
    "tx_mix_sample",
    "tx_mix_weights",
    "tx_novelty",
    "tx_pack_sharded",
    "tx_rarity",
    "tx_stratified_sample",
    "tx_tfidf_terms",
    "dd_cross_source_dups",
    "dd_embedding_neardup_exact",
    "dd_lsh_tuning",
    "dd_semantic_dedup",
    "ann_ivfpq_topk",
    "ann_kmeans_refine",
    "ann_range_search",
    "mm_wav_features",
    "mm_y4m_frames",
    "wt_coedit_pairs",
    "wt_ingest_dedup",
    "wt_markov_transitions",
    "wt_pagerank",
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
