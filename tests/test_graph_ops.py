"""Hand-computed tests for the edit-transition graph operators
(operators/graph.py): transition extraction, Markov row context, and the
fixed-point integer PageRank recurrence (every expected value below is
derived by hand in the comments)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wikitrender_spark.operators import graph
from wikitrender_spark.plans.relational_queries import (
    AUTOCORR_LAGS,
    hourly_autocorr,
)

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _events(spark, rows):
    # (user, minutes, seq, id)
    return spark.createDataFrame(
        [(u, T0 + dt.timedelta(minutes=m), s, i) for u, m, s, i in rows],
        "user string, ts timestamp, seq long, id string",
    )


def test_edit_transitions_drops_self_loops_and_counts(spark):
    ev = _events(spark, [
        # user A: P1, P1 (self-loop, dropped), P2, P3
        ("A", 0, 1, "P1"), ("A", 1, 2, "P1"),
        ("A", 2, 3, "P2"), ("A", 3, 4, "P3"),
        # user B: P2, P1, P2
        ("B", 0, 5, "P2"), ("B", 1, 6, "P1"), ("B", 2, 7, "P2"),
    ])
    got = sorted(map(tuple, graph.edit_transitions(ev).collect()))
    assert got == [
        ("P1", "P2", 2),  # A once, B once
        ("P2", "P1", 1),
        ("P2", "P3", 1),
    ]


def test_transition_order_uses_seq_tiebreak(spark):
    # same timestamp, seq decides: P9 (seq 1) then P8 (seq 2)
    ev = _events(spark, [("A", 0, 2, "P8"), ("A", 0, 1, "P9")])
    got = sorted(map(tuple, graph.edit_transitions(ev).collect()))
    assert got == [("P9", "P8", 1)]


def test_markov_top_transitions_row_context_and_tiebreak(spark):
    ev = _events(spark, [
        ("A", 0, 1, "P1"), ("A", 1, 2, "P2"),
        ("B", 0, 3, "P1"), ("B", 1, 4, "P2"),
        ("C", 0, 5, "P2"), ("C", 1, 6, "P1"),
        ("D", 0, 7, "P2"), ("D", 1, 8, "P3"),
    ])
    trans = graph.edit_transitions(ev)
    got = [tuple(r) for r in graph.markov_top_transitions(trans, k=3).collect()]
    # weights: P1->P2 w=2; P2->P1 w=1; P2->P3 w=1. out_w: P1=2, P2=2.
    # order: w desc, then (src, dst) asc for the tie.
    assert got == [
        ("P1", "P2", 2, 2),
        ("P2", "P1", 1, 2),
        ("P2", "P3", 1, 2),
    ]


def _pagerank_dict(trans, iters):
    return {
        r["node"]: r["score"]
        for r in graph.pagerank(trans, iters=iters).collect()
    }


def test_pagerank_two_node_cycle_is_stationary(spark):
    # A<->B, w=1 each: mass passed = floor(1e6*1/1) = 1e6;
    # score = 150000 + floor(85*1e6/100) = 1_000_000 every iteration.
    trans = spark.createDataFrame(
        [("A", "B", 1), ("B", "A", 1)], "src string, dst string, w long"
    )
    assert _pagerank_dict(trans, graph.PAGERANK_ITERS) == {
        "A": 1_000_000, "B": 1_000_000,
    }


def test_pagerank_fan_out_floor_division_by_hand(spark):
    # A->B (w=2), A->C (w=1); out_w(A)=3; A has no in-edges.
    # iter1: score(A) = 150000 (teleport only)
    #   mass(B) = floor(1e6*2/3) = 666666
    #     score(B) = 150000 + floor(85*666666/100)
    #              = 150000 + 566666 = 716666
    #   mass(C) = floor(1e6*1/3) = 333333
    #     score(C) = 150000 + floor(85*333333/100)
    #              = 150000 + 283333 = 433333
    # iter2 (A now 150000, stationary):
    #   mass(B) = floor(150000*2/3) = 100000 -> 150000 + 85000 = 235000
    #   mass(C) = floor(150000/3)   =  50000 -> 150000 + 42500 = 192500
    # iters >= 2 are fixed because A's score no longer changes.
    trans = spark.createDataFrame(
        [("A", "B", 2), ("A", "C", 1)], "src string, dst string, w long"
    )
    assert _pagerank_dict(trans, 1) == {
        "A": 150_000, "B": 716_666, "C": 433_333,
    }
    assert _pagerank_dict(trans, graph.PAGERANK_ITERS) == {
        "A": 150_000, "B": 235_000, "C": 192_500,
    }


def test_pagerank_topk_orders_and_breaks_ties_on_node(spark):
    # B and C end at the same score (192500 each: A->B w=1, A->C w=1);
    # tie broken by node id ascending.
    trans = spark.createDataFrame(
        [("A", "B", 1), ("A", "C", 1)], "src string, dst string, w long"
    )
    rows = [tuple(r) for r in graph.pagerank_topk(trans, k=3).collect()]
    # hand: iter>=2 -> A=150000; B=C=150000+floor(85*floor(150000/2)/100)
    #             = 150000 + floor(85*75000/100) = 150000+63750 = 213750
    assert rows == [("B", 213_750), ("C", 213_750), ("A", 150_000)]


def test_hourly_autocorr_hand_computed(spark):
    # one event_type, hourly counts [1, 2, 3, 5] over 4 consecutive hours
    rows = []
    counts = [1, 2, 3, 5]
    seq = 0
    for h, c in enumerate(counts):
        for _ in range(c):
            rows.append(("click", T0 + dt.timedelta(hours=h, minutes=seq % 60)))
            seq += 1
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {
        r["lag"]: (r["n_pairs"], r["num"], r["den_x"], r["den_y"])
        for r in hourly_autocorr(ev).collect()
    }
    # lag 1: x=[2,3,5] y=[1,2,3]: n=3 sx=10 sy=6 sxy=2+6+15=23
    #   sxx=4+9+25=38 syy=1+4+9=14
    #   num=3*23-10*6=9; den_x=3*38-100=14; den_y=3*14-36=6
    # lag 2: x=[3,5] y=[1,2]: n=2 sx=8 sy=3 sxy=3+10=13 sxx=34 syy=5
    #   num=2*13-24=2; den_x=2*34-64=4; den_y=2*5-9=1
    # lag 3: x=[5] y=[1]: n=1 -> num=5-5=0; den_x=25-25=0; den_y=0
    # lags 4..6: no pairs -> no rows
    assert got == {1: (3, 9, 14, 6), 2: (2, 2, 4, 1), 3: (1, 0, 0, 0)}
    assert set(got) <= set(AUTOCORR_LAGS)


# --- co-edit pairs -----------------------------------------------------------
def _coedit_events(spark, rows):
    # (user, is_bot, id) — one row per edit
    return spark.createDataFrame(
        [(u, b, i) for u, b, i in rows],
        "user string, is_bot boolean, id string",
    )


def test_coedit_pairs_counts_shared_editors_and_drops_bots(spark):
    ev = _coedit_events(spark, [
        # A: P1 x3, P2 x1, P3 x1 — cap=2 keeps P1 (3 edits) then the
        # (P2, P3) tie at 1 edit breaks by id asc -> P2
        ("A", False, "P1"), ("A", False, "P1"), ("A", False, "P1"),
        ("A", False, "P2"), ("A", False, "P3"),
        ("B", False, "P1"), ("B", False, "P2"),
        ("C", False, "P2"), ("C", False, "P3"),
        # bot co-edits P1+P2 — must NOT raise (P1,P2) to 3
        ("Z", True, "P1"), ("Z", True, "P2"),
    ])
    got = [tuple(r) for r in graph.coedit_pairs(ev, cap=2, k=25).collect()]
    # capped sets: A {P1,P2}, B {P1,P2}, C {P2,P3}
    # pairs: (P1,P2) shared by A,B = 2; (P2,P3) by C = 1
    assert got == [
        ("P1", "P2", 2, 1),
        ("P2", "P3", 1, 2),
    ]


def test_coedit_pairs_topk_tiebreak_is_lexicographic(spark):
    ev = _coedit_events(spark, [
        ("A", False, "P1"), ("A", False, "P2"),
        ("B", False, "P3"), ("B", False, "P4"),
    ])
    # both pairs have 1 shared editor; k=1 must keep (P1,P2) by id order
    got = [tuple(r) for r in graph.coedit_pairs(ev, cap=5, k=1).collect()]
    assert got == [("P1", "P2", 1, 1)]


# --- degree top-k ------------------------------------------------------------
def test_degree_topk_by_hand(spark):
    ev = _events(spark, [
        # A: P1 -> P2 -> P1; B: P1 -> P2; C: P3 -> P1
        ("A", 0, 1, "P1"), ("A", 1, 2, "P2"), ("A", 2, 3, "P1"),
        ("B", 0, 4, "P1"), ("B", 1, 5, "P2"),
        ("C", 0, 6, "P3"), ("C", 1, 7, "P1"),
    ])
    # trans: P1->P2 w=2, P2->P1 w=1, P3->P1 w=1
    got = [tuple(r) for r in
           graph.degree_topk(graph.edit_transitions(ev), k=5).collect()]
    # node, in_deg, out_deg, in_w, out_w, rank (total-degree desc, id asc)
    assert got == [
        ("P1", 2, 1, 2, 2, 1),  # in from P2,P3; out to P2 (w=2)
        ("P2", 1, 1, 2, 1, 2),
        ("P3", 0, 1, 0, 1, 3),  # pure source: in side coalesced to 0
    ]


# --- co-edit triangles -------------------------------------------------------
def test_coedit_triangles_by_hand(spark):
    # editor sets: P1&P2 share {A,B}; P1&P3 share {A,C}; P2&P3 share
    # {A,D}; P4 pairs with P1 only via E (w=1, cut by min_w=2)
    ev = _coedit_events(spark, [
        ("A", False, "P1"), ("A", False, "P2"), ("A", False, "P3"),
        ("B", False, "P1"), ("B", False, "P2"),
        ("C", False, "P1"), ("C", False, "P3"),
        ("D", False, "P2"), ("D", False, "P3"),
        ("E", False, "P1"), ("E", False, "P4"),
        ("F", False, "P1"), ("F", False, "P2"),  # (P1,P2) -> w=3
    ])
    got = [tuple(r) for r in
           graph.coedit_triangles(ev, cap=10, min_w=2, k=5).collect()]
    # one triangle: (P1,P2,P3) with w_ab=3 (P1P2), w_ac=2 (P1P3),
    # w_bc=2 (P2P3)
    assert got == [("P1", "P2", "P3", 3, 2, 2, 1)]


def test_coedit_triangles_count_matches_naive(spark):
    """Degree-ordered enumeration finds each triangle EXACTLY once:
    compare against a brute-force closure over the same thresholded
    pair relation on a denser random-ish (but deterministic) fixture."""
    import itertools

    rows = []
    # 8 pages, 12 users, deterministic membership: user u edits page p
    # iff (u*3 + p*p) % 4 < 2 — dense enough for several triangles
    for u in range(12):
        for p in range(8):
            if (u * 3 + p * p) % 4 < 2:
                rows.append((f"U{u}", False, f"P{p}"))
    ev = _coedit_events(spark, rows)
    pairs = {
        (r["page_a"], r["page_b"]): r["n_coeditors"]
        for r in graph.coedit_pair_weights(ev, cap=40).collect()
        if r["n_coeditors"] >= 2
    }
    naive = set()
    verts = sorted({v for p in pairs for v in p})
    for t in itertools.combinations(verts, 3):
        a, b, c = t
        if ((a, b) in pairs and (a, c) in pairs and (b, c) in pairs):
            naive.add(t)
    got = [tuple(r) for r in
           graph.coedit_triangles(ev, cap=40, min_w=2, k=1000).collect()]
    assert len(got) == len(naive) > 0
    assert {(r[0], r[1], r[2]) for r in got} == naive
    # weights on each triangle row match the pair relation
    for pa, pb, pc, wab, wac, wbc, _rank in got:
        assert (wab, wac, wbc) == (
            pairs[(pa, pb)], pairs[(pa, pc)], pairs[(pb, pc)]
        )
