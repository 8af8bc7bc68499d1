"""Hand-computed behavioral tests for the round-4 relational additions:
rank-function window suite, interval->bin coverage, event funnel."""

from __future__ import annotations

import datetime as dt

from wikitrender_spark.plans.relational_queries import (
    event_funnel,
    interval_coverage,
    window_rank_suite,
)


def test_window_rank_suite_hand_computed(spark):
    rows = [
        (1, "A", 10.0),
        (2, "A", 20.0),
        (3, "A", 20.0),  # acctbal tie broken by custkey
        (4, "A", 30.0),
        (5, "B", 1.0),
        (6, "B", 2.0),
        (7, "B", 3.0),
        (8, "B", 4.0),
        (9, "B", 5.0),
    ]
    c = spark.createDataFrame(
        rows, "c_custkey long, c_mktsegment string, c_acctbal double"
    )
    out = {r["c_custkey"]: r for r in window_rank_suite(c).collect()}
    # segment A: 4 rows -> quartiles 1..4; pct_rank (rank-1)/3; cume n/4
    assert [out[k]["quartile"] for k in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[1]["pct_rank"] == 0.0
    assert out[2]["pct_rank"] == round(1 / 3, 6)
    assert out[3]["pct_rank"] == round(2 / 3, 6)
    assert out[4]["pct_rank"] == 1.0
    assert [out[k]["cume"] for k in (1, 2, 3, 4)] == [0.25, 0.5, 0.75, 1.0]
    # segment B: 5 rows into 4 buckets -> sizes 2,1,1,1
    assert [out[k]["quartile"] for k in (5, 6, 7, 8, 9)] == [1, 1, 2, 3, 4]


def test_interval_coverage_hand_computed(spark):
    ts = dt.datetime
    orders = spark.createDataFrame(
        [
            (1, 7, ts(2020, 1, 15)),
            (2, 8, ts(2020, 2, 20)),
            (3, 7, ts(2020, 3, 10)),
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    lines = spark.createDataFrame(
        [
            (1, ts(2020, 2, 10)),
            (1, ts(2020, 3, 2)),  # order 1 spans Jan-Mar
            (2, ts(2020, 2, 25)),  # order 2 spans Feb only
            (3, ts(2020, 3, 1)),  # ships BEFORE the order date -> greatest
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    out = {
        r["month"]: r for r in interval_coverage(orders, lines).collect()
    }
    assert set(out) == {ts(2020, 1, 1), ts(2020, 2, 1), ts(2020, 3, 1)}
    jan, feb, mar = out[ts(2020, 1, 1)], out[ts(2020, 2, 1)], out[ts(2020, 3, 1)]
    assert (jan["n_active_orders"], jan["n_customers"]) == (1, 1)
    assert (feb["n_active_orders"], feb["n_customers"]) == (2, 2)
    # order 1 (cust 7) and order 3 (cust 7): 2 active, 1 distinct customer
    assert (mar["n_active_orders"], mar["n_customers"]) == (2, 1)


def test_event_funnel_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    rows = [
        # user 1: clean chain within 6h -> complete
        (1, 1, t0, "view"),
        (2, 1, t0 + h, "click"),
        (3, 1, t0 + 2 * h, "purchase"),
        # user 2: click arrives after the 6h window -> incomplete
        (4, 2, t0, "view"),
        (5, 2, t0 + 7 * h, "click"),
        (6, 2, t0 + 8 * h, "purchase"),
        # user 3: right events, wrong order -> incomplete
        (7, 3, t0, "purchase"),
        (8, 3, t0 + h, "click"),
        (9, 3, t0 + 2 * h, "view"),
        # user 4: purchase lands exactly at the 6h bound (inclusive)
        (10, 4, t0, "view"),
        (11, 4, t0 + h, "click"),
        (12, 4, t0 + 6 * h, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = {r["user_id"]: r for r in event_funnel(ev).collect()}
    assert [out[u]["funnel_complete"] for u in (1, 2, 3, 4)] == [1, 0, 0, 1]
    assert (out[1]["n_views"], out[1]["n_clicks"], out[1]["n_purchases"]) == (
        1,
        1,
        1,
    )
    assert (out[3]["n_views"], out[3]["n_clicks"], out[3]["n_purchases"]) == (
        1,
        1,
        1,
    )
