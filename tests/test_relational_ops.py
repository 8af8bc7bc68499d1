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


def test_salted_join_is_result_identical_to_plain_join(spark):
    from wikitrender_spark.plans.relational_queries import salted_join

    # hot key 1 carries 100 of 103 fact rows
    fact = spark.createDataFrame(
        [(1, i, float(i)) for i in range(100)]
        + [(2, 0, 5.0), (3, 0, 7.0), (3, 1, 9.0)],
        "k long, line int, v double",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "a"), (3, "b")], "k long, name string"
    )
    plain = fact.join(dim, "k").select("k", "line", "v", "name")
    salted = salted_join(fact, dim, "k", ["k", "line"]).select(
        "k", "line", "v", "name"
    )
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the hot key's rows really do spread across salts (the point)
    from pyspark.sql import functions as F

    n_salts = (
        fact.filter(F.col("k") == 1)
        .select(F.pmod(F.xxhash64("k", "line"), F.lit(8)).alias("s"))
        .distinct()
        .count()
    )
    assert n_salts > 1


def test_hourly_anomalies_integer_sigma_hand_computed(spark):
    from wikitrender_spark.plans.relational_queries import hourly_anomalies

    # build events directly: type A has 1 event in each of 8 hours and
    # 20 events in hour 9; type B is flat (never anomalous)
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h in range(8):
        rows.append((eid, 1, t0 + dt.timedelta(hours=h), "A"))
        eid += 1
    for _ in range(20):
        rows.append((eid, 1, t0 + dt.timedelta(hours=8, minutes=eid % 50), "A"))
        eid += 1
    for h in range(9):
        rows.append((eid, 2, t0 + dt.timedelta(hours=h), "B"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = hourly_anomalies(ev)
    got = {
        (r["event_type"], r["hour"].hour): (r["n_events"], r["is_anomaly"])
        for r in out.collect()
    }
    # type A: n=9 hours, sx=28, sxx=408 -> for x=20: (9*20-28)^2 = 23104
    # > 4*(9*408 - 784) = 11552 -> anomaly; for x=1: (9-28)^2=361 < 11552
    assert got[("A", 8)] == (20, True)
    for h in range(8):
        assert got[("A", h)] == (1, False)
    # type B: zero variance, zero deviation -> strictly-greater is False
    for h in range(9):
        assert got[("B", h)][1] is False


def test_hourly_ewma_hand_computed(spark):
    from wikitrender_spark.plans.relational_queries import hourly_ewma

    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    eid = 0
    for h, n in [(0, 4), (1, 8), (2, 2)]:
        for _ in range(n):
            rows.append((eid, 1, t0 + dt.timedelta(hours=h, minutes=eid % 55), "A"))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    out = sorted(hourly_ewma(ev).collect(), key=lambda r: r["hour"])
    assert [r["n_events"] for r in out] == [4, 8, 2]
    # ewma_1 = 4; 0.25*8 + 0.75*4 = 5; 0.25*2 + 0.75*5 = 4.25
    assert [r["ewma"] for r in out] == [4.0, 5.0, 4.25]


def test_value_pareto_hand_computed(spark):
    from wikitrender_spark.plans.relational_queries import q_value_pareto
    import wikitrender_spark.plans.relational_queries as R

    t0 = dt.datetime(2024, 3, 1)
    rows = [
        (1, 10, t0, "purchase", 6.0),
        (2, 10, t0, "purchase", 4.0),  # user 10: 10.00
        (3, 20, t0, "purchase", 30.0),  # user 20: 30.00
        (4, 30, t0, "view", 99.0),  # not a purchase
        (5, 30, t0, "purchase", 10.0),  # user 30: 10.00 (ties user 10)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    orig = R.load_table
    try:
        R.load_table = lambda *a: ev
        out = {r["user_rank"]: r for r in q_value_pareto(spark, "x").collect()}
    finally:
        R.load_table = orig
    assert out[1]["user_id"] == 20 and out[1]["cum_value"] == 30.0
    # tie at 10.0 breaks by user_id asc
    assert out[2]["user_id"] == 10 and out[2]["cum_value"] == 40.0
    assert out[3]["user_id"] == 30 and out[3]["cum_value"] == 50.0
    assert out[1]["cum_share"] == 0.6
    assert out[3]["cum_share"] == 1.0


def test_dq_audit_counts_injected_defects(spark):
    # tiny tables with one defect of each class: a duplicate order key,
    # a NULL custkey, a bad status, an over-cap price, an out-of-range
    # quantity, an over-cap discount, a NULL shipdate, an orphan
    # lineitem, and an orphan order — every violation counter must
    # observe exactly its planted defects, and only those checks fail
    import datetime as dt

    from wikitrender_spark.plans.relational_queries import dq_audit

    t = dt.datetime(2024, 1, 1)
    orders = spark.createDataFrame(
        [
            (1, 10, "O", 100.0, t, "1-URGENT"),
            (1, 10, "F", 200.0, t, "1-URGENT"),      # dup key
            (2, None, "P", 300.0, t, "2-HIGH"),      # null custkey
            (3, 10, "X", 400.0, t, "2-HIGH"),        # bad status
            (4, 10, "O", 999_999.0, t, "2-HIGH"),    # over price cap
            (5, 99, "O", 500.0, t, "2-HIGH"),        # orphan order (cust 99)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 1, 5.0, 0.01, t),
            (1, 2, 99.0, 0.02, t),                   # qty out of range
            (2, 1, 5.0, 0.09, t),                    # discount over cap
            (3, 1, 5.0, 0.01, None),                 # null shipdate
            (777, 1, 5.0, 0.01, t),                  # orphan lineitem
        ],
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_discount double, l_shipdate timestamp",
    )
    customer = spark.createDataFrame(
        [(10, "c10")], "c_custkey long, c_name string"
    )
    rows = {r["check_id"]: r for r in dq_audit(orders, li, customer).collect()}
    expected = {
        "orders_row_count": (6.0, True),
        "orders_key_unique": (1.0, False),
        "orders_custkey_complete": (1.0, False),
        "orders_status_domain": (1.0, False),
        "orders_price_cap": (1.0, False),
        "lineitem_row_count": (5.0, True),
        "lineitem_qty_range": (1.0, False),
        "lineitem_discount_cap": (1.0, False),
        "lineitem_shipdate_complete": (1.0, False),
        "lineitem_order_fk": (1.0, False),
        "orders_customer_fk": (2.0, False),  # null custkey is an orphan too
    }
    assert set(rows) == set(expected)
    for cid, (obs, passed) in expected.items():
        assert rows[cid]["observed"] == obs, (cid, rows[cid])
        assert rows[cid]["passed"] == passed, (cid, rows[cid])


def test_dq_audit_empty_tables_still_report_verdicts(spark):
    # an empty table is the case an audit most needs to flag: every
    # check must still produce a non-NULL verdict (sum over zero rows
    # is NULL without the coalesce)
    from wikitrender_spark.plans.relational_queries import dq_audit

    orders = spark.createDataFrame(
        [],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [],
        "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_discount double, l_shipdate timestamp",
    )
    customer = spark.createDataFrame([], "c_custkey long, c_name string")
    rows = {r["check_id"]: r for r in dq_audit(orders, li, customer).collect()}
    assert len(rows) == 11
    for cid, r in rows.items():
        assert r["observed"] is not None, cid
        assert r["passed"] is not None, cid
    assert rows["orders_row_count"]["passed"] is False  # empty fails rowcount
    assert rows["orders_custkey_complete"]["passed"] is True
