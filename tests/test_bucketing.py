"""Bucketed co-located join (SURVEY.md §4.2 / the 100 TB join story):
writing both fact tables bucketed+sorted on the join key lets Spark plan
the join with ZERO Exchange — each task zips matching buckets straight
off the scan. This is the durable form of 'pre-partition once, join many
times': at 100 TB the shuffle this avoids IS the dominant cost of every
fact-fact join.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikitrender_spark.schemas import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    names = ("t_orders_bkt", "t_lineitem_bkt")
    for name, table, key in (
        (names[0], "orders", "o_orderkey"),
        (names[1], "lineitem", "l_orderkey"),
    ):
        (
            load_table(spark, SF_DIR, table)
            .write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    orders_b, lineitem_b = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table(orders_b)
            .join(
                spark.table(lineitem_b),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_extendedprice").alias("rev"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the join itself must consume bucketed scan output directly:
        # no shuffle below the SortMergeJoin (the single exchange allowed
        # is the one feeding the final groupBy on a DIFFERENT key)
        join_part = plan.split("SortMergeJoin")[-1]
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_part, join_part
        assert plan.count("Exchange") <= 1  # only the status groupBy

        # and the co-located plan returns the shuffled plan's rows (float
        # sums compare approx: parallel FP addition order differs)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        want = {
            r["o_orderstatus"]: r["rev"]
            for r in load_table(spark, SF_DIR, "orders")
            .join(
                load_table(spark, SF_DIR, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_orderstatus")
            .agg(F.sum("l_extendedprice").alias("rev"))
            .collect()
        }
        got = {r["o_orderstatus"]: r["rev"] for r in j.collect()}
        assert got == pytest.approx(want)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
