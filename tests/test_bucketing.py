"""Bucketed co-located join: pre-bucketing both sides of a recurring
fact-fact join on the join key removes the per-query shuffle entirely —
the 100 TB technique for repeated joins (SURVEY.md §2.7 / session notes).
This test proves the engine's session actually exploits it: the bucketed
join plan contains NO Exchange, the plain-parquet plan does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wikitrender_spark.schemas import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    wh = tmp_path_factory.mktemp("wh")
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    (orders.write.mode("overwrite").bucketBy(4, "o_orderkey")
     .sortBy("o_orderkey").option("path", str(wh / "orders_b"))
     .saveAsTable("orders_b"))
    (li.write.mode("overwrite").bucketBy(4, "l_orderkey")
     .sortBy("l_orderkey").option("path", str(wh / "lineitem_b"))
     .saveAsTable("lineitem_b"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def _join_plan(o, l) -> str:
    j = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    return j._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_shuffle(warehouse):
    spark = warehouse
    # disable auto-broadcast so the join strategy question is real even at
    # this tiny SF (at scale neither side broadcasts)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed = _join_plan(spark.table("orders_b"), spark.table("lineitem_b"))
        plain = _join_plan(
            load_table(spark, SF_DIR, "orders"),
            load_table(spark, SF_DIR, "lineitem"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the plan prints top-down, so everything after the SortMergeJoin line
    # is the join's inputs: bucketed sides are co-partitioned on the join
    # key and need no Exchange below the join; plain parquet sides must
    # each shuffle
    assert "SortMergeJoin" in bucketed
    assert "Exchange" not in bucketed.split("SortMergeJoin", 1)[1]
    assert "SortMergeJoin" in plain
    assert "Exchange" in plain.split("SortMergeJoin", 1)[1]
