"""Bucketed-table co-location: the join on the bucket key must plan with no
Exchange (shuffle) and produce results identical to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from european_emissions_data_warehouse_spark.operators.bucketing import cluster_for_join
from european_emissions_data_warehouse_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # force the sort-merge path: at test scale everything fits the broadcast
    # threshold, which would bypass the bucketed co-location being tested
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    bo, bl = cluster_for_join(
        spark, orders, li, ["o_orderkey"], "b_orders", "b_lineitem", n_buckets=4
    )
    yield bo, bl
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def _join_agg(orders, li):
    return (
        orders.join(li, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("total"),
        )
        .orderBy("o_orderstatus")
    )


def test_bucketed_join_has_no_exchange(spark, bucketed):
    bo, bl = bucketed
    # the shuffle-heavy part is the join itself; check no Exchange feeds it
    joined = bo.join(bl, "o_orderkey").select("o_orderkey", "l_extendedprice")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"


def test_bucketed_join_matches_plain(spark, sf_dir, bucketed):
    bo, bl = bucketed
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    got = sorted(map(tuple, _join_agg(bo, bl).collect()))
    want = sorted(map(tuple, _join_agg(orders, li).collect()))
    assert got == want
