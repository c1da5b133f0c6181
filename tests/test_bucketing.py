"""Bucketed co-located joins: the join on the bucket key must not shuffle
either bucketed side (no Exchange above the scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from admob_data_pipeline_spark.plans import explain
from admob_data_pipeline_spark.sinks import writers
from admob_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    writers.write_bucketed(li, "bkt_lineitem", "l_orderkey", n_buckets=8)
    writers.write_bucketed(o, "bkt_orders", "l_orderkey", n_buckets=8)
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    tl, to = bucketed_tables
    # hint("merge"): at test scale the optimizer would broadcast the small
    # side; a real fact-fact join is SMJ, which is where bucketing pays off
    joined = spark.table(tl).hint("merge").join(spark.table(to), "l_orderkey")
    agg = joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    plan = explain.formatted_plan(joined)
    # sort-merge join directly over the bucketed scans — zero Exchange
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # results match the unbucketed join
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    tl, _ = bucketed_tables
    agg = (
        spark.table(tl)
        .groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity").cast("long")).alias("q"))
    )
    plan = explain.formatted_plan(agg)
    assert "Exchange" not in plan, plan
