"""Salting utilities: salt-invariance and two-stage plan shape."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators import skew
from admob_data_pipeline_spark.plans import explain


def test_salted_agg_equals_plain(spark):
    df = spark.createDataFrame(
        [Row(k="hot", v=i) for i in range(1000)] + [Row(k="cold", v=1)]
    ).repartition(8)
    got = {
        r.k: (r.total, r.n_rows)
        for r in skew.salted_group_agg(df, ["k"], {"total": "v"}).collect()
    }
    assert got == {"hot": (sum(range(1000)), 1000), "cold": (1, 1)}


def test_salted_agg_is_two_stage(spark):
    df = spark.createDataFrame([Row(k="a", v=1)])
    plan = explain.formatted_plan(skew.salted_group_agg(df, ["k"], {"total": "v"}))
    # (key, salt) partial+final, then key partial+final = 4 HashAggregates
    assert plan.count("HashAggregate") >= 4


def test_replicated_join_equals_plain(spark):
    big = spark.createDataFrame(
        [Row(k="x", v=i) for i in range(500)] + [Row(k="y", v=0)]
    ).repartition(8)
    small = spark.createDataFrame([Row(k="x", label="hot"), Row(k="y", label="cold")])
    joined = skew.replicated_skew_join(big, small, "k")
    got = {
        r.label: r.n
        for r in joined.groupBy("label").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"hot": 500, "cold": 1}
    plan = explain.formatted_plan(joined)
    assert "BroadcastHashJoin" in plan
