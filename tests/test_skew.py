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


def test_aqe_splits_skewed_sortmerge_join(spark):
    """AQE's automatic skew-join split must engage on a hot-key join once
    partition sizes cross the skew threshold — the zero-code complement to
    manual salting (at 100 TB both apply: salting for aggregations, AQE
    for joins). Pinned on the EXECUTED adaptive plan: the final
    SortMergeJoin must be marked skew=true."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        joined = left.join(right, "k")
        assert len(joined.collect()) == 270_100
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_skew_stress_join_splits_without_broadcast(spark):
    """The registered skew_stress_join picks broadcast at test scale (the
    right plan: orders fits the threshold). At 100 TB the dim side won't
    broadcast — pin that under a forced shuffle join AQE still splits the
    hot route_key, so the query survives the scale-up unchanged."""
    from admob_data_pipeline_spark.plans.analytics_ext import q_skew_stress_join
    from tests.conftest import SF001

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        # the join feeds an aggregation, so splitting the hot partition
        # costs one extra shuffle — worth it when the hot key dominates;
        # without force, AQE declines any split that adds a shuffle
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q_skew_stress_join(spark, SF001)
        assert len(df.collect()) == 5  # one row per priority
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:2000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_dense_global_index_matches_global_window(spark):
    """Two-phase distributed ranking must equal the single-partition
    global window for unique keys, with every window in its plan
    partitioned (no vocabulary-wide WindowExec funnel)."""
    from pyspark.sql import Row, Window
    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.operators.util import dense_global_index

    df = spark.createDataFrame([Row(k=(i * 37) % 5000) for i in range(5000)])
    got = {r.k: r.idx for r in dense_global_index(df, ["k"]).collect()}
    want = {
        r.k: r.idx
        for r in df.withColumn(
            "idx", F.row_number().over(Window.orderBy("k")) - 1
        ).collect()
    }
    assert got == want
    # the only unpartitioned window runs over n_parts offset rows
    plan = dense_global_index(df, ["k"])._jdf.queryExecution().executedPlan().toString()
    big_windows = [
        l for l in plan.splitlines()
        if "Window" in l and "_pid" not in l and "windowspecdefinition" in l.lower()
    ]
    assert all("_n" in l or "_off" in l for l in big_windows), big_windows
