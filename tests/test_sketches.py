"""KMV sketch: estimation accuracy and exact-small-set behavior."""

from __future__ import annotations

from pyspark.sql import Row

from admob_data_pipeline_spark.operators.sketches import kmv_distinct


def test_small_groups_are_exact(spark):
    rows = [Row(g="a", v=str(i % 10)) for i in range(100)] + [
        Row(g="b", v=str(i % 3)) for i in range(30)
    ]
    out = {r.g: (r.ndv_est, r.is_exact) for r in kmv_distinct(spark.createDataFrame(rows), "g", "v").collect()}
    assert out == {"a": (10.0, True), "b": (3.0, True)}


def test_estimate_within_kmv_error_bound(spark):
    """k=64 → relative standard error ~ 1/sqrt(k-2) ≈ 12.7%; assert the
    estimate lands within 4 sigma of truth for a 5000-distinct group."""
    n = 5000
    rows = [Row(g="big", v=str(i)) for i in range(n)]
    est = kmv_distinct(spark.createDataFrame(rows), "g", "v").first()
    assert not est.is_exact
    assert abs(est.ndv_est - n) / n < 4 / (62 ** 0.5), est.ndv_est


def test_result_is_partitioning_invariant(spark):
    rows = [Row(g="x", v=str(i)) for i in range(1000)]
    df1 = spark.createDataFrame(rows).repartition(2)
    df2 = spark.createDataFrame(rows).repartition(17)
    e1 = kmv_distinct(df1, "g", "v").first().ndv_est
    e2 = kmv_distinct(df2, "g", "v").first().ndv_est
    assert e1 == e2  # merge of k-smallest == global k-smallest
