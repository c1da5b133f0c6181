"""Range join: bucketized == naive, and the bucketized plan is an
equi-join (no nested loop)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from admob_data_pipeline_spark.operators.rangejoin import range_join, range_join_naive
from admob_data_pipeline_spark.plans import explain


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def _data(spark):
    events = spark.createDataFrame(
        [
            Row(event_id=i, ts=_ts(f"2024-01-{d:02d}T{h:02d}:00:00"))
            for i, (d, h) in enumerate(
                [(1, 0), (1, 23), (2, 12), (5, 1), (9, 6), (15, 18), (20, 3)]
            )
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(iv="a", start_ts=_ts("2024-01-01T00:00:00"), end_ts=_ts("2024-01-02T00:00:00")),
            Row(iv="b", start_ts=_ts("2024-01-01T12:00:00"), end_ts=_ts("2024-01-06T00:00:00")),  # overlaps a
            Row(iv="c", start_ts=_ts("2024-01-19T00:00:00"), end_ts=_ts("2024-01-25T00:00:00")),
        ]
    )
    return events, intervals


def test_bucketized_equals_naive(spark):
    events, intervals = _data(spark)
    get = lambda df: sorted((r.event_id, r.iv) for r in df.collect())
    naive = get(range_join_naive(events, intervals, "ts", "start_ts", "end_ts"))
    fast = get(range_join(events, intervals, "ts", "start_ts", "end_ts"))
    assert fast == naive
    # overlapping intervals produce one row per (event, interval) match
    assert (0, "a") in naive and (1, "a") in naive and (1, "b") in naive


def test_bucketized_is_equijoin(spark):
    events, intervals = _data(spark)
    plan = explain.formatted_plan(
        range_join(events, intervals, "ts", "start_ts", "end_ts")
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
