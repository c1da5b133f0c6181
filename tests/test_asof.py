"""As-of join semantics: at-or-before matching, per-key isolation,
no-prior-row NULLs, equal-timestamp visibility, and the one-shuffle plan."""

from __future__ import annotations

import datetime

from pyspark.sql import Row

from admob_data_pipeline_spark.operators.asof import asof_join
from admob_data_pipeline_spark.plans import explain


def _ts(s):
    return datetime.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            Row(event_id=1, user_id=1, ts=_ts("2024-01-01T10:00:00")),
            Row(event_id=2, user_id=1, ts=_ts("2024-01-01T12:00:00")),
            Row(event_id=3, user_id=1, ts=_ts("2024-01-01T09:00:00")),  # before any
            Row(event_id=4, user_id=2, ts=_ts("2024-01-01T11:00:00")),  # other key
        ]
    )
    right = spark.createDataFrame(
        [
            Row(user_id=1, ts=_ts("2024-01-01T09:30:00"), price=10),
            Row(user_id=1, ts=_ts("2024-01-01T11:00:00"), price=20),
            # equal-ts case: must be visible to a left row at the same instant
            Row(user_id=2, ts=_ts("2024-01-01T11:00:00"), price=99),
        ]
    )
    out = {
        r.event_id: r.price_asof
        for r in asof_join(left, right, "user_id", "ts", ["price"]).collect()
    }
    assert out == {1: 10, 2: 20, 3: None, 4: 99}


def test_asof_is_single_shuffle_no_join(spark):
    left = spark.createDataFrame([Row(event_id=1, user_id=1, ts=_ts("2024-01-01T10:00:00"))])
    right = spark.createDataFrame([Row(user_id=1, ts=_ts("2024-01-01T09:00:00"), price=1)])
    plan = explain.formatted_plan(asof_join(left, right, "user_id", "ts", ["price"]))
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                    "BroadcastNestedLoopJoin"):
        assert join_op not in plan, join_op
    assert plan.count("Exchange") <= 2  # union sides partition once by key
