"""Property-based tests for the round-4 scale/densify helpers.

``dense_global_index`` must equal the single-partition global window for
ANY unique key set (the range boundaries Spark samples must never leak
into the values), and ``_densify_daily`` must be an exact zero-fill: one
row per calendar day per group, observed rows byte-identical, gaps
flagged obs=0 with vm=0.
"""

from __future__ import annotations

import datetime

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

PROPS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    keys=st.sets(st.integers(min_value=-(10**9), max_value=10**9), min_size=1, max_size=300),
    n_parts=st.integers(min_value=1, max_value=40),
)
@PROPS
def test_dense_global_index_equals_window_rank(spark, keys, n_parts):
    from admob_data_pipeline_spark.operators.util import dense_global_index

    df = spark.createDataFrame([Row(k=k) for k in keys])
    got = {
        r.k: r.idx
        for r in dense_global_index(df, ["k"], n_parts=n_parts).collect()
    }
    want = {k: i for i, k in enumerate(sorted(keys))}
    assert got == want


@given(
    series=st.dictionaries(
        st.sampled_from(["a", "b", "c"]),
        st.dictionaries(
            st.integers(min_value=0, max_value=60),  # day offsets
            st.integers(min_value=-(10**6), max_value=10**6),  # vm
            min_size=1,
            max_size=25,
        ),
        min_size=1,
        max_size=3,
    )
)
@PROPS
def test_densify_daily_is_exact_zero_fill(spark, series):
    from admob_data_pipeline_spark.operators.stats import _densify_daily

    base = datetime.date(2024, 1, 1)
    rows = [
        Row(g=g, d=base + datetime.timedelta(days=off), vm=vm)
        for g, days in series.items()
        for off, vm in days.items()
    ]
    out = {
        (r.g, r.d): (r.vm, r.obs)
        for r in _densify_daily(spark.createDataFrame(rows)).collect()
    }
    expect = {}
    for g, days in series.items():
        lo, hi = min(days), max(days)
        for off in range(lo, hi + 1):
            d = base + datetime.timedelta(days=off)
            expect[(g, d)] = (days[off], 1) if off in days else (0, 0)
    assert out == expect
