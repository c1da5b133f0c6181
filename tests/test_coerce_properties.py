"""Property-based tests: the column-expression coercion kernel must agree
with a direct Python transcription of the reference semantics
(save_CSV.py:73-101) on arbitrary tagged-union payloads."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from admob_data_pipeline_spark.functions.coerce import metric_float, metric_int
from tests.test_coerce import METRIC_T


def ref_metric_int(m: dict) -> int:
    """Python transcription of the reference fallback chain
    (integerValue → microsValue → decimalValue → value → 0), with the
    engine's ANSI-safe twist: unparseable branches fall through."""
    for key, via_float in (
        ("integerValue", False),
        ("microsValue", False),
        ("decimalValue", True),
        ("value", True),
    ):
        v = m.get(key)
        if v is None:
            continue
        try:
            return int(float(v)) if via_float else int(v)
        except (TypeError, ValueError):
            continue
    return 0


def ref_metric_float(m: dict) -> float:
    for key in ("doubleValue", "decimalValue", "value"):
        v = m.get(key)
        if v is None:
            continue
        try:
            return float(v)
        except (TypeError, ValueError):
            continue
    return 0.0


int_string = st.integers(min_value=-(2**40), max_value=2**40).map(str)
float_string = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
).map(lambda x: repr(round(x, 6)))
garbage = st.sampled_from(["abc", "", "12x", "--3", " 7 "])
maybe_str = st.one_of(st.none(), int_string, float_string, garbage)

metric_struct = st.fixed_dictionaries(
    {
        "integerValue": maybe_str,
        "doubleValue": st.one_of(
            st.none(),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        "microsValue": maybe_str,
        "decimalValue": maybe_str,
        "value": maybe_str,
    }
)


@settings(max_examples=15, deadline=None)
@given(st.lists(metric_struct, min_size=1, max_size=40))
def test_metric_int_matches_reference_semantics(spark, metrics):
    df = spark.createDataFrame(
        [Row(m=Row(**m)) for m in metrics], StructType([StructField("m", METRIC_T)])
    )
    got = [r.v for r in df.select(metric_int(F.col("m")).alias("v")).collect()]
    want = [ref_metric_int(m) for m in metrics]
    assert got == want


@settings(max_examples=15, deadline=None)
@given(st.lists(metric_struct, min_size=1, max_size=40))
def test_metric_float_matches_reference_semantics(spark, metrics):
    df = spark.createDataFrame(
        [Row(m=Row(**m)) for m in metrics], StructType([StructField("m", METRIC_T)])
    )
    got = [r.v for r in df.select(metric_float(F.col("m")).alias("v")).collect()]
    want = [ref_metric_float(m) for m in metrics]
    assert got == want
