"""Unit tests for the flatten/coerce kernel (SURVEY.md §2.2 P1–P6, §1.4).

Pins every edge case from the reference's troubleshooting playbook
(README.md:225-228) and the fallback chains in save_CSV.py:73-101.
"""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from admob_data_pipeline_spark.functions.coerce import (
    dim_display,
    metric_float,
    metric_int,
)
from admob_data_pipeline_spark.functions.scalars import yyyymmdd_to_date
from admob_data_pipeline_spark.sources import chunks as chunks_mod

METRIC_T = StructType(
    [
        StructField("integerValue", StringType()),
        StructField("doubleValue", DoubleType()),
        StructField("microsValue", StringType()),
        StructField("decimalValue", StringType()),
        StructField("value", StringType()),
    ]
)
DIM_T = StructType(
    [StructField("value", StringType()), StructField("displayLabel", StringType())]
)


def _metric_df(spark, **fields):
    base = {k: None for k in ("integerValue", "doubleValue", "microsValue", "decimalValue", "value")}
    base.update(fields)
    return spark.createDataFrame(
        [Row(m=Row(**base))], StructType([StructField("m", METRIC_T)])
    )


def test_metric_int_fallback_chain(spark):
    # integerValue wins
    df = _metric_df(spark, integerValue="7", microsValue="999")
    assert df.select(metric_int(F.col("m")).alias("v")).first().v == 7
    # microsValue next (save_CSV.py:79-80)
    df = _metric_df(spark, microsValue="123456")
    assert df.select(metric_int(F.col("m")).alias("v")).first().v == 123456
    # decimalValue float-string for an int metric (save_CSV.py:81-86)
    df = _metric_df(spark, decimalValue="24.0")
    assert df.select(metric_int(F.col("m")).alias("v")).first().v == 24
    # last-resort `value`
    df = _metric_df(spark, value="3.9")
    assert df.select(metric_int(F.col("m")).alias("v")).first().v == 3
    # everything missing → 0 (save_CSV.py:87)
    df = _metric_df(spark)
    assert df.select(metric_int(F.col("m")).alias("v")).first().v == 0
    # unparseable → 0, never an error (ANSI-safe)
    df = _metric_df(spark, integerValue="garbage")
    assert df.select(metric_int(F.col("m")).alias("v")).first().v == 0


def test_metric_float_fallback_chain(spark):
    df = _metric_df(spark, doubleValue=1.5, decimalValue="9.9")
    assert df.select(metric_float(F.col("m")).alias("v")).first().v == 1.5
    df = _metric_df(spark, decimalValue="9.25")
    assert df.select(metric_float(F.col("m")).alias("v")).first().v == 9.25
    df = _metric_df(spark)
    assert df.select(metric_float(F.col("m")).alias("v")).first().v == 0.0


def test_dim_display_coalesce(spark):
    df = spark.createDataFrame(
        [
            Row(d=Row(value="raw", displayLabel="Nice")),
            Row(d=Row(value="raw", displayLabel=None)),
            Row(d=Row(value=None, displayLabel=None)),
        ],
        StructType([StructField("d", DIM_T)]),
    )
    got = [r.v for r in df.select(dim_display(F.col("d")).alias("v")).collect()]
    assert got == ["Nice", "raw", ""]


def test_yyyymmdd_guard(spark):
    df = spark.createDataFrame([("20240131",), ("1998-XX",), (None,)], ["raw"])
    got = [r.d for r in df.select(yyyymmdd_to_date(F.col("raw")).alias("d")).collect()]
    assert str(got[0]) == "2024-01-31"
    assert got[1] is None and got[2] is None


def test_flatten_drops_rowless_chunks_and_schema_is_fixed(spark):
    """S10 guard + the §1.4 schema-drift hazard: output schema is a function
    of the requested spec only, never of the payload branch used."""
    chunk_t = StructType(
        [
            StructField("chunk_id", LongType()),
            StructField(
                "row",
                StructType(
                    [
                        StructField("dimensionValues", MapType(StringType(), DIM_T)),
                        StructField("metricValues", MapType(StringType(), METRIC_T)),
                    ]
                ),
            ),
        ]
    )

    def metric(**f):
        base = {k: None for k in ("integerValue", "doubleValue", "microsValue", "decimalValue", "value")}
        base.update(f)
        return Row(**base)

    rows = [
        Row(chunk_id=1, row=None),  # header/footer chunk → dropped
        Row(
            chunk_id=2,
            row=Row(
                dimensionValues={"APP": Row(value="a1", displayLabel=None)},
                # micros branch → earnings_micros column
                metricValues={"ESTIMATED_EARNINGS": metric(microsValue="5000000")},
            ),
        ),
        Row(
            chunk_id=3,
            row=Row(
                dimensionValues={"APP": Row(value="a2", displayLabel=None)},
                # integer branch for the SAME metric — reference would emit a
                # different key here (fetch_mediation_report.py:100-111);
                # our output column set must not change.
                metricValues={"ESTIMATED_EARNINGS": metric(integerValue="7")},
            ),
        ),
    ]
    df = spark.createDataFrame(rows, chunk_t)
    flat = chunks_mod.flatten_chunks(
        df,
        dims=[chunks_mod.DimSpec("APP", "app_name")],
        metrics=[chunks_mod.MetricSpec("ESTIMATED_EARNINGS", "earnings_micros")],
    )
    got = {r.app_name: r.earnings_micros for r in flat.collect()}
    assert flat.columns == ["app_name", "earnings_micros"]
    assert got == {"a1": 5000000, "a2": 7}
