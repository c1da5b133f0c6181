"""Declared schemas for every boundary (SURVEY.md §1).

One schema per surface, enforced at read time — the reference's three
coexisting schema modes (fixed / autodetect / table-owned, §1.4) collapse
to explicit ``StructType`` everywhere.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DateType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Raw AdMob response chunk (FIXTURES.md §1): the only nested data in the
# system. ``spark.read.json(path, schema=RAW_CHUNK_SCHEMA)`` ingests the
# production API dump; sources/chunks.py flattens it.
DIMENSION_VALUE = StructType(
    [
        StructField("value", StringType()),
        StructField("displayLabel", StringType()),
    ]
)

METRIC_VALUE = StructType(
    [
        StructField("integerValue", StringType()),
        StructField("doubleValue", DoubleType()),
        StructField("microsValue", StringType()),
        StructField("decimalValue", StringType()),
        StructField("value", StringType()),
    ]
)

RAW_CHUNK_SCHEMA = StructType(
    [
        StructField("chunk_id", LongType()),
        StructField(
            "row",
            StructType(
                [
                    StructField(
                        "dimensionValues", MapType(StringType(), DIMENSION_VALUE)
                    ),
                    StructField("metricValues", MapType(StringType(), METRIC_VALUE)),
                ]
            ),
        ),
    ]
)

# Flattened network report (reference native_CTR_alerts.py:136-140;
# README.md DDL): the date-partitioned fact table.
NETWORK_REPORT_SCHEMA = StructType(
    [
        StructField("date", DateType()),
        StructField("app_name", StringType()),
        StructField("format", StringType()),
        StructField("ad_unit_name", StringType()),
        StructField("ad_requests", LongType()),
        StructField("clicks", LongType()),
        StructField("estimated_earnings_micros", LongType()),
        StructField("impressions", LongType()),
        StructField("impression_ctr", DoubleType()),
        StructField("matched_requests", LongType()),
        StructField("match_rate", DoubleType()),
        StructField("impression_rpm", DoubleType()),
        StructField("show_rate", DoubleType()),
    ]
)

# Mediation report adds the mediation dims + observed_ecpm
# (save_CSV.py:145-152, README.md:157-174).
MEDIATION_REPORT_SCHEMA = StructType(
    [
        StructField("date", DateType()),
        StructField("app_name", StringType()),
        StructField("ad_unit_name", StringType()),
        StructField("ad_source_name", StringType()),
        StructField("ad_source_instance_name", StringType()),
        StructField("mediation_group_name", StringType()),
        StructField("country", StringType()),
        StructField("ad_requests", LongType()),
        StructField("clicks", LongType()),
        StructField("estimated_earnings_micros", LongType()),
        StructField("impressions", LongType()),
        StructField("impression_ctr", DoubleType()),
        StructField("matched_requests", LongType()),
        StructField("match_rate", DoubleType()),
        StructField("observed_ecpm_micros", LongType()),
    ]
)
