"""Date-partitioned report warehouse fixture (SURVEY.md §2.1 S1, §2.2 P7/P8).

The reference lands flattened report rows in BigQuery tables that are
date-partitioned and reloaded per-date (main.py:89-109 WRITE_APPEND after a
per-date DELETE; README.md "idempotent reload"). The Spark-side analogue of
that storage layout is a parquet table partitioned by ``date``: a report
spec's ``dateRange`` then becomes PARTITION PRUNING (directories never
listed) and its ``dimensionFilters`` become parquet row-group pushdown —
the scan-side behaviors a 100 TB warehouse lives or dies by.

``materialize_report_warehouse`` synthesizes the warehouse ONCE per sf_dir
from the events fact (deterministic projection, so a SQL oracle over
``events`` reproduces it exactly) and caches it in scratch, keyed by the
source file fingerprint — same contract as relational._chunk_fixture.
``compile_report`` plans read it like any fact table; tests assert the
pruning actually happens (tests/test_report_spec.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators.stats import VALUE_SCALE
from admob_data_pipeline_spark.sources.scratch import cached_parquet_dir


def report_fact_from_events(events: DataFrame) -> DataFrame:
    """Flattened network-report grain derived from the events fact:
    one row per event with the report's dimension/metric columns. The
    projection is deterministic so DuckDB can re-derive the warehouse
    from ``events`` for oracle checks."""
    return events.select(
        F.col("ts").cast("date").alias("date"),
        F.col("event_type").alias("app_name"),
        F.concat(F.lit("unit-"), (F.col("user_id") % 8).cast("string")).alias(
            "ad_unit_name"
        ),
        F.floor(F.col("value") * VALUE_SCALE).cast("long").alias("clicks"),
        F.lit(1).cast("long").alias("impressions"),
    )


def materialize_report_warehouse(spark: SparkSession, sf_dir: str) -> str:
    """Write (once) and return the path of the date-partitioned report
    warehouse for ``sf_dir`` (sources/scratch.py publish contract)."""

    def write(tmp: str) -> None:
        from admob_data_pipeline_spark.sources.tables import load_table

        fact = report_fact_from_events(load_table(spark, sf_dir, "events"))
        # One file per date partition: the fixture is small and a report
        # warehouse's partition grain (date) is the unit of idempotent
        # reload — matches sinks.writers.overwrite_partitions layout.
        fact.repartition("date").write.mode("overwrite").partitionBy(
            "date"
        ).parquet(tmp)

    return cached_parquet_dir(
        "reportwh", os.path.join(sf_dir, "events.parquet"), write
    )


def read_report_warehouse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(materialize_report_warehouse(spark, sf_dir))
