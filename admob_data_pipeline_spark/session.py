"""SparkSession builder with scale-appropriate defaults.

The reference runs single-process Python (SURVEY.md §6); our engine targets
a real cluster. These defaults are safe on ``local[N]`` and correct on a
1000-executor cluster:

- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuning.
- Dynamic partition overwrite: the idempotent per-date reload
  (reference ``native_CTR_alerts.py:182-212`` DELETE+append) becomes a
  single atomic-per-partition ``INSERT OVERWRITE``.
- Arrow enabled for the few Pandas-UDF operators (multimodal decode).
- Session timezone pinned to UTC so date truncation of timestamps is
  deterministic across driver environments.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "admob-data-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
