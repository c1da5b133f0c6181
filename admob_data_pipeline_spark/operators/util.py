"""Shared operator plumbing.

``widen_if_narrow`` fixes an under-parallelization pathology: a CPU-heavy
map-only kernel (per-shingle hashing, per-vector cosines) inherits the
scan's split count, and a small parquet file is ONE row group → ONE task,
so the whole kernel runs single-threaded no matter how many cores exist.

The helper round-robin-repartitions **only when the input has fewer
splits than the cluster's parallelism** — on a real 100 TB scan (tens of
thousands of splits) it is a strict no-op, so no shuffle is added at
scale; on small inputs it trades a trivial shuffle for full-width CPU.
Call it AFTER projection/filter (so pushdown still reaches the scan and
the shuffle carries only the needed columns) and BEFORE the expensive
per-row work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_if_narrow(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
