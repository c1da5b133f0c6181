"""Change-data-capture style compaction: latest-record-per-key merge.

Generalizes the reference's idempotent per-date overwrite (S8,
native_CTR_alerts.py:182-212 — delete one date, re-append) from
partition granularity to key granularity: given an append-only event log
where the same logical key is written many times, produce the current
snapshot (the newest record per key). This is the upsert/compaction half
of every incremental pipeline (BigQuery MERGE, Delta MERGE INTO) expressed
as a pure-Spark operator.

Deterministic total order: (ts DESC, event_id DESC) — the event_id
tie-break makes the winner unique even for equal timestamps, so the
snapshot is reproducible across engines and runs.

Scale notes (100 TB): one shuffle on the merge key; row_number needs only
a per-key sort (no global order). At real scale the same plan runs
incrementally per partition-date — compact only the dates an update
touched, exactly the reference's S8 re-run pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from admob_data_pipeline_spark.sources.tables import load_table


def latest_by_key(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Newest record per key under an explicit deterministic order."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current snapshot of the events log: newest event per
    (user_id, event_type)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts"),
        F.floor(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    snap = latest_by_key(
        ev,
        ["user_id", "event_type"],
        [F.desc("ts"), F.desc("event_id")],
    )
    return snap.select(
        "user_id",
        "event_type",
        "event_id",
        F.floor(F.col("ts").cast("double")).cast("long").alias("ts_sec"),
        "value_e4",
    ).orderBy("user_id", "event_type")


_ORACLE_MERGE_LATEST = """
SELECT user_id, event_type, event_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec,
       CAST(FLOOR(value * 10000) AS BIGINT) AS value_e4
FROM (
    SELECT user_id, event_type, event_id, ts, value,
           ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
)
WHERE rn = 1
ORDER BY user_id, event_type
"""


QUERIES = {
    "merge_latest": q_merge_latest,
}

ORACLES = {
    "merge_latest": _ORACLE_MERGE_LATEST,
}
