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


def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 history: each event's value is current from its own
    timestamp until the key's next event — ``lead()`` over the same
    deterministic (ts, event_id) order as the snapshot, open-ended for
    the latest record (valid_to NULL). One shuffle on the key; the
    interval build is a single-pass window, no self-join.

    This is the other half of CDC: ``merge_latest`` answers "what is
    current", this answers "what was true at time T" (join on
    ``valid_from_sec <= T < valid_to_sec``)."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "event_id",
        F.col("ts"),
        F.floor(F.col("value") * 10000).cast("long").alias("value_e4"),
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("ts"), F.asc("event_id")
    )
    return (
        ev.withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_type",
            "event_id",
            F.floor(F.col("ts").cast("double")).cast("long").alias("valid_from_sec"),
            F.floor(F.col("next_ts").cast("double")).cast("long").alias("valid_to_sec"),
            "value_e4",
        )
        .orderBy("user_id", "event_type", "valid_from_sec", "event_id")
    )


_ORACLE_SCD2 = """
SELECT user_id, event_type, event_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT) AS valid_from_sec,
       CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY user_id, event_type
                                       ORDER BY ts ASC, event_id ASC)))
            AS BIGINT) AS valid_to_sec,
       CAST(FLOOR(value * 10000) AS BIGINT) AS value_e4
FROM events
ORDER BY user_id, event_type, valid_from_sec, event_id
"""


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: list[str],
    partition_col: str = "date",
) -> DataFrame:
    """MERGE INTO semantics (update matched keys, insert new ones) as a
    pure-Spark plan, restricted to the partitions the update batch
    touches — the no-table-format rendition of Delta/BigQuery MERGE.

    Plan: the update batch's partition list is broadcast; target rows
    OUTSIDE those partitions never enter the job (semi-join prunes them
    at the scan at real scale via partition pruning on the read path).
    Within affected partitions, kept = target anti-join updates on the
    key, result = kept ∪ updates. Writing the result with dynamic
    partition overwrite (``overwrite_date_partitions``) completes the
    upsert atomically per partition — composing the reference's S8
    idempotent reload into key-granular MERGE."""
    affected = updates.select(partition_col).distinct()
    in_scope = target.join(F.broadcast(affected), partition_col, "left_semi")
    kept = in_scope.join(updates, keys, "left_anti")
    return kept.unionByName(updates)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end MERGE check entirely inside the plan: target = daily
    (date, user, type) rollup of even-numbered events; updates = the same
    rollup of a 'correction' batch (odd event ids of users 0-49, plus
    their new dates). Matched (date,user,type) rows must take the update
    value and unmatched rows within an affected partition keep the
    target. The result is partition-scoped: only partitions touched by
    the batch appear (merge_upsert semi-joins to the affected set —
    untouched partitions are never read or rewritten, which is the
    idempotent-overwrite contract, but their pass-through is therefore
    not exercised by this query; the oracle mirrors the same scope)."""
    ev = load_table(spark, sf_dir, "events")
    daily = lambda df: (  # noqa: E731 - local shorthand
        df.groupBy(
            F.col("ts").cast("date").alias("date"),
            "user_id",
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("vm"),
        )
    )
    target = daily(ev.where(F.col("event_id") % 2 == 0))
    updates = daily(
        ev.where((F.col("event_id") % 2 == 1) & (F.col("user_id") < 50))
    )
    return merge_upsert(target, updates, ["date", "user_id", "event_type"]).orderBy(
        "date", "user_id", "event_type"
    )


_ORACLE_MERGE_UPSERT = """
WITH daily_t AS (
    SELECT CAST(ts AS DATE) AS date, user_id, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS vm
    FROM events WHERE event_id % 2 = 0
    GROUP BY 1, 2, 3
),
daily_u AS (
    SELECT CAST(ts AS DATE) AS date, user_id, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT) AS vm
    FROM events WHERE event_id % 2 = 1 AND user_id < 50
    GROUP BY 1, 2, 3
),
affected AS (SELECT DISTINCT date FROM daily_u),
kept AS (
    SELECT t.* FROM daily_t t
    JOIN affected a USING (date)
    WHERE NOT EXISTS (
        SELECT 1 FROM daily_u u
        WHERE u.date = t.date AND u.user_id = t.user_id
          AND u.event_type = t.event_type
    )
)
SELECT * FROM kept
UNION ALL
SELECT * FROM daily_u
ORDER BY date, user_id, event_type
"""


AS_OF_T = "2024-01-15 00:00:00"  # mid-range point-in-time for the snapshot


def q_as_of_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time query over the SCD2 history: the value of every
    (user, event_type) key AS OF a fixed timestamp T — the "what did the
    table say last Tuesday" read that the intervalized history exists to
    answer. One filter over the interval table: valid_from ≤ T < valid_to
    (open-ended current rows use NULL valid_to).

    Scale: the interval build is the scd2 single-pass window; the as-of
    read is a pure filter — no join, no shuffle beyond the history's
    own."""
    hist = q_scd2_intervals(spark, sf_dir)
    t = F.unix_timestamp(F.lit(AS_OF_T), "yyyy-MM-dd HH:mm:ss")
    return (
        hist.where(
            (F.col("valid_from_sec") <= t)
            & (F.col("valid_to_sec").isNull() | (F.col("valid_to_sec") > t))
        )
        .select("user_id", "event_type", "event_id", "valid_from_sec", "value_e4")
        .orderBy("user_id", "event_type")
    )


_ORACLE_AS_OF = f"""
WITH hist AS (
    SELECT user_id, event_type, event_id,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS valid_from_sec,
           CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY user_id, event_type
                                           ORDER BY ts ASC, event_id ASC)))
                AS BIGINT) AS valid_to_sec,
           CAST(FLOOR(value * 10000) AS BIGINT) AS value_e4
    FROM events
)
SELECT user_id, event_type, event_id, valid_from_sec, value_e4
FROM hist
WHERE valid_from_sec <= epoch(TIMESTAMP '{AS_OF_T}')
  AND (valid_to_sec IS NULL OR valid_to_sec > epoch(TIMESTAMP '{AS_OF_T}'))
ORDER BY user_id, event_type
"""


QUERIES = {
    "merge_latest": q_merge_latest,
    "scd2_intervals": q_scd2_intervals,
    "merge_upsert": q_merge_upsert,
    "as_of_snapshot": q_as_of_snapshot,
}

ORACLES = {
    "merge_latest": _ORACLE_MERGE_LATEST,
    "scd2_intervals": _ORACLE_SCD2,
    "merge_upsert": _ORACLE_MERGE_UPSERT,
    "as_of_snapshot": _ORACLE_AS_OF,
}
