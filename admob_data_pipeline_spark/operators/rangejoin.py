"""Range (interval) join — event.ts ∈ [interval.start, interval.end].

Spark compiles a raw BETWEEN join predicate to BroadcastNestedLoopJoin
(fine only when one side is tiny). The scale path is **bucketized
containment**: discretize time into fixed-width buckets, explode each
interval into the buckets it covers, equi-join events to intervals on the
bucket, then refine with the exact BETWEEN predicate.

Cost: the nested-loop O(|E|·|I|) pair space becomes an equi-join whose
fan-out is |I| · (interval_width / bucket_width) replicated interval rows
— shuffle-partitionable by bucket, AQE-splittable on hot buckets. Pick
``bucket_width`` ≈ median interval width so each interval explodes to
O(1) buckets.

Both formulations return identical rows; the naive one is the oracle
shape, the bucketized one is the default.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_naive(
    events: DataFrame, intervals: DataFrame, ts: str, start: str, end: str
) -> DataFrame:
    """BETWEEN join — BroadcastNestedLoop; only for tiny interval sides."""
    return events.join(
        F.broadcast(intervals),
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)),
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_width_sec: int = 86400,
) -> DataFrame:
    """Bucketized containment join (the 100 TB formulation)."""
    b = lambda c: F.floor(F.col(c).cast("double") / bucket_width_sec).cast("long")
    ev = events.withColumn("_bucket", b(ts))
    # explode each interval into every bucket it overlaps
    iv = intervals.withColumn(
        "_bucket",
        F.explode(F.sequence(b(start), b(end))),
    )
    joined = ev.join(iv, "_bucket").where(
        (F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end))
    )
    return joined.drop("_bucket")
