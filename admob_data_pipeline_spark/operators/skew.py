"""Skew mitigation operators (salting) — the 100 TB answer to hot keys.

AQE's skew-join splitting (enabled in session.py) handles storage-level
skew at runtime; these utilities handle *semantic* skew — a groupBy or
join key whose value distribution is pathological (a handful of values
carrying most rows, e.g. 3 return flags over 6B lineitems):

- :func:`salted_group_agg` — two-stage aggregation: rows first aggregate
  on (key, salt) — fan-out S× more reducers for the hot key — then the
  per-salt partials combine on the key alone. The second shuffle moves
  only |keys|·S pre-aggregated rows. Works for any algebraic aggregate
  (sum/count/min/max here).
- :func:`replicated_skew_join` — broadcast-replicate the small side S
  times with an explicit salt column; each big-side row picks one salt, so
  a hot join key spreads over S partitions instead of one.

Salts derive from ``spark_partition_id()`` — no extra entropy column to
shuffle, naturally balanced with input partitioning, and (crucially)
results are salt-invariant: every salt assignment yields identical final
values because the aggregates are algebraic and the join replication is
exact. Oracle queries pin that invariance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def _salt(n_salts: int) -> Column:
    return (F.spark_partition_id() % n_salts).alias("_salt")


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-stage salted SUM/COUNT aggregation.

    ``sums`` maps output column name → input column to SUM; the row count
    comes along as ``n_rows``.
    """
    stage1 = (
        df.select(*keys, _salt(n_salts), *[F.col(c).alias(out) for out, c in sums.items()])
        .groupBy(*keys, "_salt")
        .agg(
            *[F.sum(out).alias(out) for out in sums],
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    return stage1.groupBy(*keys).agg(
        *[F.sum(out).alias(out) for out in sums],
        F.sum("n_rows").alias("n_rows"),
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Inner equi-join where ``key`` is skewed on the big side: the small
    side is replicated n_salts× (broadcast), the big side joins on
    (key, salt) so one hot key spreads across n_salts reducers."""
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn("_salt", F.spark_partition_id() % n_salts)
    return big_salted.join(F.broadcast(small_rep), [key, "_salt"]).drop("_salt")
