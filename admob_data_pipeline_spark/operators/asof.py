"""As-of (point-in-time) join — a custom operator Spark's built-ins lack.

For each left row, attach the most recent right row (per key) with
``right.ts <= left.ts`` — the canonical time-series enrichment (trade↔quote,
event↔latest-state). DuckDB has it natively (``ASOF JOIN``), which makes a
perfect oracle; Spark does not, and the naive formulation
(range join + groupBy max) is a quadratic disaster on dense keys.

Implementation: the **union + carry-forward window** formulation —

1. tag right rows (carrying payload) and left rows (payload NULL),
2. union them, sort per key by (ts, tag) so a right row at the same
   timestamp sorts before the left rows it may serve,
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding window
   carries each right payload forward to every later left row,
4. keep the left rows.

Cost: ONE shuffle (the window partitioning by key) over |L|+|R| rows —
no join at all, no pair blow-up; skew follows the key distribution and is
AQE-splittable. This is the shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every ``left`` row + the latest ``right`` payload
    at-or-before its timestamp (NULL when no prior right row exists).

    ``left`` and ``right`` must both have columns ``on`` and ``ts``;
    ``payload_cols`` are taken from ``right`` and appear suffixed.
    """
    lcols = [c for c in left.columns]
    l_tagged = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        *[
            F.col(c) if c in (on, ts) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (_side=0) sort before left rows at equal ts → a right row
    # at exactly left.ts is visible to that left row (<= semantics)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols, *[f"{c}{suffix}" for c in payload_cols]
    )
