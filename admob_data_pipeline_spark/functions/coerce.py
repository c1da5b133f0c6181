"""Null-safe coercion kernel (SURVEY.md §2.2 P3–P5) as column expressions.

The reference implements these as per-row Python helpers ``get_int`` /
``get_float`` / ``disp`` (save_CSV.py:73-101,165-167;
native_CTR_alerts.py:78-106). Here each is a single Catalyst expression
over the tagged-union metric struct — vectorized, codegen'd, no Python.

The metric struct (FIXTURES.md §1) is
``STRUCT<integerValue STRING, doubleValue DOUBLE, microsValue STRING,
decimalValue STRING, value STRING>`` — exactly one branch set per row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def metric_int(metric: Column) -> Column:
    """P3 — tagged union → int64 with the reference's fallback chain
    ``integerValue → microsValue → decimalValue → value → 0``.

    Reference: save_CSV.py:73-87 (incl. the float-string-for-int case at
    :81-86 — handled by try_cast via double), native_CTR_alerts.py:78-90.
    Missing key / NULL struct → 0 (save_CSV.py:87).
    """
    return F.coalesce(
        metric.getField("integerValue").try_cast("long"),
        metric.getField("microsValue").try_cast("long"),
        metric.getField("decimalValue").try_cast("double").try_cast("long"),
        metric.getField("value").try_cast("double").try_cast("long"),
        F.lit(0).cast("long"),
    )


def metric_float(metric: Column) -> Column:
    """P4 — tagged union → float64, chain ``doubleValue → decimalValue →
    value → 0.0``. Reference: save_CSV.py:89-101, native_CTR_alerts.py:92-102.
    """
    return F.coalesce(
        metric.getField("doubleValue").cast("double"),
        metric.getField("decimalValue").try_cast("double"),
        metric.getField("value").try_cast("double"),
        F.lit(0.0),
    )


def dim_display(dim: Column) -> Column:
    """P5 — dimension display coalesce ``displayLabel ?? value ?? ''``.

    Reference: save_CSV.py:165-167, native_CTR_alerts.py:104-106.
    """
    return F.coalesce(dim.getField("displayLabel"), dim.getField("value"), F.lit(""))
