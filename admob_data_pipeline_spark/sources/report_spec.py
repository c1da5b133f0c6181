"""Report-spec → DataFrame compiler (SURVEY.md §2.1 S1/S2, §2.2 P7/P8, §2.6 O1).

The reference's "query language" is the AdMob report-spec JSON — a
declarative plan with ``dateRange``, ``dimensions``, ``metrics``,
``dimensionFilters`` (IN-list) and ``sortConditions`` — evaluated remotely
by the AdMob service (main.py:122-136; save_CSV.py:105-133;
native_CTR_alerts.py:109-132). Our engine keeps the dialect but compiles it
locally into a Catalyst logical plan over an event-grain fact table:

    spec ──compile──▶ filter(date BETWEEN …)      # P8 → partition pruning
                      .filter(dim ISIN …)          # P7 → parquet pushdown
                      .groupBy(dims)               # source pre-aggregation (§4)
                      .agg(SUM(metrics))
                      .orderBy(sortConditions)     # O1

Because the plan is declarative, Catalyst gives us the pushdowns the
reference got from the remote service for free: the date filter prunes
date partitions, the IN-list reaches the parquet row-group filter, and only
requested columns are scanned (verify via ``df.explain`` —
tests/test_report_spec.py asserts PushedFilters).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ReportSpec:
    """Mirror of the reference spec dict (main.py:122-136)."""

    date_range: tuple[str, str] | None = None  # (start, end) ISO dates, inclusive
    dimensions: tuple[str, ...] = ()
    metrics: tuple[str, ...] = ()
    dimension_filters: Mapping[str, tuple[str, ...]] = field(default_factory=dict)
    sort_conditions: tuple[tuple[str, str], ...] = ()  # (column, ASC|DESC)

    @classmethod
    def from_dict(cls, spec: dict) -> "ReportSpec":
        """Accept the reference's JSON shape verbatim."""
        dr = spec.get("dateRange")
        date_range = None
        if dr:
            fmt = lambda d: f"{d['year']:04d}-{d['month']:02d}-{d['day']:02d}" if isinstance(d, dict) else str(d)
            date_range = (fmt(dr["startDate"]), fmt(dr["endDate"]))
        filters = {}
        for f_ in spec.get("dimensionFilters", []):
            filters[f_["dimension"]] = tuple(f_["matchesAny"]["values"])
        sorts = tuple(
            (s.get("dimension") or s.get("metric"), s.get("order", "ASCENDING"))
            for s in spec.get("sortConditions", [])
        )
        return cls(
            date_range=date_range,
            dimensions=tuple(spec.get("dimensions", ())),
            metrics=tuple(spec.get("metrics", ())),
            dimension_filters=filters,
            sort_conditions=sorts,
        )


def compile_report(
    fact: DataFrame,
    spec: ReportSpec,
    dim_cols: Mapping[str, str],
    metric_cols: Mapping[str, str],
    date_col: str = "date",
) -> DataFrame:
    """Compile a spec against an event-grain fact DF.

    ``dim_cols`` / ``metric_cols`` map spec names (e.g. ``'APP'``) to fact
    columns. Output column names are the lower-cased spec names, summed at
    the requested dimension grain — matching the pre-aggregated rows the
    AdMob service returns (SURVEY.md §4 "Pre-aggregation at source").
    """
    df = fact
    if spec.date_range:
        start, end = spec.date_range
        df = df.where(F.col(date_col).between(F.lit(start), F.lit(end)))
    for dim, values in spec.dimension_filters.items():
        df = df.where(F.col(dim_cols[dim]).isin(list(values)))

    dim_out: list[Column] = []
    for d in spec.dimensions:
        src = date_col if d == "DATE" else dim_cols[d]
        dim_out.append(F.col(src).alias(d.lower()))
    aggs = [
        F.sum(F.col(metric_cols[m])).alias(m.lower()) for m in spec.metrics
    ]
    if spec.dimensions:
        out = (
            df.groupBy(*dim_out).agg(*aggs)
            if aggs
            else df.select(*dim_out).distinct()
        )
    else:
        out = df.agg(*aggs)

    if spec.sort_conditions:
        sort_cols = [
            F.col(name.lower()).desc()
            if order.upper().startswith("DESC")
            else F.col(name.lower())
            for name, order in spec.sort_conditions
        ]
        out = out.orderBy(*sort_cols)
    return out
