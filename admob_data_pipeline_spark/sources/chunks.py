"""Raw report-chunk ingestion (SURVEY.md §2.2 P1–P6, §2.1 S10).

The reference consumes the AdMob API's chunked response — each chunk
optionally carrying ``row.dimensionValues`` / ``row.metricValues`` maps —
and flattens it row-at-a-time in Python (``parse_rows``, main.py:58-87;
save_CSV.py:154-186; fetch_mediation_report.py:79-113). Here the same
semantics are a single declarative ``select`` over the nested DataFrame:

- chunks without ``row`` are dropped (S10 / README.md:226 guard);
- dimensions coalesce ``displayLabel ?? value ?? ''`` (P5);
- the DATE dimension parses ``'YYYYMMDD'`` with a malformed→NULL guard (P6);
- metrics run the tagged-union fallback chain (P3/P4), defaulting to 0.

One declared output schema, enforced at the boundary — the
``fetch_mediation_report.py:100-111`` payload-dependent-schema hazard
(SURVEY.md §1.4) is impossible by construction: the output column set is a
function of the requested spec, never of the payload.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from admob_data_pipeline_spark.functions.coerce import (
    dim_display,
    metric_float,
    metric_int,
)
from admob_data_pipeline_spark.functions.scalars import yyyymmdd_to_date


@dataclass(frozen=True)
class DimSpec:
    """A requested dimension: API name → output column, with kind."""

    name: str  # key in row.dimensionValues
    out: str  # output column name
    kind: str = "string"  # 'string' (disp coalesce) | 'date' (YYYYMMDD parse)


@dataclass(frozen=True)
class MetricSpec:
    """A requested metric: API name → output column, with target type."""

    name: str  # key in row.metricValues
    out: str  # output column name
    kind: str = "int"  # 'int' (P3 chain) | 'float' (P4 chain)


def _dim_col(d: DimSpec) -> Column:
    v = F.col("row").getField("dimensionValues").getItem(d.name)
    if d.kind == "date":
        return yyyymmdd_to_date(v.getField("value")).alias(d.out)
    return dim_display(v).alias(d.out)


def _metric_col(m: MetricSpec) -> Column:
    v = F.col("row").getField("metricValues").getItem(m.name)
    if m.kind == "float":
        return metric_float(v).alias(m.out)
    return metric_int(v).alias(m.out)


def flatten_chunks(
    chunks: DataFrame, dims: list[DimSpec], metrics: list[MetricSpec]
) -> DataFrame:
    """Nested chunk DF → flat typed report DF.

    Pure column expressions (no Python UDF): the whole flatten/coerce stage
    stays inside one WholeStageCodegen span over the scan.
    """
    return chunks.where(F.col("row").isNotNull()).select(
        *[_dim_col(d) for d in dims], *[_metric_col(m) for m in metrics]
    )


NETWORK_DIMS = [
    DimSpec("DATE", "date", "date"),
    DimSpec("APP", "app_name"),
    DimSpec("FORMAT", "format"),
    DimSpec("AD_UNIT", "ad_unit_name"),
]

NETWORK_METRICS = [
    MetricSpec("AD_REQUESTS", "ad_requests", "int"),
    MetricSpec("CLICKS", "clicks", "int"),
    MetricSpec("ESTIMATED_EARNINGS", "estimated_earnings_micros", "int"),
    MetricSpec("IMPRESSIONS", "impressions", "int"),
    MetricSpec("IMPRESSION_CTR", "impression_ctr", "float"),
    MetricSpec("MATCHED_REQUESTS", "matched_requests", "int"),
    MetricSpec("MATCH_RATE", "match_rate", "float"),
    MetricSpec("IMPRESSION_RPM", "impression_rpm", "float"),
    MetricSpec("SHOW_RATE", "show_rate", "float"),
]


MEDIATION_DIMS = [
    DimSpec("DATE", "date", "date"),
    DimSpec("APP", "app_name"),
    DimSpec("AD_UNIT", "ad_unit_name"),
    DimSpec("AD_SOURCE", "ad_source_name"),
    DimSpec("AD_SOURCE_INSTANCE", "ad_source_instance_name"),
    DimSpec("MEDIATION_GROUP", "mediation_group_name"),
    DimSpec("COUNTRY", "country"),
]

MEDIATION_METRICS = [
    MetricSpec("AD_REQUESTS", "ad_requests", "int"),
    MetricSpec("CLICKS", "clicks", "int"),
    MetricSpec("ESTIMATED_EARNINGS", "estimated_earnings_micros", "int"),
    MetricSpec("IMPRESSIONS", "impressions", "int"),
    MetricSpec("IMPRESSION_CTR", "impression_ctr", "float"),
    MetricSpec("MATCHED_REQUESTS", "matched_requests", "int"),
    MetricSpec("MATCH_RATE", "match_rate", "float"),
    # mediation-only money metric (save_CSV.py:148-151,185)
    MetricSpec("OBSERVED_ECPM", "observed_ecpm_micros", "int"),
]


def synthesize_chunks_from_lineitem(lineitem: DataFrame) -> DataFrame:
    """Deterministic nested-chunk fixture derived from ``lineitem``.

    Exercises every edge the reference's troubleshooting playbook lists
    (README.md:225-228 + FIXTURES.md §1): ~5% header/footer chunks with
    ``row = NULL``; ~20% missing ``displayLabel``; a metric arriving via
    the ``decimalValue`` fallback; a missing metric key (→ 0 default);
    malformed (non-8-char) date strings.

    This is a test *fixture generator*, not a production source — the
    production path reads real API chunk JSON via ``spark.read.json`` with
    the same nested schema and the same :func:`flatten_chunks` kernel.
    """
    # nested map/struct construction is CPU-bound — don't inherit the
    # scan's (few) splits at test scale; no-op on multi-split inputs.
    # Project to the consumed columns FIRST so the (conditional) shuffle
    # never carries the table's full width.
    from admob_data_pipeline_spark.operators.util import widen_if_narrow

    lineitem = widen_if_narrow(
        lineitem.select(
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_returnflag", "l_shipdate",
        )
    )
    date_dim = F.struct(
        F.date_format(F.col("l_shipdate"), "yyyyMMdd").alias("value"),
        F.lit(None).cast("string").alias("displayLabel"),
    )
    # malformed date for ~2% of rows (P6 guard case)
    date_dim_bad = F.struct(
        F.lit("1998-XX").alias("value"), F.lit(None).cast("string").alias("displayLabel")
    )
    app_dim = F.struct(
        F.col("l_returnflag").alias("value"),
        F.when(F.col("l_partkey") % 5 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("App-"), F.col("l_returnflag")))
        .alias("displayLabel"),
    )

    def metric(
        integer: Column | None = None,
        double: Column | None = None,
        micros: Column | None = None,
        decimal: Column | None = None,
        value: Column | None = None,
    ) -> Column:
        null_s = F.lit(None).cast("string")
        null_d = F.lit(None).cast("double")
        return F.struct(
            (integer if integer is not None else null_s).alias("integerValue"),
            (double if double is not None else null_d).alias("doubleValue"),
            (micros if micros is not None else null_s).alias("microsValue"),
            (decimal if decimal is not None else null_s).alias("decimalValue"),
            (value if value is not None else null_s).alias("value"),
        )

    row = F.struct(
        F.map_from_arrays(
            F.array(F.lit("DATE"), F.lit("APP")),
            F.array(
                F.when(F.col("l_orderkey") % 50 == 0, date_dim_bad).otherwise(date_dim),
                app_dim,
            ),
        ).alias("dimensionValues"),
        F.map_from_arrays(
            F.array(
                F.lit("CLICKS"),
                F.lit("ESTIMATED_EARNINGS"),
                F.lit("IMPRESSION_CTR"),
                F.lit("QUANTITY"),
            ),
            F.array(
                # integerValue as string (API quirk, FIXTURES.md §1)
                metric(integer=F.col("l_linenumber").cast("string")),
                # micros branch; missing entirely for ~10% (→ 0 default)
                F.when(
                    F.col("l_suppkey") % 10 == 0, metric()
                ).otherwise(
                    metric(
                        micros=F.floor(F.col("l_extendedprice") * 1e6)
                        .cast("long")
                        .cast("string")
                    )
                ),
                metric(double=F.col("l_discount")),
                # decimalValue carrying a float string for an int metric
                # (save_CSV.py:81-86 fallback case)
                metric(decimal=F.col("l_quantity").cast("string")),
            ),
        ).alias("metricValues"),
    )
    chunk_row = F.when(F.col("l_orderkey") % 20 == 0, F.lit(None)).otherwise(row)
    return lineitem.select(
        F.monotonically_increasing_id().alias("chunk_id"), chunk_row.alias("row")
    )
