"""Report-spec compiler: dialect parity + Catalyst pushdown verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from admob_data_pipeline_spark.sources.report_spec import ReportSpec, compile_report
from admob_data_pipeline_spark.sources.tables import load_table


def test_from_dict_reference_shape():
    """Accept the reference's JSON spec verbatim (main.py:122-136)."""
    spec = ReportSpec.from_dict(
        {
            "dateRange": {
                "startDate": {"year": 2024, "month": 1, "day": 5},
                "endDate": {"year": 2024, "month": 1, "day": 12},
            },
            "dimensions": ["DATE", "APP"],
            "metrics": ["CLICKS"],
            "dimensionFilters": [
                {"dimension": "APP", "matchesAny": {"values": ["a", "b"]}}
            ],
            "sortConditions": [{"dimension": "DATE", "order": "ASCENDING"}],
        }
    )
    assert spec.date_range == ("2024-01-05", "2024-01-12")
    assert spec.dimensions == ("DATE", "APP")
    assert spec.dimension_filters == {"APP": ("a", "b")}
    assert spec.sort_conditions == (("DATE", "ASCENDING"),)


def test_filters_push_to_parquet_scan(spark, sf_dir):
    """P7/P8 pushdown: the IN-list must reach the parquet scan
    (SURVEY.md §4 'Predicate pushdown')."""
    cust = load_table(spark, sf_dir, "customer")
    spec = ReportSpec(
        dimensions=("SEGMENT",),
        metrics=("BAL",),
        dimension_filters={"SEGMENT": ("BUILDING", "MACHINERY")},
    )
    df = compile_report(
        cust.withColumn("bal_c", (F.col("c_acctbal") * 100).cast("long")),
        spec,
        dim_cols={"SEGMENT": "c_mktsegment"},
        metric_cols={"BAL": "bal_c"},
        date_col="c_mktsegment",  # unused (no date_range)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "c_mktsegment" in plan
    got = {r.segment for r in df.collect()}
    assert got == {"BUILDING", "MACHINERY"}


def test_pre_aggregation_grain(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    from admob_data_pipeline_spark.operators.alerts import daily_fact

    fact = daily_fact(events)
    spec = ReportSpec(dimensions=("APP",), metrics=("IMPRESSIONS",))
    out = compile_report(
        fact, spec, dim_cols={"APP": "app_name"}, metric_cols={"IMPRESSIONS": "impressions"}
    )
    rows = out.collect()
    # one row per app, impressions == raw event count
    assert len(rows) == fact.select("app_name").distinct().count()
    assert sum(r.impressions for r in rows) == events.count()


def test_date_range_prunes_warehouse_partitions(spark, sf_dir):
    """P8 at warehouse scale: over the date-partitioned report warehouse
    a spec's dateRange must become PARTITION pruning (directories never
    read), and the IN-list must still push to the parquet row groups —
    the layout contract that makes per-date idempotent reload + scan
    efficiency hold at 100 TB."""
    from admob_data_pipeline_spark.sources.report_warehouse import (
        read_report_warehouse,
        report_fact_from_events,
    )

    wh = read_report_warehouse(spark, sf_dir)
    spec = ReportSpec(
        date_range=("2024-01-05", "2024-01-12"),
        dimensions=("DATE", "APP"),
        metrics=("CLICKS", "IMPRESSIONS"),
        dimension_filters={"APP": ("click", "view")},
        sort_conditions=(("DATE", "ASCENDING"), ("APP", "ASCENDING")),
    )
    dims = {"APP": "app_name", "UNIT": "ad_unit_name"}
    mets = {"CLICKS": "clicks", "IMPRESSIONS": "impressions"}
    df = compile_report(wh, spec, dim_cols=dims, metric_cols=mets)

    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = [l for l in plan.splitlines() if "FileScan" in l]
    assert scan, plan
    assert "PartitionFilters" in plan and "date" in plan
    # the date bounds must live in PartitionFilters, not the data filters
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "2024-01-05" in pf and "2024-01-12" in pf, pf
    assert "PushedFilters" in plan and "app_name" in plan

    # and the pruned scan computes the same report as the unpartitioned fact
    fact = report_fact_from_events(load_table(spark, sf_dir, "events"))
    expect = compile_report(fact, spec, dim_cols=dims, metric_cols=mets)
    assert df.collect() == expect.collect()


def test_mediation_warehouse_prunes_and_pushes_both_dims(spark, sf_dir):
    """S2 at warehouse scale: the mediation spec's dateRange must prune
    date partitions and BOTH monetization IN-lists (country, ad_source)
    must push to the parquet row groups — the mediation-grain twin of the
    network-warehouse contract above."""
    from admob_data_pipeline_spark.sources.report_warehouse import (
        mediation_fact_from_events,
        read_mediation_warehouse,
    )

    wh = read_mediation_warehouse(spark, sf_dir)
    spec = ReportSpec(
        date_range=("2024-01-04", "2024-01-18"),
        dimensions=("DATE", "AD_SOURCE", "COUNTRY"),
        metrics=("ESTIMATED_EARNINGS", "IMPRESSIONS"),
        dimension_filters={
            "AD_SOURCE": ("src0", "src1", "src2"),
            "COUNTRY": ("C0", "C2", "C3", "C5"),
        },
        sort_conditions=(("DATE", "ASCENDING"),),
    )
    dims = {"AD_SOURCE": "ad_source_name", "COUNTRY": "country"}
    mets = {"ESTIMATED_EARNINGS": "earn_micros", "IMPRESSIONS": "impressions"}
    df = compile_report(wh, spec, dim_cols=dims, metric_cols=mets)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "2024-01-04" in pf and "2024-01-18" in pf, pf
    pushed = next(l for l in plan.splitlines() if "PushedFilters: [" in l)
    assert "In(ad_source_name" in pushed and "In(country" in pushed, pushed

    # pruned scan == unpartitioned derivation
    fact = mediation_fact_from_events(load_table(spark, sf_dir, "events"))
    expect = compile_report(fact, spec, dim_cols=dims, metric_cols=mets)
    assert df.collect() == expect.collect()


def test_network_warehouse_full_grain_prunes_and_pushes(spark, sf_dir):
    """S1 at the FULL FIXTURES §2 grain: dateRange prunes partitions,
    the FORMAT and APP IN-lists push to row groups, the funnel metrics
    aggregate exactly as the unpartitioned derivation, and the
    zero-impression rows FIXTURES §2 demands exist in the warehouse."""
    from admob_data_pipeline_spark.sources.report_warehouse import (
        network_fact_from_events,
        read_network_warehouse,
    )

    wh = read_network_warehouse(spark, sf_dir)
    assert wh.where("impressions = 0").count() > 0  # SAFE_DIVIDE rows
    spec = ReportSpec(
        date_range=("2024-01-03", "2024-01-20"),
        dimensions=("DATE", "APP", "FORMAT"),
        metrics=("AD_REQUESTS", "CLICKS", "ESTIMATED_EARNINGS", "IMPRESSIONS"),
        dimension_filters={
            "FORMAT": ("Banner", "Rewarded", "Native advanced"),
            "APP": ("click", "view", "purchase"),
        },
        sort_conditions=(("DATE", "ASCENDING"),),
    )
    dims = {"APP": "app_name", "FORMAT": "format"}
    mets = {
        "AD_REQUESTS": "ad_requests",
        "CLICKS": "clicks",
        "ESTIMATED_EARNINGS": "earn_micros",
        "IMPRESSIONS": "impressions",
    }
    df = compile_report(wh, spec, dim_cols=dims, metric_cols=mets)

    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "2024-01-03" in pf and "2024-01-20" in pf, pf
    pushed = next(l for l in plan.splitlines() if "PushedFilters: [" in l)
    assert "In(format" in pushed and "In(app_name" in pushed, pushed

    fact = network_fact_from_events(load_table(spark, sf_dir, "events"))
    expect = compile_report(fact, spec, dim_cols=dims, metric_cols=mets)
    assert df.collect() == expect.collect()


def test_ctr_anomaly_warehouse_prunes_to_the_8_day_slice(spark, sf_dir):
    """The warehouse-backed alert's literal date bounds must land in
    PartitionFilters — at 100 TB the alert reads 8 partitions, not the
    table (the self-anchored crossJoin form cannot prune)."""
    from admob_data_pipeline_spark.plans.analytics_ext import (
        q_ctr_anomaly_warehouse,
    )

    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.sources.report_warehouse import (
        read_network_warehouse,
    )

    # derive the expected bounds the same way the query does — the driver
    # regenerates testdata between rounds, so fixture dates must not be
    # hardcoded (tables.py documents the schema-drift history)
    maxd = read_network_warehouse(spark, sf_dir).agg(F.max("date")).first()[0]
    import datetime

    lo = maxd - datetime.timedelta(days=7)

    df = q_ctr_anomaly_warehouse(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert str(lo) in pf and str(maxd) in pf, pf
    assert df.count() > 0


def test_network_dpp_join_prunes_partitions_at_runtime(spark, sf_dir):
    """The busy-dates join must produce a dynamicpruningexpression on
    the partitioned fact scan — runtime partition pruning with NO
    literal date predicate anywhere in the query."""
    from admob_data_pipeline_spark.plans.analytics_ext import (
        q_network_dpp_join,
    )

    df = q_network_dpp_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        l for l in plan.splitlines()
        if "FileScan" in l and "networkwh" in l
    )
    assert "dynamicpruningexpression" in scan, scan
    assert df.count() > 0


def test_mediation_dpp_join_prunes_partitions_at_runtime(spark, sf_dir):
    """Same DPP contract on the MEDIATION warehouse: the high-earn-dates
    join must land a dynamicpruningexpression on the partitioned
    mediation scan — no literal date predicate anywhere in the query."""
    from admob_data_pipeline_spark.plans.analytics_ext import (
        q_mediation_dpp_join,
    )

    df = q_mediation_dpp_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(
        l for l in plan.splitlines()
        if "FileScan" in l and "mediationwh" in l
    )
    assert "dynamicpruningexpression" in scan, scan
    assert df.count() > 0


def test_warehouse_funnel_compare_covers_both_systems_every_date(spark, sf_dir):
    from admob_data_pipeline_spark.plans.analytics_ext import (
        q_warehouse_funnel_compare,
    )

    rows = q_warehouse_funnel_compare(spark, sf_dir).collect()
    per_date = {}
    for r in rows:
        per_date.setdefault(r.date, set()).add(r.source_system)
        assert 0 <= r.match_rate_ppm <= 1_000_000
        assert r.matched_requests <= r.ad_requests
    assert per_date
    assert all(v == {"network", "mediation"} for v in per_date.values())
