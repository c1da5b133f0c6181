"""Alert-family behavior pins (SURVEY.md §2.3 J1 fan-out, J2, A5/F12, W1)."""

from __future__ import annotations

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators import alerts


def _events(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                event_id=i,
                ts=datetime.datetime.fromisoformat(ts),
                user_id=uid,
                event_type=et,
                value=val,
                props="{}",
            )
            for i, (ts, uid, et, val) in enumerate(rows)
        ]
    )


def test_join_fanout_quirk_preserved(spark):
    """The reference joins today↔last7 on ad_unit_name ONLY while grouping
    by (app_name, ad_unit_name) (native_CTR_alerts.py:239-240 vs :262): a
    unit serving two apps fans out. Pin that ctr_anomaly_df reproduces it
    and ctr_anomaly_window (the corrected form) does not."""
    # two apps ('click' and 'view') share unit u1 (user_id=1 → u1)
    rows = []
    for day in range(1, 9):
        ts = f"2024-01-0{day}T10:00:00"
        rows.append((ts, 1, "click", 100.0))
        rows.append((ts, 1, "view", 200.0))
    # today (Jan 9): only 'click' has unit u1 activity
    rows.append(("2024-01-09T10:00:00", 1, "click", 100.0))
    ev = _events(spark, rows)

    quirk = alerts.ctr_anomaly_df(ev).collect()
    # today has 1 (app,unit) row, but last7 has 2 rows for u1 → fan-out to 2
    assert len(quirk) == 2
    assert {r.app_name for r in quirk} == {"click"}
    assert len({r.avg_ctr_7d for r in quirk}) == 2  # two different baselines

    fixed = alerts.ctr_anomaly_window(ev).collect()
    assert len(fixed) == 1  # corrected: each (app,unit) vs its own history
    assert fixed[0].pct_change == 0.0


def test_threshold_and_safe_divide(spark):
    # unit with zero trailing impressions never divides by zero
    rows = [("2024-01-09T10:00:00", 2, "click", 50.0)]  # today only, no history
    for day in range(1, 9):
        rows.append((f"2024-01-0{day}T10:00:00", 3, "view", 10.0))
    rows.append(("2024-01-09T10:00:00", 3, "view", 100.0))  # 10x spike
    ev = _events(spark, rows)
    out = {r.ad_unit_name: r for r in alerts.ctr_anomaly_window(ev).collect()}
    assert "u2" not in out  # no trailing window → no row (inner-join parity)
    assert out["u3"].is_alert  # +900% ≫ 25%


def test_alert_message_grouping(spark):
    rows = []
    for day in range(2, 9):
        rows.append((f"2024-01-0{day}T10:00:00", 4, "click", 10.0))
        rows.append((f"2024-01-0{day}T10:00:00", 5, "click", 10.0))
    rows.append(("2024-01-09T10:00:00", 4, "click", 100.0))
    rows.append(("2024-01-09T10:00:00", 5, "click", 100.0))
    ev = _events(spark, rows)
    msgs = alerts.format_alert_messages(alerts.ctr_anomaly_df(ev)).collect()
    assert len(msgs) == 1
    assert msgs[0].app_name == "click"
    assert msgs[0].message.count("\n") == 1  # two alert lines joined


def test_missing_units_anti_join(spark):
    configured = spark.createDataFrame(
        [Row(ad_unit_name="u1"), Row(ad_unit_name="u9")]
    )
    today = spark.createDataFrame([Row(ad_unit_name="u1", clicks=1)])
    missing = alerts.missing_units(configured, today).collect()
    assert [r.ad_unit_name for r in missing] == ["u9"]


def test_bq_dialect_rewriter_tokens():
    from admob_data_pipeline_spark.functions.dialect import bq_sql_to_spark

    src = (
        "SELECT SAFE_DIVIDE(a, b), DATE_SUB('2024-01-30', INTERVAL 7 DAY)\n"
        "FROM `demo-project.admob_exports.daily` ;"
    )
    out = bq_sql_to_spark(src)
    assert "try_divide(a, b)" in out
    assert "date_sub('2024-01-30', 7)" in out
    assert "`" not in out and "FROM daily" in out
    assert not out.endswith(";")


def test_bq_verbatim_matches_filtered_ansi_form(spark, sf_dir):
    """The verbatim-dialect execution must agree with the hand-translated
    ANSI form on which (app, unit) pairs alert (the reference's output is
    the is_alert=true subset with today's CTR from the daily report)."""
    from admob_data_pipeline_spark.operators.alerts import (
        ctr_anomaly_bq_verbatim,
        ctr_anomaly_sql,
    )

    bq = {(r.app_name, r.ad_unit_name) for r in ctr_anomaly_bq_verbatim(spark, sf_dir).collect()}
    ansi = {
        (r.app_name, r.ad_unit_name)
        for r in ctr_anomaly_sql(spark, sf_dir).collect()
        if r.is_alert
    }
    assert bq == ansi
