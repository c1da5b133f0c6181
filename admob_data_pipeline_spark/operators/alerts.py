"""CTR-anomaly alert query family (SURVEY.md §2 W1/W2, A1/A2, J1/J2, P9–P12, O2).

The reference's whole "analytics engine" is one BigQuery SQL string
(native_CTR_alerts.py:215-268): CTE ``last7`` (7-day trailing group-agg with
ratio-of-sums CTR), CTE ``today`` (current-day group-agg), inner join,
``pct_change`` score, threshold filter, ORDER BY. Here it is implemented
twice over one Spark surface and cross-checked:

- :func:`ctr_anomaly_sql` — ANSI SQL translation run by ``spark.sql``;
- :func:`ctr_anomaly_window` — idiomatic DataFrame/Window form (trailing
  range window instead of CTE + self-join).

Domain mapping onto the driver testdata ``events`` table (FIXTURES.md §4):
``app_name := event_type``, ``ad_unit_name := 'u' || user_id % 8``,
``clicks := floor(value * 1000)`` (int-scaled so sums are exact and
order-independent), ``impressions := row count``. The "report date" is the
max event date, computed as a scalar aggregate (broadcast cross-join — no
driver-side collect, scale-safe).

Deliberately preserved quirk (SURVEY.md §2.3): the reference groups by
``(app_name, ad_unit_name)`` but joins today↔last7 on ``ad_unit_name``
ONLY (native_CTR_alerts.py:239-240 vs :262) — an ad unit serving two apps
fans out. We keep those semantics bit-for-bit; ``tests/test_alerts.py``
pins the fan-out.

Scale notes: the 7-day fact slice is small relative to the raw events
(group-agg shrinks to |apps|x|units| rows), so the today↔last7 join is a
broadcast hash join; the heavy lifting is the partial+final hash
aggregation, which Spark does map-side first — one shuffle of pre-agg'd
rows, no shuffle of raw events beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from admob_data_pipeline_spark.functions.scalars import pct_change, safe_divide
from admob_data_pipeline_spark.sources.tables import load_table

DEFAULT_THRESHOLD = 25.0


def daily_fact(events: DataFrame) -> DataFrame:
    """events → daily per-(app, unit) fact at the reference report grain.

    ``clicks`` is int-scaled from the double ``value`` so that SUM is exact
    integer arithmetic (order-independent across partitions — required for
    bit-identical results vs any oracle).
    """
    return events.select(
        F.col("ts").cast("date").alias("date"),
        F.col("event_type").alias("app_name"),
        F.concat(F.lit("u"), (F.col("user_id") % 8).cast("string")).alias("ad_unit_name"),
        F.floor(F.col("value") * 1000).cast("long").alias("clicks"),
        F.lit(1).cast("long").alias("impressions"),
    )


def _with_report_date(fact: DataFrame) -> DataFrame:
    """Attach scalar max(date) via broadcast cross-join (no collect)."""
    report_date = fact.agg(F.max("date").alias("report_date"))
    return fact.crossJoin(F.broadcast(report_date))


def ctr_anomaly_df(
    events: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """DataFrame translation of native_CTR_alerts.py:226-268 (CTE+join form)."""
    return ctr_anomaly_from_fact(daily_fact(events), threshold)


def ctr_anomaly_from_fact(
    daily: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """Core W1 logic over any daily fact with columns
    (date, app_name, ad_unit_name, clicks, impressions) — used both by the
    events-derived analogue and by the report-table alert job
    (pipelines.ctr_alert_job)."""
    fact = _with_report_date(daily)

    last7 = (
        fact.where(
            F.col("date").between(
                F.date_sub(F.col("report_date"), 7), F.date_sub(F.col("report_date"), 1)
            )
        )
        .groupBy("app_name", "ad_unit_name")
        .agg(
            safe_divide(F.sum("clicks"), F.sum("impressions")).alias("avg_ctr_7d"),
        )
    )
    today = (
        fact.where(F.col("date") == F.col("report_date"))
        .groupBy("app_name", "ad_unit_name")
        .agg(safe_divide(F.sum("clicks"), F.sum("impressions")).alias("today_ctr"))
    )
    # Reference quirk: join on ad_unit_name only (see module docstring).
    joined = today.join(
        F.broadcast(last7.select("ad_unit_name", "avg_ctr_7d")).hint("broadcast"),
        on="ad_unit_name",
        how="inner",
    )
    scored = joined.select(
        "app_name",
        "ad_unit_name",
        F.round("today_ctr", 6).alias("today_ctr"),
        F.round("avg_ctr_7d", 6).alias("avg_ctr_7d"),
        pct_change(F.col("today_ctr"), F.col("avg_ctr_7d"), 4).alias("pct_change"),
    ).withColumn("is_alert", F.abs(F.col("pct_change")) > F.lit(threshold))
    return scored.orderBy(F.desc("pct_change"), "app_name", "ad_unit_name")


def ctr_anomaly_bq_verbatim(
    spark: SparkSession,
    sf_dir: str,
    threshold: int = 25,
    report_date=None,
) -> DataFrame:
    """The reference's BigQuery SQL accepted VERBATIM: this function
    builds the alert statement exactly the way
    ``native_CTR_alerts.py:215-268`` does — backticked fully-qualified
    table, quoted IN-list placeholder, ISO report-date literal,
    SAFE_DIVIDE / DATE_SUB-INTERVAL dialect, trailing semicolon — and
    executes it through :func:`functions.dialect.bq_sql_to_spark`, the
    pre-parse shim SURVEY §4 prescribes instead of a Catalyst extension.

    Unlike ``ctr_anomaly_sql`` (the hand-translated ANSI form, which
    keeps every row with an is_alert flag), this reproduces the
    reference's exact output contract: today's CTR read from the daily
    report's precomputed ``impression_ctr`` column, the >threshold
    filter applied, ROUND at 4/4/2, join fanning out on ad_unit_name.

    ``report_date``: pass an explicit ``datetime.date`` to splice an ISO
    literal exactly as the reference's REPORT_DATE env parameter does (X2
    backfill arg). Default ``None`` computes it as an uncorrelated scalar
    subquery ``(SELECT MAX(date) ...)`` inside the statement. The daily
    view is checkpointed first: the reference's table IS materialized (a
    BigQuery export), and without it each of the three subquery sites plus
    both CTE legs re-plans the events aggregation (measured 2→6 scans,
    +0.2 s at sf0.1 when the subquery form first landed).
    """
    from admob_data_pipeline_spark.functions.dialect import bq_sql_to_spark

    daily = (
        daily_fact(load_table(spark, sf_dir, "events"))
        .groupBy("date", "app_name", "ad_unit_name")
        .agg(F.sum("clicks").alias("clicks"), F.sum("impressions").alias("impressions"))
        .withColumn(
            "impression_ctr", safe_divide(F.col("clicks"), F.col("impressions"))
        )
    )
    daily.localCheckpoint().createOrReplaceTempView("admob_daily_report")
    ad_units = [f"u{i}" for i in range(8)]
    table_fq = "`demo-project.admob_exports.admob_daily_report`"
    if report_date is None:
        date_expr = f"(SELECT MAX(date) FROM {table_fq})"
    else:
        date_expr = f"'{report_date.isoformat()}'"
    placeholder_list = ", ".join(f"'{au}'" for au in ad_units)
    sql = f"""
    WITH
      last7 AS (
        SELECT
          app_name,
          ad_unit_name,
          SAFE_DIVIDE(SUM(clicks), SUM(impressions)) AS avg_ctr_7d
        FROM {table_fq}
        WHERE
          ad_unit_name IN ({placeholder_list})
          AND date BETWEEN
            DATE_SUB({date_expr}, INTERVAL 7 DAY)
            AND DATE_SUB({date_expr}, INTERVAL 1 DAY)
        GROUP BY
          app_name, ad_unit_name
      ),
      today AS (
        SELECT
          app_name,
          ad_unit_name,
          impression_ctr AS today_ctr
        FROM {table_fq}
        WHERE
          ad_unit_name IN ({placeholder_list})
          AND date = {date_expr}
      )
    SELECT
      t.app_name,
      t.ad_unit_name,
      ROUND(l.avg_ctr_7d, 4) AS avg_ctr_7d,
      ROUND(t.today_ctr, 4)  AS today_ctr,
      ROUND(
        SAFE_DIVIDE(t.today_ctr - l.avg_ctr_7d, l.avg_ctr_7d) * 100
      , 2)                    AS pct_change
    FROM today AS t
    JOIN last7 AS l
      ON t.ad_unit_name = l.ad_unit_name
    WHERE
      ABS(
        SAFE_DIVIDE(t.today_ctr - l.avg_ctr_7d, l.avg_ctr_7d) * 100
      ) > {threshold}
    ORDER BY pct_change DESC;
    """
    return spark.sql(bq_sql_to_spark(sql))


def ctr_anomaly_sql(
    spark: SparkSession, sf_dir: str, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """spark.sql ANSI translation of the reference query (SAFE_DIVIDE →
    NULLIF-guarded division; BigQuery DATE_SUB INTERVAL → date_sub)."""
    # scoped view name: never clobber a caller-owned "events" view
    load_table(spark, sf_dir, "events").createOrReplaceTempView("admob_events_src")
    return spark.sql(
        f"""
        WITH fact AS (
            SELECT CAST(ts AS DATE) AS date,
                   event_type AS app_name,
                   CONCAT('u', CAST(user_id % 8 AS STRING)) AS ad_unit_name,
                   CAST(FLOOR(value * 1000) AS BIGINT) AS clicks,
                   CAST(1 AS BIGINT) AS impressions
            FROM admob_events_src
        ),
        bounds AS (SELECT MAX(date) AS report_date FROM fact),
        last7 AS (
            SELECT ad_unit_name,
                   SUM(clicks) / NULLIF(SUM(impressions), 0) AS avg_ctr_7d
            FROM fact, bounds
            WHERE date BETWEEN date_sub(report_date, 7) AND date_sub(report_date, 1)
            GROUP BY app_name, ad_unit_name
        ),
        today AS (
            SELECT app_name, ad_unit_name,
                   SUM(clicks) / NULLIF(SUM(impressions), 0) AS today_ctr
            FROM fact, bounds
            WHERE date = report_date
            GROUP BY app_name, ad_unit_name
        )
        SELECT t.app_name,
               t.ad_unit_name,
               ROUND(t.today_ctr, 6) AS today_ctr,
               ROUND(l.avg_ctr_7d, 6) AS avg_ctr_7d,
               ROUND((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0) * 100, 4)
                   AS pct_change,
               ABS(ROUND((t.today_ctr - l.avg_ctr_7d) / NULLIF(l.avg_ctr_7d, 0) * 100, 4))
                   > {threshold} AS is_alert
        FROM today t
        JOIN last7 l ON t.ad_unit_name = l.ad_unit_name
        ORDER BY pct_change DESC, app_name, ad_unit_name
        """
    )


def ctr_anomaly_window(
    events: DataFrame, threshold: float = DEFAULT_THRESHOLD
) -> DataFrame:
    """Idiomatic rewrite (SURVEY.md §2.5 W1): trailing range window over the
    daily aggregate instead of a CTE + self-join — one less scan of the fact
    and no join at all.

    NOTE on semantics: the window necessarily keys the trailing average by
    the full ``(app_name, ad_unit_name)`` grain — i.e. this is the
    *corrected* form of the reference query (each (app, unit) is compared
    to ITS OWN trailing average). The reference's join-on-unit-only fan-out
    (native_CTR_alerts.py:262) is preserved verbatim in
    :func:`ctr_anomaly_df` / :func:`ctr_anomaly_sql`; this variant is the
    one a user should actually run, and it carries its own oracle.
    """
    daily = (
        daily_fact(events)
        .groupBy("date", "app_name", "ad_unit_name")
        .agg(F.sum("clicks").alias("clicks"), F.sum("impressions").alias("impressions"))
    )
    day = F.col("date").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("app_name", "ad_unit_name")
        .orderBy(day)
        .rangeBetween(-7 * 86400, -1 * 86400)
    )
    windowed = daily.select(
        "*",
        F.sum("clicks").over(w).alias("clicks_7d"),
        F.sum("impressions").over(w).alias("impr_7d"),
    )
    scored = (
        _with_report_date(windowed)
        .where(F.col("date") == F.col("report_date"))
        .where(F.col("impr_7d").isNotNull())
        .select(
            "app_name",
            "ad_unit_name",
            F.round(safe_divide(F.col("clicks"), F.col("impressions")), 6).alias(
                "today_ctr"
            ),
            F.round(safe_divide(F.col("clicks_7d"), F.col("impr_7d")), 6).alias(
                "avg_ctr_7d"
            ),
            pct_change(
                safe_divide(F.col("clicks"), F.col("impressions")),
                safe_divide(F.col("clicks_7d"), F.col("impr_7d")),
                4,
            ).alias("pct_change"),
        )
        .withColumn("is_alert", F.abs(F.col("pct_change")) > F.lit(threshold))
    )
    return scored.orderBy(F.desc("pct_change"), "app_name", "ad_unit_name")


def format_alert_messages(alerts: DataFrame) -> DataFrame:
    """A5 + F12 — group alert lines by app into one message per app.

    Reference: native_CTR_alerts.py:273-282 (``setdefault(app, []).append``)
    and :304-308 (f-string lines). Spark-side ``collect_list(struct)`` with a
    deterministic ``array_sort`` — formatting stays distributed; only the
    final Slack POST is a driver action.
    """
    # pct is printed at the SAME precision it was rounded to (4): a second
    # rounding (e.g. %.2f of a 4-decimal value like -64.585) is a decimal
    # tie that Java (shortest-repr HALF_UP) and C printf (binary nearest)
    # resolve differently. Printing at the rounding precision has no tie.
    line = F.format_string(
        "- %s: today %.6f vs 7d avg %.6f (%+.4f%%)",
        F.col("ad_unit_name"),
        F.col("today_ctr"),
        F.col("avg_ctr_7d"),
        F.col("pct_change"),
    )
    return (
        alerts.where(F.col("is_alert"))
        .select("app_name", line.alias("line"))
        .groupBy("app_name")
        .agg(F.array_join(F.array_sort(F.collect_list("line")), "\n").alias("message"))
        .orderBy("app_name")
    )


def missing_units(configured_units: DataFrame, todays_rows: DataFrame) -> DataFrame:
    """J2 — configured ad units absent from today's report (Python-side
    anti-join in the reference, native_CTR_alerts.py:298-302) as a proper
    left-anti join. ``configured_units`` is tiny → broadcast the big side's
    distinct keys is wrong; Spark broadcasts the right side of left_anti
    automatically when small, which here is today's distinct units."""
    present = todays_rows.select("ad_unit_name").distinct()
    return configured_units.join(present, "ad_unit_name", "left_anti")
