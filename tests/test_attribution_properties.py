"""Property tests for the weighted largest-remainder attribution SPEC.

The Spark implementations are pinned to the DuckDB oracles by the
driver's value-hash gate, so property-testing the ORACLE SQL over
hypothesis-generated event sets tests the shared specification itself —
orders of magnitude faster than spinning Spark per example, with the
same guarantee surface:

- conservation: per model (position, time-decay), summed credits equal
  summed floor(value·1e6) over purchases EXACTLY, for any sign mix,
  touch multiplicity, and timestamp layout;
- fairness: every touch's credit differs from its exact proportional
  share earn·w/W by strictly less than one micro (the defining
  largest-remainder property).
"""

from __future__ import annotations

import datetime

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st

from admob_data_pipeline_spark.plans.analytics_ext import (
    _ORACLE_ATTR_POSITION,
    _ORACLE_ATTR_TIMEDECAY,
)

T0 = datetime.datetime(2024, 1, 10, 12, 0, 0)

# one user's history: a few touches at hour/day offsets plus purchases
# with signed micro-scale values (refunds included)
_user_events = st.tuples(
    st.lists(  # touches: (kind, days_back, minutes)
        st.tuples(
            st.sampled_from(["view", "click"]),
            st.integers(min_value=0, max_value=9),
            st.integers(min_value=0, max_value=59),
        ),
        max_size=6,
    ),
    st.lists(  # purchases: earn micros
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1,
        max_size=3,
    ),
)


def _events_table(con, histories):
    rows = []
    eid = 0
    for u, (touches, purchases) in enumerate(histories):
        for kind, days_back, minutes in touches:
            eid += 1
            ts = T0 - datetime.timedelta(days=days_back, minutes=minutes)
            rows.append((eid, ts, u, kind, 0.0, "{}"))
        for i, earn in enumerate(purchases):
            eid += 1
            ts = T0 + datetime.timedelta(hours=1 + i)
            rows.append((eid, ts, u, "purchase", earn / 1e6, "{}"))
    con.execute(
        "CREATE OR REPLACE TABLE events "
        "(event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?,?,?,?)", rows)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_user_events, min_size=1, max_size=4))
def test_both_weighted_models_conserve_all_micros(histories):
    con = duckdb.connect()
    _events_table(con, histories)
    expect = con.execute(
        "SELECT COALESCE(SUM(CAST(FLOOR(value * 1e6) AS BIGINT)), 0) "
        "FROM events WHERE event_type = 'purchase'"
    ).fetchone()[0]
    for sql in (_ORACLE_ATTR_POSITION, _ORACLE_ATTR_TIMEDECAY):
        got = con.execute(
            f"SELECT COALESCE(SUM(credit_micros), 0) FROM ({sql})"
        ).fetchone()[0]
        assert got == expect


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(st.lists(_user_events, min_size=1, max_size=3))
def test_per_touch_credit_within_one_micro_of_exact_share(histories):
    """largest-remainder fairness: |credit − earn·w/W| < 1 micro for
    every credited touch (checked on the time-decay model, the one with
    the widest weight spread)."""
    con = duckdb.connect()
    _events_table(con, histories)
    # re-run the oracle's internal chain up to per-touch credits
    body = _ORACLE_ATTR_TIMEDECAY.split("credited AS (")[0]
    # |credit − earn·w/W| < 1  ⇔  |credit·W − earn·w| < W, per row
    violations = con.execute(
        body
        + """
    checked AS (
        SELECT earn, wgt, wt,
               (earn * wgt - r) // wt
               + CASE WHEN rr <= rsum // wt THEN 1 ELSE 0 END AS credit
        FROM ranked WHERE t_id IS NOT NULL
    )
    SELECT COUNT(*) FROM checked
    WHERE ABS(credit * wt - earn * wgt) >= wt
    """
    ).fetchone()[0]
    assert violations == 0


def test_touch_models_conserve_and_single_credit(spark, sf_dir):
    """Both single-touch models must conserve every micro (Σ credit =
    Σ purchase earn, refunds included) and credit exactly one row per
    purchase: total n_events per model == number of purchases."""
    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.plans.analytics_ext import (
        q_attribution_touch_models,
    )
    from admob_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.floor(F.col("value") * 1e6).cast("long").alias("earn")
    )
    n_p, total = purchases.agg(
        F.count(F.lit(1)), F.sum("earn")
    ).collect()[0]
    rows = q_attribution_touch_models(spark, sf_dir).collect()
    for model in ("first", "last"):
        got = [r for r in rows if r.model == model]
        assert sum(r.credit_micros for r in got) == total
        assert sum(r.n_events for r in got) == n_p


def test_model_compare_every_model_conserves_per_day(spark, sf_dir):
    """Each of the five models' per-day credit totals must equal that
    day's purchase earn exactly — conservation through the shared
    weighted core, per model, per day (not just globally)."""
    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.plans.analytics_ext import (
        _COMPARE_MODELS,
        q_attribution_model_compare,
    )
    from admob_data_pipeline_spark.sources.tables import load_table

    want = {
        r.day: r.earn
        for r in load_table(spark, sf_dir, "events")
        .where(F.col("event_type") == "purchase")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 1e6).cast("long")).alias("earn"))
        .collect()
    }
    per: dict[tuple, int] = {}
    for r in q_attribution_model_compare(spark, sf_dir).collect():
        per[(r.model, r.day)] = per.get((r.model, r.day), 0) + r.credit_micros
    for model in _COMPARE_MODELS:
        got = {d: v for (m, d), v in per.items() if m == model}
        assert got == want, f"model {model} does not conserve"
