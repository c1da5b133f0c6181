"""Every registry query must hash-match its DuckDB oracle at sf0.001.

This is a fast local mirror of the driver's t2 gate (the driver runs the
same comparison at sf0.01 — tools/check_correctness.py runs that scale).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from admob_data_pipeline_spark.testing import diff_vs_oracle, duckdb_connection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb_connection(SF)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF)
    oracles = entry_mod.oracle_sql()
    if name not in oracles:
        assert df.count() >= 0  # rows-only contract
        return
    problems = diff_vs_oracle(df, con, oracles[name])
    assert not problems, f"{name}: {problems}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert df.columns == [
        "app_name",
        "ad_unit_name",
        "today_ctr",
        "avg_ctr_7d",
        "pct_change",
        "is_alert",
    ]
