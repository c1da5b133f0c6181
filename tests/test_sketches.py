"""KMV sketch: estimation accuracy and exact-small-set behavior."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators.sketches import kmv_distinct


def test_small_groups_are_exact(spark):
    rows = [Row(g="a", v=str(i % 10)) for i in range(100)] + [
        Row(g="b", v=str(i % 3)) for i in range(30)
    ]
    out = {r.g: (r.ndv_est, r.is_exact) for r in kmv_distinct(spark.createDataFrame(rows), "g", "v").collect()}
    assert out == {"a": (10.0, True), "b": (3.0, True)}


def test_estimate_within_kmv_error_bound(spark):
    """k=64 → relative standard error ~ 1/sqrt(k-2) ≈ 12.7%; assert the
    estimate lands within 4 sigma of truth for a 5000-distinct group."""
    n = 5000
    rows = [Row(g="big", v=str(i)) for i in range(n)]
    est = kmv_distinct(spark.createDataFrame(rows), "g", "v").first()
    assert not est.is_exact
    assert abs(est.ndv_est - n) / n < 4 / (62 ** 0.5), est.ndv_est


def test_result_is_partitioning_invariant(spark):
    rows = [Row(g="x", v=str(i)) for i in range(1000)]
    df1 = spark.createDataFrame(rows).repartition(2)
    df2 = spark.createDataFrame(rows).repartition(17)
    e1 = kmv_distinct(df1, "g", "v").first().ndv_est
    e2 = kmv_distinct(df2, "g", "v").first().ndv_est
    assert e1 == e2  # merge of k-smallest == global k-smallest


def test_builtin_approx_percentile_rank_error_bound(spark, sf_dir):
    """Spark's approx_percentile(accuracy=a) guarantees rank error
    ≤ n/a. Pin the guarantee against the exact percentile ranks on
    o_totalprice — this is the built-in t-digest-style path; the exact
    group quantiles live in quantile_stats."""
    from admob_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders").select("o_totalprice")
    n = o.count()
    accuracy = 1000
    approx = o.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.95], accuracy).alias("p")
    ).first().p
    values = sorted(r.o_totalprice for r in o.collect())
    import bisect

    for q, est in zip([0.5, 0.95], approx):
        rank = bisect.bisect_left(values, est)
        assert abs(rank - q * n) <= n / accuracy + 1, (q, est, rank)


def test_builtin_approx_count_distinct_error_bound(spark, sf_dir):
    """approx_count_distinct(rsd=0.05): HLL++ estimate within 4·rsd of the
    exact distinct count on a real key column."""
    from admob_data_pipeline_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    exact = o.select("o_custkey").distinct().count()
    est = o.agg(F.approx_count_distinct("o_custkey", 0.05).alias("e")).first().e
    assert abs(est - exact) / exact < 0.2, (est, exact)


def test_hll_rollup_merge_equals_direct(spark, sf_dir):
    """MAX-merging daily register partials into weeks must equal computing
    weekly registers directly (associativity of the register merge)."""
    from pyspark.sql import functions as F

    from admob_data_pipeline_spark.operators.sketches import (
        hll_distinct,
        hll_rollup,
    )
    from admob_data_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    rolled = {
        (r.event_type, r.wk): (r.ndv_est_e4, r.register_md5)
        for r in hll_rollup(ev).collect()
    }
    direct_in = ev.select(
        F.concat_ws(
            "|",
            "event_type",
            F.expr(
                "CAST(datediff(to_date(ts), DATE '1970-01-01') DIV 7 AS STRING)"
            ),
        ).alias("gw"),
        "user_id",
    )
    direct = {
        tuple(r.gw.rsplit("|", 1)): (r.ndv_est_e4, r.register_md5)
        for r in hll_distinct(direct_in, "gw", "user_id").collect()
    }
    assert rolled == {(g, int(w)): v for (g, w), v in direct.items()}


def test_hll_registers_match_pure_python_reference(spark):
    """Third-implementation pin for the deterministic HLL registers:
    bucket = first-byte-of-md5 mod m, rho = 53 - bit_length(next 52
    bits) (53 when zero), register = max rho — recomputed with hashlib
    only, outside both engines."""
    import hashlib

    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators import sketches

    vals = [("g1", v) for v in [1, 2, 3, 97, 12345]] + [("g2", 7)]
    df = spark.createDataFrame([Row(g=g, v=v) for g, v in vals])
    got = {
        (r.g, r.b): r.r
        for r in sketches.hll_registers(df, "g", "v").collect()
    }

    expect = {}
    for g, v in vals:
        hx = hashlib.md5(str(v).encode()).hexdigest()
        b = int(hx[0:2], 16) % sketches.HLL_M
        x = int(hx[2:15], 16)
        rho = 53 if x == 0 else 53 - x.bit_length()
        expect[(g, b)] = max(expect.get((g, b), 0), rho)
    assert got == expect
