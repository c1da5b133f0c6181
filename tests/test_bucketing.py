"""Bucketed co-located joins: the join on the bucket key must not shuffle
either bucketed side (no Exchange above the scans)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from admob_data_pipeline_spark.plans import explain
from admob_data_pipeline_spark.sinks import writers
from admob_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    writers.write_bucketed(li, "bkt_lineitem", "l_orderkey", n_buckets=8)
    writers.write_bucketed(o, "bkt_orders", "l_orderkey", n_buckets=8)
    yield "bkt_lineitem", "bkt_orders"
    spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
    spark.sql("DROP TABLE IF EXISTS bkt_orders")


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    tl, to = bucketed_tables
    # hint("merge"): at test scale the optimizer would broadcast the small
    # side; a real fact-fact join is SMJ, which is where bucketing pays off
    joined = spark.table(tl).hint("merge").join(spark.table(to), "l_orderkey")
    agg = joined.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))
    plan = explain.formatted_plan(joined)
    # sort-merge join directly over the bucketed scans — zero Exchange
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, plan
    # results match the unbucketed join
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, agg.collect())) == sorted(map(tuple, want.collect()))


def test_bucketed_aggregation_has_no_shuffle(spark, bucketed_tables):
    tl, _ = bucketed_tables
    agg = (
        spark.table(tl)
        .groupBy("l_orderkey")
        .agg(F.sum(F.floor("l_quantity").cast("long")).alias("q"))
    )
    plan = explain.formatted_plan(agg)
    assert "Exchange" not in plan, plan


def test_sql_hash_matches_written_bucket_ids(spark, tmp_path):
    """The compaction helper repartitions on pmod(hash(key), n) and
    claims that SQL hash() IS the bucketed writer's bucket function —
    pin it row-for-row against the _NNNNN suffix of every written file,
    and pin that the compacted output is exactly one file per non-empty
    bucket."""
    import re

    from admob_data_pipeline_spark.sinks.writers import (
        compact_bucketed_table,
        write_epoch_bucketed,
        overwrite_epoch_partition,
    )

    df = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 97).alias("v")
    )
    t = "bucket_hash_pin_t"
    spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_epoch_bucketed(
            df, t, key="k", n_buckets=8, path=str(tmp_path / "t")
        )
        overwrite_epoch_partition(
            spark.range(500, 600).select(
                F.col("id").alias("k"), F.lit(0).alias("v")
            ),
            t,
            key="k",
            n_buckets=8,
            epoch=0,
        )
        rows = (
            spark.table(t)
            .select("k", F.input_file_name().alias("f"),
                    F.expr("pmod(hash(k), 8)").alias("hb"))
            .collect()
        )
        assert rows
        for r in rows:
            suffix = int(re.search(r"_(\d{5})\.", r.f).group(1))
            assert suffix == r.hb, (r.k, suffix, r.hb)
        # compaction: one file per non-empty bucket
        before, after = compact_bucketed_table(
            spark, t, key="k", n_buckets=8, fold_partition=("epoch", -1)
        )
        assert after < before and after <= 8
        n_buckets_used = (
            spark.table(t).select(F.expr("pmod(hash(k), 8)")).distinct().count()
        )
        assert after == n_buckets_used
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t}")
