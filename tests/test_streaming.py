"""Streaming semantics: batch-equivalence (complete mode) and append-mode
watermark behavior (late windows withheld)."""

from __future__ import annotations

from pyspark.sql import functions as F

from admob_data_pipeline_spark.streaming import alerts as S


def test_complete_mode_equals_batch(spark, sf_dir):
    out = S.run_available_now(S.daily_rates_stream(S._event_stream(spark, sf_dir)))
    got = {(str(r.date), r.app_name): (r.clicks, r.impressions) for r in out.collect()}
    from admob_data_pipeline_spark.sources.tables import load_table

    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            F.col("ts").cast("date").alias("date"),
            F.col("event_type").alias("app_name"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("clicks"),
            F.count(F.lit(1)).alias("impressions"),
        )
    )
    want = {
        (str(r.date), r.app_name): (r.clicks, r.impressions) for r in batch.collect()
    }
    assert got == want


def test_append_mode_withholds_unclosed_windows(spark, sf_dir):
    """With a 2-day watermark, append mode may only emit windows the
    watermark has passed — a subset of the complete result, never late or
    corrupted rows."""
    complete = S.run_available_now(
        S.daily_rates_stream(S._event_stream(spark, sf_dir))
    )
    appended = S.run_available_now(
        S.daily_rates_stream(S._event_stream(spark, sf_dir)), output_mode="append"
    )
    want = {
        (str(r.date), r.app_name): (r.clicks, r.impressions)
        for r in complete.collect()
    }
    got = {
        (str(r.date), r.app_name): (r.clicks, r.impressions)
        for r in appended.collect()
    }
    assert set(got) <= set(want)
    assert all(want[k] == v for k, v in got.items())
    # the final (unclosed) day must be withheld
    last_day = max(d for d, _ in want)
    assert all(d < last_day for d, _ in got)


def test_rocksdb_state_store_matches_default_provider(spark, sf_dir):
    """The production state backend at 100 TB is RocksDB (the
    HDFS-backed in-memory default keeps all state on the executor
    heap); every stateful query must produce IDENTICAL results on it.
    The provider is a runtime SQL conf, so the swap is
    deployment-config, not code — pinned here on the sessionize query
    against its batch mirror (which is oracle-gated)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    )
    try:
        prev = spark.conf.get(key)
    except Exception:
        prev = None
    spark.conf.set(key, rocks)
    try:
        streamed = S.run_available_now(
            S.sessionize_stream(S._event_stream(spark, sf_dir))
        )
        got = sorted(map(tuple, streamed.collect()))
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
    from admob_data_pipeline_spark.sources.tables import load_table

    batch = S.sessionize_batch(load_table(spark, sf_dir, "events"))
    assert got == sorted(map(tuple, batch.collect()))


def test_streaming_skew_audit_equals_batch(spark, sf_dir):
    """Count merge is associative, so the streamed hot-key audit must be
    row-identical to the batch q_skew_audit — the single-sourcing
    contract (shared skew_audit_from_counts scorer)."""
    from admob_data_pipeline_spark.plans.analytics_ext import q_skew_audit
    from admob_data_pipeline_spark.streaming.alerts import (
        q_streaming_skew_audit,
    )

    batch = [tuple(r) for r in q_skew_audit(spark, sf_dir).collect()]
    stream = [tuple(r) for r in q_streaming_skew_audit(spark, sf_dir).collect()]
    assert stream == batch and batch
