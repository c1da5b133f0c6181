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
