"""Checkpointed restart: a resumed stream must process only new files —
the incremental-ingest contract that replaces the reference's per-date
DELETE+append idempotency at streaming granularity."""

from __future__ import annotations

from pyspark.sql import functions as F

from admob_data_pipeline_spark.sources.tables import load_table


def _run(spark, src, out, ckpt, schema):
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("vm", F.floor(F.col("value") * 1000).cast("long"))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_restart_processes_only_new_files(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    for part in (0, 1):
        events.where(F.col("event_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    schema = spark.read.parquet(src).schema
    _run(spark, src, out, ckpt, schema)
    n_first = spark.read.parquet(out).count()
    assert n_first == events.where(F.col("event_id") % 3 != 2).count()

    # new data arrives; SAME checkpoint → resume, not reprocess
    events.where(F.col("event_id") % 3 == 2).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, out, ckpt, schema)
    got = spark.read.parquet(out)
    assert got.count() == events.count()  # every record exactly once
    assert got.select("event_id").distinct().count() == events.count()


def test_foreachbatch_partition_overwrite_is_idempotent(spark, sf_dir, tmp_path):
    """S8 on a stream: re-running the whole stream (fresh checkpoint, same
    table) must REPLACE the date partitions, not append duplicates — the
    at-least-once sink composes to exactly-once table state."""
    from admob_data_pipeline_spark.streaming import alerts as sa

    table = str(tmp_path / "rates_table")
    stream = sa.daily_rates_stream(sa._event_stream(spark, sf_dir))
    sa.stream_to_partitioned_table(stream, table, str(tmp_path / "ck1"))
    # materialize NOW: the lazy frame would re-read files replaced below
    first_rows = sorted(map(tuple, spark.read.parquet(table).collect()))
    assert len(first_rows) > 0

    # full re-run (e.g. a backfill) with a fresh checkpoint: same state
    sa.stream_to_partitioned_table(stream, table, str(tmp_path / "ck2"))
    again_rows = sorted(map(tuple, spark.read.parquet(table).collect()))
    # values identical, not just counts — partitions replaced, not appended
    assert again_rows == first_rows
