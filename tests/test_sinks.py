"""Sink semantics: S4–S10 + the S8 idempotency contract."""

from __future__ import annotations

import datetime
import json
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from admob_data_pipeline_spark.sinks import writers


def _day_rows(spark, day: str, values):
    return spark.createDataFrame(
        [
            Row(date=datetime.date.fromisoformat(day), unit=f"u{i}", clicks=v)
            for i, v in enumerate(values)
        ]
    )


def test_csv_single_file_with_header(spark, tmp_path):
    p = str(tmp_path / "csv")
    writers.write_csv(_day_rows(spark, "2024-01-01", [1, 2]), p, single_file=True)
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    assert len(parts) == 1
    lines = open(os.path.join(p, parts[0])).read().strip().split("\n")
    assert lines[0] == "date,unit,clicks"
    assert len(lines) == 3


def test_jsonl_is_ndjson(spark, tmp_path):
    p = str(tmp_path / "jsonl")
    writers.write_jsonl(_day_rows(spark, "2024-01-01", [5]), p, single_file=True)
    parts = [f for f in os.listdir(p) if f.startswith("part-")]
    rec = json.loads(open(os.path.join(p, parts[0])).readline())
    assert rec["unit"] == "u0" and rec["clicks"] == 5


def test_partition_overwrite_is_idempotent_and_isolated(spark, tmp_path):
    """Re-running one date must replace exactly that date (S8): the
    reference's DELETE+append contract (native_CTR_alerts.py:182-212)."""
    p = str(tmp_path / "table")
    writers.append_to_table(_day_rows(spark, "2024-01-01", [1, 2]), p)
    writers.append_to_table(_day_rows(spark, "2024-01-02", [3]), p)

    # re-run day 2 with corrected data — twice (idempotency)
    for _ in range(2):
        writers.overwrite_date_partitions(_day_rows(spark, "2024-01-02", [30, 40]), p)

    got = spark.read.parquet(p)
    by_day = {
        str(r.date): r.n
        for r in got.groupBy("date").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_day == {"2024-01-01": 2, "2024-01-02": 2}
    day2 = sorted(r.clicks for r in got.where(F.col("date") == "2024-01-02").collect())
    assert day2 == [30, 40]
    # the overwrite must not have flipped the session's global conf
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode") is not None
    )


def test_compaction_rewrites_only_target_partition(spark, tmp_path):
    import glob

    p = str(tmp_path / "frag")
    # fragment day 1 into many files; day 2 untouched
    frag = _day_rows(spark, "2024-01-01", list(range(20))).repartition(10)
    writers.append_to_table(frag, p)
    writers.append_to_table(_day_rows(spark, "2024-01-02", [1, 2]), p)
    before_d2 = sorted(glob.glob(f"{p}/date=2024-01-02/part-*"))

    writers.compact_partitions(spark, p, ["2024-01-01"])

    after_d1 = glob.glob(f"{p}/date=2024-01-01/part-*")
    assert len(after_d1) == 1  # compacted
    assert sorted(glob.glob(f"{p}/date=2024-01-02/part-*")) == before_d2  # untouched
    got = spark.read.parquet(p)
    assert got.where(F.col("date") == "2024-01-01").count() == 20
    assert got.count() == 22


def test_empty_guard_skips_writer(spark, tmp_path):
    p = str(tmp_path / "never")
    df = _day_rows(spark, "2024-01-01", [1]).where(F.lit(False))
    written = writers.write_if_nonempty(df, lambda d: writers.write_csv(d, p))
    assert written is False
    assert not os.path.exists(p)


def test_slack_sink_transport_and_failure_logging(spark):
    calls = []

    def fake_transport(url, payload, timeout):
        calls.append((url, json.loads(payload), timeout))
        return 200 if len(calls) == 1 else 500

    sink = writers.SlackSink("https://hooks.example/T/B/X", transport=fake_transport)
    msgs = spark.createDataFrame(
        [Row(app_name="a", message="alert A"), Row(app_name="b", message="alert B")]
    )
    ok = sink.post_messages(msgs)
    assert ok == 1 and sink.sent == 1 and sink.failed == 1
    assert calls[0][0] == "https://hooks.example/T/B/X"
    assert calls[0][1] == {"text": "alert A"}
    assert calls[0][2] == 10.0  # reference timeout (native_CTR_alerts.py:310)


def test_sorted_layout_files_are_internally_sorted(spark, tmp_path):
    """Every output file must be internally sorted on the sort column —
    the property that makes parquet row-group min/max stats selective
    (zone-map pruning at scan time)."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(0, 10_000).select(
        (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "sorted")
    writers.write_sorted_layout(df, out, ["k"], files_per_partition=4)
    files = glob.glob(out + "/*.parquet")
    assert len(files) >= 2
    total = 0
    for f in files:
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        total += len(ks)
        assert ks == sorted(ks), f
        # sorted file ⇒ row-group [min,max] ranges are non-overlapping
        md = pq.ParquetFile(f).metadata
        prev_max = None
        for i in range(md.num_row_groups):
            st = md.row_group(i).column(0).statistics
            if prev_max is not None:
                assert st.min >= prev_max
            prev_max = st.max
    assert total == 10_000


def test_zorder_layout_files_cluster_both_dims(spark, tmp_path):
    """Z-ordered files must cluster BOTH dimensions: each output file's
    (min,max) box in either column covers only a fraction of the full
    domain, so a 2D box predicate skips most files via footer stats —
    the property a 1D sort only provides for its leading column."""
    import glob

    import pyarrow.parquet as pq

    n = 1 << 12
    df = spark.range(0, n).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("v"),
    )
    out = str(tmp_path / "zorder")
    writers.write_zorder_layout(df, out, "x", "y", bits=6, files=8)
    files = [f for f in glob.glob(out + "/*.parquet") if "_SUCCESS" not in f]
    assert len(files) >= 4
    total = 0
    spans_x, spans_y = [], []
    for f in files:
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        if not xs:
            continue
        total += len(xs)
        spans_x.append((max(xs) - min(xs) + 1) / 64)
        spans_y.append((max(ys) - min(ys) + 1) / 64)
    assert total == n
    # average per-file box must be a strict subset of the domain in BOTH
    # dims (a 1D custkey sort would leave one dim spanning ~100%)
    assert sum(spans_x) / len(spans_x) < 0.8
    assert sum(spans_y) / len(spans_y) < 0.8


def test_zorder_key_interleaves_bits(spark):
    row = (
        spark.range(1)
        .select(
            writers.zorder_key(F.lit(0b101), F.lit(0b011), bits=3).alias("z")
        )
        .first()
    )
    # a=101, b=011 → z bits (b2 a2 b1 a1 b0 a0) = 0 1 1 0 1 1 = 27
    assert row.z == 0b011011


def test_global_sort_files_are_disjoint_and_ordered(spark, tmp_path):
    """Range-partitioned export: file key ranges must be disjoint so that
    reading files in partition order reproduces a global ORDER BY."""
    import glob

    import pyarrow.parquet as pq

    df = spark.range(0, 5000).select(
        (F.col("id") * 2654435761 % 5000).alias("k"), F.col("id").alias("v")
    )
    out = str(tmp_path / "gsort")
    writers.write_global_sort(df, out, ["k"], files=6)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) >= 2
    prev_max, total = None, 0
    for f in files:  # part file names sort by partition id
        ks = pq.read_table(f, columns=["k"]).column("k").to_pylist()
        if not ks:
            continue
        total += len(ks)
        assert ks == sorted(ks), f
        if prev_max is not None:
            assert ks[0] >= prev_max
        prev_max = ks[-1]
    assert total == 5000


def test_write_audit_publish_rejects_and_quarantines(spark, tmp_path):
    import os

    import pytest
    from pyspark.sql import Row

    from admob_data_pipeline_spark.sinks.writers import write_audit_publish

    bad = spark.createDataFrame(
        [Row(app_name=None, impressions=-1)], "app_name string, impressions long"
    )
    out = str(tmp_path / "published")

    def audit(staged):
        n = staged.where(staged.app_name.isNull()).count()
        return [f"{n} null keys"] if n else []

    with pytest.raises(ValueError, match="audit failed"):
        write_audit_publish(bad, out, audit)
    assert not os.path.exists(out)  # nothing published
    quarantine = [d for d in os.listdir(tmp_path) if d.startswith("published.staging-")]
    assert quarantine  # staged files kept for diagnosis

    good = spark.createDataFrame([Row(app_name="a", impressions=3)])
    write_audit_publish(good, out, audit)
    assert spark.read.parquet(out).count() == 1


def test_schema_evolution_nulls_exactly_the_v1_half(spark, sf_dir):
    """mergeSchema must surface clicks = NULL for exactly the v1 dates
    (first half of the observed calendar) and real values for v2."""
    from admob_data_pipeline_spark.sinks.roundtrip import (
        q_sink_schema_evolution,
    )

    rows = q_sink_schema_evolution(spark, sf_dir).collect()
    dates = sorted({r.date for r in rows})
    v1 = set(dates[: len(dates) // 2])
    assert v1 and len(v1) < len(dates)
    for r in rows:
        if r.date in v1:
            assert r.clicks is None
        else:
            assert r.clicks is not None
