"""Staging-format round trips: sink → source must be lossless, and schema
drift must surface at the boundary (not as a silently different table)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from admob_data_pipeline_spark.sinks import writers
from admob_data_pipeline_spark.sources import files

SCHEMA = StructType(
    [
        StructField("date", DateType()),
        StructField("unit", StringType()),
        StructField("clicks", LongType()),
    ]
)


def _df(spark):
    return spark.createDataFrame(
        [
            Row(date=datetime.date(2024, 1, 1), unit="u1", clicks=10),
            Row(date=datetime.date(2024, 1, 1), unit="u2", clicks=None),
        ],
        SCHEMA,
    )


def test_csv_round_trip(spark, tmp_path):
    p = str(tmp_path / "csv")
    writers.write_csv(_df(spark), p, single_file=True)
    back = files.read_report_csv(spark, p, SCHEMA)
    assert sorted((str(r.date), r.unit, r.clicks) for r in back.collect()) == [
        ("2024-01-01", "u1", 10),
        ("2024-01-01", "u2", None),
    ]


def test_jsonl_round_trip(spark, tmp_path):
    p = str(tmp_path / "jsonl")
    writers.write_jsonl(_df(spark), p, single_file=True)
    back = files.read_report_jsonl(spark, p, SCHEMA)
    got = sorted((str(r.date), r.unit, r.clicks) for r in back.collect())
    assert got == [("2024-01-01", "u1", 10), ("2024-01-01", "u2", None)]


def test_jsonl_permissive_quarantines_malformed(spark, tmp_path):
    p = tmp_path / "bad"
    p.mkdir()
    (p / "data.json").write_text(
        '{"date":"2024-01-01","unit":"u1","clicks":1}\n'
        "this is not json\n"
        '{"date":"2024-01-02","unit":"u2","clicks":2}\n'
    )
    back = files.read_report_jsonl(spark, str(p), SCHEMA, strict=False)
    rows = back.collect()
    corrupt = [r for r in rows if r._corrupt_record is not None]
    clean = [r for r in rows if r._corrupt_record is None]
    assert len(corrupt) == 1 and "not json" in corrupt[0]._corrupt_record
    assert {r.unit for r in clean} == {"u1", "u2"}


def test_jsonl_strict_fails_fast(spark, tmp_path):
    p = tmp_path / "bad2"
    p.mkdir()
    (p / "data.json").write_text('{"date":"2024-01-01"}\nnot json\n')
    with pytest.raises(Exception):
        files.read_report_jsonl(spark, str(p), SCHEMA, strict=True).collect()


def test_partitioned_table_prunes_partitions(spark, tmp_path):
    """S8-layout read: a date predicate must prune to one partition
    directory (PartitionFilters), not scan the table."""
    from admob_data_pipeline_spark.plans import explain

    p = str(tmp_path / "table")
    writers.append_to_table(_df(spark), p)
    writers.append_to_table(
        spark.createDataFrame(
            [Row(date=datetime.date(2024, 1, 2), unit="u3", clicks=7)], SCHEMA
        ),
        p,
    )
    q = spark.read.parquet(p).where(F.col("date") == "2024-01-02")
    plan = explain.formatted_plan(q)
    assert "PartitionFilters" in plan and "date" in plan.split("PartitionFilters", 1)[1][:200]
    assert [r.unit for r in q.collect()] == ["u3"]


def test_schema_evolution_merge_across_partitions(spark, tmp_path):
    """A long-lived table accumulates partitions written at different
    schema versions (the reference's autodetect-append S7 would silently
    fork schemas — SURVEY §1.4). mergeSchema must reconcile: old
    partitions surface the new column as NULL, and a reader pinned to an
    explicit schema gets the declared shape regardless of file version."""
    out = str(tmp_path / "evolving")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v1.write.parquet(out + "/date=2024-01-01")
    v2 = spark.createDataFrame(
        [(2, "b", 99)], "id long, name string, score long"
    )
    v2.write.parquet(out + "/date=2024-01-02")

    merged = spark.read.option("mergeSchema", True).parquet(out)
    assert set(merged.columns) == {"id", "name", "score", "date"}
    rows = {r.id: r.score for r in merged.collect()}
    assert rows == {1: None, 2: 99}

    # explicit schema pins the data columns; the partition-dir column is
    # still appended by partition discovery
    pinned = spark.read.schema("id long, score long").parquet(out)
    assert pinned.columns == ["id", "score", "date"]
    assert {(r.id, r.score) for r in pinned.collect()} == {(1, None), (2, 99)}
