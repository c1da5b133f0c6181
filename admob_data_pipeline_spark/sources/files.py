"""File-format sources — the read side of the staging formats (S4/S5).

The reference writes CSV/JSONL staging objects and has BigQuery load them
back (schema-on-load, three different schema modes — SURVEY.md §1.4).
Here reads always carry an explicit ``StructType``: schema drift surfaces
at the boundary as a read error (FAILFAST) or quarantined rows
(PERMISSIVE + ``_corrupt_record``), never as a silently different table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructField, StructType, StringType


def read_report_csv(
    spark: SparkSession,
    path: str,
    schema: StructType,
    strict: bool = True,
) -> DataFrame:
    """Header CSV with declared schema. ``strict`` = FAILFAST (reference's
    fixed-schema load, save_CSV.py:206-212); otherwise PERMISSIVE."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .csv(path)
    )


def read_report_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType,
    strict: bool = True,
) -> DataFrame:
    """NDJSON with declared schema (the reference's autodetect JSONL load,
    main.py:101-105, made explicit). In PERMISSIVE mode malformed lines
    land in ``_corrupt_record`` for quarantine instead of failing the job."""
    reader = spark.read
    if not strict:
        schema = StructType(
            [*schema.fields, StructField("_corrupt_record", StringType())]
        )
    return (
        reader.schema(schema)
        .option("mode", "FAILFAST" if strict else "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
