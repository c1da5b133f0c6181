"""Production chunk-JSON ingest path: raw API dump → RAW_CHUNK_SCHEMA →
flatten kernel. The same kernel serves the synthetic fixture and real
JSON — this pins the JSON leg."""

from __future__ import annotations

import json

from admob_data_pipeline_spark import schemas
from admob_data_pipeline_spark.sources import chunks as chunks_mod


def test_chunk_json_roundtrip(spark, tmp_path):
    payload = [
        {"chunk_id": 1},  # header chunk, no row → dropped
        {
            "chunk_id": 2,
            "row": {
                "dimensionValues": {
                    "DATE": {"value": "20240131"},
                    "APP": {"value": "a1", "displayLabel": "App One"},
                },
                "metricValues": {
                    "CLICKS": {"integerValue": "42"},
                    "ESTIMATED_EARNINGS": {"microsValue": "1250000"},
                    "IMPRESSION_CTR": {"doubleValue": 0.125},
                },
            },
        },
        {
            "chunk_id": 3,
            "row": {
                "dimensionValues": {
                    "DATE": {"value": "2024-XX"},  # malformed → NULL date
                    "APP": {"value": "a2"},  # no displayLabel → value
                },
                "metricValues": {},  # all metrics missing → 0 defaults
            },
        },
    ]
    p = tmp_path / "chunks.jsonl"
    p.write_text("\n".join(json.dumps(c) for c in payload))

    raw = spark.read.schema(schemas.RAW_CHUNK_SCHEMA).json(str(p))
    flat = chunks_mod.flatten_chunks(
        raw,
        dims=[
            chunks_mod.DimSpec("DATE", "date", "date"),
            chunks_mod.DimSpec("APP", "app_name"),
        ],
        metrics=[
            chunks_mod.MetricSpec("CLICKS", "clicks", "int"),
            chunks_mod.MetricSpec("ESTIMATED_EARNINGS", "earnings_micros", "int"),
            chunks_mod.MetricSpec("IMPRESSION_CTR", "ctr", "float"),
        ],
    )
    rows = {r.app_name: r for r in flat.collect()}
    assert set(rows) == {"App One", "a2"}
    r2 = rows["App One"]
    assert str(r2.date) == "2024-01-31"
    assert (r2.clicks, r2.earnings_micros, r2.ctr) == (42, 1250000, 0.125)
    r3 = rows["a2"]
    assert r3.date is None
    assert (r3.clicks, r3.earnings_micros, r3.ctr) == (0, 0, 0.0)
