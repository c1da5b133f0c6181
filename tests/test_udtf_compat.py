"""The Python-UDTF compat path must match the expression kernel
row-for-row on the full edge-case fixture (null rows, missing labels,
decimalValue fallbacks, malformed dates, missing metrics)."""

from __future__ import annotations

from admob_data_pipeline_spark.functions import udtf_compat
from admob_data_pipeline_spark.sources import chunks as chunks_mod
from admob_data_pipeline_spark.sources.tables import load_table


def test_udtf_matches_expression_kernel(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    raw = chunks_mod.synthesize_chunks_from_lineitem(li)

    dims = [
        chunks_mod.DimSpec("DATE", "date", "date"),
        chunks_mod.DimSpec("APP", "app_name"),
    ]
    metrics = [
        chunks_mod.MetricSpec("CLICKS", "clicks", "int"),
        chunks_mod.MetricSpec("ESTIMATED_EARNINGS", "estimated_earnings_micros", "int"),
        chunks_mod.MetricSpec("IMPRESSION_CTR", "impression_ctr", "float"),
        chunks_mod.MetricSpec("QUANTITY", "quantity", "int"),
    ]
    expr_rows = sorted(
        map(tuple, chunks_mod.flatten_chunks(raw, dims, metrics).collect()),
        key=str,
    )

    fn = udtf_compat.register(spark)
    raw.createOrReplaceTempView("_udtf_raw_chunks")
    try:
        udtf_rows = sorted(
            map(
                tuple,
                spark.sql(
                    f"SELECT t.* FROM _udtf_raw_chunks, LATERAL {fn}(row) t"
                ).collect(),
            ),
            key=str,
        )
    finally:
        spark.catalog.dropTempView("_udtf_raw_chunks")

    assert len(expr_rows) == len(udtf_rows) > 0
    assert expr_rows == udtf_rows
