"""Capture the ANN index ingest-side plan, before vs after the r12
fused-kernel rewrite (OPTIMIZATION_r12.md — ann_index_build/upsert).

The declared `ann_index_build` query returns a LocalTableScan of
collected per-list stats, so the plan that actually changed is the
DataFrame fed to the bucketed code-table write. This script constructs
both shapes from the same live functions and writes their
explain("formatted") to plans/r12/ann_index_build_ingest_{before,after}.txt:

- BEFORE (HEAD shape): assign_lists(base) JOIN pq_quantize(emb) on
  vec_id — two corpus kernels meeting in a corpus-scale shuffle join.
- AFTER: fused_assign_code_kernel — ONE map-only kernel pass.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from admob_data_pipeline_spark.sources.tables import load_table
from admob_data_pipeline_spark.operators.similarity import (
    _pq_codebooks,
    assign_lists,
    fused_assign_code_kernel,
    pq_quantize,
    with_vec,
    PQ_SLOTS,
    PQ_CODES,
)
from admob_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CENTROID_MOD = 32


def formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    spark = get_spark("capture-ingest-plan", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, SF_DIR, "embeddings")
    base, dim = with_vec(emb)
    m, kc = PQ_SLOTS, PQ_CODES
    sub = dim // m
    cents = base.where(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("v").alias("cv"),
        F.col("nrm").alias("cn"),
    )
    book_mats = _pq_codebooks(base, sub, m, kc)

    # BEFORE: two kernels + corpus-scale join on vec_id
    assigned = assign_lists(base, cents.select("cid", "cv"))
    codes = pq_quantize(emb, m, kc, book_mats=book_mats)
    before = codes.join(assigned.select("vec_id", "list_id"), "vec_id").select(
        "vec_id", "list_id", *[F.col(f"c{s}") for s in range(m)]
    )

    # AFTER: one fused map-only kernel
    cent_rows = cents.orderBy("cid").collect()
    kern, code_schema = fused_assign_code_kernel(
        [int(r["cid"]) for r in cent_rows],
        [list(r["cv"]) for r in cent_rows],
        book_mats,
        sub,
        m,
    )
    after = base.select("vec_id", "v").mapInPandas(kern, schema=code_schema)

    os.makedirs("plans/r12", exist_ok=True)
    with open("plans/r12/ann_index_build_ingest_before.txt", "w") as fh:
        fh.write(formatted(before))
    with open("plans/r12/ann_index_build_ingest_after.txt", "w") as fh:
        fh.write(formatted(after))
    print("written")


if __name__ == "__main__":
    main()
