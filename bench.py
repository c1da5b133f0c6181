"""Benchmark harness (driver contract).

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through the noop sink (executes the whole
physical plan incl. projections — ``count()`` would let Catalyst prune
work a real consumer pays for).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from admob_data_pipeline_spark.plans import registry
from admob_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "pricing_summary",
    "ctr_anomaly_sql",
    "ctr_anomaly_window",
    "dim_join_filter",
    "chunk_flatten",
    "report_spec",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality_scores",
    "text_fingerprints",
    "ann_bruteforce_topk",
    "embedding_neardup",
    "multimodal_frames",
    "asof_join",
    "window_analytics",
    "text_corpus_filter",
    "ann_ivf_topk",
    "salted_agg",
    "kmv_distinct",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen warm-up on the smallest table (not timed)
    registry.QUERIES["distinct_priorities"](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        materialize(registry.QUERIES[name](spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
