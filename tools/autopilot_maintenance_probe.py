"""Autopilot steady-state cost probe (round-11, judge r10 item 6).

The registered ``*_index_autopilot`` queries run 37-48 s at sf0.1, but
that wall time is dominated by the IN-WRAPPER build + multi-epoch
ingest fixture; the number that matters for the 100 TB story is the
MAINTENANCE phase alone — what a scheduled ops cycle costs against an
already-persisted index. This probe builds each family's lifecycle
state once (untimed, the deployment's sunk cost), then times:

  cycle1  the remedy cycle: audits fire, remedies run (split/refresh/
          ban-hot + compact) — the occasional expensive cycle,
  cycle2  the steady-state cycle right after: audits read the manifest
          and drift tables, find nothing actionable, do no writes —
          the cost a DAILY schedule actually pays.

The 100 TB claim probed: cycle2 must be AUDIT-BOUNDED (metadata +
pruned aggregate reads, no rewrites), i.e. a small fraction of cycle1
and independent of how much ingest history the index accumulated
before the last compact.

Usage: python tools/autopilot_maintenance_probe.py [sf_dir]
Prints one JSON line per family plus a summary line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from admob_data_pipeline_spark.operators import (  # noqa: E402
    ann_index,
    dedup_index,
    hybrid_index,
    retrieval_index,
)
from admob_data_pipeline_spark.session import get_spark  # noqa: E402
from admob_data_pipeline_spark.sources.tables import load_table  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def _ann_state(spark, prefix, out):
    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.where(F.col("vec_id") % 4 != 3)
    delta = emb.where(F.col("vec_id") % 4 == 3)
    ann_index.ann_index_build(base, prefix, out)
    for e in range(3):
        ann_index.ann_index_upsert(
            delta.where(F.expr(f"pmod(vec_id div 4, 3)") == e),
            prefix,
            epoch=e,
        )
    ann_index.ann_index_delete(
        spark, emb.where(F.col("vec_id") % 10 == 5).select("vec_id"), prefix
    )
    return lambda: ann_index.ann_index_autopilot(emb, prefix, max_epochs=2)


def _bm25_state(spark, prefix, out):
    docs = load_table(spark, SF_DIR, "documents")
    base = docs.where(F.col("doc_id") % 4 != 3)
    delta = docs.where(F.col("doc_id") % 4 == 3)
    retrieval_index.bm25_index_build(base, prefix, out)
    for e in range(2):
        retrieval_index.bm25_index_upsert(
            delta.where(F.expr("pmod(doc_id div 4, 2)") == e),
            prefix,
            epoch=e,
        )
    retrieval_index.bm25_index_delete(
        spark, docs.where(F.col("doc_id") % 10 == 5).select("doc_id"), prefix
    )
    return lambda: retrieval_index.bm25_index_autopilot(
        spark, prefix, max_epochs=1
    )


def _dedup_state(spark, prefix, out):
    docs = load_table(spark, SF_DIR, "documents")
    dedup_index.dedup_index_build(
        docs.where((F.col("doc_id") % 5).isin(1, 2)), prefix, out
    )
    dedup_index.dedup_index_upsert(
        docs.where(F.col("doc_id") % 5 == 3), prefix
    )
    dedup_index.dedup_index_upsert(
        docs.where(F.col("doc_id") % 5 == 4), prefix
    )
    dedup_index.dedup_index_delete(
        spark, docs.where(F.col("doc_id") % 10 == 7).select("doc_id"), prefix
    )
    return lambda: dedup_index.dedup_index_autopilot(
        spark, prefix, max_epochs=1
    )


def _hybrid_state(spark, prefixes, out):
    bp, ap = prefixes
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    retrieval_index.bm25_index_build(docs, bp, f"{out}/bm25")
    ann_index.ann_index_build(emb, ap, f"{out}/ann")
    # one-sided operational skew (1%): deleted from ANN only
    ann_index.ann_index_delete(
        spark, emb.where(F.col("vec_id") % 100 == 5).select("vec_id"), ap
    )
    return lambda: hybrid_index.hybrid_index_autopilot(
        spark, bp, ap, reconcile="bounded"
    )


FAMILY_TABLES = {
    "ann": ("centroids", "codebooks", "codes", "tombstones"),
    "bm25": ("postings", "doclen", "stats", "positions", "tombstones"),
    "dedup": ("bands", "shingles", "shsizes", "banned", "tombstones"),
}


def main() -> None:
    spark = get_spark("autopilot_probe", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for family, mk in (
        ("ann", _ann_state),
        ("bm25", _bm25_state),
        ("dedup", _dedup_state),
        ("hybrid", _hybrid_state),
    ):
        out = tempfile.mkdtemp(prefix=f"auto_probe_{family}_")
        if family == "hybrid":
            prefix = ("auto_probe_hy_bm25", "auto_probe_hy_ann")
        else:
            prefix = f"auto_probe_{family}"
        try:
            t0 = time.perf_counter()
            cycle = mk(spark, prefix, out)
            t_state = time.perf_counter() - t0
            t0 = time.perf_counter()
            actions1 = cycle()
            t1 = time.perf_counter() - t0
            t0 = time.perf_counter()
            actions2 = cycle()
            t2 = time.perf_counter() - t0
            # a third cycle re-measures the steady state (min of 2)
            t0 = time.perf_counter()
            actions3 = cycle()
            t3 = time.perf_counter() - t0
            row = {
                "family": family,
                "state_setup_sec": round(t_state, 2),
                "cycle1_sec": round(t1, 2),
                "cycle1_actions": actions1,
                "steady_sec": round(min(t2, t3), 2),
                "steady_actions": actions2 + actions3,
            }
            results[family] = row
            print(json.dumps(row), flush=True)
        finally:
            if family == "hybrid":
                for t in FAMILY_TABLES["bm25"]:
                    spark.sql(f"DROP TABLE IF EXISTS {prefix[0]}_{t}")
                for t in FAMILY_TABLES["ann"]:
                    spark.sql(f"DROP TABLE IF EXISTS {prefix[1]}_{t}")
            else:
                for t in FAMILY_TABLES[family]:
                    spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
            shutil.rmtree(out, ignore_errors=True)
    summary = {
        "probe": "autopilot_maintenance",
        "sf_dir": SF_DIR,
        "steady_total_sec": round(
            sum(r["steady_sec"] for r in results.values()), 2
        ),
        "remedy_total_sec": round(
            sum(r["cycle1_sec"] for r in results.values()), 2
        ),
    }
    print(json.dumps(summary))
    # persist per-SF so scaling_report.py can append the maintenance
    # section to SCALING.md (keyed by sf_dir; re-runs overwrite their key)
    import os

    store_path = "/root/repo/AUTOPILOT_PROBE.json"
    store = (
        json.load(open(store_path)) if os.path.exists(store_path) else {}
    )
    store[SF_DIR] = {"families": results, "summary": summary}
    json.dump(store, open(store_path, "w"), indent=1)


if __name__ == "__main__":
    main()
