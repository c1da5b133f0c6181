"""Bounded-reconcile policy: the skew ratio must bound OPERATIONAL skew
of the shared universe, not be diluted by a large declared asymmetric
surface (ADVICE r11)."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators.ann_index import (
    ann_index_build,
    ann_index_delete,
)
from admob_data_pipeline_spark.operators.hybrid_index import (
    hybrid_index_autopilot,
    hybrid_index_parity,
)
from admob_data_pipeline_spark.operators.retrieval_index import (
    bm25_index_build,
)
from admob_data_pipeline_spark.sources.tables import load_table


def test_bounded_skew_ratio_is_net_of_declared_slice(spark, sf_dir):
    """Deployment whose DECLARED text-only surface is half the corpus:
    an operational skew of ~1/64 of the corpus is ~1.6% of the GROSS
    live set (inside a 2% bound — the old denominator would have
    repaired) but ~3% of the shared universe net of the declared slice
    — the bounded policy must REFUSE, because the bound is a statement
    about operational skew, which lives entirely in the net universe."""
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    text_only = F.col("vec_id") % 2 == 1
    op_skew = (F.col("vec_id") % 64 == 0) & ~text_only
    out = tempfile.mkdtemp(prefix="hybrid_netden_")
    bp, ap = "hybrid_netden_bm25", "hybrid_netden_ann"
    try:
        bm25_index_build(docs, bp, f"{out}/bm25")
        ann_index_build(emb.where(~text_only), ap, f"{out}/ann")
        ann_index_delete(spark, emb.where(op_skew).select("vec_id"), ap)
        declared = docs.select("doc_id").join(
            emb.where(~text_only).select(F.col("vec_id").alias("doc_id")),
            "doc_id",
            "left_anti",
        )
        # sanity: the construction really straddles the bound
        row = hybrid_index_parity(spark, bp, ap).first()
        n_op = emb.where(op_skew).count()
        gross = max(row["n_bm25_live"], row["n_ann_live"])
        net = max(
            row["n_bm25_live"] - declared.count(),
            row["n_ann_live"],
        )
        assert n_op / gross <= 0.02 < n_op / net, (n_op, gross, net)
        before = hybrid_index_parity(spark, bp, ap).first()
        acts = hybrid_index_autopilot(
            spark,
            bp,
            ap,
            reconcile="bounded",
            expected_asymmetry=declared,
        )
        assert len(acts) == 1 and acts[0].endswith(":exceeds-skew-bound"), (
            acts
        )
        # and it deleted nothing
        assert hybrid_index_parity(spark, bp, ap).first() == before
    finally:
        for t in ("postings", "doclen", "stats", "positions", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {bp}_{t}")
        for t in ("centroids", "codebooks", "codes", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {ap}_{t}")
        shutil.rmtree(out, ignore_errors=True)
