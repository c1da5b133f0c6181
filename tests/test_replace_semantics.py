"""Uniform LSM replace/delete semantics across the three index
families (r12): a delete kills only versions ingested at-or-before its
stamp, so a doc/vector RE-INGESTED after its delete RESURRECTS — and
serving after the resurrection equals serving before the delete."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators import (
    ann_index,
    dedup_index,
    retrieval_index,
)
from admob_data_pipeline_spark.sources.tables import load_table


def test_bm25_delete_then_reupsert_resurrects(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark join window alpha"),
            (2, "spark beta gamma"),
            (3, "join window delta spark"),
        ],
        "doc_id long, text string",
    )
    out = tempfile.mkdtemp(prefix="bm25_resurrect_")
    prefix = "bm25_idx_rz"
    q = ("spark", "join", "window")
    try:
        retrieval_index.bm25_index_build(docs, prefix, out)
        before = retrieval_index.bm25_index_search(spark, q, prefix).collect()
        assert 1 in {r["doc_id"] for r in before}
        retrieval_index.bm25_index_delete(
            spark, docs.where("doc_id = 1").select("doc_id"), prefix
        )
        masked = retrieval_index.bm25_index_search(spark, q, prefix).collect()
        assert 1 not in {r["doc_id"] for r in masked}
        retrieval_index.bm25_index_upsert(docs.where("doc_id = 1"), prefix)
        after = retrieval_index.bm25_index_search(spark, q, prefix).collect()
        assert after == before  # identical text -> identical ranking
        # and the physical purge respects the resurrection
        retrieval_index.bm25_index_compact(spark, prefix)
        assert (
            retrieval_index.bm25_index_search(spark, q, prefix).collect()
            == before
        )
        assert spark.table(f"{prefix}_doclen").count() == 3
        assert spark.table(f"{prefix}_tombstones").count() == 0
    finally:
        for t in ("postings", "doclen", "stats", "positions", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_ann_delete_then_reupsert_resurrects(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="ann_resurrect_")
    prefix = "ann_idx_rz"
    try:
        ann_index.ann_index_build(emb, prefix, out)
        before = ann_index.ann_index_search(emb, [0], prefix).collect()
        victim = before[0]["vec_id"]
        ann_index.ann_index_delete(
            spark, emb.where(F.col("vec_id") == victim).select("vec_id"), prefix
        )
        masked = ann_index.ann_index_search(emb, [0], prefix).collect()
        assert victim not in {r["vec_id"] for r in masked}
        # re-ingest the ORIGINAL vector: same quantizers -> same codes,
        # and the epoch-aware mask must let the new version serve
        ann_index.ann_index_upsert(
            emb.where(F.col("vec_id") == victim), prefix
        )
        after = ann_index.ann_index_search(emb, [0], prefix).collect()
        assert after == before
        ann_index.ann_index_compact(spark, prefix)
        assert ann_index.ann_index_search(emb, [0], prefix).collect() == before
        assert (
            spark.table(f"{prefix}_codes")
            .groupBy("vec_id")
            .count()
            .where("count > 1")
            .count()
            == 0
        )
    finally:
        for t in ("centroids", "codebooks", "codes", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_dedup_delete_then_reupsert_resurrects(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    build = docs.where(F.col("doc_id") % dedup_index.PROBE_MOD != 0)
    batch = docs.where(F.col("doc_id") % dedup_index.PROBE_MOD == 0)
    import os

    out = tempfile.mkdtemp(prefix="dedup_resurrect_")
    prefix = "dedup_idx_rz"
    try:
        dedup_index.dedup_index_build(build, prefix, os.path.join(out, "ix"))
        before = dedup_index.dedup_index_probe(batch, prefix).collect()
        assert before, "fixture needs at least one near-dup pair"
        victim = before[0]["index_doc"]
        dedup_index.dedup_index_delete(
            spark,
            docs.where(F.col("doc_id") == victim).select("doc_id"),
            prefix,
        )
        masked = dedup_index.dedup_index_probe(batch, prefix).collect()
        assert victim not in {r["index_doc"] for r in masked}
        dedup_index.dedup_index_upsert(
            docs.where(F.col("doc_id") == victim), prefix
        )
        after = dedup_index.dedup_index_probe(batch, prefix).collect()
        assert after == before
        dedup_index.dedup_index_compact(spark, prefix)
        assert (
            dedup_index.dedup_index_probe(batch, prefix).collect() == before
        )
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)
