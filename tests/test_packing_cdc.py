"""Structural invariants for chunking/packing and CDC compaction — the
properties the oracle hash can't express directly."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from admob_data_pipeline_spark.operators import cdc, packing
from admob_data_pipeline_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_chunks_cover_every_token(spark, docs):
    """Union of chunk windows must cover each document exactly: with
    stride ≤ size there are no gaps, and total coverage per doc equals the
    window sum (overlap included)."""
    chunks = packing.chunk_documents(docs)
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_chunk_tokens").alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("start").alias("last_start"),
    )
    toks = docs.select(
        "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n_tokens")
    )
    joined = per_doc.join(toks, "doc_id").collect()
    assert joined
    for r in joined:
        # last window starts before the end: no token past last_start+size
        assert r.last_start < r.n_tokens
        # gapless: consecutive starts differ by stride ≤ size
        assert packing.CHUNK_STRIDE <= packing.CHUNK_SIZE
        # coverage ≥ n_tokens (overlap makes it strictly larger for n > size)
        assert r.covered >= r.n_tokens


def test_chunk_fanout_bound(spark, docs):
    """Each doc produces exactly ceil(n/stride) chunks (bounded fan-out —
    what keeps the explode safe at scale)."""
    chunks = packing.chunk_documents(docs)
    got = {r.doc_id: r.n for r in chunks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {
        r.doc_id: -(-r.n // packing.CHUNK_STRIDE)
        for r in docs.select(
            "doc_id", F.size(F.split(F.lower("text"), " ")).alias("n")
        ).collect()
    }
    assert got == want


def test_pack_overflow_bounded_by_one_doc(spark, docs):
    """Greedy-contiguous packing may overflow capacity by at most one
    document: pack_tokens < capacity + max doc tokens in that pack's
    bucket. Also: every doc lands in exactly one pack."""
    packs = packing.pack_documents(docs).collect()
    max_doc = (
        docs.select(F.max(F.size(F.split(F.lower("text"), " "))).alias("m"))
        .collect()[0]
        .m
    )
    assert packs
    for p in packs:
        assert p.pack_tokens < packing.PACK_CAPACITY + max_doc
        assert p.n_docs >= 1
    n_docs_total = sum(p.n_docs for p in packs)
    assert n_docs_total == docs.count()


def test_latest_by_key_deterministic_tiebreak(spark):
    """Equal timestamps resolve by event_id DESC — the snapshot is unique
    and reproducible."""
    rows = [
        (1, "click", 10, "2024-01-01 00:00:00", 1.0),
        (2, "click", 10, "2024-01-01 00:00:00", 2.0),  # same key+ts, higher id
        (3, "view", 10, "2024-01-02 00:00:00", 3.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    snap = cdc.latest_by_key(
        df, ["user_id", "event_type"], [F.desc("ts"), F.desc("event_id")]
    )
    got = {(r.user_id, r.event_type): r.event_id for r in snap.collect()}
    assert got == {(10, "click"): 2, (10, "view"): 3}


def test_packing_matches_pure_python_reference(spark):
    """Seeded random corpus: the distributed pack assignment must equal a
    sequential pure-Python implementation of the same greedy-contiguous
    rule, bucket by bucket."""
    import random

    rng = random.Random(42)
    rows = [(i, "w " * rng.randint(0, 80) + "w") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r.bucket, r.pack_id): (r.n_docs, r.pack_tokens, r.first_doc, r.last_doc)
        for r in packing.pack_documents(df).collect()
    }

    # sequential reference
    want: dict = {}
    by_bucket: dict = {}
    for doc_id, text in rows:
        by_bucket.setdefault(doc_id % packing.N_BUCKETS, []).append(
            (doc_id, len(text.lower().split(" ")))
        )
    for bucket, docs_in in by_bucket.items():
        cum = 0
        for doc_id, n in sorted(docs_in):
            pack_id = (cum) // packing.PACK_CAPACITY
            cum += n
            key = (bucket, pack_id)
            nd, pt, fd, ld = want.get(key, (0, 0, doc_id, doc_id))
            want[key] = (nd + 1, pt + n, min(fd, doc_id), max(ld, doc_id))
    assert got == want
