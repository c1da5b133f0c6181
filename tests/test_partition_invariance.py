"""Partition-count invariance: results must be bit-identical whether a
query runs over 2 or 32 shuffle partitions.

This is the local proxy for "same answer on 8 cores and 1000 executors".
It holds only because of the repo-wide float discipline (integer-domain
sums, exact-quotient ratios, floor-scaled scores) — a raw double SUM
would fail it by accumulation-order drift. The picked queries exercise
the riskiest machinery: sketch merge (KMV), transcendental-scaled ranking
(TF-IDF), window cumsum binning (packing), and vectorized numpy partials
(class centroids)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

SENSITIVE = [
    "kmv_distinct",
    "text_tfidf",
    "doc_packing",
    "embedding_class_centroids",
    "pricing_summary",
    # round-3 additions exercising new risky machinery: iterative merge
    # adoption (argmax tiebreak per round), hashed-bucket log-ratios,
    # second-moment integer sums, and PSI/MI transcendental scaling
    "text_bpe_train",
    "importance_weights",
    "embedding_dim_stats",
    "drift_psi",
    "mutual_information",
    "dedup_substring",
    # round-4: 60-wide integer vote aggregate + band self-join (the ±1
    # vote sums are associative by construction; this pins it)
    "dedup_simhash",
    # round-6: multi-table LSH union + rounded-cosine dedup + per-node
    # window (knn graph machinery via its mutual symmetrization), BM25
    # positional postings + floor-scaled scores, and the components
    # labels over the mutual graph
    "knn_mutual_edges",
    "bm25_phrase_search",
    "dedup_mutual_knn_clusters",
    # round-7: weighted largest-remainder splits (remainder assignment
    # rides row_number windows — the tie-breaks must be total), the
    # salted twin (same output through a different shuffle layout), the
    # multi-probe union, and the hashed-linear-model integer fold
    "attribution_position",
    "attribution_timedecay",
    "attribution_salted",
    "knn_probe_lift",
    "quality_classifier",
]


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_independent_of_shuffle_partitions(spark, sf_dir, name):
    fn = entry_mod.queries()[name]
    before = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        few = sorted(map(tuple, fn(spark, sf_dir).collect()))
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        many = sorted(map(tuple, fn(spark, sf_dir).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert few == many
