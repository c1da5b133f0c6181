"""Duplicate-cluster (connected components) semantics."""

from __future__ import annotations

from pyspark.sql import Row

from admob_data_pipeline_spark.operators import dedup


def _docs(spark, texts):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_transitive_chain_is_one_cluster(spark):
    """A~B and B~C (but A≁C directly) must still cluster together —
    pairwise dedup can't see this; components can."""
    # A and B share the w1..w5 prefix (jaccard .23); B and C share the
    # x6..x10 tail (.23); A and C share nothing. Chain: A-B-C.
    a = "w1 w2 w3 w4 w5 a6 a7 a8 a9 a10"
    b = "w1 w2 w3 w4 w5 x6 x7 x8 x9 x10"
    c = "x6 x7 x8 x9 x10 q1 q2 q3 q4 q5"
    d = "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10"  # isolated
    out = dedup.duplicate_clusters(
        _docs(spark, [a, b, c, d]), threshold=0.2
    ).collect()
    by_doc = {r.doc_id: r for r in out}
    assert by_doc[0].cluster_id == by_doc[1].cluster_id == by_doc[2].cluster_id == 0
    assert by_doc[0].cluster_size == 3
    assert by_doc[3].cluster_id == 3 and by_doc[3].cluster_size == 1


def test_singletons_when_no_pairs(spark):
    out = dedup.duplicate_clusters(
        _docs(spark, ["a b c d e", "v w x y z"]), threshold=0.9
    ).collect()
    assert all(r.cluster_id == r.doc_id and r.cluster_size == 1 for r in out)
