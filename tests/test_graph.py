"""Iterative graph kernels: integer-domain PageRank + min-label components."""

from pyspark.sql import Row

from admob_data_pipeline_spark.operators import graph


def _edges(spark, pairs):
    return spark.createDataFrame([Row(u=a, v=b) for a, b in pairs])


def test_pagerank_hub_ranks_highest(spark):
    # star: 0 connected to 1..4, plus a detached pair 5-6
    e = _edges(spark, [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)])
    rows = graph.pagerank(e).collect()
    assert rows[0].node == 0  # the hub dominates
    by_node = {r.node: r.rank_e12 for r in rows}
    # leaves of the star are symmetric — identical integer ranks
    assert len({by_node[n] for n in (1, 2, 3, 4)}) == 1
    assert by_node[5] == by_node[6]
    # integer mass is conserved up to DIV truncation: never exceeds scale
    assert sum(by_node.values()) <= graph.PR_SCALE


def test_pagerank_deterministic_across_partitioning(spark):
    e = _edges(spark, [(i, (i * 7 + 1) % 23) for i in range(22)])
    a = {(r.node, r.rank_e12) for r in graph.pagerank(e).collect()}
    b = {
        (r.node, r.rank_e12)
        for r in graph.pagerank(e.repartition(2)).collect()
    }
    assert a == b  # BIGINT arithmetic: shuffle order cannot change bits


def test_components_two_cliques(spark):
    e = _edges(spark, [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12)])
    lbl = {r.node: r.lbl for r in graph.connected_components(e).collect()}
    assert lbl == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10}


def test_components_chain_converges_past_one_hop(spark):
    # a 6-node path: min label must travel the full diameter
    e = _edges(spark, [(i, i + 1) for i in range(5)])
    lbl = {r.node: r.lbl for r in graph.connected_components(e).collect()}
    assert set(lbl.values()) == {0}
