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


def test_rolling_zscore_known_values(spark, sf_dir):
    import math

    from admob_data_pipeline_spark.plans.analytics_ext import (
        ZSCORE_SCALE,
        q_rolling_zscore,
    )

    rows = q_rolling_zscore(spark, sf_dir).collect()
    assert rows, "no output"
    by_key = {}
    for r in rows:
        by_key.setdefault(r.app_name, []).append(r)
    for app, rs in by_key.items():
        rs.sort(key=lambda r: r.date)
        # first day has no trailing history → NULL z
        assert rs[0].z_e4 is None
        # recompute one mid-series z from the raw daily values
        if len(rs) > 3:
            i = 3
            window = [x.vm for x in rs[max(0, i - 28):i]]
            n, s, q = len(window), sum(window), sum(v * v for v in window)
            rad = n * q - s * s
            if n >= 2 and rad > 0:
                z = (rs[i].vm * n - s) / math.sqrt(rad)
                assert rs[i].z_e4 == math.floor(z * ZSCORE_SCALE)


def test_quantile_binning_partitions_all_orders(spark, sf_dir):
    from admob_data_pipeline_spark.plans.analytics_ext import q_quantile_binning
    from admob_data_pipeline_spark.sources.tables import load_table

    rows = q_quantile_binning(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == total  # every order binned once
    assert [r.bucket for r in rows] == sorted(r.bucket for r in rows)
    # bucket ranges must not overlap
    for a, b in zip(rows, rows[1:]):
        assert a.max_cents <= b.min_cents


def test_link_prediction_excludes_existing_edges(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.graph import link_prediction

    # path graph 1-2-3-4: candidates are the distance-2 pairs (1,3), (2,4)
    edges = spark.createDataFrame(
        [Row(u=1, v=2), Row(u=2, v=3), Row(u=3, v=4)]
    )
    got = {(r.u, r.v): (r.n_common, r.jaccard_ppm) for r in link_prediction(edges).collect()}
    assert set(got) == {(1, 3), (2, 4)}
    # (1,3): common={2}, deg 1 and 2 → jaccard 1/(1+2-1) = 0.5
    assert got[(1, 3)] == (1, 500_000)
    assert got[(2, 4)] == (1, 500_000)


def test_frequent_triples_apriori_consistency(spark, sf_dir):
    """Every reported triple's support ≥ threshold and all its 2-subsets
    are frequent edges (the A-priori invariant the prune relies on)."""
    from admob_data_pipeline_spark.operators.graph import (
        MIN_SUPPORT,
        copurchase_edges,
        frequent_triples,
    )
    from admob_data_pipeline_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    edges = {(r.u, r.v) for r in copurchase_edges(li).collect()}
    for r in frequent_triples(li).collect():
        assert r.support >= MIN_SUPPORT
        assert (r.a, r.b) in edges and (r.b, r.c) in edges and (r.a, r.c) in edges


def test_association_rules_confidence_asymmetry(spark):
    """Rules are directed: a rare antecedent gives high confidence toward
    a common consequent but not vice versa."""
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.graph import association_rules

    # item 1 in 4 baskets, item 2 in 2 of them → conf(2→1)=1.0, conf(1→2)=0.5
    rows = []
    for ok in (1, 2, 3, 4):
        rows.append(Row(l_orderkey=ok, l_partkey=1))
    for ok in (1, 2):
        rows.append(Row(l_orderkey=ok, l_partkey=2))
    li = spark.createDataFrame(rows)
    got = {(r.ante, r.cons): r for r in association_rules(li).collect()}
    assert got[(2, 1)].confidence_ppm == 1_000_000
    assert got[(1, 2)].confidence_ppm == 500_000
    # lift symmetric: (2·4)/(4·2)=1 → 1e6
    assert got[(2, 1)].lift_e6 == got[(1, 2)].lift_e6 == 1_000_000


def test_hits_hand_computed_bipartite(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import hits_bipartite

    edges = spark.createDataFrame(
        [Row(c=1, p=10), Row(c=1, p=11), Row(c=2, p=10), Row(c=2, p=11), Row(c=2, p=12)]
    )
    out = {(r.role, r.node): (r.score1, r.score2) for r in hits_bipartite(edges).collect()}
    # a1: in-degrees (2,2,1); h1: c1=4, c2=5; a2: 9,9,5; h2: c1=18, c2=23
    assert out[("authority", 10)] == (2, 9)
    assert out[("authority", 11)] == (2, 9)
    assert out[("authority", 12)] == (1, 5)
    assert out[("hub", 1)] == (4, 18)
    assert out[("hub", 2)] == (5, 23)


def test_kcore_peels_tail_nodes(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import kcore

    # K4 on {1,2,3,4} (every node degree 3) + pendant chain 4-5-6:
    # 5 and 6 peel out at k=3, then the K4 survives intact.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    df = spark.createDataFrame([Row(u=u, v=v) for u, v in edges])
    rows = kcore(df, k=3).collect()
    out = {r.node: r.deg for r in rows}
    assert out == {1: 3, 2: 3, 3: 3, 4: 3}
    assert all(r.converged == 1 for r in rows)


def test_kcore_flags_unconverged_deep_cascade(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import kcore

    # Pendant path 1-2-...-12 hanging off K4 {20,21,22,23} ∪ {12}: at
    # k=2 the path peels one endpoint per round, so 3 rounds leave
    # non-core path nodes in the emitted set — the converged flag must
    # expose the truncation; enough rounds converge to the K4+12 core.
    path = [(i, i + 1) for i in range(1, 12)]
    k4 = [(20, 21), (20, 22), (20, 23), (21, 22), (21, 23), (22, 23)]
    anchor = [(12, 20), (12, 21)]
    df = spark.createDataFrame([Row(u=u, v=v) for u, v in path + k4 + anchor])

    truncated = kcore(df, k=2, iters=3).collect()
    assert truncated, "truncated run still emits a (super)set"
    assert all(r.converged == 0 for r in truncated)
    assert any(r.node < 10 for r in truncated), "under-peeled path nodes present"

    done = kcore(df, k=2, iters=12).collect()
    assert all(r.converged == 1 for r in done)
    assert {r.node for r in done} == {12, 20, 21, 22, 23}


def test_clustering_coefficient_wedge_free_graph(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import clustering_coefficient

    # Perfect matching: every degree is 1, zero wedges — must emit a 0
    # coefficient row, not raise ANSI DivideByZeroError.
    df = spark.createDataFrame([Row(u=1, v=2), Row(u=3, v=4)])
    [r] = clustering_coefficient(df).collect()
    assert (r.n_triangles, r.n_wedges, r.transitivity_ppm) == (0, 0, 0)


def test_negative_samples_exclude_positives_and_are_seeded(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import negative_samples

    pos = spark.createDataFrame([Row(c=1, p=10), Row(c=2, p=11)])
    items = spark.createDataFrame([Row(p_partkey=i) for i in range(10, 18)])
    out = negative_samples(pos, items, k=4)
    rows = [(r.user_id, r.slot, r.neg_item) for r in out.collect()]
    # no sampled negative equals the user's positive
    assert all(not (u == 1 and it == 10) and not (u == 2 and it == 11)
               for u, _, it in rows)
    # deterministic: second run identical
    assert rows == [(r.user_id, r.slot, r.neg_item)
                    for r in negative_samples(pos, items, k=4).collect()]
    # different seed -> different draw
    other = [(r.user_id, r.slot, r.neg_item)
             for r in negative_samples(pos, items, k=4, seed="other").collect()]
    assert rows != other


def test_recsys_hitrate_recovers_planted_pattern(spark):
    import datetime
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import recsys_hitrate

    # train period: many users buy {1,2} together; test period: user buys
    # 2 after having bought only 1 in train -> the rule 1->2 must hit.
    orders, items = [], []
    d0 = datetime.datetime(2024, 1, 1)
    ok = 0
    for u in range(10):  # co-purchase evidence in train
        ok += 1
        orders.append(Row(o_orderkey=ok, o_custkey=100 + u,
                          o_orderstatus="F", o_totalprice=1.0,
                          o_orderdate=d0, o_orderpriority="1-URGENT"))
        items += [Row(l_orderkey=ok, l_partkey=1), Row(l_orderkey=ok, l_partkey=2)]
    ok += 1  # eval user buys item 1 in train...
    orders.append(Row(o_orderkey=ok, o_custkey=999, o_orderstatus="F",
                      o_totalprice=1.0, o_orderdate=d0 + datetime.timedelta(days=1),
                      o_orderpriority="1-URGENT"))
    items.append(Row(l_orderkey=ok, l_partkey=1))
    ok += 1  # ...and item 2 in the test period
    orders.append(Row(o_orderkey=ok, o_custkey=999, o_orderstatus="F",
                      o_totalprice=1.0, o_orderdate=d0 + datetime.timedelta(days=100),
                      o_orderpriority="1-URGENT"))
    items.append(Row(l_orderkey=ok, l_partkey=2))
    li_cols = dict(l_suppkey=1, l_linenumber=1, l_quantity=1.0,
                   l_extendedprice=1.0, l_discount=0.0, l_tax=0.0,
                   l_returnflag="N", l_linestatus="O",
                   l_shipdate=d0)
    li = spark.createDataFrame([Row(**{**r.asDict(), **li_cols}) for r in items])
    out = recsys_hitrate(spark.createDataFrame(orders), li).first()
    assert out.n_users_eval == 1
    assert out.n_hit_users == 1
    assert out.hitrate_ppm == 1_000_000


def test_clustering_coefficient_complete_graph_is_one(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import clustering_coefficient

    # K4: 4 triangles, wedges = 4·C(3,2)=12 -> C = 3·4/12 = 1
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    out = clustering_coefficient(
        spark.createDataFrame([Row(u=u, v=v) for u, v in k4])
    ).first()
    assert (out.n_triangles, out.n_wedges, out.transitivity_ppm) == (4, 12, 1_000_000)
    # star graph: no triangles -> 0
    star = [(1, 2), (1, 3), (1, 4)]
    out2 = clustering_coefficient(
        spark.createDataFrame([Row(u=u, v=v) for u, v in star])
    ).first()
    assert out2.n_triangles == 0 and out2.transitivity_ppm == 0


def test_assortativity_sign_on_star_graph(spark):
    from pyspark.sql import Row
    from admob_data_pipeline_spark.operators.graph import degree_assortativity

    # star: hub degree 5 linked to leaves degree 1 -> perfectly
    # disassortative (r = -1)
    star = [(1, j) for j in range(2, 7)]
    out = degree_assortativity(
        spark.createDataFrame([Row(u=u, v=v) for u, v in star])
    ).first()
    assert out.r_e6 in (-1_000_000, -999_999)


def test_connected_components_raises_past_iteration_cap(spark):
    """Non-convergence must fail loudly: a diameter-5 path with
    max_iters=2 leaves labels still changing — silent early return would
    split one component into several and diverge from the exact oracle."""
    import pytest
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [Row(u=i, v=i + 1) for i in range(5)]
    )
    with pytest.raises(RuntimeError, match="still changing"):
        connected_components(edges, max_iters=2)


def test_label_propagation_finds_planted_communities(spark):
    """Two 4-cliques joined by a single bridge edge: synchronous LPA
    with the deterministic min-tie-break assigns each clique one
    community; the bridge is too weak to merge them."""
    clique_a = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    clique_b = [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
    e = _edges(spark, clique_a + clique_b + [(3, 10)])
    got = {r.community: r.n_nodes for r in graph.label_propagation(e).collect()}
    assert got == {0: 4, 10: 4}


def test_label_propagation_matches_python_reference(spark):
    """Synchronous rounds + (max count, min label) tie-break, pinned
    against a pure-python simulation on an asymmetric graph."""
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 3), (4, 5), (5, 6), (0, 6)]
    rounds = graph.LPA_ROUNDS
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            cnt = {}
            for m in nbrs:
                cnt[lbl[m]] = cnt.get(lbl[m], 0) + 1
            new[n] = min(cnt, key=lambda c: (-cnt[c], c))
        lbl = new
    want = {}
    for c in lbl.values():
        want[c] = want.get(c, 0) + 1
    got = {
        r.community: r.n_nodes
        for r in graph.label_propagation(_edges(spark, pairs)).collect()
    }
    assert got == want
