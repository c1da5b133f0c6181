"""Physical-plan pins: the properties that make these plans survive a
100× scale-up (SURVEY.md §4). A regression here is a performance bug even
when results stay correct."""

from __future__ import annotations

from pyspark.sql import functions as F

from admob_data_pipeline_spark.plans import explain, relational
from admob_data_pipeline_spark.sources.tables import load_table


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, sf_dir):
    df = relational.q_pricing_summary(spark, sf_dir)
    pushed = explain.pushed_filters(df)
    assert any("l_shipdate" in p for p in pushed), pushed
    schemas = explain.scan_read_schemas(df)
    # scan must read only the 5 referenced columns, not all 11
    assert len(schemas) == 1
    for col in ("l_returnflag", "l_linestatus", "l_quantity"):
        assert col in schemas[0]
    for col in ("l_orderkey", "l_partkey", "l_suppkey", "l_tax"):
        assert col not in schemas[0], schemas[0]


def test_pricing_summary_partial_aggregation(spark, sf_dir):
    """partial (map-side) + final HashAggregate — one shuffle of pre-agg'd
    rows, never raw rows."""
    df = relational.q_pricing_summary(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan or "Partial" in plan


def test_dim_join_is_broadcast_not_shuffle(spark, sf_dir):
    df = relational.q_dim_join_filter(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact side must not shuffle for the join


def test_alert_join_is_broadcast(spark, sf_dir):
    df = relational.q_ctr_anomaly_df(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_in_list_filter_reaches_scan(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("c_custkey")
    )
    pushed = explain.pushed_filters(df)
    assert any("c_mktsegment" in p and "In" in p for p in pushed), pushed


def test_dedup_operators_never_cartesian(spark, sf_dir):
    """The whole point of LSH/banding: candidate generation must be an
    equi-join on bucket keys — a CartesianProduct (or broadcast NL join)
    anywhere means the O(N²) pair space leaked back in."""
    from admob_data_pipeline_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    for df in (
        dedup.ngram_jaccard_pairs(docs),
        dedup.minhash_lsh_pairs(docs),
        dedup.simhash_pairs(docs),
    ):
        plan = explain.formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_topk_uses_limit_not_global_sort(spark, sf_dir):
    """ORDER BY + LIMIT must compile to TakeOrderedAndProject — a
    per-partition top-k + merge, not a full global sort."""
    df = relational.q_top_orders(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "TakeOrderedAndProject" in plan


def test_pivot_is_single_aggregation_no_distinct_prepass(spark, sf_dir):
    """Declared pivot values must compile to ONE conditional-sum hash
    aggregation; an undeclared pivot runs a distinct-scan of the pivot
    column first (an extra full pass over the fact table at scale)."""
    df = relational.q_pivot_revenue(spark, sf_dir)
    plan = explain.formatted_plan(df)
    # one parquet scan only: an undeclared pivot value list adds a second
    # scan (the distinct pre-pass). Spark's declared pivot is a two-phase
    # aggregation — (key, yr) pre-agg then pivot-first — both over the
    # same single scan, which is the shape we want at scale.
    # formatted output names each node twice (tree + details): 2 mentions
    # per physical scan, so one scan == exactly 2
    assert plan.count("Scan parquet") == 2, plan


def test_semi_join_no_fanout_operators(spark, sf_dir):
    """left_semi must stay a semi join (no fan-out + dedup recovery)."""
    df = relational.q_semi_join(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_decontaminate_broadcasts_benchmark_grams(spark, sf_dir):
    """The benchmark gram set must broadcast — the training side of a
    decontamination pass must never shuffle for the match."""
    from admob_data_pipeline_spark.operators import corpus

    df = corpus.q_decontaminate(spark, sf_dir)
    plan = explain.formatted_plan(df)
    assert "BroadcastHashJoin" in plan


def test_ivf_assignment_is_map_only(spark, sf_dir):
    """Centroid assignment must not materialize the N×C pair space: no
    join/cross-product may appear between the scan and the mapInPandas
    assignment stage (probe/search joins later in the plan are fine and
    must be broadcast)."""
    from admob_data_pipeline_spark.operators import similarity
    from admob_data_pipeline_spark.sources.tables import load_table as lt

    emb = lt(spark, sf_dir, "embeddings")
    assigned = similarity.assign_lists(
        similarity.with_vec(emb)[0],
        similarity.with_vec(emb)[0]
        .where(F.col("vec_id") % 25 == 0)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv")),
    )
    plan = explain.formatted_plan(assigned)
    assert "Join" not in plan and "CartesianProduct" not in plan, plan
