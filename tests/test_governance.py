"""Governance ops: k-anonymity, erasure audit, typo clustering."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators import governance


def test_k_anonymity_flags_small_groups(spark):
    rows = [Row(qa="x", qb="m")] * 6 + [Row(qa="y", qb="m")] * 2
    out = {
        (r.qa, r.qb): (r.group_size, r.meets_k)
        for r in governance.k_anonymity(
            spark.createDataFrame(rows), ["qa", "qb"]
        ).collect()
    }
    assert out == {("x", "m"): (6, True), ("y", "m"): (2, False)}


def test_erasure_audit_checksum_proves_absence(spark):
    ev = spark.createDataFrame([Row(user_id=i, v=i * 2) for i in range(20)])
    forgotten = spark.createDataFrame([Row(user_id=3), Row(user_id=7)])
    before = governance.erasure_audit(ev, forgotten).first()
    assert before.n_erased == 2 and before.n_kept == 18

    # after actually deleting, the audit must report 0 erased and the SAME
    # surviving checksum — that equality is the absence proof
    wiped = ev.join(forgotten, "user_id", "left_anti")
    after = governance.erasure_audit(wiped, forgotten).first()
    assert after.n_erased == 0
    assert after.n_kept == 18
    assert after.kept_key_checksum == before.kept_key_checksum


def test_typo_pairs_blocking_has_full_recall(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="color colour colr kolor banana"),
            Row(doc_id=1, text="color grape"),
        ]
    )
    got = {(r.a, r.b): r.dist for r in governance.typo_pairs(docs).collect()}
    # brute-force ground truth at distance <= 2
    vocab = [
        r.tok
        for r in docs.select(
            F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
        .distinct()
        .collect()
    ]

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    expect = {
        (a, b): lev(a, b)
        for a in vocab
        for b in vocab
        if a < b and lev(a, b) <= 2
    }
    assert got == expect
    assert ("color", "colour") in got and got[("color", "colr")] == 1


def test_dq_constraints_reports_failures_and_passes(spark, sf_dir):
    from admob_data_pipeline_spark.operators.governance import dq_constraints
    from admob_data_pipeline_spark.sources.tables import load_table

    rows = {
        r.constraint: r
        for r in dq_constraints(
            load_table(spark, sf_dir, "orders"), load_table(spark, sf_dir, "lineitem")
        ).collect()
    }
    assert len(rows) == 7
    # the suite must be able to FAIL: partial orders exist in the data
    assert not rows["o_orderstatus_no_partial"].passed
    assert rows["o_orderstatus_no_partial"].violations > 0
    # structural invariants of the dataset hold
    for name in ("o_custkey_complete", "o_orderkey_unique", "l_orderkey_ref_integrity"):
        assert rows[name].passed and rows[name].violations == 0


def test_t_closeness_bounds_and_homogeneous_group(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.governance import (
        q_l_diversity,
        q_t_closeness,
    )

    rows = q_t_closeness(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert 0 <= r.tv_ppm <= 1_000_000  # TV distance ∈ [0, 1]
    ld = {r.c_nationkey: r for r in q_l_diversity(spark, "/root/testdata/sf0.001").collect()}
    assert set(ld) == {r.c_nationkey for r in rows}


def test_erasure_guard_fallback_preserves_results(spark, sf_dir, monkeypatch):
    """erasure_audit's one-count broadcast guard must produce identical
    counts and checksum when forced onto the plain-join path."""
    from admob_data_pipeline_spark.operators import governance, util

    want = governance.q_erasure_audit(spark, sf_dir).collect()
    monkeypatch.setattr(util, "BROADCAST_ROW_LIMIT", 0)
    got = governance.q_erasure_audit(spark, sf_dir).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
