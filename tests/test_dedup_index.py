"""Persisted MinHash-LSH dedup index: frozen stop-list semantics,
exchange-free band probe, parity with the in-plan incremental op."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators import dedup_index
from admob_data_pipeline_spark.plans import explain
from admob_data_pipeline_spark.sources.tables import load_table


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows]
    )


def test_frozen_stop_list_semantics(spark):
    """The hot-shingle cap is FROZEN at build: a shingle hot in the BASE
    is filtered from the probe batch too (its band collisions vanish),
    while a shingle that becomes hot only INSIDE the batch is kept —
    the quantizer-freeze contract applied to dedup."""
    boiler = "alpha beta gamma delta"  # base-hot shingles (4 base docs)
    base = [
        (1, boiler + " one"),
        (2, boiler + " two"),
        (3, boiler + " three"),
        (4, boiler + " four"),
        # a pair of true near-dups inside the base (not probed)
        (6, "red green blue yellow purple"),
    ]
    batch = [
        # shares ONLY the frozen-hot boilerplate with base docs 1-4 →
        # all its shingles are banned → no candidates, no pairs
        (5, boiler + " five"),
        # true near-dup of base doc 6 through non-hot shingles
        (10, "red green blue yellow orange"),
    ]
    out = tempfile.mkdtemp(prefix="dedup_idx_test_")
    prefix = "dedup_idx_t"
    try:
        dedup_index.dedup_index_build(
            _docs(spark, base), prefix, out, max_df=3
        )
        banned = {
            r.shingle for r in spark.table(f"{prefix}_banned").collect()
        }
        # the boilerplate 3-gram shingles are base-hot (df=4 > 3)
        assert banned == {"alpha beta gamma", "beta gamma delta"}
        got = {
            (r.batch_doc, r.index_doc)
            for r in dedup_index.dedup_index_probe(
                _docs(spark, batch), prefix, threshold=0.5
            ).collect()
        }
        assert got == {(10, 6)}
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_band_probe_has_no_exchange_on_index_side(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    out = tempfile.mkdtemp(prefix="dedup_idx_plan_")
    prefix = "dedup_idx_p"
    try:
        dedup_index.dedup_index_build(base, prefix, out)
        probe = spark.createDataFrame(
            [("00000000000000000000000000000000",)], "band_key string"
        )
        plan = explain.formatted_plan(
            spark.table(f"{prefix}_bands").hint("merge").join(probe, "band_key")
        )
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange (") == 1, plan  # probe side only
        assert "Bucketed: true" in plan
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_upsert_then_compact_keeps_probe_semantics_and_layout(spark, sf_dir):
    """Incremental maintenance + compaction: upserted docs are probed
    identically to a from-scratch build WITH the frozen stop list (the
    registered oracle pins values; here we pin table mechanics), the
    compacted tables drop to one file per bucket, probe results are
    identical pre/post, and the zero-Exchange band probe survives."""
    docs = load_table(spark, sf_dir, "documents")
    build = docs.where((F.col("doc_id") % 5).isin([1, 2]))
    delta = docs.where((F.col("doc_id") % 5).isin([3, 4]))
    batch = docs.where(F.col("doc_id") % 5 == 0)
    out = tempfile.mkdtemp(prefix="dedup_idx_compact_")
    prefix = "dedup_idx_cpt"
    try:
        dedup_index.dedup_index_build(build, prefix, out)
        n0 = spark.table(f"{prefix}_bands").count()
        dedup_index.dedup_index_upsert(
            delta.where(F.col("doc_id") % 5 == 3), prefix
        )
        dedup_index.dedup_index_upsert(
            delta.where(F.col("doc_id") % 5 == 4), prefix
        )
        n1 = spark.table(f"{prefix}_bands").count()
        assert n1 > n0  # delta band entries landed
        pre = dedup_index.dedup_index_probe(batch, prefix).collect()
        (bb, ba), (sb, sa) = dedup_index.dedup_index_compact(spark, prefix)
        assert ba < bb and sa < sb
        assert ba <= dedup_index.DEDUP_IDX_BUCKETS
        assert sa <= dedup_index.DEDUP_IDX_BUCKETS
        assert spark.table(f"{prefix}_bands").count() == n1
        assert dedup_index.dedup_index_probe(batch, prefix).collect() == pre
        probe = spark.createDataFrame(
            [("00000000000000000000000000000000",)], "band_key string"
        )
        plan = explain.formatted_plan(
            spark.table(f"{prefix}_bands").hint("merge").join(probe, "band_key")
        )
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange (") == 1, plan
        assert "Bucketed: true" in plan
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_upsert_replay_with_same_epoch_is_idempotent(spark, sf_dir):
    """Replaying an ingest epoch must leave all three maintained tables
    byte-identical — duplicated band entries would re-surface as
    duplicate candidates, duplicated shingle rows would corrupt the
    exact-Jaccard verification counts."""
    docs = load_table(spark, sf_dir, "documents")
    build = docs.where((F.col("doc_id") % 5).isin([1, 2]))
    delta = docs.where((F.col("doc_id") % 5).isin([3, 4]))
    batch = docs.where(F.col("doc_id") % 5 == 0)
    out = tempfile.mkdtemp(prefix="dedup_idx_replay_")
    prefix = "dedup_idx_replay_t"
    try:
        dedup_index.dedup_index_build(build, prefix, out)
        dedup_index.dedup_index_upsert(delta, prefix, epoch=0)
        snaps = {
            t: sorted(map(tuple, spark.table(f"{prefix}_{t}").collect()))
            for t in ("bands", "shingles", "shsizes")
        }
        pre = dedup_index.dedup_index_probe(batch, prefix).collect()
        dedup_index.dedup_index_upsert(delta, prefix, epoch=0)  # replay
        for t, snap in snaps.items():
            assert sorted(
                map(tuple, spark.table(f"{prefix}_{t}").collect())
            ) == snap, t
        assert dedup_index.dedup_index_probe(batch, prefix).collect() == pre
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_delete_masks_then_compact_purges(spark, sf_dir):
    """Tombstone lifecycle for the dedup index: deleted docs never
    surface as candidates, all three maintained tables purge their rows
    at compaction, the tombstone set truncates, and probe results are
    byte-identical across the purge."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") % 5 != 0)
    batch = docs.where(F.col("doc_id") % 5 == 0)
    doomed = base.where(F.col("doc_id") % 10 == 1).select("doc_id")
    out = tempfile.mkdtemp(prefix="dedup_idx_del_test_")
    prefix = "dedup_idx_del_t"
    try:
        dedup_index.dedup_index_build(base, prefix, out)
        n_bands = spark.table(f"{prefix}_bands").count()
        dedup_index.dedup_index_delete(spark, doomed, prefix)
        got = dedup_index.dedup_index_probe(batch, prefix).collect()
        assert all(r.index_doc % 10 != 1 for r in got)
        assert spark.table(f"{prefix}_bands").count() == n_bands
        dedup_index.dedup_index_compact(spark, prefix)
        for t in ("bands", "shingles", "shsizes"):
            assert (
                spark.table(f"{prefix}_{t}")
                .join(doomed, "doc_id", "left_semi")
                .count()
                == 0
            ), t
        assert spark.table(f"{prefix}_tombstones").count() == 0
        assert dedup_index.dedup_index_probe(batch, prefix).collect() == got
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_streaming_ingest_survives_midstream_restart(spark, sf_dir, tmp_path):
    """Kill-and-restart through the streaming dedup-index maintenance:
    committed epochs are not double-applied after a resume; the final
    probe equals a one-shot batch upsert over the same split."""
    docs = load_table(spark, sf_dir, "documents")
    build = docs.where((F.col("doc_id") % 5).isin([1, 2]))
    delta = docs.where((F.col("doc_id") % 5).isin([3, 4]))
    batch = docs.where(F.col("doc_id") % 5 == 0)
    prefix = "dedup_idx_restart_t"
    src = str(tmp_path / "arrivals")
    ckpt = str(tmp_path / "ckpt")

    def arrive(part):
        delta.where(F.col("doc_id") % 5 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run():
        q = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(
                lambda b, eid: dedup_index.dedup_index_upsert(
                    b, prefix, epoch=eid
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    prefix2 = "dedup_idx_restart_ref_t"
    try:
        dedup_index.dedup_index_build(build, prefix, str(tmp_path / "a"))
        arrive(3)
        run()  # epoch 0 commits, stream stops
        arrive(4)
        run()  # restart: only epoch 1 runs
        got = dedup_index.dedup_index_probe(batch, prefix).collect()
        dedup_index.dedup_index_build(build, prefix2, str(tmp_path / "b"))
        dedup_index.dedup_index_upsert(delta, prefix2, epoch=0)
        want = dedup_index.dedup_index_probe(batch, prefix2).collect()
        assert got == want
        # delta docs actually entered the index (non-vacuous parity)
        assert (
            spark.table(f"{prefix}_shsizes")
            .where((F.col("doc_id") % 5).isin([3, 4]))
            .count()
            > 0
        )
    finally:
        for p in (prefix, prefix2):
            for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
                spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_ban_hot_repairs_only_affected_docs(spark, sf_dir):
    """The stop-list re-census remedy's physical contracts (the oracle
    gate pins values, not layout): docs containing NO newly-banned
    shingle keep byte-identical band rows (epoch included), affected
    docs' rows are consistently rewritten (bands from the post-ban
    signature, shingle rows minus the bans, sizes matching), the stop
    list grows by exactly top_n, and the zero-Exchange bucketed probe
    join survives the partition rewrites."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where((F.col("doc_id") % 5).isin(1, 2))
    out = tempfile.mkdtemp(prefix="dedup_ban_hot_test_")
    prefix = "dedup_idx_bh_t"
    try:
        dedup_index.dedup_index_build(base, prefix, out)
        dedup_index.dedup_index_upsert(
            docs.where(F.col("doc_id") % 5 == 3), prefix
        )
        pre_bands = {
            (r.band_key, r.band, r.doc_id, r.epoch)
            for r in spark.table(f"{prefix}_bands").collect()
        }
        pre_sh = {
            (r.shingle, r.doc_id, r.epoch)
            for r in spark.table(f"{prefix}_shingles").collect()
        }
        n_banned_pre = spark.table(f"{prefix}_banned").count()
        n_hot = dedup_index.dedup_index_ban_hot(spark, prefix, top_n=5)
        assert n_hot == 5
        banned_all = {
            r.shingle for r in spark.table(f"{prefix}_banned").collect()
        }
        assert spark.table(f"{prefix}_banned").count() == n_banned_pre + 5
        affected = {d for (s, d, e) in pre_sh if s in banned_all}
        post_bands = {
            (r.band_key, r.band, r.doc_id, r.epoch)
            for r in spark.table(f"{prefix}_bands").collect()
        }
        post_sh = {
            (r.shingle, r.doc_id, r.epoch)
            for r in spark.table(f"{prefix}_shingles").collect()
        }
        # banned shingles fully purged; survivors byte-identical
        assert post_sh == {
            (s, d, e) for (s, d, e) in pre_sh if s not in banned_all
        }
        # untouched docs: band rows byte-identical
        pre_untouched = {r for r in pre_bands if r[2] not in affected}
        assert pre_untouched == {
            r for r in post_bands if r[2] not in affected
        }
        # affected docs: bands recomputed (epoch preserved), sizes match
        sizes = {
            r.doc_id: r.n_sh
            for r in spark.table(f"{prefix}_shsizes").collect()
        }
        from collections import Counter

        sh_counts = Counter(d for (_, d, _) in post_sh)
        assert sizes == dict(sh_counts)
        # the bucketed zero-Exchange probe join survives the rewrite
        probe = spark.createDataFrame(
            [("00000000000000000000000000000000",)], "band_key string"
        )
        plan = explain.formatted_plan(
            spark.table(f"{prefix}_bands").hint("merge").join(probe, "band_key")
        )
        assert "SortMergeJoin" in plan
        assert plan.count("Exchange (") == 1, plan
        assert "Bucketed: true" in plan
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)


def test_ban_hot_rerun_reconciles_crash_leftovers(spark, sf_dir):
    """Crash-recovery convergence (round-10 self-review): a shingle that
    reached the stop list while the partition rewrites never ran (its
    residual df may no longer win the top-N election) must STILL be
    purged by the next run — the repair reconciles against the full
    banned table, not the fresh election."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.where((F.col("doc_id") % 5).isin(1, 2))
    out = tempfile.mkdtemp(prefix="dedup_ban_crash_test_")
    prefix = "dedup_idx_bc_t"
    try:
        dedup_index.dedup_index_build(base, prefix, out)
        dedup_index.dedup_index_upsert(
            docs.where(F.col("doc_id") % 5 == 3), prefix
        )
        # pick a LOW-df stored shingle: it could never win a top-N
        # election, so only the banned-table reconciliation can purge it
        victim = (
            spark.table(f"{prefix}_shingles")
            .groupBy("shingle")
            .count()
            .orderBy("count", "shingle")
            .first()["shingle"]
        )
        # simulate the crash state: stop list extended, rewrite never ran
        spark.createDataFrame([(victim,)], "shingle string").write.mode(
            "append"
        ).format("parquet").saveAsTable(f"{prefix}_banned")
        assert (
            spark.table(f"{prefix}_shingles")
            .where(F.col("shingle") == victim)
            .count()
            > 0
        )
        dedup_index.dedup_index_ban_hot(spark, prefix, top_n=3)
        # the leftover is purged even though it was not re-elected
        assert (
            spark.table(f"{prefix}_shingles")
            .where(F.col("shingle") == victim)
            .count()
            == 0
        )
    finally:
        for t in ("bands", "shingles", "shsizes", "banned", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        shutil.rmtree(out, ignore_errors=True)
