"""Aggregate query/oracle registry — one import point for __spark_entry__.

Each domain module contributes ``QUERIES`` (name → (spark, sf_dir) →
DataFrame) and ``ORACLES`` (name → DuckDB SQL). Names are unique across
modules; a query without an oracle gets the driver's weaker rows-only
check (reserved for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

from admob_data_pipeline_spark.operators import (
    cdc,
    corpus,
    dedup,
    multimodal,
    packing,
    similarity,
    text,
)
from admob_data_pipeline_spark.plans import analytics_ext, relational
from admob_data_pipeline_spark.sinks import roundtrip
from admob_data_pipeline_spark.streaming import alerts as streaming_alerts

# Order matters for the driver's 50-query correctness window (see
# DRIVER_GREEN below): within the "fresh" group, modules earlier in this
# list are checked first. relational (pivot_revenue's fixed oracle) and the
# LLM-pipeline operators are the never-driver-checked surface, so they lead;
# analytics_ext's latest additions queue behind them for next round's
# rotation.
_MODULES = [
    relational,
    text,
    corpus,
    dedup,
    similarity,
    multimodal,
    packing,
    cdc,
    roundtrip,
    streaming_alerts,
    analytics_ext,
]


def _merged(attr: str) -> dict:
    out: dict = {}
    for mod in _MODULES:
        for name, v in getattr(mod, attr, {}).items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = v
    return out


# Names with a driver-green CORRECTNESS row on record (round 1, sf0.01).
# The external correctness gate samples only the first 50 registry entries
# per round, so queries WITHOUT a green record are ordered first and the
# already-verified set last; append each round's green names here to rotate
# fresh queries into the checked window until every entry has a record.
DRIVER_GREEN: frozenset[str] = frozenset(
    {
        "pricing_summary",
        "global_revenue",
        "distinct_priorities",
        "collect_by_group",
        "dim_join_filter",
        "customers_without_orders",
        "trailing_date_range",
        "union_reports",
        "scalar_functions",
        "chunk_flatten",
        "report_spec",
        "ctr_anomaly_sql",
        "ctr_anomaly_df",
        "ctr_anomaly_window",
        "calendar_rollup",
        "props_json",
        "top_orders",
        "alert_messages",
        "salted_agg",
        "salted_join",
        "asof_join",
        "window_analytics",
        "revenue_histogram",
        "quantile_stats",
        "kmv_distinct",
        "shipping_priority",
        "regional_revenue",
        "range_join",
        # pivot_revenue: rows+schema matched but hash failed in r01 (HUGEINT
        # oracle type) — kept OUT of this set so the fixed oracle re-enters
        # the checked window.
        "semi_join",
        "full_outer_coverage",
        "cube_summary",
        "profile_orders",
        "window_ranks",
        "corr_stats",
        "large_volume_customers",
        "nation_volume_trade",
        "priority_shipmix",
        "promo_revenue_ratio",
        "disjunctive_revenue",
        "min_cost_per_brand",
        "waiting_suppliers",
        "idle_high_balance",
        "grouping_sets_calendar",
        "bloom_pruned_join",
        "heavy_hitters",
        "incremental_rollup",
        "resample_daily",
        "cohort_retention",
        "funnel_conversion",
    }
)


# Round-1-era queries that have NEVER had a driver verdict (two rounds
# outstanding) — they outrank this round's newer additions for the 50
# slots of the correctness window. Names absent from the registry are
# ignored, so this list never breaks when queries are renamed.
FRESH_FIRST: tuple[str, ...] = (
    "pivot_revenue",
    "text_hashing_vectorizer",
    "text_dataset_split",
    "text_vocabulary",
    "text_corpus_filter",
    "text_token_stats",
    "text_quality_scores",
    "text_language_id",
    "text_fingerprints",
    "text_bm25",
    "stratified_sample",
    "text_decontaminate",
    "text_repetition",
    "text_tfidf",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_clusters",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "embedding_neardup",
    "embedding_neardup_lsh",
    "embedding_quantize_int8",
    "embedding_class_centroids",
    "multimodal_frame_dedup",
    "multimodal_metadata",
    "multimodal_frames",
    "doc_chunking",
    "doc_packing",
    "merge_latest",
    "scd2_intervals",
    "sink_csv_roundtrip",
    "sink_sorted_layout",
    "sink_jsonl_roundtrip",
    "sink_partition_overwrite",
    "streaming_stateful_rates",
    "sessionize_batch",
    "streaming_sessionize_sink",
    "streaming_attribution",
    "streaming_dedup",
    "streaming_daily_rates",
    "streaming_sessionize",
)


def _prioritized(d: dict) -> dict:
    first = {k: d[k] for k in FRESH_FIRST if k in d and k not in DRIVER_GREEN}
    fresh = {
        k: v for k, v in d.items() if k not in DRIVER_GREEN and k not in first
    }
    green = {k: v for k, v in d.items() if k in DRIVER_GREEN}
    return {**first, **fresh, **green}


QUERIES = _prioritized(_merged("QUERIES"))
ORACLES = _merged("ORACLES")
