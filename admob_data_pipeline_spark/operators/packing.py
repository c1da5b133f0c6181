"""Sequence chunking and packing for LLM training-data preparation.

Not reference-derived (the reference has no text surface) — these are the
two standard shape-transformations between a document corpus and a
fixed-context training set:

- **Chunking**: split each document's token stream into fixed-size windows
  with a stride (overlap) — one doc → ceil(n/stride) training rows.
- **Packing**: concatenate consecutive short documents into fixed-capacity
  packs (context-length bins) so training batches waste no pad tokens.

Both are deterministic and engine-portable, so they carry full DuckDB
oracles — the chunk windows are pure per-row array ops, and the packing
uses an integer cumulative sum with an explicit tie-break ordering.

Scale notes (100 TB):
- Chunking is map-only (explode of per-row generated windows): zero
  shuffle, scales linearly with executors. Output fan-out is bounded by
  ceil(n_tokens/stride) per doc.
- Packing shuffles once on the bucket key. Buckets are the parallelism
  unit (at scale: one bucket ≈ one output shard ≈ 256–1024 MB); the
  window cumulative-sum within a bucket is a single-pass sort aggregate.
  Packing quality (fill ratio) is per-bucket greedy-contiguous: a doc
  joins the pack its cumulative offset starts in, so a pack overflows by
  at most one document — the standard streaming-packing trade-off that
  avoids the O(n²) bin-packing global optimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators.text import tokens
from admob_data_pipeline_spark.operators.util import widen_if_narrow
from admob_data_pipeline_spark.sources.tables import load_table

CHUNK_SIZE = 32  # tokens per training window
CHUNK_STRIDE = 24  # window start step (CHUNK_SIZE - overlap)
PACK_CAPACITY = 256  # tokens per pack
N_BUCKETS = 8  # packing parallelism unit


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Fixed-size sliding windows over each document's tokens.

    Window starts at 0, stride, 2·stride, … while start < n_tokens; the
    final window may be short. Map-only: sequence() generates the start
    offsets per row and explode fans them out — no shuffle, no UDF."""
    df = widen_if_narrow(df)
    t = tokens(F.col(text_col))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(t) - 1, F.lit(0)), F.lit(stride)
    )
    return (
        df.select("doc_id", t.alias("toks"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            "start",
            F.slice(F.col("toks"), F.col("start") + 1, size).alias("chunk"),
        )
        .select(
            "doc_id",
            "start",
            F.size("chunk").alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", F.col("chunk"))).alias("chunk_hash"),
        )
    )


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return chunk_documents(docs).orderBy("doc_id", "start")


_ORACLE_CHUNKING = f"""
SELECT doc_id, start,
       CAST(len(chunk) AS INTEGER) AS n_chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_hash
FROM (
    SELECT doc_id, start,
           list_slice(toks, start + 1, start + {CHUNK_SIZE}) AS chunk
    FROM (
        SELECT doc_id, toks,
               unnest(generate_series(0, GREATEST(len(toks) - 1, 0),
                                      {CHUNK_STRIDE})) AS start
        FROM (
            SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents
        )
    )
)
ORDER BY doc_id, start
"""


def pack_documents(
    df: DataFrame,
    text_col: str = "text",
    capacity: int = PACK_CAPACITY,
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Greedy-contiguous packing: within a bucket (docs ordered by
    doc_id), a document joins the pack its cumulative token offset falls
    in — ``pack_id = floor(offset_before_doc / capacity)``. Exact integer
    arithmetic end-to-end (ROUND_NOTES rule 1), one shuffle on bucket."""
    df = widen_if_narrow(df)
    n_tok = F.size(tokens(F.col(text_col)))
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = df.select(
        "doc_id",
        (F.col("doc_id") % n_buckets).cast("long").alias("bucket"),
        n_tok.cast("long").alias("n_tokens"),
    )
    return (
        sized.withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            # integer DIV, not floor(x / y): `/` promotes to double and
            # loses exactness past 2^53 cumulative tokens per bucket
            "pack_id",
            F.expr(f"(cum - n_tokens) DIV CAST({capacity} AS BIGINT)"),
        )
        .groupBy("bucket", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bucket", "pack_id")
    )


def q_doc_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pack_documents(docs)


_ORACLE_PACKING = f"""
WITH sized AS (
    SELECT doc_id,
           CAST(doc_id % {N_BUCKETS} AS BIGINT) AS bucket,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
    FROM documents
), packed AS (
    SELECT bucket, doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS pack_id
    FROM sized
)
SELECT bucket, pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM packed
GROUP BY bucket, pack_id
ORDER BY bucket, pack_id
"""


def packing_efficiency(
    df: DataFrame, capacity: int = PACK_CAPACITY, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Pack-utilization audit over :func:`pack_documents`: per bucket, how
    many packs, the mean docs per pack, total vs wasted token budget, and
    the fill ratio — the metric that tells a training pipeline whether its
    packing capacity matches the document length distribution (waste =
    padding = wasted FLOPs).

    Waste is counted against CLOSED packs only (per-pack shortfall is
    capacity − pack_tokens... except overflow packs, whose last doc spills
    past capacity — those clamp to 0), all in exact integer arithmetic —
    including the fill ratio, reported as floor-divided parts-per-million
    so no double ever enters the result."""
    packs = pack_documents(df, capacity=capacity, n_buckets=n_buckets)
    waste = F.greatest(F.lit(0).cast("long"), F.lit(capacity) - F.col("pack_tokens"))
    return (
        packs.select("bucket", "pack_tokens", waste.alias("waste"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("pack_tokens").alias("total_tokens"),
            F.sum("waste").alias("wasted_tokens"),
        )
        .withColumn(
            # parts-per-million via BIGINT floor division — no double
            # quotient, no ROUND decimal-tie risk (playbook #2); exact in
            # both engines up to ~9e12 total tokens per bucket
            "fill_ratio_ppm",
            F.expr(
                "CAST(total_tokens * 1000000"
                " DIV (total_tokens + wasted_tokens) AS BIGINT)"
            ),
        )
        .orderBy("bucket")
    )


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return packing_efficiency(load_table(spark, sf_dir, "documents"))


_ORACLE_PACK_EFF = f"""
WITH sized AS (
    SELECT doc_id,
           CAST(doc_id % {N_BUCKETS} AS BIGINT) AS bucket,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
    FROM documents
), packed AS (
    SELECT bucket, doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - n_tokens) // {PACK_CAPACITY} AS BIGINT) AS pack_id
    FROM sized
), packs AS (
    SELECT bucket, pack_id, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
    FROM packed GROUP BY bucket, pack_id
), audited AS (
    SELECT bucket, pack_tokens,
           GREATEST(0, {PACK_CAPACITY} - pack_tokens) AS waste
    FROM packs
)
SELECT bucket,
       COUNT(*) AS n_packs,
       CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(waste) AS BIGINT) AS wasted_tokens,
       CAST(SUM(pack_tokens) * 1000000
            // (SUM(pack_tokens) + SUM(waste)) AS BIGINT) AS fill_ratio_ppm
FROM audited
GROUP BY bucket
ORDER BY bucket
"""


QUERIES = {
    "doc_chunking": q_doc_chunking,
    "doc_packing": q_doc_packing,
    "packing_efficiency": q_packing_efficiency,
}

ORACLES = {
    "doc_chunking": _ORACLE_CHUNKING,
    "doc_packing": _ORACLE_PACKING,
    "packing_efficiency": _ORACLE_PACK_EFF,
}
