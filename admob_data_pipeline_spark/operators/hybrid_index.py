"""Hybrid (lexical + vector) retrieval served ENTIRELY from persisted
indexes — the RAG serving stack as artifact composition.

The inline ``hybrid_search_rrf`` (operators/corpus.py) derives both legs
from the raw tables inside the query. Here the same more-like-this
query runs without touching the corpus or the embedding table beyond
the probe row: the lexical leg reads the persisted BM25 postings/doclen/
stats (query-term selection included — the probe's top terms come off
its own posting rows), the vector leg is the persisted IVF-PQ index's
two-stage search (ADC shortlist → exact-cosine rerank), and the fusion
is the same integer Reciprocal Rank Fusion. Rank-only fusion means the
two legs' incomparable scales never need calibration — and that the
vector leg may legitimately rank by its index's (quantized-shortlist)
view of the corpus rather than the exact-scan view: the oracle
recomputes exactly that split, IVF-PQ shortlist semantics included.

Reference: aamir-dp/admob-data-pipeline has no retrieval surface; this
composes the brief's persisted-index families into the serving shape a
production RAG deployment runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators.ann_index import (
    ann_index_build,
    ann_index_search_rerank,
)
from admob_data_pipeline_spark.operators.corpus import (
    _DUCK_BM25_SCORE,
    _DUCK_BM25_TABLES,
    BM25_B,
    BM25_K1,
    HYBRID_PROBE,
    HYBRID_QTERMS,
    HYBRID_TOP,
    RRF_K,
    RRF_POOL,
    RRF_SCALE,
    _bm25_rank_postings,
    _bm25_score,
)
from admob_data_pipeline_spark.operators.retrieval_index import (
    bm25_index_build,
)
from admob_data_pipeline_spark.operators.similarity import (
    _ORACLE_IVFPQ,
    DEFAULT_K,
)
from admob_data_pipeline_spark.sources.tables import load_table

VEC_SHORTLIST = 2 * RRF_POOL  # ADC shortlist feeding the exact rerank


def hybrid_index_search(
    spark: SparkSession,
    emb: DataFrame,
    bm25_prefix: str,
    ann_prefix: str,
    probe: int = HYBRID_PROBE,
    top: int = HYBRID_TOP,
) -> DataFrame:
    """More-like-this hybrid RRF from the two persisted indexes.

    Lexical leg (index-only): the probe's posting rows ARE its term
    profile — score them with index-derived dfs, the probe's stored
    doclen, and the frozen scalars to pick the top query terms, then
    rank the pool through the shared ``_bm25_rank_postings`` core fed
    from the index tables (probe excluded from candidates AFTER df).
    Vector leg (index-only): two-stage persisted ANN serving — ADC
    shortlist of ``VEC_SHORTLIST`` from the bucketed code table, exact
    cosine rerank to the pool. Fusion: integer RRF, full-outer over two
    ≤ pool-row lists."""
    postings_all = spark.table(f"{bm25_prefix}_postings").join(
        F.broadcast(spark.table(f"{bm25_prefix}_tombstones")),
        "doc_id",
        "left_anti",
    )
    doclen = spark.table(f"{bm25_prefix}_doclen")
    stats = spark.table(f"{bm25_prefix}_stats").select("n_docs", "avgdl")
    # probe term profile: its posting rows + per-term df + its doclen
    ptf = postings_all.where(F.col("doc_id") == probe).localCheckpoint()
    df_t = (
        postings_all.join(
            F.broadcast(ptf.select("token")), "token", "left_semi"
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    probe_dl = doclen.where(F.col("doc_id") == probe).select("dl")
    qscored = (
        ptf.join(F.broadcast(df_t), "token")
        .crossJoin(F.broadcast(probe_dl))
        .crossJoin(F.broadcast(stats))
        .select("token", _bm25_score(BM25_K1, BM25_B).alias("s"))
    )
    qterms = (
        qscored.orderBy(F.desc("s"), "token")
        .limit(HYBRID_QTERMS)
        .select("token")
        .localCheckpoint()
    )
    postings_sel = postings_all.join(
        F.broadcast(qterms), "token", "left_semi"
    ).localCheckpoint()
    lex = _bm25_rank_postings(
        None,
        postings_sel,
        RRF_POOL,
        BM25_K1,
        BM25_B,
        exclude_doc=probe,
        doclen=doclen,
        stats=stats,
    ).select("doc_id", F.col("rnk").alias("lex_rank"))
    vec = ann_index_search_rerank(
        emb, [probe], ann_prefix, k=RRF_POOL, rerank_r=VEC_SHORTLIST
    ).select(
        F.col("vec_id").alias("doc_id"),
        F.col("rank").cast("int").alias("vec_rank"),
    )
    fused = lex.join(vec, "doc_id", "full_outer").select(
        "doc_id",
        "lex_rank",
        "vec_rank",
        (
            F.coalesce(
                F.expr(f"{RRF_SCALE} DIV ({RRF_K} + lex_rank)"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{RRF_SCALE} DIV ({RRF_K} + vec_rank)"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_score"),
    )
    head = fused.orderBy(F.desc("rrf_score"), "doc_id").limit(top)
    w = Window.orderBy(F.desc("rrf_score"), F.col("doc_id"))
    return head.withColumn("rnk", F.row_number().over(w).cast("int")).orderBy(
        "rnk"
    )


def q_hybrid_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build both indexes in scratch, serve the hybrid query from them
    alone. The oracle recomputes the exact split: index-derived lexical
    leg (identical to the inline one — same corpus, same frozen-scalar
    derivation) fused with the IVF-PQ-shortlist exact-rerank vector
    leg."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="hybrid_index_")
    bp, ap = "hybrid_bm25_idx", "hybrid_ann_idx"
    try:
        bm25_index_build(docs, bp, f"{out}/bm25")
        ann_index_build(emb, ap, f"{out}/ann")
        rows = hybrid_index_search(spark, emb, bp, ap).collect()
    finally:
        for t in ("postings", "doclen", "stats", "positions", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {bp}_{t}")
        for t in ("centroids", "codebooks", "codes", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {ap}_{t}")
        shutil.rmtree(out, ignore_errors=True)
    return spark.createDataFrame(
        rows,
        "doc_id bigint, lex_rank int, vec_rank int, rrf_score bigint,"
        " rnk int",
    )


# vector leg: the inline IVF-PQ chain widened to the shortlist, exact-
# cosine reranked, filtered to the probe; lexical leg: the inline hybrid
# oracle's CTEs verbatim (the persisted derivation is value-identical).
_shortlist_sql = _ORACLE_IVFPQ.replace(
    f"WHERE rank <= {DEFAULT_K}", f"WHERE rank <= {VEC_SHORTLIST}"
).strip()
assert _shortlist_sql != _ORACLE_IVFPQ.strip()

_ORACLE_HYBRID_INDEX = f"""
WITH {_DUCK_BM25_TABLES},
short AS (
    {_shortlist_sql}
),
eb AS (
    SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
           sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                 CAST(embedding AS DOUBLE[]))) AS nrm
    FROM embeddings
),
rescored AS (
    SELECT s.vec_id AS doc_id,
           ROUND(list_dot_product(q.v, b.v) / NULLIF(q.nrm * b.nrm, 0), 6)
               AS cos_sim
    FROM short s
    JOIN eb q ON q.vec_id = s.qid
    JOIN eb b ON b.vec_id = s.vec_id
    WHERE s.qid = {HYBRID_PROBE}
),
vec AS (
    SELECT doc_id, vec_rank FROM (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY cos_sim DESC, doc_id
               ) AS INT) AS vec_rank
        FROM rescored
    ) WHERE vec_rank <= {RRF_POOL}
),
qsc AS (
    SELECT tf.token, {_DUCK_BM25_SCORE} AS s
    FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
    WHERE tf.doc_id = {HYBRID_PROBE}
),
qterms AS (SELECT token FROM qsc ORDER BY s DESC, token LIMIT {HYBRID_QTERMS}),
per_term AS (
    SELECT tf.doc_id, {_DUCK_BM25_SCORE} AS s
    FROM tf JOIN df USING (token) JOIN dl USING (doc_id), stats
    WHERE tf.token IN (SELECT token FROM qterms)
      AND tf.doc_id <> {HYBRID_PROBE}
),
doc_scores AS (
    SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_scaled
    FROM per_term GROUP BY doc_id
),
lex AS (
    SELECT doc_id, lex_rank FROM (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (
                   ORDER BY score_scaled DESC, doc_id
               ) AS INT) AS lex_rank
        FROM doc_scores
    ) WHERE lex_rank <= {RRF_POOL}
),
fused AS (
    SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
           CAST(COALESCE({RRF_SCALE} // ({RRF_K} + l.lex_rank), 0)
              + COALESCE({RRF_SCALE} // ({RRF_K} + v.vec_rank), 0)
               AS BIGINT) AS rrf_score
    FROM lex l FULL OUTER JOIN vec v ON v.doc_id = l.doc_id
),
ranked AS (
    SELECT doc_id, lex_rank, vec_rank, rrf_score,
           CAST(ROW_NUMBER() OVER (
               ORDER BY rrf_score DESC, doc_id
           ) AS INT) AS rnk
    FROM fused
)
SELECT doc_id, lex_rank, vec_rank, rrf_score, rnk
FROM ranked WHERE rnk <= {HYBRID_TOP}
ORDER BY rnk
"""


def serving_plans(spark: SparkSession, sf_dir: str):
    """Plan-audit hook: the registered wrapper collects internally for
    scratch cleanup; expose the real LAZY hybrid plan over prebuilt
    scratch indexes (see ann_index.serving_plans for the contract)."""
    import shutil
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out = tempfile.mkdtemp(prefix="hybrid_index_audit_")
    bp, ap = "hybrid_bm25_audit", "hybrid_ann_audit"
    bm25_index_build(docs, bp, f"{out}/bm25")
    ann_index_build(emb, ap, f"{out}/ann")

    def cleanup():
        for t in ("postings", "doclen", "stats", "positions", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {bp}_{t}")
        for t in ("centroids", "codebooks", "codes", "tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS {ap}_{t}")
        shutil.rmtree(out, ignore_errors=True)

    return {
        "hybrid_index_search": lambda: hybrid_index_search(
            spark, emb, bp, ap
        ),
    }, cleanup


QUERIES = {
    "hybrid_index_search": q_hybrid_index_search,
}

ORACLES = {
    "hybrid_index_search": _ORACLE_HYBRID_INDEX,
}
