"""Text-analysis operators over the ``documents`` table (BASELINE.json
north-star: language-ID, quality scoring, token counting, fingerprinting).

Not reference-derived (the reference has no text ops) — these are the
training-data-pipeline extensions, designed Spark-first:

- all tokenization/scoring is built-in column expressions (split/filter/
  transform lambdas) — JVM-side, codegen'd, no Python UDFs;
- fingerprints use md5 (identical in Spark and DuckDB → oracle-checkable);
- at 100 TB these are embarrassingly parallel map-only stages: no shuffle
  at all until the final aggregate, so they scale linearly with executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from admob_data_pipeline_spark.operators.util import join_small, widen_if_narrow
from admob_data_pipeline_spark.sources.tables import load_table

# Stopword marker sets for the n-gram/stopword language heuristic. The
# synthetic corpus shares one vocabulary, so marker hits are sparse — the
# classifier machinery is what matters (deterministic argmax w/ tiebreak).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "et", "les", "des"),
    "de": ("der", "die", "das", "und", "nicht"),
    "zh": ("de0", "le0", "shi0", "bu0", "wo0"),  # pinyin-ish markers
}

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (the corpus is space-delimited; a regex
    tokenizer drops in here for real corpora)."""
    return F.split(F.lower(text), " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish sub-word proxy
    (4-char windows, ~chars/4 rounded up) + distinct-token ratio."""
    df = widen_if_narrow(df)
    t = tokens(F.col(text_col))
    return df.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        F.ceil(F.length(text_col) / F.lit(4)).cast("long").alias("n_bpe_est"),
        F.round(
            F.try_divide(F.size(F.array_distinct(t)), F.size(t)), 6
        ).alias("ttr"),
    )


def quality_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length, mean token length, stopword ratio,
    non-alpha ratio — the standard pre-training quality heuristics."""
    df = widen_if_narrow(df)
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    stop_hits = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    alpha_only = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z]", "")
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(F.try_divide(F.length(text_col) - n_tok + 1, n_tok), 6).alias(
            "mean_token_len"
        ),
        F.round(F.try_divide(stop_hits, n_tok), 6).alias("stopword_ratio"),
        F.round(
            F.try_divide(
                F.length(text_col) - F.length(alpha_only), F.length(text_col)
            ),
            6,
        ).alias("non_alpha_ratio"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language heuristic: score = |tokens ∩ markers(lang)|,
    predicted = argmax score (ties → lexicographically first lang, 'und'
    when no marker hits)."""
    df = widen_if_narrow(df)
    t = tokens(F.col(text_col))

    def marker_filter(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    scores = [
        F.struct(
            F.size(F.filter(t, marker_filter(markers))).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct(score, lang) orders by score then lang — we want
    # max score, ties broken by FIRST lang, so invert: sort desc score,
    # asc lang via (score, negated-rank) — simplest: reduce with greatest
    # semantics expressed as sort_array on (score desc → use -score asc).
    best = F.sort_array(
        F.array(*[
            F.struct(
                (-s.getField("score")).alias("neg"),
                s.getField("lang").alias("lang"),
                s.getField("score").alias("score"),
            )
            for s in scores
        ])
    ).getItem(0)
    return df.select(
        "doc_id",
        F.col("lang").alias("lang_meta"),
        F.when(best.getField("score") > 0, best.getField("lang"))
        .otherwise(F.lit("und"))
        .alias("lang_pred"),
        best.getField("score").cast("long").alias("marker_hits"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", k: int = 3) -> DataFrame:
    """Document fingerprinting: full-text md5 + min-shingle fingerprint
    (the 1-hash MinHash — a content-defined rolling fingerprint).

    Staged through an intermediate select so the shingle array is built
    once per row, not re-derived per output expression."""
    df = widen_if_narrow(df)
    staged = df.select(
        "doc_id",
        F.lower(F.col(text_col)).alias("lt"),
        shingles(tokens(F.col(text_col)), k).alias("sh"),
    )
    return staged.select(
        "doc_id",
        F.md5(F.col("lt")).alias("fp_md5"),
        F.array_min(F.transform(F.col("sh"), F.md5)).alias("fp_min_shingle"),
        F.size(F.col("sh")).alias("n_shingles"),
    )


def shingles(tok: Column, k: int = 3) -> Column:
    """k-token shingles as strings; empty array when fewer than k tokens.

    Guarded: Spark's ``sequence(1, n)`` DESCENDS when n < 1, so short
    documents must short-circuit to an empty array.
    """
    n = F.size(tok)
    idx = F.sequence(F.lit(1), n - (k - 1))
    return F.when(
        n >= k,
        F.transform(idx, lambda i: F.array_join(F.slice(tok, i, k), " ")),
    ).otherwise(F.array().cast("array<string>"))


def corpus_filter(
    docs: DataFrame,
    min_tokens: int = 20,
    max_tokens: int = 10_000,
    min_stopword_ratio: float = 0.0,
    max_non_alpha: float = 0.5,
) -> DataFrame:
    """Composite pre-training corpus filter: quality gates + exact-dup
    canonicalization in one pass, emitting keep/drop with the FIRST failing
    rule as the reason (the standard pipeline audit trail).

    All gates are column expressions over one scan + one hash-groupBy for
    the dup check — the filter stays a two-shuffle job at any corpus size.
    """
    q = quality_scores(docs)
    # exact-dup canonical: first doc_id per content hash keeps
    hashes = docs.select("doc_id", F.md5(F.col("text")).alias("h"))
    canon = hashes.groupBy("h").agg(F.min("doc_id").alias("canon_id"))
    dedup = hashes.join(canon, "h").select(
        "doc_id", (F.col("doc_id") == F.col("canon_id")).alias("is_canonical")
    )
    joined = q.join(dedup, "doc_id")
    reason = (
        F.when(~F.col("is_canonical"), F.lit("duplicate"))
        .when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("stopword_ratio") < min_stopword_ratio, F.lit("low_stopword"))
        .when(F.col("non_alpha_ratio") > max_non_alpha, F.lit("non_alpha"))
        .otherwise(F.lit("ok"))
    )
    return joined.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
        "n_tokens",
    ).orderBy("doc_id")


FUNNEL_STAGES = ["duplicate", "too_short", "too_long", "low_stopword", "non_alpha"]


def curation_funnel(docs: DataFrame, **filter_kwargs) -> DataFrame:
    """Filter-cascade accounting: for each curation stage, how many docs
    entered, how many it dropped, and the drop rate — the funnel report a
    data-curation team reads to see WHERE the corpus is shrinking (C4/
    RefinedWeb-style pipeline accounting). Stage semantics come from
    ``corpus_filter`` (reason = first failing gate), so drops attribute to
    the earliest stage exactly as a sequential pipeline would.

    Scale: one corpus-sized aggregation (reason tallies); the funnel
    arithmetic runs over |stages| rows. Drop rates are integer ppm."""
    cf = corpus_filter(docs, **filter_kwargs)
    # one corpus pass: the reason tally (≤ |stages|+1 rows) is checkpointed
    # and the raw total derived from it, instead of re-scanning for a count
    drops = (
        cf.groupBy("reason").agg(F.count(F.lit(1)).alias("n")).localCheckpoint()
    )
    stages = docs.sparkSession.createDataFrame(
        [(i + 1, s) for i, s in enumerate(FUNNEL_STAGES)],
        "stage_idx int, stage string",
    )
    tot = drops.agg(F.sum("n").alias("n_raw"))
    f = (
        stages.join(F.broadcast(drops), stages.stage == drops.reason, "left")
        .select(
            "stage_idx", "stage", F.coalesce("n", F.lit(0)).cast("long").alias("n_dropped")
        )
    )
    w = Window.orderBy("stage_idx").rowsBetween(Window.unboundedPreceding, -1)
    cum = f.crossJoin(tot).select(
        "stage_idx",
        "stage",
        (F.col("n_raw") - F.coalesce(F.sum("n_dropped").over(w), F.lit(0))).alias(
            "n_in"
        ),
        "n_dropped",
    )
    return cum.select(
        "stage_idx",
        "stage",
        F.col("n_in").cast("long").alias("n_in"),
        "n_dropped",
        (F.col("n_in") - F.col("n_dropped")).cast("long").alias("n_out"),
        F.expr(
            "CAST(CASE WHEN n_in = 0 THEN 0 "
            "ELSE n_dropped * 1000000 DIV n_in END AS BIGINT)"
        ).alias("drop_ppm"),
    ).orderBy("stage_idx")


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    return curation_funnel(load_table(spark, sf_dir, "documents"))


def tokenizer_fertility(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer fertility by language: subword-pieces per whitespace word
    (here the BPE-proxy estimate from ``token_stats``) — the fairness
    audit that shows which languages pay more tokens per word under a
    given tokenizer (fertility ≫ 1 → that language gets less effective
    context and costs more to train on). Exact integer ppm output.

    Scale: map-only per-doc arithmetic + one small groupBy on lang."""
    stats = token_stats(docs, text_col)
    per_doc = stats.join(docs.select("doc_id", "lang"), "doc_id")
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_words"),
            F.sum("n_bpe_est").alias("n_pieces"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_pieces",
            # two-stage ×1000 scaling (see vocab_coverage): piece counts at
            # corpus scale would overflow BIGINT when multiplied by 1e6
            F.expr(
                "CAST(CASE WHEN n_words = 0 THEN 0 "
                "ELSE (n_pieces * 1000 DIV n_words) * 1000 "
                "+ (n_pieces * 1000 % n_words) * 1000 DIV n_words "
                "END AS BIGINT)"
            ).alias("fertility_ppm"),
        )
        .orderBy("lang")
    )


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tokenizer_fertility(load_table(spark, sf_dir, "documents"))


_ORACLE_FERTILITY = """
WITH s AS (
    SELECT doc_id, lang,
           CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens,
           CAST(CEIL(len(text) / 4.0) AS BIGINT) AS n_bpe_est
    FROM documents
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_words,
       CAST(SUM(n_bpe_est) AS BIGINT) AS n_pieces,
       CAST(CASE WHEN SUM(n_tokens) = 0 THEN 0
            ELSE (SUM(n_bpe_est) * 1000 // SUM(n_tokens)) * 1000
                 + (SUM(n_bpe_est) * 1000 % SUM(n_tokens)) * 1000
                   // SUM(n_tokens) END AS BIGINT)
           AS fertility_ppm
FROM s
GROUP BY lang
ORDER BY lang
"""


def dataset_split(
    docs: DataFrame,
    seed: str = "split-seed-1",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Deterministic train/val/test assignment by content-stable hash:
    split(doc) = f(md5(seed || doc_id)) — reproducible across runs,
    clusters, and engines; changing the seed re-shuffles assignments
    without touching data. The standard leakage-safe split for training
    corpora (hash the ID, never random())."""
    frac = F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string"))), 1, 13),
        16,
        10,
    ).cast("double") / F.lit(float(16**13))
    split = (
        F.when(frac < val_frac, F.lit("val"))
        .when(frac < val_frac + test_frac, F.lit("test"))
        .otherwise(F.lit("train"))
    )
    return docs.select("doc_id", split.alias("split"))


def vocabulary(docs: DataFrame, top_n: int = 100, text_col: str = "text") -> DataFrame:
    """Corpus vocabulary: document frequency + occurrence count per token,
    top-N by (df desc, token) — the vocab/BPE-prep pass of a text
    pipeline. One explode + one groupBy; top-N via TakeOrderedAndProject."""
    tok = widen_if_narrow(docs.select("doc_id", F.col(text_col))).select(
        "doc_id", F.explode(tokens(F.col(text_col))).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("doc_freq"),
            F.count(F.lit(1)).alias("occurrences"),
        )
        .orderBy(F.desc("doc_freq"), "token")
        .limit(top_n)
    )


def hashing_vectorizer(
    docs: DataFrame, dim: int = 32, text_col: str = "text"
) -> DataFrame:
    """Feature-hashing vectorizer: token t lands in bucket md5(t) mod dim,
    vector[i] = count of tokens in bucket i — the classic trick that turns
    unbounded vocab into fixed-width features with no vocabulary table
    (and thus no shuffle to build one).

    One explode + one groupBy; the dense vector assembles from the sparse
    (bucket, count) map per doc. Output also carries the l2 norm so the
    vector can flow straight into the similarity operators.
    """
    bucket = (
        F.conv(F.substring(F.md5(F.col("token")), 1, 13), 16, 10).cast("long")
        % dim
    ).cast("int")
    counts = (
        widen_if_narrow(docs.select("doc_id", F.col(text_col)))
        .select("doc_id", F.explode(tokens(F.col(text_col))).alias("token"))
        .select("doc_id", bucket.alias("b"))
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("b", "c"))).alias("m"))
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m").getItem(i.cast("int")), F.lit(0).cast("long")),
    )
    staged = counts.select("doc_id", vec.alias("vec"))
    l2 = F.sqrt(
        F.aggregate(
            F.col("vec"),
            F.lit(0.0),
            lambda acc, x: acc + (x * x).cast("double"),
        )
    )
    return staged.select(
        "doc_id",
        F.md5(F.array_join(F.transform(F.col("vec"), lambda x: x.cast("string")), ","))
        .alias("vec_checksum"),
        F.element_at("vec", 1).alias("v0"),
        F.element_at("vec", dim).alias(f"v{dim - 1}"),
        F.round(l2, 6).alias("l2_norm"),
    )


# PII patterns chosen from the RE2 ∩ Java-regex common subset (no
# lookaround, no backrefs) so the Spark operator and the DuckDB oracle
# compile the same automaton. Order matters: emails first (an address
# contains dots a later pattern could nibble), then phones, then IPv4.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_redact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing: replace emails / phone numbers / IPv4 addresses with
    typed placeholder tags and report per-category hit counts — the
    standard pre-training privacy pass.

    Pure column expressions (regexp_count + chained regexp_replace), so the
    scrub is a map-only stage at any corpus size: no shuffle, no Python.
    Counts are taken BEFORE redaction; replacements are applied in
    PII_PATTERNS order."""
    df = widen_if_narrow(df)
    redacted = F.col(text_col)
    counts = []
    for name, pattern, tag in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pattern)).alias(f"n_{name}s")
        )
        redacted = F.regexp_replace(redacted, pattern, tag)
    return df.select(
        "doc_id",
        *counts,
        F.md5(redacted).alias("redacted_md5"),
    )


def length_bucket_sample(
    docs: DataFrame,
    seed: str = "lenbucket-seed-1",
    text_col: str = "text",
) -> DataFrame:
    """Token-length-stratified downsampling: bucket documents by token
    count, keep each doc with a per-bucket rate via the same
    content-stable md5 fraction as ``dataset_split`` — the standard move
    for reshaping a corpus's length distribution (long docs are rarer but
    each costs more tokens, so they get higher keep rates... or lower,
    per the rate table) without a shuffle and reproducibly across engines.

    Map-only until the final tiny per-bucket aggregate."""
    t = tokens(F.col(text_col))
    n_tok = F.size(t)
    bucket = (
        F.when(n_tok < 32, F.lit("len_lt_32"))
        .when(n_tok < 64, F.lit("len_32_63"))
        .when(n_tok < 96, F.lit("len_64_95"))
        .otherwise(F.lit("len_ge_96"))
    )
    rate = (
        F.when(n_tok < 32, F.lit(1.0))
        .when(n_tok < 64, F.lit(0.5))
        .when(n_tok < 96, F.lit(0.25))
        .otherwise(F.lit(0.125))
    )
    frac = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("double") / F.lit(float(16**13))
    staged = widen_if_narrow(docs).select(
        "doc_id", bucket.alias("bucket"), (frac < rate).alias("keep")
    )
    return (
        staged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_kept"),
            F.min(F.when(F.col("keep"), F.col("doc_id"))).alias("first_kept"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------- queries

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_stats(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


_ORACLE_TOKEN_STATS = """
WITH t AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks, len(text) AS n_chars
    FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct_tokens,
       CAST(CEIL(n_chars / 4.0) AS BIGINT) AS n_bpe_est,
       ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / NULLIF(len(toks), 0), 6) AS ttr
FROM t
ORDER BY doc_id
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


_ORACLE_QUALITY = f"""
WITH t AS (
    SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
           len(text) AS n_chars
    FROM documents
)
SELECT doc_id,
       CAST(n_chars AS INT) AS n_chars,
       CAST(len(toks) AS INT) AS n_tokens,
       ROUND(CAST(n_chars - len(toks) + 1 AS DOUBLE) / NULLIF(len(toks), 0), 6)
           AS mean_token_len,
       ROUND(CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
             / NULLIF(len(toks), 0), 6) AS stopword_ratio,
       ROUND(CAST(n_chars - len(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                  AS DOUBLE) / NULLIF(n_chars, 0), 6) AS non_alpha_ratio
FROM t
ORDER BY doc_id
"""

_MARKER_CASES = "\n".join(
    f"           CAST(len(list_filter(toks, x -> x IN {markers!r})) AS BIGINT) AS s_{lang},"
    for lang, markers in sorted(LANG_MARKERS.items())
)

_ORACLE_LANG_ID = f"""
WITH t AS (
    SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents
),
s AS (
    SELECT doc_id, lang,
{_MARKER_CASES}
    FROM t
),
ranked AS (
    SELECT doc_id, lang AS lang_meta, u.lang AS cand, u.score,
           ROW_NUMBER() OVER (PARTITION BY doc_id
                              ORDER BY u.score DESC, u.lang) AS rn
    FROM s, UNNEST([
        {{'lang': 'de', 'score': s_de}}, {{'lang': 'en', 'score': s_en}},
        {{'lang': 'es', 'score': s_es}}, {{'lang': 'fr', 'score': s_fr}},
        {{'lang': 'zh', 'score': s_zh}}
    ]) AS un(u)
)
SELECT doc_id, lang_meta,
       CASE WHEN score > 0 THEN cand ELSE 'und' END AS lang_pred,
       score AS marker_hits
FROM ranked WHERE rn = 1
ORDER BY doc_id
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


_ORACLE_FINGERPRINTS = """
WITH t AS (
    SELECT doc_id, lower(text) AS lt, string_split(lower(text), ' ') AS toks
    FROM documents
),
sh AS (
    SELECT doc_id, lt,
           [array_to_string(toks[i:i+2], ' ')
            FOR i IN generate_series(1, len(toks) - 2)] AS shingles
    FROM t
)
SELECT doc_id,
       md5(lt) AS fp_md5,
       list_min(list_transform(shingles, s -> md5(s))) AS fp_min_shingle,
       CAST(len(shingles) AS INT) AS n_shingles
FROM sh
ORDER BY doc_id
"""


def q_corpus_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corpus_filter(load_table(spark, sf_dir, "documents"))


_ORACLE_CORPUS_FILTER = f"""
WITH t AS (
    SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
           len(text) AS n_chars, md5(text) AS h
    FROM documents
),
q AS (
    SELECT doc_id, h,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
               / NULLIF(len(toks), 0) AS stop_r,
           CAST(n_chars - len(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                AS DOUBLE) / NULLIF(n_chars, 0) AS na_r
    FROM t
),
canon AS (SELECT h, MIN(doc_id) AS canon_id FROM q GROUP BY h),
j AS (
    SELECT q.*, (q.doc_id = c.canon_id) AS is_canonical
    FROM q JOIN canon c USING (h)
),
r AS (
    SELECT doc_id, n_tokens,
           CASE WHEN NOT is_canonical THEN 'duplicate'
                WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 10000 THEN 'too_long'
                WHEN ROUND(stop_r, 6) < 0.0 THEN 'low_stopword'
                WHEN ROUND(na_r, 6) > 0.5 THEN 'non_alpha'
                ELSE 'ok' END AS reason
    FROM j
)
SELECT doc_id, reason, reason = 'ok' AS keep, n_tokens
FROM r
ORDER BY doc_id
"""

_ORACLE_FUNNEL = f"""
WITH t AS (
    SELECT doc_id, text, string_split(lower(text), ' ') AS toks,
           len(text) AS n_chars, md5(text) AS h
    FROM documents
),
q AS (
    SELECT doc_id, h,
           CAST(len(toks) AS INT) AS n_tokens,
           CAST(len(list_filter(toks, x -> x IN {STOPWORDS!r})) AS DOUBLE)
               / NULLIF(len(toks), 0) AS stop_r,
           CAST(n_chars - len(regexp_replace(lower(text), '[^a-z]', '', 'g'))
                AS DOUBLE) / NULLIF(n_chars, 0) AS na_r
    FROM t
),
canon AS (SELECT h, MIN(doc_id) AS canon_id FROM q GROUP BY h),
j AS (
    SELECT q.*, (q.doc_id = c.canon_id) AS is_canonical
    FROM q JOIN canon c USING (h)
),
r AS (
    SELECT doc_id,
           CASE WHEN NOT is_canonical THEN 'duplicate'
                WHEN n_tokens < 20 THEN 'too_short'
                WHEN n_tokens > 10000 THEN 'too_long'
                WHEN ROUND(stop_r, 6) < 0.0 THEN 'low_stopword'
                WHEN ROUND(na_r, 6) > 0.5 THEN 'non_alpha'
                ELSE 'ok' END AS reason
    FROM j
),
drops AS (SELECT reason, COUNT(*) AS n FROM r GROUP BY reason),
stages AS (
    SELECT * FROM (VALUES (1, 'duplicate'), (2, 'too_short'), (3, 'too_long'),
                          (4, 'low_stopword'), (5, 'non_alpha'))
        AS v(stage_idx, stage)
),
tot AS (SELECT COUNT(*) AS n_raw FROM r),
f AS (
    SELECT s.stage_idx, s.stage, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_dropped
    FROM stages s LEFT JOIN drops d ON d.reason = s.stage
),
cum AS (
    SELECT stage_idx, stage, n_dropped,
           t.n_raw - COALESCE(SUM(n_dropped) OVER (
               ORDER BY stage_idx ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS n_in
    FROM f, tot t
)
SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
       CAST(n_in AS BIGINT) AS n_in,
       n_dropped,
       CAST(n_in - n_dropped AS BIGINT) AS n_out,
       CAST(CASE WHEN n_in = 0 THEN 0
            ELSE n_dropped * 1000000 // n_in END AS BIGINT) AS drop_ppm
FROM cum
ORDER BY stage_idx
"""


def q_hashing_vectorizer(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hashing_vectorizer(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


_ORACLE_VECTORIZER = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
bucketed AS (
    SELECT doc_id,
           CAST(CAST('0x' || substr(md5(token), 1, 13) AS BIGINT) % 32 AS INT) AS b
    FROM tok
),
counts AS (
    SELECT doc_id, b, COUNT(*) AS c FROM bucketed GROUP BY doc_id, b
),
maps AS (
    SELECT doc_id, MAP(array_agg(b), array_agg(c)) AS m
    FROM counts GROUP BY doc_id
),
vecs AS (
    SELECT doc_id,
           [COALESCE(map_extract(m, CAST(i AS INT))[1], 0)
            FOR i IN generate_series(0, 31)] AS vec
    FROM maps
)
SELECT doc_id,
       md5(array_to_string(vec, ',')) AS vec_checksum,
       vec[1] AS v0,
       vec[32] AS v31,
       ROUND(sqrt(list_sum(list_transform(vec, x -> CAST(x*x AS DOUBLE)))), 6)
           AS l2_norm
FROM vecs
ORDER BY doc_id
"""


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = dataset_split(load_table(spark, sf_dir, "documents"))
    return (
        d.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .orderBy("split")
    )


_ORACLE_SPLIT = """
WITH f AS (
    SELECT doc_id,
           CAST('0x' || substr(md5('split-seed-1' || '|' || CAST(doc_id AS VARCHAR)),
                               1, 13) AS BIGINT) / POWER(16, 13) AS frac
    FROM documents
),
s AS (
    SELECT doc_id,
           CASE WHEN frac < 0.1 THEN 'val'
                WHEN frac < 0.2 THEN 'test'
                ELSE 'train' END AS split
    FROM f
)
SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS first_doc
FROM s GROUP BY split ORDER BY split
"""


def q_vocabulary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocabulary(load_table(spark, sf_dir, "documents"))


_ORACLE_VOCAB = """
WITH tok AS (
    SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
)
SELECT token,
       COUNT(DISTINCT doc_id) AS doc_freq,
       COUNT(*) AS occurrences
FROM tok
GROUP BY token
ORDER BY doc_freq DESC, token
LIMIT 100
"""


def bpe_merge_pairs(
    docs: DataFrame, top_n: int = 50, text_col: str = "text"
) -> DataFrame:
    """First BPE tokenizer-training iteration: count adjacent character
    pairs across the corpus, weighted by word frequency — the pair with
    the highest count is the first merge a byte-pair-encoding tokenizer
    would learn. Running this repeatedly (re-tokenizing after each merge)
    is exactly BPE training; one iteration is the expensive distributed
    part, and is fully expressible as two aggregations.

    Scale: the corpus collapses to its word-frequency table first (one
    shuffle on word — vocabulary-sized, not corpus-sized), so the char-pair
    explode runs over distinct words only; the final pair count is a
    second vocabulary-sized aggregation. No Python, all codegen.

    Words shorter than 2 chars are filtered BEFORE building the pair index
    (playbook #21: Spark's sequence(1, n) descends when n < 1)."""
    w = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .where(F.length("w") >= 2)
    )
    pairs = w.select(
        "wf",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wf").alias("n_merge"))
        .orderBy(F.desc("n_merge"), "pair")
        .limit(top_n)
    )


# --- character entropy --------------------------------------------------------
ENTROPY_SCALE = 1_000_000


def char_entropy(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc character-level Shannon entropy (nats) — the
    compressibility proxy quality filters use: machine-generated or
    repetitive junk sits far below natural text. Each character class's
    contribution −p·ln(p) is floor-scaled to an e6 integer BEFORE the
    per-doc sum (transcendental ulp discipline), so the score is an
    exact integer in any engine.

    Scale: one explode + one (doc_id, char) aggregation — the per-doc
    key bounds every group; map-side partials absorb the fan-out.
    """
    docs = widen_if_narrow(docs)
    cc = (
        docs.select(
            "doc_id", F.explode(F.split(F.lower(F.col(text_col)), "")).alias("ch")
        )
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("n_c"))
    )
    tot = cc.groupBy("doc_id").agg(F.sum("n_c").alias("n"))
    p = F.col("n_c") / F.col("n")
    contrib = F.floor(-p * F.log(p) * ENTROPY_SCALE).cast("long")
    return (
        cc.join(tot, "doc_id")
        .select("doc_id", "n", contrib.alias("h_e6"))
        .groupBy("doc_id")
        .agg(
            F.max("n").cast("long").alias("n_chars"),
            F.sum("h_e6").alias("entropy_e6"),
            F.count(F.lit(1)).alias("n_distinct_chars"),
        )
        .orderBy("doc_id")
    )


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    return char_entropy(load_table(spark, sf_dir, "documents"))


_ORACLE_ENTROPY = f"""
WITH cc AS (
    SELECT doc_id, ch, COUNT(*) AS n_c FROM (
        SELECT doc_id, unnest(string_split(lower(text), '')) AS ch FROM documents
    ) GROUP BY doc_id, ch
),
tot AS (SELECT doc_id, CAST(SUM(n_c) AS BIGINT) AS n FROM cc GROUP BY doc_id)
SELECT c.doc_id, MAX(t.n) AS n_chars,
       CAST(SUM(CAST(FLOOR(-(n_c / CAST(n AS DOUBLE))
                           * ln(n_c / CAST(n AS DOUBLE)) * {ENTROPY_SCALE})
                     AS BIGINT)) AS BIGINT) AS entropy_e6,
       COUNT(*) AS n_distinct_chars
FROM cc c JOIN tot t ON t.doc_id = c.doc_id
GROUP BY c.doc_id
ORDER BY c.doc_id
"""


# --- deterministic augmentation ----------------------------------------------
DROPOUT_PPM = 150_000  # drop ~15% of tokens


def word_dropout(
    docs: DataFrame,
    seed: str = "aug-seed-1",
    drop_ppm: int = DROPOUT_PPM,
    text_col: str = "text",
) -> DataFrame:
    """Deterministic token-dropout augmentation: token i of doc d drops
    iff md5(seed|d|i) falls below the drop threshold — the augmentation a
    robustness-training pass applies, made reproducible (same seed →
    byte-identical corpus on any engine/cluster/run; new seed → fresh
    draw). Emits the kept-token fingerprint, not the text, so the audit
    row stays narrow.

    Scale: map-only (per-row array ops); no shuffle until the final sort.
    """
    t = tokens(F.col(text_col))
    n = F.size(t)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    frac = lambda i: F.conv(  # noqa: E731
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(seed), F.col("doc_id").cast("string"), i.cast("string")
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("double") / F.lit(float(16**13))
    kept_idx = F.filter(idx, lambda i: frac(i) >= drop_ppm / 1_000_000)
    kept = F.transform(kept_idx, lambda i: F.element_at(t, i))
    staged = widen_if_narrow(docs).select(
        "doc_id", n.alias("n_tokens"), kept.alias("kept")
    )
    return staged.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.size("kept").cast("long").alias("n_kept"),
        F.md5(F.array_join(F.col("kept"), " ")).alias("aug_fingerprint"),
    ).orderBy("doc_id")


def q_word_dropout(spark: SparkSession, sf_dir: str) -> DataFrame:
    return word_dropout(load_table(spark, sf_dir, "documents"))


_ORACLE_DROPOUT = f"""
WITH t AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
k AS (
    SELECT doc_id, len(toks) AS n_tokens,
           [toks[i] FOR i IN generate_series(1, len(toks))
            IF CAST('0x' || substr(md5('aug-seed-1' || '|' || CAST(doc_id AS VARCHAR)
                                       || '|' || CAST(i AS VARCHAR)), 1, 13) AS BIGINT)
               / POWER(16, 13) >= {DROPOUT_PPM / 1_000_000}] AS kept
    FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(len(kept) AS BIGINT) AS n_kept,
       md5(array_to_string(kept, ' ')) AS aug_fingerprint
FROM k ORDER BY doc_id
"""


BPE_TRAIN_ITERS = 3


def bpe_train(
    docs: DataFrame, n_iters: int = BPE_TRAIN_ITERS, text_col: str = "text"
) -> DataFrame:
    """Full distributed BPE training loop, ``n_iters`` merges: count
    adjacent token pairs over the word-frequency table, adopt the most
    frequent pair as a merge, RE-SEGMENT every word, and repeat —
    the Sennrich et al. (2016) trainer, where ``bpe_merge_pairs`` is a
    single iteration. Output: one row per learned merge (rank, the
    bracketed pair, corpus count at adoption time).

    Segmentations are encoded as bracketed strings — "low" →
    "(l)(o)(w)" — so applying a merge is a plain string replace:
    the pattern "(a)(b)" starts with '(' and ends with ')', so matches
    can never overlap or share characters, which makes the replace
    order-independent (identical in any engine) AND exactly the greedy
    left-to-right merge: back-to-back pairs "(x)(y)(x)(y)" collapse to
    "(xy)(xy)" in one pass, and "(a)(a)(a)" → "(aa)(a)" like real BPE.

    Scale: the corpus shuffles ONCE (word count); every iteration after
    that runs on the vocabulary-sized word table (the reason production
    BPE trainers keep a word-freq table, not the raw corpus). Each
    iteration: one vocabulary-sized pair aggregation + a top-1
    (TakeOrdered, no full sort materialization) + a broadcast of the
    1-row merge. Per-iteration localCheckpoint truncates lineage
    (playbook: cache() misses on these plans).

    Words are restricted to ^[a-z0-9]{2,}$ (standard pre-tokenization;
    also guarantees '(' / ')' never occur inside a token).
    """
    merges, _ = _bpe_loop(docs, n_iters, text_col)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out.orderBy("merge_rank")


def _bpe_loop(docs: DataFrame, n_iters: int, text_col: str):
    """Shared BPE trainer loop: returns ([per-merge 1-row frames], the
    word table AFTER all merges are applied)."""
    w = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .where(F.col("w").rlike("^[a-z0-9]{2,}$"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wf"))
        .select(
            F.expr("concat('(', array_join(split(w, ''), ')('), ')')").alias("s"),
            "wf",
        )
        .localCheckpoint()
    )
    merges = []
    for rank in range(1, n_iters + 1):
        pair_counts = (
            w.select("wf", F.expr(r"split(substring(s, 2, length(s) - 2), '\\)\\(')").alias("t"))
            .where(F.size("t") >= 2)  # fully-merged words: sequence(1,0) trap
            .select(
                "wf",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(t) - 1),"
                        " j -> concat('(', element_at(t, j), ')(',"
                        " element_at(t, j + 1), ')'))"
                    )
                ).alias("pair"),
            )
            .groupBy("pair")
            .agg(F.sum("wf").alias("n_merge"))
        )
        best = (
            pair_counts.orderBy(F.desc("n_merge"), F.asc("pair"))
            .limit(1)
            .localCheckpoint()
        )
        merges.append(
            best.select(
                F.lit(rank).alias("merge_rank"), F.col("pair"), F.col("n_merge")
            )
        )
        w = (
            w.crossJoin(F.broadcast(best.select(F.col("pair").alias("bp"))))
            .select(
                F.expr("replace(s, bp, replace(bp, ')(', ''))").alias("s"),
                "wf",
            )
            .localCheckpoint()
        )
    return merges, w


BPE_ENCODE_TOP = 50


def bpe_encode(
    docs: DataFrame,
    n_iters: int = BPE_TRAIN_ITERS,
    top_n: int = BPE_ENCODE_TOP,
    text_col: str = "text",
) -> DataFrame:
    """Tokenizer INFERENCE with the merges ``bpe_train`` learns: apply
    all merges to the word table and count the resulting pieces over the
    corpus (occurrences weighted by word frequency) — the piece-frequency
    table a tokenizer build step publishes. Multi-char pieces in the
    output are exactly the learned merges reaching the corpus.

    Scale: identical to the trainer (corpus shuffles once into the word
    table; everything else is vocabulary-sized); the final piece count is
    one more vocabulary-sized aggregation.
    """
    _, w = _bpe_loop(docs, n_iters, text_col)
    return (
        w.select(
            "wf",
            F.explode(
                F.expr(r"split(substring(s, 2, length(s) - 2), '\\)\\(')")
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("wf").alias("n_occ"))
        .orderBy(F.desc("n_occ"), F.asc("piece"))
        .limit(top_n)
    )


def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_encode(load_table(spark, sf_dir, "documents"))


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_train(load_table(spark, sf_dir, "documents"))


def _bpe_oracle(n_iters: int = BPE_TRAIN_ITERS, mode: str = "train") -> str:
    ctes = [
        """w1 AS (
    SELECT concat('(', array_to_string(string_split(w, ''), ')('), ')') AS s, wf
    FROM (
        SELECT w, COUNT(*) AS wf
        FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
        WHERE regexp_matches(w, '^[a-z0-9]{2,}$')
        GROUP BY w
    )
)"""
    ]
    for i in range(1, n_iters + 1):
        ctes.append(
            f"""p{i} AS (
    SELECT pair, SUM(wf) AS n_merge FROM (
        SELECT wf,
               unnest(['(' || t[j] || ')(' || t[j+1] || ')'
                       FOR j IN generate_series(1, len(t) - 1)]) AS pair
        FROM (SELECT string_split(substr(s, 2, length(s) - 2), ')(') AS t, wf
              FROM w{i})
        WHERE len(t) >= 2
    ) GROUP BY pair
),
b{i} AS (SELECT pair, n_merge FROM p{i} ORDER BY n_merge DESC, pair LIMIT 1)"""
        )
        if i < n_iters or mode == "encode":
            ctes.append(
                f"""w{i+1} AS (
    SELECT replace(s, (SELECT pair FROM b{i}),
                   replace((SELECT pair FROM b{i}), ')(', '')) AS s, wf
    FROM w{i}
)"""
            )
    if mode == "encode":
        final = f"""SELECT piece, CAST(SUM(wf) AS BIGINT) AS n_occ FROM (
    SELECT wf, unnest(string_split(substr(s, 2, length(s) - 2), ')(')) AS piece
    FROM w{n_iters + 1}
) GROUP BY piece ORDER BY n_occ DESC, piece LIMIT {BPE_ENCODE_TOP}"""
        return "WITH " + ",\n".join(ctes) + "\n" + final
    selects = "\nUNION ALL ".join(
        f"SELECT {i} AS merge_rank, pair, CAST(n_merge AS BIGINT) AS n_merge FROM b{i}"
        for i in range(1, n_iters + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects + "\nORDER BY merge_rank"


_ORACLE_BPE_TRAIN = _bpe_oracle()
_ORACLE_BPE_ENCODE = _bpe_oracle(mode="encode")


def vocab_coverage(
    docs: DataFrame,
    sizes: tuple[int, ...] = (100, 500, 2000),
    text_col: str = "text",
) -> DataFrame:
    """Token-occurrence coverage of a top-V vocabulary — the curve a
    tokenizer/vocab designer reads to pick V (what share of the corpus
    stream is covered by the V most frequent tokens; the remainder becomes
    <unk> or byte-fallback).

    Scale: the corpus reduces to its token-frequency table (one shuffle,
    map-side partial agg), and the ranking touches only the top
    ``max(sizes)`` tokens via orderBy+limit — Spark's
    TakeOrderedAndProject does per-partition partial top-K and merges K
    rows, so NO vocabulary-wide single-partition sort exists in the plan
    (a web-scale vocab would serialize one there; the only remaining
    window runs over ≤ max(sizes) rows). Coverage is an exact integer
    ppm (BIGINT·1e6 DIV total) — engine/partitioning independent."""
    counts = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # reused by the top-K scan and the total
    )
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(max(sizes))
    ranked = top.withColumn("rnk", F.row_number().over(w))
    sizes_df = docs.sparkSession.createDataFrame(
        [(v,) for v in sizes], "vocab_size int"
    )
    covered = (
        ranked.crossJoin(F.broadcast(sizes_df))
        .where(F.col("rnk") <= F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(F.sum("n").alias("covered"))
    )
    total = counts.agg(F.sum("n").alias("total"))
    return (
        covered.crossJoin(total)
        .select(
            "vocab_size",
            "covered",
            "total",
            # two-stage ×1000 scaling: covered*1e6 would overflow BIGINT at
            # real corpus token counts (~2.5e13 at 100 TB); q*1000 +
            # (r*1000 DIV t) with (q, r) = divmod(covered*1000, t) is the
            # exact same quotient with every intermediate < 2^63
            F.expr(
                "CAST((covered * 1000 DIV total) * 1000"
                " + (covered * 1000 % total) * 1000 DIV total AS BIGINT)"
            ).alias("coverage_ppm"),
        )
        .orderBy("vocab_size")
    )


def q_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe_merge_pairs(load_table(spark, sf_dir, "documents"))


_ORACLE_BPE = """
WITH w AS (
    SELECT w, COUNT(*) AS wf FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents
    ) GROUP BY w HAVING length(w) >= 2
),
pairs AS (
    SELECT wf,
           unnest([substring(w, i, 2) FOR i IN generate_series(1, length(w) - 1)])
               AS pair
    FROM w
)
SELECT pair, CAST(SUM(wf) AS BIGINT) AS n_merge
FROM pairs
GROUP BY pair
ORDER BY n_merge DESC, pair
LIMIT 50
"""


def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_coverage(load_table(spark, sf_dir, "documents"))


_ORACLE_VOCAB_COVERAGE = """
WITH counts AS (
    SELECT token, COUNT(*) AS n FROM (
        SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
    ) GROUP BY token
),
ranked AS (
    SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rnk
    FROM counts
),
sizes AS (SELECT unnest([100, 500, 2000]) AS vocab_size),
covered AS (
    SELECT s.vocab_size, CAST(SUM(r.n) AS BIGINT) AS covered
    FROM ranked r JOIN sizes s ON r.rnk <= s.vocab_size
    GROUP BY s.vocab_size
),
total AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM counts)
SELECT c.vocab_size, c.covered, t.total,
       CAST((c.covered * 1000 // t.total) * 1000
            + (c.covered * 1000 % t.total) * 1000 // t.total AS BIGINT)
           AS coverage_ppm
FROM covered c, total t
ORDER BY c.vocab_size
"""


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Pre-tokenization text normalization: lowercase, strip control
    characters, collapse whitespace runs, and trim — the canonical first
    pass of every text pipeline, as pure column expressions (map-only, no
    shuffle; a Unicode NFC step slots in here via the same regexp chain
    when the corpus needs it).

    Output keeps before/after lengths and a content hash so downstream
    dedup keys can be compared pre/post normalization."""
    raw = F.col(text_col)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(raw), r"[\x00-\x1f]", " "), r"\s+", " "
        )
    )
    return widen_if_narrow(df).select(
        "doc_id",
        F.length(raw).alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.md5(norm).alias("norm_md5"),
        (F.md5(norm) == F.md5(raw)).alias("unchanged"),
    )


def q_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    return normalize_text(load_table(spark, sf_dir, "documents")).orderBy("doc_id")


_ORACLE_NORMALIZE = r"""
WITH n AS (
    SELECT doc_id, text,
           trim(regexp_replace(
               regexp_replace(lower(text), '[\x00-\x1f]', ' ', 'g'),
               '\s+', ' ', 'g')) AS norm
    FROM documents
)
SELECT doc_id,
       CAST(len(text) AS INT) AS n_chars_raw,
       CAST(len(norm) AS INT) AS n_chars_norm,
       md5(norm) AS norm_md5,
       md5(norm) = md5(text) AS unchanged
FROM n
ORDER BY doc_id
"""


WSAMPLE_K = 50
WSAMPLE_SCALE = 1_000_000_000


def weighted_sample(
    docs: DataFrame,
    weight_col,
    k: int = WSAMPLE_K,
    seed: str = "wsample-seed-1",
) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis): each
    row draws u = md5-fraction and keeps key = ln(u)/w; the top-k keys
    ARE a weight-proportional sample — one map pass + a top-k, no
    per-row state, deterministic and reproducible across engines/runs.
    This is how a quality-weighted training-data subsample is drawn at
    100 TB (weight = quality score, length, dedup count…).

    The key is floor-scaled to an integer BEFORE ranking (ln() ulp
    discipline), ties broken by doc_id; top-k via TakeOrderedAndProject,
    never a full sort."""
    w = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.col("doc_id").cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("double") / F.lit(float(16**13))
    key_scaled = F.floor(F.log(u) / w * WSAMPLE_SCALE).cast("long")
    return (
        docs.select("doc_id", w.cast("long").alias("weight"), key_scaled.alias("es_key_e9"))
        .orderBy(F.desc("es_key_e9"), "doc_id")
        .limit(k)
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return weighted_sample(load_table(spark, sf_dir, "documents"), "n_chars")


_ORACLE_WSAMPLE = f"""
WITH keyed AS (
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           CAST(FLOOR(
               ln(CAST('0x' || substr(md5('wsample-seed-1' || '|'
                       || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
                  / POWER(16, 13))
               / n_chars * {WSAMPLE_SCALE}) AS BIGINT) AS es_key_e9
    FROM documents
)
SELECT doc_id, weight, es_key_e9
FROM keyed
ORDER BY es_key_e9 DESC, doc_id
LIMIT {WSAMPLE_K}
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic corpus carries no organic PII, so the query enriches
    each doc with deterministic contact strings derived from (source,
    doc_id) — same expression on both engines — then runs the generic
    scrubber over the enriched text. What's verified: the regex automata
    agree cross-engine, counts land per category, and the redacted text
    (hashed) is identical."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact "),
            F.col("source"),
            F.lit(".user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com phone 555-"),
            F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 64).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 32).cast("string"),
        ).alias("text"),
    )
    return pii_redact(enriched).orderBy("doc_id")


_ORACLE_PII = r"""
WITH enriched AS (
    SELECT doc_id,
           text || ' contact ' || source || '.user' || CAST(doc_id AS VARCHAR)
                || '@example.com phone 555-'
                || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST(doc_id % 64 AS VARCHAR)
                || '.' || CAST(doc_id % 32 AS VARCHAR) AS text
    FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text,
            '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text,
            '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phones,
       CAST(len(regexp_extract_all(text,
            '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS INT) AS n_ips,
       md5(regexp_replace(
           regexp_replace(
               regexp_replace(text,
                   '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
               '\b\d{3}-\d{3}-\d{4}\b', '<PHONE>', 'g'),
           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g')) AS redacted_md5
FROM enriched
ORDER BY doc_id
"""


def q_length_bucket_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_bucket_sample(load_table(spark, sf_dir, "documents"))


_ORACLE_LENBUCKET = """
WITH t AS (
    SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tok FROM documents
),
b AS (
    SELECT doc_id,
           CASE WHEN n_tok < 32 THEN 'len_lt_32'
                WHEN n_tok < 64 THEN 'len_32_63'
                WHEN n_tok < 96 THEN 'len_64_95'
                ELSE 'len_ge_96' END AS bucket,
           CASE WHEN n_tok < 32 THEN 1.0
                WHEN n_tok < 64 THEN 0.5
                WHEN n_tok < 96 THEN 0.25
                ELSE 0.125 END AS rate,
           CAST('0x' || substr(md5('lenbucket-seed-1' || '|'
                || CAST(doc_id AS VARCHAR)), 1, 13) AS BIGINT)
               / POWER(16, 13) AS frac
    FROM t
)
SELECT bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN frac < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       MIN(CASE WHEN frac < rate THEN doc_id END) AS first_kept
FROM b
GROUP BY bucket
ORDER BY bucket
"""


# --- entity-disjoint group k-fold --------------------------------------------
KFOLD_K = 5
KFOLD_SEED = "fold-seed-1"


def group_kfold(docs: DataFrame, k: int = KFOLD_K, seed: str = KFOLD_SEED) -> DataFrame:
    """Entity-disjoint k-fold assignment: the fold is a content-stable
    hash of the SOURCE (md5(seed|source) mod k), so every document of a
    domain lands in the same fold — the grouped cross-validation protocol
    that stops near-duplicate pages from one site straddling train and
    eval (the row-level ``dataset_split`` cannot guarantee this). Same
    seed → identical assignment on any engine/run; a new seed redraws.

    Emits the per-fold census (docs, sources, chars); disjointness is
    structural (fold is a function of source), pinned in pytest.

    Scale: map-only fold tagging + one partial-agg rollup keyed by fold.
    """
    # coalesce NULL sources explicitly: Spark's concat_ws silently DROPS
    # null args while SQL || propagates null — without this the two
    # engines would fold null-source docs differently
    fold = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.lit(seed), F.coalesce(F.col("source"), F.lit(""))
                    )
                ),
                1,
                13,
            ),
            16,
            10,
        ).cast("long")
        % k
    )
    return (
        docs.select(fold.alias("fold"), "source", "n_chars")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum("n_chars").alias("n_chars"),
        )
        .select(
            F.col("fold").cast("int").alias("fold"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_sources").cast("long").alias("n_sources"),
            F.col("n_chars").cast("long").alias("n_chars"),
        )
        .orderBy("fold")
    )


def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    return group_kfold(load_table(spark, sf_dir, "documents"))


_ORACLE_KFOLD = f"""
SELECT CAST(CAST('0x' || substr(md5('{KFOLD_SEED}' || '|'
                                || COALESCE(source, '')), 1, 13)
            AS BIGINT) % {KFOLD_K} AS INT) AS fold,
       COUNT(*) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents
GROUP BY fold
ORDER BY fold
"""


# --- language-ID confusion matrix --------------------------------------------


def langid_confusion(docs: DataFrame) -> DataFrame:
    """Evaluation of the n-gram language-ID heuristic against the
    corpus's own ``lang`` metadata: the (true, predicted) confusion
    census with per-true-language recall in integer ppm — the accuracy
    readout that decides whether the cheap classifier is good enough to
    gate the expensive one.

    Scale: the classifier itself is map-only (marker-token scoring);
    the confusion matrix is a |langs|² rollup.
    """
    pred = language_id(docs)
    tot = pred.groupBy("lang_meta").agg(F.count(F.lit(1)).alias("n_true"))
    cells = pred.groupBy("lang_meta", "lang_pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        cells.join(tot, "lang_meta")
        .select(
            "lang_meta",
            "lang_pred",
            F.col("n").cast("long").alias("n"),
            F.expr("n * 1000000 DIV n_true").cast("long").alias("recall_ppm"),
        )
        .orderBy("lang_meta", "lang_pred")
    )


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    return langid_confusion(load_table(spark, sf_dir, "documents"))


# reuse the language-ID oracle verbatim as the base CTE (drop its final
# ORDER BY) so the confusion matrix is checked against the same
# prediction logic
def _confusion_oracle() -> str:
    base = _ORACLE_LANG_ID.rsplit("ORDER BY", 1)[0]
    return f"""
WITH base AS ({base}),
tot AS (SELECT lang_meta, CAST(COUNT(*) AS BIGINT) AS n_true
        FROM base GROUP BY lang_meta),
cells AS (SELECT lang_meta, lang_pred, CAST(COUNT(*) AS BIGINT) AS n
          FROM base GROUP BY lang_meta, lang_pred)
SELECT c.lang_meta, c.lang_pred, c.n,
       CAST(c.n * 1000000 // t.n_true AS BIGINT) AS recall_ppm
FROM cells c JOIN tot t ON t.lang_meta = c.lang_meta
ORDER BY c.lang_meta, c.lang_pred
"""


# --- PMI collocations ---------------------------------------------------------
COLLOC_MIN_COUNT = 10
COLLOC_TOP = 40
COLLOC_SCALE = 10_000


def collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = COLLOC_MIN_COUNT,
    top_n: int = COLLOC_TOP,
) -> DataFrame:
    """PMI-ranked adjacent-token collocations: bigrams whose observed
    frequency most exceeds the independence expectation
    p(ab)/(p(a)·p(b)) — the phrase-mining pass (new york, machine
    learning) that feeds tokenizer merge hints and stop-phrase lists.

    Ranking is by the association LIFT itself (monotone with PMI — no
    ln needed), computed as ((c_ab/c_a)·(N_uni/c_b))·(N_uni/N_big): three
    correctly-rounded double quotients/products in a FIXED association
    order, written identically in both engines (the integer numerator
    c_ab·N_uni² would overflow BIGINT at corpus scale — same reasoning as
    corpus.mutual_information). Floor-scaled e4 for display/tie-breaks;
    ties resolve on the bigram text.

    Scale: two vocabulary-sized aggregations (unigrams, bigrams) off one
    token stream; the unigram join uses join_small (playbook #22:
    broadcast only below a proven row count). min_count bounds the
    ranked set before the joins.
    """
    docs = widen_if_narrow(docs)
    toks_col = tokens(F.col(text_col))
    uni = (
        docs.select(F.explode(toks_col).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()
    )
    big0 = (
        docs.select(F.explode(shingles(toks_col, 2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint()
    )
    n_uni = uni.agg(F.sum("c").alias("n_uni"))
    n_big = big0.agg(F.sum("c_ab").alias("n_big"))
    big = big0.where(F.col("c_ab") >= min_count).withColumn(
        "wa", F.element_at(F.split(F.col("bigram"), " "), 1)
    ).withColumn("wb", F.element_at(F.split(F.col("bigram"), " "), 2))
    ca = uni.select(F.col("w").alias("wa"), F.col("c").alias("c_a"))
    cb = uni.select(F.col("w").alias("wb"), F.col("c").alias("c_b"))
    j = (
        join_small(join_small(big, ca, "wa"), cb, "wb")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_big))
    )
    ratio = (
        (F.col("c_ab") / F.col("c_a")) * (F.col("n_uni") / F.col("c_b"))
    ) * (F.col("n_uni") / F.col("n_big"))
    return (
        j.select(
            "bigram",
            F.col("c_ab").cast("long").alias("c_ab"),
            F.col("c_a").cast("long").alias("c_a"),
            F.col("c_b").cast("long").alias("c_b"),
            F.floor(ratio * COLLOC_SCALE).cast("long").alias("lift_e4"),
        )
        .orderBy(F.desc("lift_e4"), "bigram")
        .limit(top_n)
    )


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    return collocations(load_table(spark, sf_dir, "documents"))


_ORACLE_COLLOC = f"""
WITH t AS (
    SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
),
uni AS (
    SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(toks) AS w FROM t
    ) GROUP BY w
),
big0 AS (
    SELECT bigram, COUNT(*) AS c_ab FROM (
        SELECT unnest([array_to_string(toks[i:i+1], ' ')
                       FOR i IN generate_series(1, len(toks) - 1)]) AS bigram
        FROM t
    ) GROUP BY bigram
),
n_u AS (SELECT SUM(c) AS n_uni FROM uni),
n_b AS (SELECT SUM(c_ab) AS n_big FROM big0),
big AS (
    SELECT bigram, c_ab,
           string_split(bigram, ' ')[1] AS wa,
           string_split(bigram, ' ')[2] AS wb
    FROM big0 WHERE c_ab >= {COLLOC_MIN_COUNT}
)
SELECT b.bigram, CAST(b.c_ab AS BIGINT) AS c_ab,
       CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
       CAST(FLOOR(((CAST(b.c_ab AS DOUBLE) / ca.c)
                   * (CAST(n_uni AS DOUBLE) / cb.c))
                  * (CAST(n_uni AS DOUBLE) / n_big)
                  * {COLLOC_SCALE}) AS BIGINT) AS lift_e4
FROM big b
JOIN uni ca ON ca.w = b.wa
JOIN uni cb ON cb.w = b.wb, n_u, n_b
ORDER BY lift_e4 DESC, bigram
LIMIT {COLLOC_TOP}
"""


# --- exact stratified split --------------------------------------------------

STRAT_SEED = "strat-split-1"
STRAT_CUM_PCT = (80, 90)  # cumulative train/val boundaries; test = remainder


def q_stratified_split_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified train/val/test split with EXACT per-stratum quotas —
    the complement to ``dataset_split``'s probabilistic hash threshold
    (which only hits 80/10/10 in expectation; a small stratum can land
    all-train). Docs are ordered inside each (lang, source) stratum by a
    content-stable seeded hash and cut at the cumulative-floor
    boundaries: rank r goes to train iff 100·r ≤ 80·n, to val iff
    100·r ≤ 90·n — cross-multiplied, division-free, and the bucket sizes
    are each within 1 of exact proportion while summing to n exactly.

    Scale: the within-stratum rank is TWO-PHASE — a (stratum, 2-hex-char
    hash prefix) count rollup (bounded: 256·|strata| rows) provides
    cumulative offsets via a window over that rollup, and the data-side
    row_number runs inside (stratum, prefix) partitions, 256× finer than
    a naive per-stratum window. A hot stratum (one web-crawl source can
    be half a 100 TB corpus) therefore never serializes through one
    task — the playbook-#27 fix applied to stratified sampling. Rank
    equivalence to the naive window is exact because prefix-major order
    IS hash order (the prefix is the hash's own head)."""
    docs = load_table(spark, sf_dir, "documents")
    h = F.md5(
        F.concat_ws("|", F.lit(STRAT_SEED), F.col("doc_id").cast("string"))
    )
    base = docs.select("doc_id", "lang", "source", h.alias("h")).withColumn(
        "bkt", F.substring("h", 1, 2)
    )
    bcounts = base.groupBy("lang", "source", "bkt").agg(
        F.count(F.lit(1)).alias("c")
    )
    w_cum = (
        Window.partitionBy("lang", "source")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_tot = Window.partitionBy("lang", "source")
    offsets = (
        bcounts.withColumn(
            "off", F.coalesce(F.sum("c").over(w_cum), F.lit(0))
        )
        .withColumn("n", F.sum("c").over(w_tot))
        # bounded at 256·|strata| rows by construction; materialized so
        # join_small's broadcast-guard count() is a tiny-table job, not a
        # second corpus scan
        .localCheckpoint()
    )
    ranked = join_small(base, offsets.drop("c"), ["lang", "source", "bkt"])
    w_in = Window.partitionBy("lang", "source", "bkt").orderBy("h", "doc_id")
    r = (F.col("off") + F.row_number().over(w_in)).alias("r")
    lo, hi = STRAT_CUM_PCT
    split = (
        F.when(F.col("r") * 100 <= F.col("n") * lo, F.lit("train"))
        .when(F.col("r") * 100 <= F.col("n") * hi, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ranked.withColumn("r", r)
        .select("lang", "source", split.alias("split"))
        .groupBy("lang", "source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "source", "split")
    )


_ORACLE_STRAT_SPLIT = f"""
WITH ranked AS (
    SELECT lang, source,
           ROW_NUMBER() OVER (
               PARTITION BY lang, source
               ORDER BY md5('{STRAT_SEED}' || '|' || CAST(doc_id AS VARCHAR)),
                        doc_id
           ) AS r,
           COUNT(*) OVER (PARTITION BY lang, source) AS n
    FROM documents
),
labeled AS (
    SELECT lang, source,
           CASE WHEN r * 100 <= n * {STRAT_CUM_PCT[0]} THEN 'train'
                WHEN r * 100 <= n * {STRAT_CUM_PCT[1]} THEN 'val'
                ELSE 'test' END AS split
    FROM ranked
)
SELECT lang, source, split, COUNT(*) AS n_docs
FROM labeled GROUP BY lang, source, split
ORDER BY lang, source, split
"""


QUERIES = {
    "stratified_split_exact": q_stratified_split_exact,
    "text_hashing_vectorizer": q_hashing_vectorizer,
    "text_dataset_split": q_dataset_split,
    "text_vocabulary": q_vocabulary,
    "text_corpus_filter": q_corpus_filter,
    "text_token_stats": q_token_stats,
    "text_quality_scores": q_quality_scores,
    "text_language_id": q_language_id,
    "text_fingerprints": q_fingerprints,
    "text_pii_redact": q_pii_redact,
    "weighted_sample": q_weighted_sample,
    "text_normalize": q_normalize_text,
    "length_bucket_sample": q_length_bucket_sample,
    "text_bpe_merge_pairs": q_bpe_merge_pairs,
    "text_bpe_train": q_bpe_train,
    "text_bpe_encode": q_bpe_encode,
    "text_word_dropout": q_word_dropout,
    "text_char_entropy": q_char_entropy,
    "text_vocab_coverage": q_vocab_coverage,
    "curation_funnel": q_curation_funnel,
    "tokenizer_fertility": q_tokenizer_fertility,
    "text_collocations": q_collocations,
    "group_kfold": q_group_kfold,
    "langid_confusion": q_langid_confusion,
}

ORACLES = {
    "stratified_split_exact": _ORACLE_STRAT_SPLIT,
    "langid_confusion": _confusion_oracle(),
    "group_kfold": _ORACLE_KFOLD,
    "text_collocations": _ORACLE_COLLOC,
    "text_pii_redact": _ORACLE_PII,
    "weighted_sample": _ORACLE_WSAMPLE,
    "text_normalize": _ORACLE_NORMALIZE,
    "length_bucket_sample": _ORACLE_LENBUCKET,
    "text_hashing_vectorizer": _ORACLE_VECTORIZER,
    "text_dataset_split": _ORACLE_SPLIT,
    "text_vocabulary": _ORACLE_VOCAB,
    "text_corpus_filter": _ORACLE_CORPUS_FILTER,
    "text_token_stats": _ORACLE_TOKEN_STATS,
    "text_quality_scores": _ORACLE_QUALITY,
    "text_language_id": _ORACLE_LANG_ID,
    "text_fingerprints": _ORACLE_FINGERPRINTS,
    "text_bpe_merge_pairs": _ORACLE_BPE,
    "text_bpe_train": _ORACLE_BPE_TRAIN,
    "text_bpe_encode": _ORACLE_BPE_ENCODE,
    "text_word_dropout": _ORACLE_DROPOUT,
    "text_char_entropy": _ORACLE_ENTROPY,
    "text_vocab_coverage": _ORACLE_VOCAB_COVERAGE,
    "curation_funnel": _ORACLE_FUNNEL,
    "tokenizer_fertility": _ORACLE_FERTILITY,
}
