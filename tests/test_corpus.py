"""Corpus-curation operator semantics: decontamination overlap counting,
repetition gate boundaries, TF-IDF ranking invariants."""

from __future__ import annotations

from pyspark.sql import Row

from admob_data_pipeline_spark.operators import corpus


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="t", n_chars=len(t)) for i, t in enumerate(texts)]
    )


def test_decontaminate_flags_exact_and_partial_overlap(spark):
    bench = _docs(spark, ["alpha beta gamma delta"])
    train = spark.createDataFrame(
        [
            Row(doc_id=10, text="alpha beta gamma delta"),      # full copy
            Row(doc_id=11, text="x y alpha beta gamma z"),      # one shared 3-gram
            Row(doc_id=12, text="p q r s t u"),                 # clean
        ]
    )
    out = {r.doc_id: r for r in corpus.decontaminate(train, bench).collect()}
    # full copy shares both distinct 3-grams of the benchmark doc
    assert out[10].contaminated and out[10].n_shared_ngrams == 2
    assert out[11].contaminated and out[11].n_shared_ngrams == 1
    assert not out[12].contaminated and out[12].n_shared_ngrams == 0


def test_repetition_gate_boundaries(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="a b a b a"),   # 2-grams: ab ba ab ba → dup 0.5
            Row(doc_id=1, text="a b c d e"),   # all distinct → dup 0.0
            Row(doc_id=2, text="a"),           # no grams → keep by default
        ]
    )
    out = {r.doc_id: r for r in corpus.repetition_scores(docs).collect()}
    assert out[0].dup_frac == 0.5 and not out[0].keep
    assert out[1].dup_frac == 0.0 and out[1].keep
    assert out[2].n_ngrams == 0 and out[2].keep


def test_tfidf_ubiquitous_token_scores_zero(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="common rare0 rare0 rare0"),
            Row(doc_id=1, text="common rare1"),
            Row(doc_id=2, text="common other"),
        ]
    )
    out = corpus.tfidf_top_terms(docs, top=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # df('common') == N → ln(1) = 0 → can never beat a doc-specific term
    assert by_doc[0][0].token == "rare0" and by_doc[0][0].score_scaled > 0
    for rows in by_doc.values():
        assert [r.rnk for r in rows] == sorted(r.rnk for r in rows)
        for r in rows:
            if r.token == "common":
                assert r.score_scaled == 0


def test_corpus_invariants_on_random_docs(spark):
    """Structural invariants over a batch of pseudo-random docs (one Spark
    job, not per-example roundtrips): n-gram counts, dup_frac bounds,
    self-decontamination totality, stratified-sample monotonicity."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(12)]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 40)))
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en") for i, t in enumerate(texts)]
    )

    rep = {r.doc_id: r for r in corpus.repetition_scores(docs).collect()}
    for i, t in enumerate(texts):
        n_tok = len(t.split(" ")) if t else 1  # split('') → ['']
        assert rep[i].n_ngrams == max(0, n_tok - corpus.REPEAT_N + 1)
        if rep[i].n_ngrams:
            assert 0.0 <= rep[i].dup_frac <= 1.0
            assert rep[i].n_distinct <= rep[i].n_ngrams

    # every doc with >= n tokens shares all its grams with itself
    decon = corpus.decontaminate(docs, docs)
    for r in decon.collect():
        n_tok = len(texts[r.doc_id].split(" ")) if texts[r.doc_id] else 1
        if n_tok >= corpus.DECONTAM_N:
            assert r.contaminated, r

    # a higher rate can only grow the (deterministic) sample
    low = {r.doc_id for r in corpus.stratified_sample(docs, {"en": 0.3}).collect()}
    high = {r.doc_id for r in corpus.stratified_sample(docs, {"en": 0.8}).collect()}
    assert low <= high and len(high) > len(low)


def test_lm_score_rare_tokens_score_higher(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.corpus import lm_score

    # 9 docs of common tokens + 1 doc of singletons: the rare-token doc
    # must have the highest average NLL under the corpus-fit unigram LM.
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="the cat sat on the mat") for i in range(9)]
        + [Row(doc_id=9, text="zyx wvu tsr qpo nml kji")]
    )
    rows = {r.doc_id: r for r in lm_score(docs).collect()}
    common_avg = max(rows[i].avg_nll_e4 for i in range(9))
    assert rows[9].avg_nll_e4 > common_avg
    # exactness: sum of per-token ints equals n_tokens * per-token value
    # for the uniform-rare doc (all six tokens have count 1)
    assert rows[9].nll_sum_e4 % rows[9].n_tokens == 0


def test_join_small_flips_strategy_at_threshold(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.util import join_small

    big = spark.createDataFrame([Row(k=i % 10, x=i) for i in range(100)])
    small = spark.createDataFrame([Row(k=i, y=i * 2) for i in range(10)])

    under = join_small(big, small, "k", max_rows=1000)
    over = join_small(big, small, "k", max_rows=5)
    assert "BroadcastHashJoin" in under._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in over._jdf.queryExecution().executedPlan().toString()

    # strategy must not change results
    a = sorted(map(tuple, under.collect()))
    b = sorted(map(tuple, over.collect()))
    assert a == b and len(a) == 100


def test_bigram_lm_detects_scrambled_order(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.corpus import bigram_lm_score

    # same unigram distribution, different order: the scrambled doc must
    # score higher under the bigram LM (unigram LM cannot separate them)
    common = ["the cat sat on the mat"] * 8
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(common)]
        + [Row(doc_id=8, text="mat the on sat cat the")]
    )
    rows = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert rows[8].avg_nll_e4 > max(rows[i].avg_nll_e4 for i in range(8))
    # single-token docs are excluded by construction
    docs2 = spark.createDataFrame([Row(doc_id=0, text="one"), Row(doc_id=1, text="a b")])
    assert [r.doc_id for r in bigram_lm_score(docs2).collect()] == [1]


def test_mixture_weights_flattens_domains(spark):
    """√-temperature: a 100× bigger source gets only 10× the weight; shares
    sum to ≤ 1e6 ppm (floor rounding) and quotas to ≤ budget."""
    docs = spark.createDataFrame(
        [Row(doc_id=i, text="t", lang="en", source=("big" if i < 400 else "small"),
             n_chars=1) for i in range(404)]
    )
    rows = {r.source: r for r in corpus.mixture_weights(docs, budget=1000).collect()}
    assert rows["big"].n_docs == 400 and rows["small"].n_docs == 4
    # raw ratio 100×, sqrt ratio 10×
    assert rows["big"].weight_e6 == 10 * rows["small"].weight_e6
    assert sum(r.share_ppm for r in rows.values()) <= 1_000_000
    assert sum(r.quota_docs for r in rows.values()) <= 1000


def test_importance_weights_token_counts_and_smoothing(spark):
    d = spark.createDataFrame(
        [
            Row(doc_id=0, lang="en", text="a b c"),
            Row(doc_id=1, lang="de", text="x y"),
        ]
    )
    rows = {r.doc_id: r for r in corpus.importance_weights(d).collect()}
    assert rows[0].n_tokens == 3 and rows[1].n_tokens == 2
    # target tokens score strictly higher than non-target under add-1
    # smoothing (each bucket here holds one distinct token)
    assert rows[0].iw_sum_e4 / 3 > rows[1].iw_sum_e4 / 2


def test_importance_weights_separates_target_language(spark, sf_dir):
    """DSIR recall property: per-token importance of target-lang docs
    exceeds the non-target average on the mixed-language corpus."""
    from admob_data_pipeline_spark.sources.tables import load_table

    rows = corpus.importance_weights(load_table(spark, sf_dir, "documents")).collect()
    en = [r.iw_sum_e4 / r.n_tokens for r in rows if r.lang == "en" and r.n_tokens]
    other = [r.iw_sum_e4 / r.n_tokens for r in rows if r.lang != "en" and r.n_tokens]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_source_cap_sample_caps_every_source(spark, sf_dir):
    from admob_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    kept = corpus.source_cap_sample(docs, cap=5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r.source, []).append(r.rank_in_source)
    totals = {r.source: r.n for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    for src, ranks in by_src.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) == min(5, totals[src])
    # deterministic: same seed → identical kept set
    again = {(r.doc_id, r.source) for r in corpus.source_cap_sample(docs, cap=5).collect()}
    assert again == {(r.doc_id, r.source) for r in kept}


def test_mutual_information_dependence_and_independence(spark):
    dep = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i % 2 else "de"), source=("en" if i % 2 else "de"))
         for i in range(20)]
    )
    rows = corpus.mutual_information(dep).collect()
    # perfectly dependent uniform pair: total MI = ln(2) (scaled e6)
    assert sum(r.mi_e6 for r in rows) in (693146, 693147)  # floor of 2×½·ln2
    ind = spark.createDataFrame(
        [Row(doc_id=i, lang=("en" if i % 2 else "de"), source=("s1" if i < 10 else "s2"))
         for i in range(20)]
    )
    rows = corpus.mutual_information(ind).collect()
    assert all(-1 <= r.mi_e6 <= 0 for r in rows)  # independent → ~0 (floor may hit -1)


def test_ngram_novelty_unique_vs_shared_sources(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, source="s1", text="a b c d e"),
            Row(doc_id=1, source="s2", text="a b c d e"),   # fully shared with s1
            Row(doc_id=2, source="s3", text="p q r s t"),   # fully novel
        ]
    )
    got = {r.source: (r.n_grams, r.n_unique, r.novelty_ppm)
           for r in corpus.ngram_novelty(docs).collect()}
    assert got["s3"] == (3, 3, 1_000_000)
    assert got["s1"] == (3, 0, 0) and got["s2"] == (3, 0, 0)


def test_bm25_search_and_requires_every_term(spark, sf_dir):
    from admob_data_pipeline_spark.operators import corpus
    from admob_data_pipeline_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    conj = corpus.bm25_search(docs, require_all=True).collect()
    assert conj, "AND query should match docs in the fixture corpus"
    # every hit matched ALL query terms
    assert all(r.n_terms_matched == len(corpus.BM25_QUERY) for r in conj)
    # AND results score identically to the same docs in OR mode: the
    # filter changes eligibility, never the score.
    disj = {
        r.doc_id: r.score_scaled
        for r in corpus.bm25_search(docs, top=10**6).collect()
    }
    for r in conj:
        assert disj[r.doc_id] == r.score_scaled


def test_bm25_phrase_counts_only_adjacent_in_order(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.corpus import bm25_phrase_search

    docs = spark.createDataFrame(
        [
            # two adjacent occurrences -> tf = 2
            Row(doc_id=0, text="hash join wins hash join again ok pad"),
            # reversed order and gap -> no phrase
            Row(doc_id=1, text="join hash and hash big join here pad"),
            # one occurrence -> tf = 1
            Row(doc_id=2, text="a hash join b c d e f"),
            Row(doc_id=3, text="nothing relevant here at all x y z"),
        ]
    )
    rows = {r.doc_id: r for r in bm25_phrase_search(docs, ("hash", "join")).collect()}
    assert set(rows) == {0, 2}
    assert rows[0].tf == 2 and rows[2].tf == 1
    # equal doc lengths, higher tf -> strictly higher BM25
    assert rows[0].score_scaled > rows[2].score_scaled
    assert [rows[0].rnk, rows[2].rnk] == [1, 2]


def test_curation_gate_rules_fire_individually(spark):
    from pyspark.sql import Row

    from admob_data_pipeline_spark.operators.corpus import curation_gate

    stop_pad = "the cat sat on the mat and it is of to in "  # stopword-rich
    # passes every rule: 30 distinct 6-char alpha tokens (distinct
    # 2-grams, ~14% space fraction) with 2 stopwords (6.7% >= 2%)
    good = "the and " + " ".join(
        chr(97 + i // 26) + chr(97 + i % 26) + "word" for i in range(28)
    )
    # 26 single-char tokens + stopwords: mean token length 1 < the lower
    # bound of 2 (chars-per-token integer cross-mult)
    thin = " ".join(chr(97 + i) for i in range(26)) + " it is of to in"
    rows = {
        r.doc_id: r
        for r in curation_gate(
            spark.createDataFrame(
                [
                    Row(doc_id=0, text=good),                    # passes all
                    Row(doc_id=1, text="too short doc"),         # len_ok fails
                    Row(doc_id=2, text=thin),                    # mean len < 2
                    Row(doc_id=3, text=" ".join(f"tok{i}" for i in range(30))),  # no stopwords
                    Row(doc_id=4, text=(stop_pad * 2 + "123 456 789! @# $%")),   # non-alpha heavy
                    Row(doc_id=5, text=(stop_pad + "dup gram " * 15).strip()),   # repetitive
                ]
            )
        ).collect()
    }
    assert rows[0].keep
    assert not rows[1].len_ok and not rows[1].keep
    assert not rows[2].mean_len_ok and not rows[2].keep
    assert not rows[3].stop_ok and not rows[3].keep
    assert not rows[4].alpha_ok and not rows[4].keep
    assert not rows[5].rep_ok and not rows[5].keep


def test_hybrid_rrf_fusion_algebra_and_leg_consistency(spark, sf_dir):
    """The fused score must equal the integer RRF recomputed from the two
    legs' ranks, and each leg's ranks must match its standalone ranking
    (lexical = _bm25_rank_postings pool, vector = brute-force top-k) —
    fusion may reorder but never invent or change ranks."""
    from admob_data_pipeline_spark.operators.corpus import (
        HYBRID_PROBE,
        RRF_K,
        RRF_POOL,
        RRF_SCALE,
        q_hybrid_search_rrf,
    )
    from admob_data_pipeline_spark.operators.similarity import topk_bruteforce
    from admob_data_pipeline_spark.sources.tables import load_table

    rows = q_hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    vec_ranks = {
        r.vec_id: r.rank
        for r in topk_bruteforce(
            load_table(spark, sf_dir, "embeddings"), [HYBRID_PROBE], k=RRF_POOL
        ).collect()
    }
    for r in rows:
        want = 0
        if r.lex_rank is not None:
            want += RRF_SCALE // (RRF_K + r.lex_rank)
        if r.vec_rank is not None:
            want += RRF_SCALE // (RRF_K + r.vec_rank)
        assert r.rrf_score == want
        assert r.doc_id != HYBRID_PROBE
        if r.vec_rank is not None:
            assert vec_ranks[r.doc_id] == r.vec_rank
    scores = [r.rrf_score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_source_similarity_matrix_full_grid_and_bounds(spark, sf_dir):
    from admob_data_pipeline_spark.operators.corpus import (
        q_source_similarity_matrix,
    )
    from admob_data_pipeline_spark.sources.tables import load_table

    rows = q_source_similarity_matrix(spark, sf_dir).collect()
    n_src = load_table(spark, sf_dir, "documents").select("source").distinct().count()
    assert len(rows) == n_src * (n_src - 1) // 2  # every unordered pair
    for r in rows:
        assert r.source_a < r.source_b
        assert 0 <= r.n_inter <= min(r.n_a, r.n_b)
        assert 0 <= r.jaccard_ppm <= 1_000_000
