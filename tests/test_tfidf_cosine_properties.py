"""Third-implementation pin for tfidf_cosine_pairs (playbook rule: any
new similarity semantics gets a pure-python reference alongside the two
SQL dialects — drift that lands identically in Spark AND DuckDB still
gets caught here).

The reference reimplements the whole contract from scratch: 3-token
shingle multisets, df on the full corpus, the df ≤ MAX_DF stop-shingle
cap, idf floored to integer milli-nats, exact integer dot/norms, and the
final cosine rounded HALF_UP (Spark's ROUND; python's round() is
banker's, so Decimal quantize is used)."""

from __future__ import annotations

import math
from collections import Counter
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import Row

from admob_data_pipeline_spark.operators import dedup

PROPS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# small vocabulary → real shingle overlap between random docs
_WORD = st.sampled_from([f"w{i}" for i in range(12)])
_DOC = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


def _py_tfidf_pairs(texts, max_df, idf_scale):
    sh = {}
    for i, t in enumerate(texts):
        toks = t.lower().split(" ") if t else [""]
        grams = [
            " ".join(toks[j : j + 3]) for j in range(max(0, len(toks) - 2))
        ]
        sh[i] = Counter(grams)
    df = Counter()
    for c in sh.values():
        for g in c:
            df[g] += 1
    n_docs = len(texts)
    keep = {g for g, d in df.items() if d <= max_df}
    w = {
        i: {
            g: c * math.floor(math.log(n_docs / df[g]) * idf_scale)
            for g, c in cnt.items()
            if g in keep
        }
        for i, cnt in sh.items()
    }
    n2 = {i: sum(x * x for x in wi.values()) for i, wi in w.items()}
    out = {}
    for a in range(n_docs):
        for b in range(a + 1, n_docs):
            shared = set(w[a]) & set(w[b])
            if not shared or not n2[a] or not n2[b]:
                continue
            dot = sum(w[a][g] * w[b][g] for g in shared)
            cos = float(dot) / (math.sqrt(float(n2[a])) * math.sqrt(float(n2[b])))
            out[(a, b)] = float(
                Decimal(repr(cos)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
    return out


@given(texts=st.lists(_DOC, min_size=2, max_size=14))
@PROPS
def test_tfidf_cosine_matches_pure_python(spark, texts):
    d = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    got = {
        (r.a, r.b): r.cos_sim
        for r in dedup.tfidf_cosine_pairs(d, threshold=0.0).collect()
    }
    want = _py_tfidf_pairs(texts, dedup.MAX_DF, dedup.IDF_SCALE)
    # Spark emits only pairs with ≥1 shared surviving shingle and a
    # defined cosine — same support as the reference dict
    assert got == want
