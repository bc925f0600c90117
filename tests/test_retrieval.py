"""BM25 top-k (operators/retrieval.py) vs an independent pure-Python
reference implementation on a small corpus."""

import math

import pytest
from pyspark.sql import functions as F

from parquet_editor_spark.operators.retrieval import bm25_topk

CORPUS = [
    (1, "join join join scan filter"),
    (2, "vector vector join merge"),
    (3, "spark spark spark spark vector"),
    (4, "table row column batch window"),
    (5, "join vector spark"),
]


def _py_bm25(terms, k1=1.2, b=0.75):
    docs = {i: t.split() for i, t in CORPUS}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    dft = {
        q: sum(1 for t in docs.values() if q in t) for q in terms
    }
    out = {}
    for i, toks in docs.items():
        score, hits = 0.0, 0
        for q in terms:
            tf = toks.count(q)
            if not tf:
                continue
            hits += 1
            idf = math.log((n - dft[q] + 0.5) / (dft[q] + 0.5) + 1.0)
            score += idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
        if hits:
            out[i] = (hits, round(score, 4))
    return out


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, "doc_id BIGINT, text STRING")


def test_bm25_matches_reference(spark, corpus_df):
    got = {
        r["id"]: (r["n_hit_terms"], r["score"])
        for r in bm25_topk(corpus_df, ["join", "spark", "vector"], k=10).collect()
    }
    assert got == _py_bm25(["join", "spark", "vector"])


def test_bm25_topk_order_and_limit(spark, corpus_df):
    rows = bm25_topk(corpus_df, ["join", "spark", "vector"], k=2).collect()
    want = sorted(
        _py_bm25(["join", "spark", "vector"]).items(),
        key=lambda kv: (-kv[1][1], kv[0]),
    )[:2]
    assert [(r["id"], r["score"]) for r in rows] == [
        (i, s) for i, (h, s) in want
    ]


def test_bm25_excludes_nonmatching_docs(spark, corpus_df):
    ids = {r["id"] for r in bm25_topk(corpus_df, ["window"], k=10).collect()}
    assert ids == {4}


def test_bm25_case_insensitive_terms(spark, corpus_df):
    a = bm25_topk(corpus_df, ["JOIN"], k=10).collect()
    b = bm25_topk(corpus_df, ["join"], k=10).collect()
    assert [(r["id"], r["score"]) for r in a] == [(r["id"], r["score"]) for r in b]


def test_bm25_empty_terms_rejected(corpus_df):
    with pytest.raises(ValueError):
        bm25_topk(corpus_df, [])


def test_bm25_plan_filters_before_shuffle(spark, corpus_df):
    """Scale guard: the query-term filter must sit under the (id, term)
    aggregation, not above it — only matching tokens cross the shuffle."""
    plan = bm25_topk(corpus_df, ["join"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_hybrid_rrf_fuses_both_lists(spark):
    from parquet_editor_spark.operators.retrieval import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [
            (0, "spark join vector"),
            (1, "spark spark spark"),
            (2, "nothing relevant here"),
            (3, "vector vector join"),
        ],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [0.9, 0.1]),
            (2, [0.0, 1.0]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<float>",
    )
    out = hybrid_rrf_topk(
        docs, embs, ["spark", "join", "vector"], query_vec_id=0, k=4
    ).collect()
    rows = {r["doc_id"]: r for r in out}
    # doc 2 matches no term: lexical rank NULL, dense rank present
    assert rows[2]["lex_rank"] is None and rows[2]["dense_rank"] is not None
    # rrf = 1/(60+lex) + 1/(60+dense), monotone in both ranks
    for r in out:
        expect = 0.0
        if r["lex_rank"] is not None:
            expect += 1.0 / (60 + r["lex_rank"])
        if r["dense_rank"] is not None:
            expect += 1.0 / (60 + r["dense_rank"])
        assert r["rrf"] == round(expect, 6)
    # ordered by fused score desc
    vals = [r["rrf"] for r in out]
    assert vals == sorted(vals, reverse=True)


def test_hybrid_rrf_respects_k(spark):
    from parquet_editor_spark.operators.retrieval import hybrid_rrf_topk

    docs = spark.createDataFrame(
        [(i, "spark word%d" % i) for i in range(30)],
        "doc_id long, text string",
    )
    embs = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    assert (
        hybrid_rrf_topk(docs, embs, ["spark"], query_vec_id=0, k=7).count()
        == 7
    )


def test_tfidf_vectors_layout_and_values(spark):
    """Deterministic vocab layout (df desc, term asc) and hand-checked
    tf-idf values; docs with no vocab terms get the zero vector."""
    import math

    from parquet_editor_spark.operators.retrieval import tfidf_vectors

    rows = [
        (0, "apple banana apple"),
        (1, "banana cherry"),
        (2, "apple banana"),
        (3, "zzz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r["tfidf"]
        for r in tfidf_vectors(df, "doc_id", "text", vocab_size=3,
                               round_to=6).collect()
    }
    # df: banana=3, apple=2, cherry=1, zzz=1 -> vocab [banana, apple, cherry]
    N = 4
    idf = {t: math.log((N + 1) / (d + 1)) + 1 for t, d in
           [("banana", 3), ("apple", 2), ("cherry", 1)]}
    assert out[0] == [round(1 * idf["banana"], 6),
                      round(2 * idf["apple"], 6), 0.0]
    assert out[1] == [round(1 * idf["banana"], 6), 0.0,
                      round(1 * idf["cherry"], 6)]
    assert out[3] == [0.0, 0.0, 0.0]  # zzz lost the tie to cherry
    assert all(len(v) == 3 for v in out.values())
