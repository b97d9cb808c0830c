"""BM25 ranking (operators/search.py)."""

from __future__ import annotations

import math

from mito_spark.operators.search import bm25_topk


def test_bm25_topk_scores_against_reference_impl(spark, sf_dir):
    """Cross-check the DataFrame plan against a plain-Python BM25 on
    the same rows (pulled once; sf0.001 = 500 docs)."""
    from mito_spark.engine import load_table

    query = ("spark", "join", "window")
    got = bm25_topk(spark, sf_dir, query=query, topk=10).collect()
    docs = {r.doc_id: r.text.strip().lower().split() for r in load_table(spark, sf_dir, "documents").collect()}
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    df = {t: sum(1 for toks in docs.values() if t in toks) for t in query}

    def score(toks):
        s = 0.0
        for t in query:
            tf = toks.count(t)
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl))
        return round(s, 6)

    expected = sorted(
        ((score(t), -d) for d, t in docs.items() if score(t) > 0), reverse=True
    )[:10]
    exp = [(-d, s) for s, d in expected]
    assert [(r.doc_id, r.score) for r in got] == [(d, round(s, 6)) for d, s in exp]


def test_bm25_respects_topk_and_positive_scores(spark, sf_dir):
    rows = bm25_topk(spark, sf_dir, topk=5).collect()
    assert len(rows) == 5
    assert all(r.score > 0 for r in rows)
    # descending, ties broken by doc_id
    assert rows == sorted(rows, key=lambda r: (-r.score, r.doc_id))


def test_bm25_unmatched_query_is_empty(spark, sf_dir):
    assert bm25_topk(spark, sf_dir, query=("zzzznope",)).count() == 0


def test_hybrid_rrf_fuses_legs(spark, sf_dir):
    """RRF score equals the sum of reciprocal leg ranks; top result
    must appear in at least one leg's candidate list."""
    from mito_spark.operators.search import RRF_K, hybrid_search_rrf

    rows = hybrid_search_rrf(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    for r in rows:
        want = 0.0
        if r["bm25_rank"] is not None:
            want += 1.0 / (RRF_K + r["bm25_rank"])
        if r["ql_rank"] is not None:
            want += 1.0 / (RRF_K + r["ql_rank"])
        assert abs(r["rrf_score"] - round(want, 6)) < 1e-9
        assert r["bm25_rank"] is not None or r["ql_rank"] is not None
    # sorted by fused score desc
    scores = [r["rrf_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_rrf_agrees_with_bm25_leg(spark, sf_dir):
    """The doc ranked 1 by the BM25 leg is bm25_topk's #1."""
    from mito_spark.operators.search import bm25_topk, hybrid_search_rrf

    top_bm25 = bm25_topk(spark, sf_dir).first()["doc_id"]
    leg1 = [
        r["doc_id"]
        for r in hybrid_search_rrf(spark, sf_dir).collect()
        if r["bm25_rank"] == 1
    ]
    assert leg1 == [top_bm25]


def test_hybrid_rrf_oov_term_does_not_poison_ql_leg(spark, sf_dir):
    """A query term absent from the whole collection (cf=0) must be
    dropped from the QL leg, not turn every doc's score NULL (which
    silently degraded ql_rank to doc_id order before the guard)."""
    from mito_spark.operators.search import hybrid_search_rrf

    clean = hybrid_search_rrf(spark, sf_dir, query=("spark", "join")).collect()
    with_oov = hybrid_search_rrf(
        spark, sf_dir, query=("spark", "join", "zzzznope")
    ).collect()
    key = lambda rows: [(r["doc_id"], r["bm25_rank"], r["ql_rank"]) for r in rows]
    assert key(with_oov) == key(clean)  # OOV term contributes nothing
