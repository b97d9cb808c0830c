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
