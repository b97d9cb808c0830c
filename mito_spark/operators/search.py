"""BM25 full-text ranking over the documents table — the retrieval
capability a corpus engine pairs with ANN (similarity.py): lexical
top-k alongside embedding top-k.

Scale shape (deliberately NOT the textbook inverted-index join): the
query is a handful of literal terms, so per-term tf is a scalar
expression on each doc row (`size(filter(tokens, = term))`) — no
explode, no vocabulary shuffle, no posting-list materialization. The
corpus-level statistics (N, avgdl, per-term document frequencies) are
ONE single-row aggregate broadcast back with a cross join. Total plan:
one pass over documents for stats, one pass for scoring, one
TakeOrderedAndProject for the top-k. Zero wide shuffles at any corpus
size; the stats row is O(|query terms|).

Scoring is Robertson/Okapi BM25 with the standard +1-smoothed idf:
    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
Scores round to 6 decimals on both engines (the ln-parity convention
proven by text.tfidf_top_terms across rounds).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table

DEFAULT_QUERY = ("spark", "join", "window")
K1 = 1.2
B = 0.75


def _tokens(col: Column) -> Column:
    # array_remove, not filter(lambda): lambda HOFs run interpreted
    # (no whole-stage codegen) — measured 2x slower on this exact shape
    return F.array_remove(F.split(F.trim(F.lower(col)), r"\s+"), "")


def bm25_topk(
    spark: SparkSession,
    sf_dir: str,
    query: tuple[str, ...] = DEFAULT_QUERY,
    topk: int = 20,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """queries() entry: BM25 top-k documents for a fixed query."""
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("dl"))

    def _tf(term: str) -> Column:
        # term frequency without a lambda HOF (codegen stays wide):
        # |toks| - |toks \ {term}| counts occurrences of term
        return F.size(F.col("toks")) - F.size(F.array_remove(F.col("toks"), term))

    tf_cols = [_tf(t).alias(f"tf_{i}") for i, t in enumerate(query)]
    with_tf = base.select("doc_id", "dl", *tf_cols)

    stats = with_tf.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(query))
        ],
    )

    scored = with_tf.crossJoin(F.broadcast(stats))
    score = None
    for i in range(len(query)):
        tf = F.col(f"tf_{i}").cast("double")
        df_ = F.col(f"df_{i}").cast("double")
        idf = F.log(
            F.lit(1.0) + (F.col("n_docs") - df_ + F.lit(0.5)) / (df_ + F.lit(0.5))
        )
        term = idf * tf * F.lit(k1 + 1.0) / (
            tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
        score = term if score is None else score + term
    return (
        scored.select("doc_id", F.round(score, 6).alias("score"))
        .where(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(topk)
    )


def _bm25_sql(
    query: tuple[str, ...] = DEFAULT_QUERY, topk: int = 20, k1: float = K1, b: float = B
) -> str:
    tf_exprs = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(query)
    )
    df_exprs = ",\n         ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}" for i in range(len(query))
    )
    score_terms = " + ".join(
        f"ln(1.0 + (n_docs - CAST(df_{i} AS DOUBLE) + 0.5) / (CAST(df_{i} AS DOUBLE) + 0.5))"
        f" * CAST(tf_{i} AS DOUBLE) * {k1 + 1.0}"
        f" / (CAST(tf_{i} AS DOUBLE) + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        for i in range(len(query))
    )
    return rf"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), with_tf AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_exprs}
  FROM base
), stats AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl,
         {df_exprs}
  FROM with_tf
)
SELECT doc_id, ROUND({score_terms}, 6) AS score
FROM with_tf CROSS JOIN stats
WHERE ROUND({score_terms}, 6) > 0
ORDER BY score DESC, doc_id ASC
LIMIT {topk}
"""


BM25_SQL = _bm25_sql()
