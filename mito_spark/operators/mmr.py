"""Maximal Marginal Relevance (MMR) re-ranking — retrieval
diversification (Carbonell & Goldstein, SIGIR'98): greedily pick the
next result maximizing λ·relevance − (1−λ)·max-similarity-to-already-
selected, so the top-k covers the query's neighborhood instead of
returning k near-copies of the best hit. The standard post-processing
step after ANN retrieval in RAG/search pipelines, and the natural
consumer of this repo's ANN tiers.

Spark-first shape: the greedy loop is UNROLLED into k deterministic
DataFrame stages (argmax = row_number over (score desc, id asc)) —
per-stage work is per-query candidate rescoring against the selected
set via the precomputed pairwise-sim table, all shuffles keyed on
query_id. Every float is a fold-left cosine or an order-free MAX, so
the DuckDB oracle re-derives the selection bit-for-bit; no Python in
the row path. k is a small constant (results-page size), so the
unrolled plan depth is bounded.

Scale notes: candidates and pairwise sims are checkpointed once
(m·|Q| and m²·|Q| rows — bounded by the retrieval fan-out, not the
corpus); each greedy stage is one bounded shuffle on query_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mito_spark.engine import load_table, spread
from mito_spark.operators.similarity import _cosine


def mmr_rerank(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    m: int = 20,
    k: int = 5,
    lam: float = 0.5,
) -> DataFrame:
    """Top-m exact-cosine candidates per query → MMR-greedy top-k.
    Output: (query_id, neighbor_id, rank, score) where rank 1's score
    is its relevance and later ranks carry their MMR score."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    w_rel = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("cand_id"))
    cand = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            "v",
            _cosine(F.col("q"), F.col("v")).alias("rel"),
        )
        .where(F.col("rel").isNotNull())
        .withColumn("rr", F.row_number().over(w_rel))
        .where(F.col("rr") <= m)
        .drop("rr")
        .localCheckpoint()
    )
    psim = (
        cand.alias("a")
        .join(cand.alias("b"), "query_id")
        .where(F.col("a.cand_id") != F.col("b.cand_id"))
        .select(
            "query_id",
            F.col("a.cand_id").alias("c1"),
            F.col("b.cand_id").alias("c2"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("sim"),
        )
        .localCheckpoint()
    )
    rels = cand.select("query_id", "cand_id", "rel")
    pick1 = (
        rels.withColumn("rn", F.row_number().over(w_rel.orderBy(F.desc("rel"), F.asc("cand_id"))))
        .where(F.col("rn") == 1)
        .select("query_id", F.lit(1).alias("rank"), "cand_id", F.col("rel").alias("score"))
    )
    sel = pick1
    for i in range(2, k + 1):
        remaining = rels.join(
            sel.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_anti"
        )
        maxsim = (
            psim.join(
                sel.select("query_id", F.col("cand_id").alias("c2")), ["query_id", "c2"]
            )
            .groupBy("query_id", F.col("c1").alias("cand_id"))
            .agg(F.max("sim").alias("ms"))
        )
        w_mmr = Window.partitionBy("query_id").orderBy(F.desc("mmr"), F.asc("cand_id"))
        pick = (
            remaining.join(maxsim, ["query_id", "cand_id"])
            .withColumn("mmr", lam * F.col("rel") - (1 - lam) * F.col("ms"))
            .withColumn("rn", F.row_number().over(w_mmr))
            .where(F.col("rn") == 1)
            .select("query_id", F.lit(i).alias("rank"), "cand_id", F.col("mmr").alias("score"))
        )
        # localCheckpoint per stage: sel feeds BOTH the next stage's
        # anti-join and max-sim join, and without materialization the
        # stage-i plan re-embeds every earlier stage's DAG (planning
        # cost grows superlinearly in k; measured 13.8 s -> ~3 s at
        # sf0.1 for k=5). |sel| <= k·|Q| rows — the checkpoint is free.
        sel = sel.unionByName(pick).localCheckpoint()
    return (
        sel.select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            "rank",
            F.round("score", 6).alias("score"),
        )
        .orderBy("query_id", "rank")
    )


def _mmr_sql(n_queries: int = 10, m: int = 20, k: int = 5, lam: float = 0.5, dim: int = 64) -> str:
    cos = (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> x.v[i] * y.v[i]))"
        f" / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> x.v[i]*x.v[i])))"
        f" * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> y.v[i]*y.v[i]))))"
    )
    parts = [
        f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v FROM e WHERE vec_id < {n_queries}
), cand AS (
  SELECT query_id, cand_id, v, rel FROM (
    SELECT x.query_id, y.vec_id AS cand_id, y.v AS v,
           {cos.replace('x.v', 'x.v').replace('y.v', 'y.v')} AS rel,
           ROW_NUMBER() OVER (PARTITION BY x.query_id ORDER BY {cos} DESC, y.vec_id) AS rr
    FROM q x JOIN e y ON y.vec_id <> x.query_id
  ) WHERE rr <= {m}
), psim AS (
  SELECT a.query_id, a.cand_id AS c1, b.cand_id AS c2,
         list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]))
           / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i]*a.v[i])))
              * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> b.v[i]*b.v[i])))) AS sim
  FROM cand a JOIN cand b ON a.query_id = b.query_id AND a.cand_id <> b.cand_id
), sel1 AS (
  SELECT query_id, 1 AS rank, cand_id, rel AS score FROM (
    SELECT query_id, cand_id, rel,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rel DESC, cand_id) AS rn
    FROM cand
  ) WHERE rn = 1
)"""
    ]
    prev_union = "SELECT query_id, rank, cand_id, score FROM sel1"
    for i in range(2, k + 1):
        parts.append(
            f""", all{i} AS ({prev_union}), pick{i} AS (
  SELECT query_id, {i} AS rank, cand_id, mmr AS score FROM (
    SELECT c.query_id, c.cand_id,
           {lam!r} * c.rel - {1 - lam!r} * ms.ms AS mmr,
           ROW_NUMBER() OVER (PARTITION BY c.query_id
                              ORDER BY {lam!r} * c.rel - {1 - lam!r} * ms.ms DESC, c.cand_id) AS rn
    FROM cand c
    JOIN (SELECT p.query_id, p.c1 AS cand_id, MAX(p.sim) AS ms
          FROM psim p JOIN all{i} s ON p.query_id = s.query_id AND p.c2 = s.cand_id
          GROUP BY p.query_id, p.c1) ms
      ON c.query_id = ms.query_id AND c.cand_id = ms.cand_id
    WHERE NOT EXISTS (SELECT 1 FROM all{i} s
                      WHERE s.query_id = c.query_id AND s.cand_id = c.cand_id)
  ) WHERE rn = 1
)"""
        )
        prev_union += f" UNION ALL SELECT query_id, rank, cand_id, score FROM pick{i}"
    parts.append(
        f"""
SELECT query_id, cand_id AS neighbor_id, rank, ROUND(score, 6) AS score
FROM ({prev_union})
ORDER BY query_id, rank
"""
    )
    return "".join(parts)


MMR_SQL = _mmr_sql()
