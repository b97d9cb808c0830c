"""Exact-substring span dedup: find w-token spans duplicated across
documents (the sliding-window/hash re-expression of suffix-array
exact-substring dedup from "Deduplicating Training Data Makes Language
Models Better", arXiv:2107.06499).

Suffix arrays don't distribute; the Spark-native shape is: hash every
w-token sliding window map-side (one explode), group by span hash to
find hashes seen in >= 2 distinct documents, then join positions back
to score each document by how much of it is duplicated text. Every
stage is keyed on the span hash or doc_id — two shuffles on the hash
(groupBy + join, Catalyst reuses the exchange) and one on doc_id.

At 100 TB: window hashing is map-side codegen (no Python); the hash
join is equi-join on md5 keys, uniformly distributed except for
boilerplate mega-spans (site headers, license blocks) which are
exactly the hot keys AQE skew-join splits; the per-doc rollup shuffles
one row per duplicated position, not per window. The output is the
span-removal manifest a rewrite pass consumes.

Reference anchor: the reference's dedup surface is fingerprint-based
(mito cel fingerprinting over string fields); this extends it with the
span-level exactness its tests motivate but its single-node engine
cannot afford.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table, spread
from mito_spark.operators.text import _tokens

WINDOW = 8  # tokens per span; 2107.06499 uses 50 BPE tokens at web scale


def exact_substring_spans(
    spark: SparkSession, sf_dir: str, w: int = WINDOW
) -> DataFrame:
    """Per-document duplicated-span profile: (doc_id, n_windows,
    dup_windows, dup_fraction) where dup_windows counts sliding
    w-token windows whose md5 also appears in another document.

    The window hashes are built inside one ``transform`` over a staged
    token column (HOF stays JVM-side; the Generate sits in its own
    projection per the repo's interpreted-HOF rule), so no window
    string is ever materialized twice.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id", _tokens(F.lower(F.col("text"))).alias("toks")
    )
    # Guard short docs: sequence(1, size-w+1) with a negative stop
    # would generate a DESCENDING sequence in Spark — the when() is
    # correctness, not style.
    staged = toks.select(
        "doc_id",
        F.when(
            F.size("toks") >= w,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - w + 1),
                lambda i: F.md5(
                    F.encode(F.array_join(F.slice(F.col("toks"), i, w), " "), "UTF-8")
                ),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("hs"),
    ).localCheckpoint()  # feeds both the position stream and the per-doc counts
    wins = staged.select("doc_id", F.explode("hs").alias("h"))
    dup = (
        wins.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("h")
    )
    per_doc_dup = (
        wins.join(dup, "h")  # same key as the groupBy: exchange reuse
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("dup_windows"))
    )
    counts = staged.select(
        "doc_id", F.size("hs").cast("bigint").alias("n_windows")
    )
    return (
        counts.join(per_doc_dup, "doc_id", "left")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce(F.col("dup_windows"), F.lit(0)).cast("bigint").alias("dup_windows"),
            F.round(
                F.try_divide(
                    F.coalesce(F.col("dup_windows"), F.lit(0)).cast("double"),
                    F.col("n_windows").cast("double"),
                ),
                6,
            ).alias("dup_fraction"),
        )
    )


SPANS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS t
  FROM documents
), wins AS (
  SELECT doc_id, md5(array_to_string(t[i:i+{WINDOW - 1}], ' ')) AS h
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - {WINDOW} + 2)) AS i) r
), dup AS (
  SELECT h FROM wins GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2
), pd AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dup_windows
  FROM wins WHERE h IN (SELECT h FROM dup) GROUP BY doc_id
), counts AS (
  SELECT doc_id, CAST(greatest(len(t) - {WINDOW} + 1, 0) AS BIGINT) AS n_windows
  FROM toks
)
SELECT counts.doc_id, n_windows,
       COALESCE(dup_windows, 0) AS dup_windows,
       CASE WHEN n_windows = 0 THEN NULL
            ELSE ROUND(CAST(COALESCE(dup_windows, 0) AS DOUBLE) / n_windows, 6)
       END AS dup_fraction
FROM counts LEFT JOIN pd ON counts.doc_id = pd.doc_id
"""
