"""Corpus snapshot diffing — the bookkeeping step of an incremental
ingest: given two snapshots of the same corpus (yesterday's crawl and
today's), classify every document as added / removed / changed /
unchanged and roll the result up per source.

Why it's an engine operator and not a script: at 100 TB the diff IS
the expensive part — a full-outer join of two corpus-sized frames.
The design keeps that join cheap:

- content equality compares md5 CONTENT HASHES computed in the scan
  projection, so the shuffle carries (doc_id, source, hash, length) —
  constant width per row — never the document bodies;
- the join keys on doc_id with no skew (ids are unique), so AQE's
  plain hash join partitions evenly; snapshots stored bucketed by
  doc_id co-locate and the shuffle disappears entirely;
- everything downstream of the join is a map-side-combinable count
  rollup into a |status| × |source| frame.

``snapshot_diff(old, new)`` is the composable API; the registry entry
``corpus_snapshot_diff`` derives two deterministic simulated snapshots
from the documents table (5% removed, 10% edited-in-place via
truncation, 10% added — md5-bucketed, portable to the oracle) so the
gate hash-proves all four statuses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table, spread

# Simulated-snapshot buckets (of 100): [0,5) removed in the new
# snapshot, [80,90) edited between snapshots, [90,100) newly added.
SNAP_REMOVED_LT = 5
SNAP_EDIT_FROM = 80
SNAP_ADDED_FROM = 90


def _snap_bucket(doc_id: Column) -> Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("snap:v1:"), doc_id.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")
        % 100
    )


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Diff two (doc_id, source, text) snapshots into the per-source
    status rollup (status, source, n_docs, sum_chars_new). Hash-only
    shuffle; see module docstring for the scale shape."""
    o = old.select(
        "doc_id",
        F.col("source").alias("src_o"),
        F.md5("text").alias("h_o"),
    )
    n = new.select(
        "doc_id",
        F.col("source").alias("src_n"),
        F.md5("text").alias("h_n"),
        F.length("text").cast("bigint").alias("len_n"),
    )
    j = o.join(n, "doc_id", "full_outer")
    status = (
        F.when(F.col("h_n").isNull(), F.lit("removed"))
        .when(F.col("h_o").isNull(), F.lit("added"))
        .when(F.col("h_o") != F.col("h_n"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        j.select(
            status.alias("status"),
            F.coalesce(F.col("src_n"), F.col("src_o")).alias("source"),
            "len_n",
        )
        .groupBy("status", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.coalesce(F.sum("len_n"), F.lit(0)).alias("sum_chars_new"),
        )
        .orderBy("status", "source")
    )


def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper: build the two simulated snapshots and diff
    them. The edit simulation truncates the last 7 chars (bounded at
    1) so 'changed' rows differ in content, not just metadata."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "source", "text", _snap_bucket(F.col("doc_id")).alias("bkt")
    )
    old = base.where(F.col("bkt") < SNAP_ADDED_FROM).select(
        "doc_id",
        "source",
        F.when(
            F.col("bkt") >= SNAP_EDIT_FROM,
            F.expr("substring(text, 1, greatest(length(text) - 7, 1))"),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    new = base.where(F.col("bkt") >= SNAP_REMOVED_LT).select(
        "doc_id", "source", "text"
    )
    return snapshot_diff(old, new)


CORPUS_SNAPSHOT_DIFF_SQL = f"""
WITH base AS (
  SELECT doc_id, source, text,
         CAST('0x' || substr(md5('snap:v1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 AS bkt
  FROM documents
), old AS (
  SELECT doc_id, source,
         CASE WHEN bkt >= {SNAP_EDIT_FROM}
              THEN substr(text, 1, greatest(length(text) - 7, 1))
              ELSE text END AS text
  FROM base WHERE bkt < {SNAP_ADDED_FROM}
), new AS (
  SELECT doc_id, source, text FROM base WHERE bkt >= {SNAP_REMOVED_LT}
), j AS (
  SELECT coalesce(n.source, o.source) AS source,
         CASE WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.doc_id IS NULL THEN 'added'
              WHEN md5(o.text) <> md5(n.text) THEN 'changed'
              ELSE 'unchanged' END AS status,
         CASE WHEN n.doc_id IS NULL THEN NULL ELSE length(n.text) END AS len_n
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT status, source, COUNT(*) AS n_docs,
       CAST(coalesce(SUM(len_n), 0) AS BIGINT) AS sum_chars_new
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""
