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


# Quality floor for the ingest gate — the same word-count weak signal
# the hashed quality classifier trains on (classify.QC_MIN_WORDS);
# duplicated as a local constant so the two modules stay decoupled.
INGEST_MIN_WORDS = 40


def ingest_delta_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED daily-ingest workflow, end to end under the hash
    gate: snapshot-delta extraction → incremental near-dup against the
    canon → quality floor → per-source acceptance manifest
    (source, n_batch, n_dup, n_low_quality, n_accepted).

    Composition of three audited pieces: the simulated-snapshot
    buckets (``corpus_snapshot_diff``), the shared new-vs-canon
    MinHash chain (``dedup.incremental_dedup_frames`` — one
    signature pass over batch ∪ canon, band join new×canon only), and
    the C4-style word-count floor. Batch = the added+changed docs
    (buckets ≥ SNAP_EDIT_FROM, CURRENT text); canon = the unchanged
    corpus. Changed docs' OLD versions are deliberately absent from
    the canon: an upsert ingest replaces them in place, so a changed
    doc must only be deduped against OTHER canon documents (keeping
    the old version would flag every in-place edit as a duplicate of
    its own past). Precedence: dup > low_quality > accepted — a
    near-dup is dropped before its quality is ever consulted, exactly
    the order a production pipeline bills its rejections.

    Scale shape: everything incremental_dedup costs (no new×new, no
    canon×canon), plus one scan-level word count and a
    |sources|-bounded conditional rollup. The oracle splices the SAME
    MinHash chain with the md5-bucket membership predicates
    (``dedup._incremental_chain_preds``), so the composition — not
    just the pieces — is hash-proven.
    """
    from mito_spark.operators.dedup import incremental_dedup_frames
    from mito_spark.operators.text import _tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    base = docs.select(
        "doc_id", "source", "text", _snap_bucket(F.col("doc_id")).alias("bkt")
    )
    canon = base.where(
        (F.col("bkt") >= SNAP_REMOVED_LT) & (F.col("bkt") < SNAP_EDIT_FROM)
    ).select("doc_id", "text")
    batch = base.where(F.col("bkt") >= SNAP_EDIT_FROM)
    flags = incremental_dedup_frames(batch.select("doc_id", "text"), canon)
    joined = batch.select(
        "doc_id",
        "source",
        F.size(_tokens(F.lower(F.col("text")))).alias("n_words"),
    ).join(flags.select("doc_id", "dup_of"), "doc_id", "left")
    cat = (
        F.when(F.col("dup_of").isNotNull(), F.lit("dup"))
        .when(F.col("n_words") < INGEST_MIN_WORDS, F.lit("low_quality"))
        .otherwise(F.lit("accepted"))
    )
    return (
        joined.select("source", cat.alias("cat"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum(F.when(F.col("cat") == "dup", 1).otherwise(0))
            .cast("bigint")
            .alias("n_dup"),
            F.sum(F.when(F.col("cat") == "low_quality", 1).otherwise(0))
            .cast("bigint")
            .alias("n_low_quality"),
            F.sum(F.when(F.col("cat") == "accepted", 1).otherwise(0))
            .cast("bigint")
            .alias("n_accepted"),
        )
        .orderBy("source")
    )


def _ingest_delta_sql() -> str:
    from mito_spark.operators.dedup import _incremental_chain_preds

    bkt = (
        "CAST('0x' || substr(md5('snap:v1:' || CAST({a}.doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100"
    )
    chain = _incremental_chain_preds(
        f"{bkt.format(a='n')} >= {SNAP_EDIT_FROM}",
        f"{bkt.format(a='o')} >= {SNAP_REMOVED_LT} AND {bkt.format(a='o')} < {SNAP_EDIT_FROM}",
    )
    return (
        chain
        + rf""", batch AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS n_words
  FROM documents
  WHERE CAST('0x' || substr(md5('snap:v1:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 100 >= {SNAP_EDIT_FROM}
), flagged AS (
  SELECT b.source,
         CASE WHEN f.dup_of IS NOT NULL THEN 'dup'
              WHEN b.n_words < {INGEST_MIN_WORDS} THEN 'low_quality'
              ELSE 'accepted' END AS cat
  FROM batch b
  LEFT JOIN (SELECT new_id, dup_of FROM best WHERE rk = 1) f ON b.doc_id = f.new_id
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_batch,
       CAST(COUNT(*) FILTER (WHERE cat = 'dup') AS BIGINT) AS n_dup,
       CAST(COUNT(*) FILTER (WHERE cat = 'low_quality') AS BIGINT) AS n_low_quality,
       CAST(COUNT(*) FILTER (WHERE cat = 'accepted') AS BIGINT) AS n_accepted
FROM flagged GROUP BY 1 ORDER BY 1
"""
    )


INGEST_DELTA_SQL = _ingest_delta_sql()
