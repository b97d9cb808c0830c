"""load_table handle memoization (r12 optimization round)."""

from __future__ import annotations

import os


def _write(spark, path: str, rows):
    spark.createDataFrame(rows, "doc_id bigint, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(path, "documents.parquet"))


def test_load_table_memoizes_handle(spark, sf_dir):
    from mito_spark.engine import load_table

    a = load_table(spark, sf_dir, "documents")
    b = load_table(spark, sf_dir, "documents")
    assert a is b


def test_load_table_sees_rewritten_table(spark, tmp_path):
    """A rewrite of the same path must invalidate the memoized handle:
    the first memo form served a stale file index and rewritten tables
    raised FileNotFoundException (or worse, read old data)."""
    from mito_spark.engine import load_table

    d = str(tmp_path)
    _write(spark, d, [(1, "one")])
    assert load_table(spark, d, "documents").count() == 1
    _write(spark, d, [(1, "one"), (2, "two"), (3, "three")])
    assert load_table(spark, d, "documents").count() == 3
