"""Bucketed (co-located) joins: the shuffle-elimination tier for
repeated fact-fact joins at 100 TB.

A shuffle join on orderkey moves the whole fact table across the
network every query. Writing both tables bucketed by the join key
(same bucket count) pins co-joined rows to matching files; every later
join on that key is exchange-free — each task zips bucket i of both
sides. The write-side shuffle is paid ONCE, amortized over every
downstream join/aggregation on the key. This is the batch analogue of
the reference's single-process locality (it never shuffles because it
never distributes — we keep the distribution and delete the shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed (+ optionally sorted) table — external at
    ``path`` if given, else managed in the warehouse. n_buckets rules:
    ~2-4× cluster cores, and identical across tables meant to co-join.
    Sorting within buckets additionally removes the join's sort step
    (SortMergeJoin reads presorted runs)."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *cols)
    if sort_by is not None:
        s = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*s)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str | list[str]) -> DataFrame:
    """Join two same-bucketed tables on their bucket key: planner sees
    compatible output partitioning and drops both exchanges."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys)
