"""Batch/streaming sinks: partitioned parquet layout + compaction.

The reference's only sink is a Go channel (lib/send.go — covered by
streaming.ChannelSink). A real engine also owns its storage layout;
these helpers encode the two rules that matter at 100 TB:

- partition by the pruning key (almost always event date): queries
  with a date predicate read only their partitions (PartitionFilters
  in the scan, verified in tests);
- keep file counts sane: streaming and fine-grained partitioning
  produce small files; compaction rewrites a partition to target-size
  files in one distributed pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with directory partitioning. With dynamic partition
    overwrite, re-running a day's pipeline replaces only that day's
    directories — the idempotent-backfill contract."""
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(*cols).format(fmt).save(path)


def add_date_partition(df: DataFrame, ts_col: str = "ts", name: str = "dt") -> DataFrame:
    """Derive the standard date partition column from an event-time
    timestamp (kept as DATE so pruning predicates stay sargable)."""
    return df.withColumn(name, F.to_date(F.col(ts_col)))


def compact(
    spark: SparkSession,
    path: str,
    target_files: int,
    fmt: str = "parquet",
    where: str | None = None,
) -> None:
    """Rewrite (a slice of) a dataset into ``target_files`` files per
    partition directory: one distributed read + repartition + dynamic
    overwrite. Run on cold partitions; readers see the swap atomically
    per partition directory."""
    df = spark.read.format(fmt).load(path)
    if where:
        df = df.where(where)
    parts = [f.name for f in df.schema.fields]
    # partition columns are whatever the directory layout encoded;
    # re-derive them from the read schema's partition values is not
    # needed — partitionBy on the same columns reproduces the layout
    pcols = [c for c in parts if c == "dt"]
    out = df.repartition(target_files)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = out.write.mode("overwrite").format(fmt)
    if pcols:
        w = w.partitionBy(*pcols)
    w.save(path)
