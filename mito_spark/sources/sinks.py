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


def partition_columns(df: DataFrame) -> list[str]:
    """Partition columns as encoded in the dataset's actual directory
    layout (``.../col=value/...`` segments of its input files), in
    nesting order. Empty for an unpartitioned dataset. Works on any
    filesystem the scan does — no driver-side listing."""
    import re

    files = df.inputFiles()
    if not files:
        return []
    cols: list[str] = []
    for seg in files[0].split("/")[:-1]:
        m = re.fullmatch(r"([^=/]+)=[^/]*", seg)
        if m:
            cols.append(m.group(1))
    return cols


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
    per partition directory.

    Safety contract: partition columns are derived from the dataset's
    real directory layout (not assumed). A ``where`` slice is accepted
    only when the dataset is partitioned AND the predicate references
    partition columns alone — then dynamic partition overwrite rewrites
    exactly the selected whole partitions. Anything else (unpartitioned
    data, or a predicate touching data columns) would silently replace
    the dataset with the filtered slice, so it raises instead."""
    import re

    df = spark.read.format(fmt).load(path)
    pcols = partition_columns(df)
    if where:
        if not pcols:
            raise ValueError(
                "compact(where=...) on an unpartitioned dataset would overwrite "
                "the whole dataset with the filtered slice; compact it in full "
                "or partition it first"
            )
        data_cols = {f.name for f in df.schema.fields} - set(pcols)
        referenced = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", where))
        bad = sorted(referenced & data_cols)
        if bad:
            raise ValueError(
                f"compact(where=...) predicate references non-partition "
                f"column(s) {bad}; only whole-partition slices "
                f"(predicates on {pcols}) can be rewritten losslessly"
            )
        df = df.where(where)
    out = df.repartition(target_files)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    w = out.write.mode("overwrite").format(fmt)
    if pcols:
        w = w.partitionBy(*pcols)
    w.save(path)
