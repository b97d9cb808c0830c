"""SparkSession construction and table loading.

Scale posture: these configs are chosen so the same code runs on a
1000-executor cluster against ~100 TB — AQE handles runtime re-planning
(skew joins, coalescing post-shuffle partitions), broadcast threshold
keeps dimension joins shuffle-free, and nothing below ever collects a
large result to the driver. Tests run on local[N]; only parallelism
defaults differ.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

# Resolved-table memo: session -> {(sf_dir, table): lazy DataFrame}.
# Holds LOGICAL PLANS only (never data); weak-keyed so a stopped
# session's entries are collectable. See load_table's docstring.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor that
# follows TPC-H-ish proportions (region=5, nation=25; customer/supplier
# scale linearly but stay << fact tables).
BROADCAST_TABLES = frozenset({"region", "nation"})


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "mito_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing of shuffle partitions + skew-join
      handling, so a fixed ``spark.sql.shuffle.partitions`` is only an
      upper bound, not a tuning burden, at any scale.
    - Arrow enabled: every pandas-UDF boundary is Arrow-batched.
    - On a real cluster, shuffle_partitions should be ~2-3x total
      cores; here it defaults to the local core count.
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    if "spark.master" not in os.environ.get("SPARK_CONF", ""):
        builder = builder.master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one synthetic table; parquet scan gets column pruning and
    predicate pushdown from Catalyst automatically.

    The resolved DataFrame (a LAZY logical plan — no data, no
    ``.cache()``) is memoized per (session, sf_dir, table): resolving
    a parquet table costs ~0.3-0.5 s of driver work (py4j round
    trips, file listing, footer/schema read) and a query touching six
    tables paid it six times per invocation — ~25% of the whole bench
    at gate SF was table re-resolution (r12 optimization round). At
    100 TB the same cost is the §6 file-listing problem, and reusing
    the resolved handle is exactly what a catalog does. Every action
    on the returned frame still scans parquet afresh; nothing
    materialized is reused. The cache dies with the session (weak
    key), so a restarted session re-resolves.

    The memo key carries a freshness stamp: max mtime_ns over the
    table path and its direct children (ADVICE r12: the directory's
    own mtime does not change when an existing part file is modified
    in place, only when entries are added/removed). A rewrite of the
    same path (tests; any overwrite-in-place flow) changes the stamp
    and forces a fresh resolve, so the handle can never serve a stale
    file index (the r12 memoization's first form did exactly that —
    FileNotFoundException on the rewritten table). Superseded stamps
    for the same (sf_dir, name) are evicted so the per-session dict
    stays bounded under repeated rewrites. A few os.stat calls per
    load_table vs ~0.3-0.5 s of py4j resolution.

    events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
    reader rejects; we read nanos as long (session conf, settable at
    runtime so it works under any driver-provided session) and truncate
    to microseconds — the same truncation DuckDB applies, keeping the
    oracle comparable."""
    per = _TABLE_CACHE.get(spark)
    if per is None:
        per = {}
        _TABLE_CACHE[spark] = per
    path = os.path.join(sf_dir, f"{name}.parquet")
    stamp = _freshness_stamp(path)
    key = (sf_dir, name, stamp)
    df = per.get(key)
    if df is None:
        for old in [k for k in per if k[:2] == (sf_dir, name)]:
            del per[old]
        df = _load_table_uncached(spark, sf_dir, name)
        per[key] = df
    return df


def _freshness_stamp(path: str):
    """max mtime_ns over the dataset path and its direct children —
    catches in-place part-file rewrites that leave the directory's own
    mtime unchanged. None (always-miss) when the path is unreadable."""
    try:
        stamp = os.stat(path).st_mtime_ns
    except OSError:
        return None
    try:
        with os.scandir(path) as it:
            for entry in it:
                try:
                    m = entry.stat().st_mtime_ns
                except OSError:
                    continue
                if m > stamp:
                    stamp = m
    except (NotADirectoryError, OSError):
        pass
    return stamp


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        if dict(df.dtypes).get("ts") == "bigint":
            # integer `div`, not `/`: float division loses precision at
            # nanosecond epoch magnitudes (~1.7e18 > 2^53)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def spread(df: DataFrame, parallelism: int | None = None) -> DataFrame:
    """Ensure a DataFrame has at least session-parallelism partitions
    before CPU-dense per-row work (hashing, signatures, pandas UDFs).

    A scan of few/small files yields few partitions, serializing all
    downstream expression compute on that many cores regardless of
    cluster size. At 100 TB the file count dwarfs the core count and
    this is a no-op; at any scale the one round-robin shuffle it may add
    costs far less than running sketch/decode compute underparallelized.
    """
    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view so the whole
    engine surface is reachable from plain ``spark.sql`` — the same
    names the DuckDB oracle uses, so any oracle_sql() string is also
    directly runnable (modulo dialect) against Spark."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
