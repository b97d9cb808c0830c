"""Sketch-tier aggregates: the fixed-memory, single-pass, mergeable
answers to cardinality / quantile questions at 100 TB.

The reference has no aggregates beyond list min/max (SURVEY §2.2
aggregation note); Spark's sketches are the scale-path extension the
same way joins/windows are. Exact twins of both questions are already
oracled (order_priority_distinct_customers, events_value_percentiles);
this module is the approximate tier whose *error bounds* are enforced
by pytest (tests/test_sketches.py) — cross-engine hash-matching is
impossible for estimates, so the driver records a rows-only check.

Why sketches at scale: an exact COUNT(DISTINCT) shuffles every
distinct key; an HLL sketch is a few KB per group, merged map-side —
the shuffle carries sketches, not keys. percentile_approx likewise
streams one KLL/GK summary per partition instead of sorting 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def sketch_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event_type: HLL++ distinct users (two surfaces — the scalar
    estimate and the mergeable binary-sketch path) and approximate
    value quantiles. Rows-only in the driver; bounds pytest-enforced."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("users_approx"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users_hll"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
        F.count(F.lit(1)).alias("n"),
    )


def merge_hll_sketches(parts: DataFrame, sketch_col: str, key_col: str) -> DataFrame:
    """Re-aggregate pre-computed HLL sketches (hll_union_agg) — the
    rollup pattern: per-partition/per-day sketches stored once, any
    coarser grouping answered without rescanning raw data."""
    return parts.groupBy(key_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_estimate")
    )
