"""Sketch-tier aggregates: the fixed-memory, single-pass, mergeable
answers to cardinality / quantile questions at 100 TB.

The reference has no aggregates beyond list min/max (SURVEY §2.2
aggregation note); Spark's sketches are the scale-path extension the
same way joins/windows are. Exact twins of both questions are already
oracled (order_priority_distinct_customers, events_value_percentiles).

Driver checkability (r3): sketch *estimates* can never hash-match a
foreign engine, so the gated profile emits (a) the exact twin columns,
which the DuckDB oracle recomputes normally, and (b) one boolean per
estimate asserting it landed within its declared error bound, which
the oracle pins to TRUE — if a Spark estimate drifts out of bounds the
boolean flips and the row hash-fails. Raw estimates stay available via
``sketch_estimates`` and their tighter bounds are pytest-enforced
(tests/test_sketches.py).

Why sketches at scale: an exact COUNT(DISTINCT) shuffles every
distinct key; an HLL sketch is a few KB per group, merged map-side —
the shuffle carries sketches, not keys. percentile_approx likewise
streams one KLL/GK summary per partition instead of sorting 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def _profile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregations joined on the (tiny) group key, NOT one mixed
    aggregate. Mixing COUNT(DISTINCT) with object-buffer aggregates
    (percentile, hll_sketch_agg) in a single groupBy forces the
    Expand-based distinct rewrite through the object-hash path: 5x
    slower at sf0.1, and the HLL estimates came back misattributed —
    every group reported the identical estimate (the pattern
    reproduces on a plain session; the split plan returns proper
    per-group values). Two clean single-mode aggregates + a join on
    5 group rows is faster AND right."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("users_approx"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users_hll"),
        F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
        F.round(F.percentile("value", 0.95), 6).alias("p95_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
    )
    return exact.join(approx, "event_type")


def sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch estimates beside the exact twins (pytest surface)."""
    return _profile_agg(spark, sf_dir).select(
        "event_type",
        "users_exact",
        "users_approx",
        "users_hll",
        "p50_exact",
        "p95_exact",
        "p50_approx",
        "p95_approx",
        "n",
    )


def _within(est: Column, exact: Column, rel: float, abs_tol: float) -> Column:
    return F.abs(est - exact) <= F.greatest(F.abs(exact) * rel, F.lit(abs_tol))


def sketch_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated profile: exact twins (hash-compared against the
    DuckDB oracle) + bound-check booleans the oracle pins TRUE.

    Bounds: distinct estimates within 6% (approx_count_distinct at
    rsd=0.02 → 3σ = 6%; HLL default lgConfigK=12 → ~1.6% rsd) with an
    absolute floor of 3 for tiny groups; approximate percentiles with
    accuracy=10000 within 10 value units (values ~ U[0,1000], rank
    error 1e-4)."""
    a = _profile_agg(spark, sf_dir)
    return a.select(
        "event_type",
        "users_exact",
        "p50_exact",
        "p95_exact",
        "n",
        _within(F.col("users_approx"), F.col("users_exact"), 0.06, 3.0).alias(
            "users_approx_ok"
        ),
        _within(F.col("users_hll"), F.col("users_exact"), 0.06, 3.0).alias(
            "users_hll_ok"
        ),
        _within(F.col("p50_approx"), F.col("p50_exact"), 0.0, 10.0).alias(
            "p50_approx_ok"
        ),
        _within(F.col("p95_approx"), F.col("p95_exact"), 0.0, 10.0).alias(
            "p95_approx_ok"
        ),
    )


# The oracle recomputes the exact columns and pins every bound boolean
# to TRUE: a Spark estimate outside its bound flips the boolean and the
# driver's value hash fails. That converts "unverifiable estimate"
# into an in-gate checked contract.
SKETCH_PROFILE_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS users_exact,
       ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
       ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
       COUNT(*) AS n,
       TRUE AS users_approx_ok,
       TRUE AS users_hll_ok,
       TRUE AS p50_approx_ok,
       TRUE AS p95_approx_ok
FROM events GROUP BY event_type
"""


def merge_hll_sketches(parts: DataFrame, sketch_col: str, key_col: str) -> DataFrame:
    """Re-aggregate pre-computed HLL sketches (hll_union_agg) — the
    rollup pattern: per-partition/per-day sketches stored once, any
    coarser grouping answered without rescanning raw data."""
    return parts.groupBy(key_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_estimate")
    )
