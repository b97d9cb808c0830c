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


# --- Heavy hitters: Misra-Gries candidates + exact verify ------------

# report every term with frequency >= HH_NUM/HH_DEN of all tokens
HH_NUM, HH_DEN = 1, 500
# no-false-negative bound needs ceil(DEN/NUM) counters; 2x margin is
# ~free (the summary is per-partition, bounded, never shuffled wide)
MG_CAPACITY = 2 * HH_DEN


def _mg_partition(batches):
    """Per-partition Misra-Gries summary in its mergeable form
    (Agarwal et al., "Mergeable Summaries", SODA'12): fold each Arrow
    batch's value_counts into at most MG_CAPACITY counters; when the
    dict overflows, subtract the (K+1)-th largest count from all and
    drop the non-positive — the batched equivalent of the classic
    decrement step, same guarantee: any term with partition count
    > n_p/(K+1) survives. Emits the candidate terms plus one
    term=NULL row carrying the partition's exact token count (so the
    corpus total needs no second scan)."""
    import pandas as pd

    counters: dict = {}
    n_tokens = 0
    for pdf in batches:
        vc = pdf["term"].value_counts()
        n_tokens += int(vc.sum())
        for t, c in vc.items():
            counters[t] = counters.get(t, 0) + int(c)
        if len(counters) > MG_CAPACITY:
            cut = sorted(counters.values(), reverse=True)[MG_CAPACITY]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    yield pd.DataFrame(
        {
            "term": list(counters.keys()) + [None],
            "n": [None] * len(counters) + [n_tokens],
        }
    )


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters — every term with frequency >=
    HH_NUM/HH_DEN of all tokens, with exact count and share — via the
    two-pass candidates-then-verify pattern (Misra-Gries per
    partition, then exact counts restricted to the candidate union).

    Why not one groupBy+HAVING: that shuffles the FULL vocabulary
    (web-scale corpora: ~1e9 distinct tokens of typos/URLs/hashes,
    nearly all of it garbage that can never reach the threshold). The
    MG pass emits <= 2/phi candidate rows per partition with ZERO
    shuffle, the candidate union is guaranteed a superset of every
    true heavy hitter (count >= N/DEN > N/(capacity+1) implies
    partition count > n_p/(capacity+1) somewhere, which MG retains),
    and the verify pass counts ONLY candidate tokens — the shuffle
    carries candidates x partitions rows, independent of vocabulary
    size. Final output is exact and partitioning-invariant (the
    candidate SET varies with partitioning; the verified filter does
    not — pinned by the partition-invariance net).

    The threshold compares in integer arithmetic (cnt * DEN >=
    NUM * N) — no float boundary to diverge between engines. Python
    appears only inside the Arrow-batched MG fold (vectorized
    value_counts per batch, bounded dict merge); the verify pass is
    pure JVM.
    """
    from mito_spark.engine import spread
    from mito_spark.operators.text import _tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(_tokens(F.lower(F.col("text")))).alias("term"))
    # one MG scan feeds both the total and the candidate set
    summary = toks.mapInPandas(
        _mg_partition, schema="term string, n bigint"
    ).localCheckpoint()
    tot = summary.agg(F.sum("n").alias("n_total"))
    cand = summary.where(F.col("term").isNotNull()).select("term").distinct()
    return (
        toks.join(F.broadcast(cand), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * HH_DEN >= HH_NUM * F.col("n_total"))
        .select(
            "term",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
    )


HEAVY_HITTERS_SQL = rf"""
WITH terms AS (
  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS term
  FROM documents
), tot AS (
  SELECT COUNT(*) AS n_total FROM terms
), cnts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM terms GROUP BY term
)
SELECT term, cnt,
       ROUND(CAST(cnt AS DOUBLE) / n_total, 6) AS share
FROM cnts CROSS JOIN tot
WHERE cnt * {HH_DEN} >= {HH_NUM} * n_total
"""
