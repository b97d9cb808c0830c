"""Range (point-in-interval) join — a time-series operator Spark lacks
natively (alongside asof.py), built as a composition of existing
DataFrame ops.

The naive formulation — equi-join on the key plus an inequality pair —
pairs every key match before filtering the range: per-key O(|L|·|R|).
The scale path here is **bucketization**: pick a bucket width, explode
each interval into the buckets it spans, bucket each point, equi-join
on (key, bucket), then apply the exact range predicate. The shuffle is
a plain hash partition on (key, bucket); work is proportional to true
matches plus bucket-boundary false positives, never to key-pair cross
products. Because a point lives in exactly one bucket, each
(point, interval) pair meets in at most one bucket — no de-dup pass.
Bucket width tunes the tradeoff: ≈ the typical interval length keeps
the interval explode factor around 2 while keeping buckets selective.

Reference parity note: the reference has no joins (SURVEY §2.2 join
note); this is north-star time-series surface, same tier as the as-of
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str,
    ts: str,
    lo: str,
    hi: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join point rows to interval rows of the same ``on`` key where
    ``lo <= ts < hi`` (half-open). Keeps all point columns and the
    interval side's non-key columns.

    The interval's bucket span includes floor(hi/width) even when hi is
    exclusive — the exact predicate discards any boundary false
    positive, so correctness never depends on bucket alignment.
    """
    pb = points.withColumn("_b", F.floor(F.unix_timestamp(F.col(ts)) / bucket_seconds))
    span = F.sequence(
        F.floor(F.unix_timestamp(F.col(lo)) / bucket_seconds),
        F.floor(F.unix_timestamp(F.col(hi)) / bucket_seconds),
    )
    ib = intervals.withColumnRenamed(on, "_rk").withColumn("_b", F.explode(span))
    return (
        pb.join(ib, (pb[on] == ib["_rk"]) & (pb["_b"] == ib["_b"]))
        .where((F.col(ts) >= F.col(lo)) & (F.col(ts) < F.col(hi)))
        .drop("_b", "_rk")
    )


def events_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: for each purchase event, the count and exact
    value sum of the same user's events inside [purchase_ts,
    purchase_ts + 1 hour) — a point-in-interval self-join on the event
    stream. Sum is decimal-exact then cast (cross-engine hash
    stability)."""
    ev = load_table(spark, sf_dir, "events")
    points = ev.select("user_id", "ts", "value", F.col("event_id").alias("point_event_id"))
    intervals = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("lo"),
            (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("hi"),
        )
    )
    joined = range_join(points, intervals, on="user_id", ts="ts", lo="lo", hi="hi")
    return joined.groupBy("purchase_event_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(38,10)")).cast("double").alias("sum_value"),
    )


PURCHASE_WINDOW_SQL = """
SELECT p.event_id AS purchase_event_id, p.user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(e.value AS DECIMAL(38,10))) AS DOUBLE) AS sum_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
JOIN events e
  ON e.user_id = p.user_id AND e.ts >= p.ts AND e.ts < p.ts + INTERVAL 1 HOUR
GROUP BY p.event_id, p.user_id
"""
