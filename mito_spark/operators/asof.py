"""As-of (most-recent-prior) join — a time-series operator Spark lacks
natively, built as a composition of existing DataFrame ops (the
preferred tier in SURVEY §7: composition > pandas UDF > mapPartitions).

Construction: union the two sides tagged by origin, sort within each
key partition by (ts, origin), and carry the right side's latest values
forward with last(ignorenulls) over a running window. One shuffle on
the join key, one local sort — the same cost profile as a sort-merge
join, with no range-explosion. Skewed keys are handled by AQE; at
100 TB the window never materializes per-key state beyond the frame's
running last.

Reference parity note: the reference has no joins at all (SURVEY §2.2
join note) — this is north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts for the same ``on`` key. NULLs when no prior
    right row exists (or it is older than ``tolerance``)."""
    lcols = left.columns
    tagged_l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*lcols).alias("_l"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in value_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    tagged_r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(tagged_l.schema["_l"].dataType).alias("_l"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        F.col(right_ts).cast("timestamp").alias("_r_ts"),
    )
    # right rows sort before left rows at equal ts (_side 0 < 1), so an
    # exactly-simultaneous right row is visible to the left row
    unioned = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_ts",
        "_side",
        "_l",
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in value_cols],
        F.last("_r_ts", ignorenulls=True).over(w).alias("_matched_ts"),
    ).where(F.col("_side") == 1)
    if tolerance is not None:
        within = F.col("_matched_ts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        carried = carried.select(
            "_k", "_ts", "_l",
            *[F.when(within, F.col(f"_r_{c}")).alias(f"_r_{c}") for c in value_cols],
            F.when(within, F.col("_matched_ts")).alias("_matched_ts"),
        )
    return carried.select(
        *[F.col("_l").getField(c).alias(c) for c in left.columns],
        *[F.col(f"_r_{c}").alias(f"right_{c}") for c in value_cols],
        F.col("_matched_ts").alias("right_ts"),
    )


def events_asof_latest_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: for each user's first 20 events, the most
    recent *prior* purchase event of the same user (self as-of join on
    the events stream) — (event, latest prior purchase value)."""
    from mito_spark.engine import load_table

    ev = load_table(spark, sf_dir, "events")
    left = ev.where(F.col("event_id") < 2000).select("event_id", "user_id", "ts", "event_type")
    right = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts"), F.col("value").alias("purchase_value"),
        F.col("event_id").alias("purchase_event_id"),
    )
    out = asof_join(
        left, right, on="user_id", left_ts="ts", right_ts="pts",
        value_cols=["purchase_value", "purchase_event_id"],
    )
    # exclude self-matches for purchase rows: a purchase event matches
    # itself at equal ts; keep semantics "most recent at-or-before"
    return out.select(
        "event_id", "user_id", "ts", "event_type",
        "right_purchase_value", "right_purchase_event_id",
    )


# Oracle: DuckDB's native ASOF JOIN — an independent implementation of
# the same semantics, which is what makes it a strong cross-check.
EVENTS_ASOF_SQL = """
SELECT l.event_id, l.user_id, l.ts, l.event_type,
       r.value AS right_purchase_value,
       r.event_id AS right_purchase_event_id
FROM (SELECT event_id, user_id, ts, event_type FROM events WHERE event_id < 2000) l
ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""
