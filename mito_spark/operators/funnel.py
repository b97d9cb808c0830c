"""Ordered-sequence funnel analysis over the events stream — the
event-analytics capability (windowed multi-step conversion) the
reference's per-message model cannot express but an events engine
needs (ClickHouse ``windowFunnel`` / sequenceMatch shape, re-expressed
declaratively).

Semantics: for each user, step k converts at the EARLIEST event of
type ``steps[k]`` that is strictly after the step-(k-1) conversion and
no later than ``within`` of the step-0 conversion (the classic
"window anchored at funnel entry" rule).

Scale shape: ONE shuffle — groupBy(user_id) with per-step
ordered-collect aggregates; everything after is per-row array algebra
on bounded arrays (a user's own events). No self-joins (the naive
k-way formulation), no windows over the full stream. The final
roll-up is a single-row aggregate exploded into the per-step summary.
Per-user event lists are bounded by per-user activity; a pathological
hot user would be capped upstream (engine.spread / salting), not here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table

DEFAULT_STEPS = ("view", "click", "purchase")
DEFAULT_WITHIN = "7 days"


def funnel_analysis(
    spark: SparkSession,
    sf_dir: str,
    steps: tuple[str, ...] = DEFAULT_STEPS,
    within: str = DEFAULT_WITHIN,
) -> DataFrame:
    """queries() entry: per-step funnel conversion.

    Output: (step_idx, step, n_users, conversion) — users reaching
    each step under the ordered-within-horizon rule; conversion is
    the fraction of step-0 users, rounded to 6 decimals."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isin(*steps))
    per_user = ev.groupBy("user_id").agg(
        *[
            F.sort_array(
                F.collect_list(F.when(F.col("event_type") == s, F.col("ts")))
            ).alias(f"ts_{i}")
            for i, s in enumerate(steps)
        ]
    )

    # try_element_at: a user may reach later step types without ever
    # entering the funnel (empty ts_0) — ANSI element_at would throw
    t0 = F.try_element_at(F.col("ts_0"), F.lit(1))
    cur = per_user.withColumn("t_0", t0).withColumn(
        "deadline", t0 + F.expr(f"INTERVAL {within}")
    )
    prev = F.col("t_0")
    for i in range(1, len(steps)):
        # earliest step-i event strictly after step-(i-1), inside the
        # horizon anchored at step 0; NULL prev → empty filter → NULL.
        # The single-param lambda is invoked eagerly by F.filter, so
        # capturing the loop-carried `prev` here is safe.
        p = prev
        nxt = F.array_min(
            F.filter(F.col(f"ts_{i}"), lambda x: (x > p) & (x <= F.col("deadline")))
        )
        cur = cur.withColumn(f"t_{i}", nxt)
        prev = F.col(f"t_{i}")

    counts = cur.agg(
        *[F.count(F.col(f"t_{i}")).alias(f"n_{i}") for i in range(len(steps))]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("step_idx"),
                F.lit(s).alias("step"),
                F.col(f"n_{i}").alias("n_users"),
                # try_divide: an empty funnel (n_0 = 0) reports NULL
                # conversion, not a task failure
                F.round(F.try_divide(F.col(f"n_{i}"), F.col("n_0")), 6).alias("conversion"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.explode(rows).alias("r")).select("r.*")


def _funnel_sql(steps: tuple[str, ...] = DEFAULT_STEPS, within: str = DEFAULT_WITHIN) -> str:
    step_list = ", ".join(f"'{s}'" for s in steps)
    collects = ",\n         ".join(
        f"list(ts ORDER BY ts) FILTER (WHERE event_type = '{steps[i]}') AS ts_{i}"
        for i in range(len(steps))
    )
    conv = ["ts_0[1] AS t_0"]
    for i in range(1, len(steps)):
        conv.append(
            f"list_min(list_filter(ts_{i}, x -> x > t_{i - 1} AND x <= deadline)) AS t_{i}"
        )
    # DuckDB resolves lateral column references via chained CTEs
    chain = []
    prev = "per_user"
    chain.append(
        f"s0 AS (SELECT *, ts_0[1] AS t_0, ts_0[1] + INTERVAL {within} AS deadline FROM per_user)"
    )
    for i in range(1, len(steps)):
        chain.append(
            f"s{i} AS (SELECT *, list_min(list_filter(ts_{i}, "
            f"x -> x > t_{i - 1} AND x <= deadline)) AS t_{i} FROM s{i - 1})"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {i} AS step_idx, '{s}' AS step, n_{i} AS n_users, "
        f"ROUND(CAST(n_{i} AS DOUBLE) / n_0, 6) AS conversion FROM counts"
        for i, s in enumerate(steps)
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         {collects}
  FROM events WHERE event_type IN ({step_list})
  GROUP BY user_id
), {", ".join(chain)},
counts AS (
  SELECT {", ".join(f"COUNT(t_{i}) AS n_{i}" for i in range(len(steps)))} FROM s{len(steps) - 1}
)
{unions}
"""


FUNNEL_SQL = _funnel_sql()
