"""Event-stream operators over the `events` table — the batch twins of
the streaming surface (mito is a message-stream processor; its events
are dynamic JSON documents, SURVEY.md §1.1). Each of these also runs
unchanged on a readStream DataFrame (see mito_spark.streaming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group events by type: count + exact-decimal value stats.

    100 TB posture: ~6 groups → partial agg collapses everything
    map-side; shuffle is a few KB regardless of input size.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


EVENTS_BY_TYPE_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-JSON field extraction (mito `state.?props.?k` /
    decode_json, lib/json.go:249-266): point lookup with
    get_json_object — no full JSON decode, no Python; per-user sum of
    the extracted metric.

    100 TB posture: get_json_object is a JVM scalar over the string —
    one pass, codegen'd; shuffle only for the final per-user agg.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.select("user_id", k.alias("k"))
        .groupBy("user_id")
        .agg(F.sum("k").alias("k_sum"), F.count(F.lit(1)).alias("n_events"))
    )


EVENTS_PROPS_SQL = """
SELECT user_id, CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


SESSION_GAP_MINUTES = 30


def sessionize(
    spark: SparkSession, sf_dir: str, gap_minutes: int = SESSION_GAP_MINUTES
) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap.

    Implemented with the built-in `session_window` (the same operator
    Structured Streaming uses for streaming sessions, so the batch and
    streaming paths share semantics and code). One shuffle on user_id;
    state never touches the driver.

    Output: one row per (user_id, session) with event count and the
    session's event-time span. session_window.end = last event + gap by
    definition, so we report last_ts = end - gap for oracle parity.
    """
    ev = load_table(spark, sf_dir, "events")
    gap = f"{gap_minutes} minutes"
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("session_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            (F.col("w.end") - F.expr(f"INTERVAL {gap_minutes} MINUTES")).alias("last_ts"),
            "n_events",
            "session_value",
        )
    )


# Oracle: classic lag/cumulative-sum sessionization — a different
# algorithm computing the same sessions, which is exactly what makes it
# a good cross-check.
SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {SESSION_GAP_MINUTES} MINUTE THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
FROM numbered GROUP BY user_id, session_id
"""


def user_activity_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed event-time windows (tumbling 1 day): the batch form of the
    streaming windowed aggregate; window() is the same expression
    Structured Streaming plans with a watermark."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("day"), "event_type", "n_events")
    )


USER_ACTIVITY_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def events_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity rollup: hour → day → grand
    total per event_type, one pass (ROLLUP grouping sets — a single
    shuffle; partial aggregation collapses each set map-side).

    100 TB posture: the continuous-aggregate pattern is to PERSIST the
    finest grain (hour) partitioned by day and re-aggregate coarser
    grains from it (see sources/sinks.py partitioned writes +
    sketches.merge_hll_sketches for the mergeable-distinct variant);
    this query is the one-shot form whose results match that pipeline
    bit-for-bit because the sums are decimal-exact."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    hour = F.date_trunc("hour", F.col("ts"))
    return (
        ev.select(day.alias("day"), hour.alias("hour"), "event_type", "value")
        .rollup("day", "hour")
        .agg(
            F.grouping("day").cast("int").alias("g_day"),
            F.grouping("hour").cast("int").alias("g_hour"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("total_value"),
        )
        .select("day", "hour", "g_day", "g_hour", "n_events", "total_value")
    )


TIME_ROLLUP_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
       CAST(GROUPING(date_trunc('day', ts)) AS INT) AS g_day,
       CAST(GROUPING(date_trunc('hour', ts)) AS INT) AS g_hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP (date_trunc('day', ts), date_trunc('hour', ts))
"""


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles of event value per type (linear interpolation,
    the quantile_cont definition both engines share). Exact percentile
    requires a sort per group — fine for bounded group counts; for
    100 TB high-cardinality groups the drop-in is approx_percentile
    (t-digest sketch: one pass, mergeable, no sort), which the oracle
    can't hash-match and so isn't the checked form here."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.percentile("value", 0.5), 6).alias("p50"),
            F.round(F.percentile("value", 0.9), 6).alias("p90"),
            F.round(F.percentile("value", 0.99), 6).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
    )


PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


ANOMALY_Z = 3.0


def events_value_anomalies(
    spark: SparkSession, sf_dir: str, z: float = ANOMALY_Z
) -> DataFrame:
    """Population z-score anomaly detection per event type: events
    whose ``value`` deviates more than ``z`` standard deviations from
    their type's mean are anomalies; output is the per-type detection
    manifest (n, mean, std, n_anomalies).

    Determinism: moments are computed from DECIMAL-cast exact sums
    (round-9 value, round-9 value², the repo's decimal-sum convention)
    so mean/std are order-free and both engines agree bit-for-bit —
    stddev_pop over doubles would be partition-order-dependent.

    Plan shape: one groupBy(event_type) for the 5-row stats table,
    broadcast back onto the scan for the anomaly count — the big side
    shuffles once (the second groupBy re-uses the first's key)."""
    ev = load_table(spark, sf_dir, "events")
    v = F.col("value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(v, 9).cast("decimal(38,9)")).alias("_s"),
        F.sum(F.round(v * v, 9).cast("decimal(38,9)")).alias("_sq"),
    )
    mean = F.col("_s").cast("double") / F.col("n_events")
    var = F.col("_sq").cast("double") / F.col("n_events") - mean * mean
    stats = stats.withColumn("_mean", mean).withColumn(
        "_std", F.sqrt(F.greatest(var, F.lit(0.0)))
    )
    flagged = (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(v - F.col("_mean")) > F.lit(z) * F.col("_std"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_anomalies"))
    )
    return (
        stats.join(flagged, "event_type", "left")
        .select(
            "event_type",
            "n_events",
            F.round("_mean", 6).alias("mean_value"),
            F.round("_std", 6).alias("std_value"),
            F.coalesce("n_anomalies", F.lit(0)).alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


ANOMALIES_SQL = f"""
WITH stats AS (
  SELECT event_type,
         COUNT(*) AS n_events,
         SUM(CAST(ROUND(value, 9) AS DECIMAL(38,9))) AS s,
         SUM(CAST(ROUND(value * value, 9) AS DECIMAL(38,9))) AS sq
  FROM events GROUP BY event_type
), m AS (
  SELECT event_type, n_events,
         CAST(s AS DOUBLE) / n_events AS mean,
         sqrt(GREATEST(CAST(sq AS DOUBLE) / n_events
              - (CAST(s AS DOUBLE) / n_events) * (CAST(s AS DOUBLE) / n_events), 0.0)) AS std
  FROM stats
), flagged AS (
  SELECT e.event_type, COUNT(*) AS n_anomalies
  FROM events e JOIN m USING (event_type)
  WHERE abs(e.value - m.mean) > {ANOMALY_Z} * m.std
  GROUP BY e.event_type
)
SELECT m.event_type, m.n_events,
       ROUND(m.mean, 6) AS mean_value,
       ROUND(m.std, 6) AS std_value,
       COALESCE(f.n_anomalies, 0) AS n_anomalies
FROM m LEFT JOIN flagged f USING (event_type)
ORDER BY m.event_type
"""


RETRANSMIT_EPS_S = 900


def events_retransmit_dedup(
    spark: SparkSession, sf_dir: str, eps_s: int = RETRANSMIT_EPS_S
) -> DataFrame:
    """Retransmission dedup: flag events of the same (user_id,
    event_type) arriving within ``eps_s`` seconds of the previous raw
    occurrence — the at-least-once-delivery cleanup every event
    pipeline runs before aggregation (the reference's streaming inputs
    are explicitly at-least-once; its dedup story is the user's
    fingerprint filter, SURVEY.md §2.11).

    Semantics: LAG-based — the gap is measured to the previous RAW
    event, not the previous kept one (true debounce is iterative; the
    LAG form is the standard one-pass approximation and is what the
    streaming twin's per-key state implements with one timestamp of
    state). One shuffle on (user_id, event_type); the window never
    leaves the key partition, so the plan scales with keys, not rows.

    Output: the DROPPED rows (the retransmission manifest) with the
    offending gap in seconds.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    # timestampdiff, not unix_micros: ts is TIMESTAMP_NTZ (nanos
    # truncated to micros in load_table) and unix_micros rejects NTZ.
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            "ts",
            F.lag("ts").over(w).alias("prev_ts"),
        )
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round(
                F.expr("timestampdiff(MICROSECOND, prev_ts, ts)").cast("double")
                / F.lit(1_000_000.0),
                6,
            ).alias("gap_s"),
        )
        .where(F.col("gap_s") <= eps_s)
    )


RETRANSMIT_SQL = f"""
WITH g AS (
  SELECT event_id, user_id, event_type,
         ROUND(CAST(epoch(ts - LAG(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS DOUBLE), 6) AS gap_s
  FROM events
)
SELECT event_id, user_id, event_type, gap_s
FROM g WHERE gap_s <= {RETRANSMIT_EPS_S}
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity week
    (their cohort), then for each (cohort_week, weeks_since) the count
    of cohort users active in that later week — the triangle matrix
    every product-analytics engine renders as the retention heatmap.

    Plan: one (user, week) distinct rollup; per-user cohort = MIN over
    that (a second pass over the SAME user-keyed shuffle output, not
    the raw events); the cohort join is user-keyed; the final rollup
    is on (cohort_week, weeks_since) — bounded by weeks², tiny at any
    corpus size. Three shuffles total, none corpus-wide beyond the
    first distinct.

    week_diff counts whole 7-day periods between the date_trunc'd
    week starts (exact integer arithmetic on dates — engine-portable,
    no timestamp subtraction rounding).
    """
    ev = load_table(spark, sf_dir, "events")
    uw = (
        ev.select("user_id", F.date_trunc("week", F.col("ts")).alias("week"))
        .distinct()
    )
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .select(
            "cohort_week",
            (
                F.datediff(F.to_date("week"), F.to_date("cohort_week")) / 7
            ).cast("int").alias("weeks_since"),
            "user_id",
        )
        .groupBy("cohort_week", "weeks_since")
        .agg(F.count_distinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "weeks_since")
    )


RETENTION_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events
), cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM uw GROUP BY user_id
)
SELECT c.cohort_week,
       CAST(date_diff('day', CAST(c.cohort_week AS DATE), CAST(u.week AS DATE)) / 7 AS INTEGER) AS weeks_since,
       COUNT(DISTINCT u.user_id) AS n_users
FROM uw u JOIN cohort c USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""


ROLLING_DAYS = 7


def events_rolling_window(
    spark: SparkSession, sf_dir: str, days: int = ROLLING_DAYS
) -> DataFrame:
    """Per-event trailing ``days``-day rollup per user — the classic
    'activity in the last N days as of each event' feature every
    feature-store pipeline materializes. This is a RANGE window frame
    (value-based, microsecond key), not ROWS: all events inside the
    time interval count, however many there are, and equal-timestamp
    peers are included identically on both engines (RANGE frames are
    peer-inclusive by definition — the property that makes the result
    deterministic under ties).

    One shuffle on user_id; the frame key is epoch MICROSECONDS as a
    bigint (timestampdiff on the NTZ column — unix_micros rejects NTZ;
    DuckDB's epoch_us is the exact mirror), so frame membership is
    exact, not seconds-truncated. The windowed sum is decimal-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    span = days * 86400 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us"))
        .rangeBetween(-span, 0)
    )
    return (
        ev.select("event_id", "user_id", "ts", "value", us.alias("us"))
        .select(
            "event_id",
            "user_id",
            "ts",
            F.count(F.lit(1)).over(w).alias("n_events_trailing"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(w)
            .cast("double")
            .alias("value_trailing"),
        )
    )


ROLLING_SQL = f"""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_events_trailing,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS value_trailing
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {ROLLING_DAYS * 86400 * 1000000} PRECEDING AND CURRENT ROW)
"""


EWMA_ALPHA = "0.3"

# Route users whose OBSERVED-ACTIVE-DAY count exceeds this through the
# linear applyInPandas kernel: the JVM array-append fold is O(D²) in
# element copies (VERDICT r7 wrong#3) — microscopic for calendar-bounded
# histories (3 years of daily activity = 1.2e6 copies) but enforced
# here rather than assumed, the BPE_FOLD_MAX_TOKENS discipline. The
# probe reads one MAX(size) off the checkpointed per-user arrays, so
# the gate corpus (max ~tens of active days) keeps the single-
# projection fold plan with no union and no empty Python stage.
EWMA_FOLD_MAX_DAYS = 1024


def _ewma_decimal_literals(alpha: str) -> tuple[str, str]:
    """Validate and derive the (α, 1−α) decimal literal strings. Both
    are evaluated as DECIMAL(5,4) (ADVICE r7 #2): a decimal(5,4) ×
    decimal(28,9) product has precision 33 / scale 13 — inside Spark's
    38-digit exact range — whereas decimal(10,9) literals pushed the
    product past precision 38, silently re-scaled to 17, and could
    diverge from DuckDB (which keeps more scale) by 1 ULP at the
    9dp round for high-precision alphas. Hence the supported contract:
    alpha carries at most 4 decimal places."""
    from decimal import Decimal

    a = Decimal(alpha)
    if not (0 < a < 1):
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    if -a.as_tuple().exponent > 4:
        raise ValueError(
            f"alpha supports at most 4 decimal places (decimal(5,4) "
            f"exactness contract), got {alpha}"
        )
    b = Decimal(1) - a
    return str(a), str(b)


def _ewma_kernel_factory(a_str: str, b_str: str):
    """The linear per-user EWMA kernel (applyInPandas): Python Decimal
    arithmetic at high precision reproduces the JVM decimal fold
    bit-for-bit — products are exact (scale 13), the 9dp HALF_UP round
    matches Spark's decimal ROUND, and the final double casts are both
    correctly-rounded nearest."""
    import pandas as pd

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from decimal import ROUND_HALF_UP, Decimal, localcontext

        a, b = Decimal(a_str), Decimal(b_str)
        q9 = Decimal("1e-9")
        pdf = pdf.sort_values("day")
        out_day, out_x, out_e = [], [], []
        with localcontext() as ctx:
            ctx.prec = 60  # keep every product/sum exact pre-round
            e = None
            for day, x in zip(pdf["day"], pdf["xd"]):
                x = x if isinstance(x, Decimal) else Decimal(str(x))
                e = x if e is None else (a * x + b * e).quantize(
                    q9, rounding=ROUND_HALF_UP
                )
                out_day.append(day)
                out_x.append(float(x))
                out_e.append(float(e))
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].iloc[:1].repeat(len(out_day)).values,
                "day": pd.to_datetime(out_day),
                "daily_value": out_x,
                "ewma": out_e,
            }
        )

    return kernel


def events_user_ewma(
    spark: SparkSession,
    sf_dir: str,
    alpha: str = EWMA_ALPHA,
    fold_max_days: int | None = None,
) -> DataFrame:
    """Per-user exponentially weighted moving average of daily activity
    value — the classic time-series smoothing feature (e_t = α·x_t +
    (1−α)·e_{t−1}, seeded e_0 = x_0) a feature store materializes
    beside the trailing-window rollup. EWMA is a RECURRENCE, not a
    frame aggregate: no SQL window frame expresses it, so this is the
    engine's recursive-per-key showcase.

    Semantics: the recurrence runs over OBSERVED days (gap days do not
    decay the average — the 'ignore missing' convention; a
    calendar-decay variant is a date-spine join away).

    The recurrence runs ENTIRELY in decimal: α is a DECIMAL(5,4)
    literal (hence the string parameter; ≤4 decimal places enforced —
    ADVICE r7 #2: a (5,4)×(28,9) product is exact at scale 13, while
    (10,9) literals overflowed precision 38 and could diverge 1 ULP
    from DuckDB for high-precision alphas), daily sums are
    DECIMAL(18,4), and each step is α·x + (1−α)·e rounded back to
    scale 9 — exact arithmetic, so both engines hold the same number
    at every step by construction. A double recurrence with per-step
    ROUND was tried first and diverged by 1 ULP on ~0.3% of rows.

    Scale shape: one shuffle to daily sums, one user-keyed rollup into
    a day-ordered array (checkpointed), then per user either the JVM
    array fold (D ≤ ``fold_max_days`` observed days — O(D²) element
    copies with a tiny constant) or, for histories that exceed the
    bound, a linear Python-decimal applyInPandas kernel (VERDICT r7
    wrong#3: the bound is enforced, not assumed — same probe-once
    discipline as BPE_FOLD_MAX_TOKENS, so the common all-short case
    keeps the single-projection fold plan with no union and no empty
    Python stage).
    """
    if fold_max_days is None:
        fold_max_days = EWMA_FOLD_MAX_DAYS
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("xd")
    )
    return _ewma_over_daily(daily, alpha, fold_max_days).orderBy("user_id", "day")


def _ewma_over_daily(
    daily: DataFrame, alpha: str, fold_max_days: int
) -> DataFrame:
    """The shared EWMA machinery over a (user_id, day, xd DECIMAL(18,4))
    frame — observed-days and calendar-spine variants differ only in
    which daily frame they feed in. Returns the unordered
    (user_id, day, daily_value, ewma) rows: JVM decimal fold for users
    within ``fold_max_days``, the linear Python-decimal kernel beyond
    it (probe-once, so the common all-short case keeps the single-
    projection plan)."""
    a_str, b_str = _ewma_decimal_literals(alpha)
    a_lit = F.lit(a_str).cast("decimal(5,4)")
    b_lit = F.lit(b_str).cast("decimal(5,4)")
    arr = daily.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("day", F.col("xd").cast("decimal(28,9)").alias("x"))
            )
        ).alias("l")
    ).localCheckpoint()
    fold = F.aggregate(
        F.col("l"),
        F.array().cast("array<decimal(28,9)>"),
        lambda acc, s: F.concat(
            acc,
            F.array(
                F.when(F.size(acc) == 0, s.getField("x")).otherwise(
                    F.round(
                        a_lit * s.getField("x") + b_lit * F.element_at(acc, -1), 9
                    ).cast("decimal(28,9)")
                )
            ),
        ),
    )

    def fold_rows(frame: DataFrame) -> DataFrame:
        staged = frame.select("user_id", "l", fold.alias("e")).localCheckpoint()
        z = staged.select("user_id", F.explode(F.arrays_zip("l", "e")).alias("p"))
        return z.select(
            "user_id",
            F.col("p.l.day").cast("timestamp").alias("day"),
            F.col("p.l.x").cast("double").alias("daily_value"),
            F.col("p.e").cast("double").alias("ewma"),
        )

    max_days = arr.agg(F.max(F.size("l"))).first()[0] or 0
    if max_days <= fold_max_days:
        out = fold_rows(arr)
    else:
        is_long = F.size("l") > fold_max_days
        short = fold_rows(arr.where(~is_long))
        long_users = (
            arr.where(is_long)
            .select("user_id", F.explode("l").alias("p"))
            .select("user_id", F.col("p.day").alias("day"), F.col("p.x").alias("xd"))
            .groupBy("user_id")
            .applyInPandas(
                _ewma_kernel_factory(a_str, b_str),
                schema="user_id long, day timestamp, daily_value double, ewma double",
            )
        )
        out = short.unionByName(long_users)
    return out


def events_user_ewma_calendar(
    spark: SparkSession,
    sf_dir: str,
    alpha: str = EWMA_ALPHA,
    fold_max_days: int | None = None,
) -> DataFrame:
    """Calendar-decay EWMA — the date-spine twin events_user_ewma's
    docstring promises: gap days DO decay the average. Each user's
    daily series is completed to every calendar day between their
    first and last observed day (x = 0 on inactive days), then the
    same exact-decimal recurrence runs over the spine — so a user who
    goes quiet sees their smoothed activity decay toward zero at rate
    (1−α) per day instead of freezing at its last observed value (the
    feature-store semantics for staleness-aware activity features).

    Output: one row per CALENDAR day in each user's span
    (user_id, day, daily_value — 0.0 on gap days — and ewma).

    Scale shape: the spine explode is bounded by users × calendar span
    (years → ~10³ rows/user, the same bound the fold threshold
    enforces); the left join back to observed days is user+day keyed;
    everything downstream reuses the audited _ewma_over_daily
    machinery, including the linear-kernel route for spans past
    ``fold_max_days``."""
    if fold_max_days is None:
        fold_max_days = EWMA_FOLD_MAX_DAYS
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,4)")).alias("xd")
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    completed = spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("xd", F.lit(0).cast("decimal(18,4)")).alias("xd"),
    )
    return _ewma_over_daily(completed, alpha, fold_max_days).orderBy(
        "user_id", "day"
    )


def _ewma_calendar_sql(alpha: str = EWMA_ALPHA) -> str:
    """Oracle: the observed-daily CTE completed to a per-user calendar
    spine (DuckDB generate_series, 1-day step), zeros on gap days,
    then the identical list_reduce recurrence."""
    spine = """
WITH obs AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,4))) AS xd
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY user_id
), spine AS (
  SELECT user_id, CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
                                              CAST(d1 AS TIMESTAMP),
                                              INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
), daily AS (
  SELECT s.user_id, s.day,
         CAST(COALESCE(o.xd, 0) AS DECIMAL(28,9)) AS x
  FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.day = s.day
)"""
    base = _ewma_sql(alpha)
    marker = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,9)) AS x
  FROM events GROUP BY 1, 2
)"""
    assert marker in base  # splice point; fail at import, not gate time
    return base.replace(marker, spine)


def _ewma_sql(alpha: str = EWMA_ALPHA) -> str:
    a, b = _ewma_decimal_literals(alpha)
    return f"""
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DECIMAL(28,9)) AS x
  FROM events GROUP BY 1, 2
), arr AS (
  SELECT user_id,
         list(day ORDER BY day) AS l_day,
         list(x ORDER BY day) AS l_x
  FROM arr_src GROUP BY user_id
), folded AS (
  SELECT user_id, l_day, l_x,
         list_reduce(
           list_transform(l_x, x -> [x]),
           (acc, el) -> acc || [CAST(ROUND(CAST({a} AS DECIMAL(5,4)) * el[1]
                                          + CAST({b} AS DECIMAL(5,4)) * acc[-1], 9) AS DECIMAL(28,9))]
         ) AS e
  FROM arr
)
SELECT user_id,
       CAST(unnest(l_day) AS TIMESTAMP) AS day,
       CAST(unnest(l_x) AS DOUBLE) AS daily_value,
       CAST(unnest(e) AS DOUBLE) AS ewma
FROM folded
ORDER BY user_id, day
""".replace("arr_src", "daily")


EWMA_SQL = _ewma_sql()
EWMA_CALENDAR_SQL = _ewma_calendar_sql()


def events_percentile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week value-percentile drift per event type — the
    events-side member of the drift-monitor family (text:
    source_token_drift, vectors: embedding_snapshot_drift, encoding:
    charset_profile): per (event_type, week) the exact p50/p95 plus
    their deltas vs the previous observed week. A tail percentile that
    walks week over week is the classic silent-regression signature
    (pricing change, client bug, unit drift) that a global percentile
    hides.

    Exact percentiles sort per (type, week) group — bounded group
    count; the 100 TB swap-in is approx_percentile (t-digest, one
    pass, mergeable), which the oracle can't hash-match and so isn't
    the checked form (the events_value_percentiles convention). The
    lag window runs over the types × weeks aggregate — never event
    rows. Deltas subtract the ALREADY-6dp-ROUNDED doubles (identical
    on both engines) and round again; first observed week reads NULL.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("week", F.col("ts")).alias("week")
    ).agg(
        F.round(F.percentile("value", 0.5), 6).alias("p50"),
        F.round(F.percentile("value", 0.95), 6).alias("p95"),
        F.count(F.lit(1)).alias("n"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    return agg.select(
        "event_type",
        "week",
        "p50",
        "p95",
        "n",
        F.round(F.col("p50") - F.lag("p50").over(w), 6).alias("d_p50"),
        F.round(F.col("p95") - F.lag("p95").over(w), 6).alias("d_p95"),
    ).orderBy("event_type", "week")


PERCENTILE_DRIFT_SQL = """
WITH agg AS (
  SELECT event_type, date_trunc('week', ts) AS week,
         ROUND(quantile_cont(value, 0.5), 6) AS p50,
         ROUND(quantile_cont(value, 0.95), 6) AS p95,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, week, p50, p95, n,
       ROUND(p50 - lag(p50) OVER (PARTITION BY event_type ORDER BY week), 6) AS d_p50,
       ROUND(p95 - lag(p95) OVER (PARTITION BY event_type ORDER BY week), 6) AS d_p95
FROM agg ORDER BY 1, 2
"""


# --- weekday seasonality (one-way ANOVA on the day-of-week factor) -----

_DOW_NAMES = ["mon", "tue", "wed", "thu", "fri", "sat", "sun"]


def events_seasonality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week SEASONALITY per event type — the telemetry
    decomposition a capacity planner or anomaly-threshold tuner needs
    before trusting any flat baseline: per type, the weekday
    amplitude (max − min of weekday means) and the share of value
    variance the weekday factor explains — one-way ANOVA eta² =
    between-group SS / total SS, the exact "how much of the signal is
    just the weekly cycle" number (an anomaly detector that ignores a
    high eta² type alarms every Saturday; cf. events_value_anomalies,
    whose z-scores assume a flat mean).

    Engine-parity notes recorded: day-of-week numbering DIVERGES
    between engines (Spark dayofweek is 1=Sunday, DuckDB's is
    0=Sunday), so dow derives arithmetically — (days-since-epoch + 3)
    mod 7, Monday = 0 (1970-01-01 was a Thursday) — identical integer
    arithmetic on both. All SS terms assemble from exact decimal sums
    (Σv, Σv², per-dow Σv) with double ops on the exact operands:
    TSS = Σv² − (Σv)²/n, BSS = Σ_d S_d²/n_d − (Σv)²/n. Peak/trough
    picked by windows over the ≤ 7-row per-type frame (never event
    rows), ties → smallest dow.

    Scale shape: ONE scan → (type, dow) decimal rollup (map-side
    combinable, ≤ |types|·7 groups) + a (type) rollup; windows and
    joins touch only the bounded group frames.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    dow = (
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) + F.lit(3)
    ) % 7

    def dec(c):
        return F.round(c, 9).cast("decimal(38,9)")

    base = ev.select("event_type", dow.alias("dow"), F.col("value").alias("v"))
    per_dow = base.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).alias("n_d"), F.sum(dec(F.col("v"))).alias("s_d")
    )
    per_type = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("v"))).alias("s"),
        F.sum(dec(F.col("v") * F.col("v"))).alias("ss"),
    )
    md = (F.col("s_d").cast("double") / F.col("n_d").cast("double")).alias("m_d")
    dowm = per_dow.select("event_type", "dow", "n_d", "s_d", md)
    from pyspark.sql import Window

    # windows over the <= 7-rows-per-type frame, never event rows
    wp = Window.partitionBy("event_type").orderBy(F.desc("m_d"), F.asc("dow"))
    wt = Window.partitionBy("event_type").orderBy(F.asc("m_d"), F.asc("dow"))
    names = F.array(*[F.lit(x) for x in _DOW_NAMES])
    picks = (
        dowm.withColumn("rp", F.row_number().over(wp))
        .withColumn("rt", F.row_number().over(wt))
        .withColumn(
            "bs",
            dec(
                F.col("s_d").cast("double")
                * F.col("s_d").cast("double")
                / F.col("n_d").cast("double")
            ),
        )
        .groupBy("event_type")
        .agg(
            F.max("m_d").alias("max_m"),
            F.min("m_d").alias("min_m"),
            F.sum("bs").alias("bss_raw"),
            F.max(F.when(F.col("rp") == 1, F.element_at(names, F.col("dow") + 1))).alias(
                "peak_dow"
            ),
            F.max(F.when(F.col("rt") == 1, F.element_at(names, F.col("dow") + 1))).alias(
                "trough_dow"
            ),
        )
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    tss = F.col("ss").cast("double") - s * s / n
    bss = F.col("bss_raw").cast("double") - s * s / n
    return (
        per_type.join(picks, "event_type")
        .select(
            "event_type",
            F.col("n").alias("n_events"),
            F.round(s / n, 6).alias("mean_value"),
            F.round(F.col("max_m") - F.col("min_m"), 6).alias("amplitude"),
            F.round(
                F.when(
                    tss > 0,
                    F.greatest(F.least(bss / tss, F.lit(1.0)), F.lit(0.0)),
                ),
                6,
            ).alias("seasonal_share"),
            "peak_dow",
            "trough_dow",
        )
        .orderBy("event_type")
    )


def _seasonality_sql() -> str:
    names = "[" + ", ".join(f"'{x}'" for x in _DOW_NAMES) + "]"
    return f"""
WITH base AS MATERIALIZED (
  SELECT event_type,
         (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) + 3) % 7 AS dow,
         value AS v
  FROM events WHERE value IS NOT NULL
), per_dow AS MATERIALIZED (
  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n_d,
         SUM(CAST(ROUND(v, 9) AS DECIMAL(38,9))) AS s_d
  FROM base GROUP BY event_type, dow
), per_type AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CAST(ROUND(v, 9) AS DECIMAL(38,9))) AS s,
         SUM(CAST(ROUND(v * v, 9) AS DECIMAL(38,9))) AS ss
  FROM base GROUP BY event_type
), dowm AS (
  SELECT event_type, dow, n_d, s_d,
         CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE) AS m_d,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE) DESC, dow ASC) AS rp,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE) ASC, dow ASC) AS rt
  FROM per_dow
), picks AS (
  SELECT event_type,
         MAX(m_d) AS max_m, MIN(m_d) AS min_m,
         SUM(CAST(ROUND(CAST(s_d AS DOUBLE) * CAST(s_d AS DOUBLE) / CAST(n_d AS DOUBLE), 9) AS DECIMAL(38,9))) AS bss_raw,
         MAX(CASE WHEN rp = 1 THEN ({names})[dow + 1] END) AS peak_dow,
         MAX(CASE WHEN rt = 1 THEN ({names})[dow + 1] END) AS trough_dow
  FROM dowm GROUP BY event_type
)
SELECT t.event_type,
       t.n AS n_events,
       ROUND(CAST(t.s AS DOUBLE) / t.n, 6) AS mean_value,
       ROUND(p.max_m - p.min_m, 6) AS amplitude,
       ROUND(CASE WHEN CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n > 0
                  THEN GREATEST(LEAST(
                    (CAST(p.bss_raw AS DOUBLE) - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n)
                    / (CAST(t.ss AS DOUBLE) - CAST(t.s AS DOUBLE) * CAST(t.s AS DOUBLE) / t.n), 1.0), 0.0)
             END, 6) AS seasonal_share,
       p.peak_dow, p.trough_dow
FROM per_type t JOIN picks p USING (event_type)
ORDER BY t.event_type
"""


SEASONALITY_SQL = _seasonality_sql()


# --- interarrival-time burstiness (the temporal Fano sibling) ----------


def events_interarrival_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interarrival-time profile per event type — the TEMPORAL
    sibling of ``quality.term_burstiness_report``: for a Poisson
    arrival process the interarrival gaps are exponential with
    CV = 1, so cv_gap >> 1 means bursty arrivals (batch jobs, retry
    storms, thundering herds) and cv_gap << 1 means a metronome
    (schedulers, heartbeats) — exactly the classification a
    rate-limiter or capacity planner needs before sizing for the
    MEAN rate (a bursty type's p99 concurrency is far above it; cf.
    the reference's rate-limit policies, lib/limit.go, which exist
    because arrivals are not uniform).

    Per type: gap count, mean gap, CV (population moments from exact
    decimal sums), and the max gap (outage/quiet-period indicator).
    Gaps derive from INTEGER microsecond timestamps (unix_micros /
    epoch_us — identical int64 arithmetic on both engines; float
    epoch seconds would round), converted to seconds only at the
    double division.

    Scale shape: the lag window is partitioned by event_type over
    event rows — inherent to "consecutive events per type" (the
    sessionize shape) and uniform across types; everything after is
    a |types|-row rollup of decimal moments. Ordering ties break on
    event_id, so duplicate timestamps cannot reorder between engines.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    # the integer microsecond key orders identically to ts, so the
    # window sorts on it directly
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    # timestampdiff, not unix_micros: ts is TIMESTAMP_NTZ and
    # unix_micros rejects NTZ (the rolling-window precedent)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    gaps = (
        ev.select("event_type", "event_id", us.alias("us"))
        .withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "event_type",
            ((F.col("us") - F.col("prev")).cast("double") / F.lit(1e6)).alias("g"),
        )
    )

    def dec(c):
        return F.round(c, 9).cast("decimal(38,9)")

    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum(dec(F.col("g"))).alias("s"),
        F.sum(dec(F.col("g") * F.col("g"))).alias("ss"),
        F.max("g").alias("mx"),
    )
    n = F.col("n_gaps").cast("double")
    mean = F.col("s").cast("double") / n
    var = F.greatest(F.col("ss").cast("double") / n - mean * mean, F.lit(0.0))
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mean, 6).alias("mean_gap_s"),
        F.round(F.try_divide(F.sqrt(var), mean), 6).alias("cv_gap"),
        F.round("mx", 6).alias("max_gap_s"),
    ).orderBy("event_type")


INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         CAST(us - LAG(us) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS DOUBLE) / 1e6 AS g
  FROM (SELECT event_type, event_id, ts, epoch_us(ts) AS us FROM events)
), agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         SUM(CAST(ROUND(g, 9) AS DECIMAL(38,9))) AS s,
         SUM(CAST(ROUND(g * g, 9) AS DECIMAL(38,9))) AS ss,
         MAX(g) AS mx
  FROM gaps WHERE g IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_gaps,
       ROUND(CAST(s AS DOUBLE) / n_gaps, 6) AS mean_gap_s,
       ROUND(sqrt(GREATEST(CAST(ss AS DOUBLE) / n_gaps
                 - (CAST(s AS DOUBLE) / n_gaps) * (CAST(s AS DOUBLE) / n_gaps), 0.0))
             / nullif(CAST(s AS DOUBLE) / n_gaps, 0), 6) AS cv_gap,
       ROUND(mx, 6) AS max_gap_s
FROM agg ORDER BY event_type
"""
