"""Structured Streaming surface.

The reference evaluates one state batch at a time, synchronously
(SURVEY §2.11): no watermarks, windows or late-data handling exist
there. Spark gives those for free, and the batch operators in
mito_spark.operators.events are written against expressions
(session_window / window / groupBy-agg) that plan identically under
readStream — these wrappers wire them to streams.

Scale posture: state lives in the executor state store (RocksDB on a
real cluster), never the driver; watermarks bound state size; sinks
go through foreachBatch so every existing batch writer works.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_events_from_parquet(spark: SparkSession, sf_dir: str, schema=None) -> DataFrame:
    """readStream over the events directory — the file-source twin of
    load_table(..., 'events'). maxFilesPerTrigger=1 keeps micro-batches
    bounded; the nanos→micros conversion matches the batch path."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    df = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        # the streaming file source needs a directory; select only the
        # events files out of it
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # watermarks require TIMESTAMP (with local-tz semantics); the
        # parquet writer may emit tz-less micros which Spark 4 infers
        # as NTZ. Session tz is UTC so the instant is unchanged.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def windowed_counts(events: DataFrame, window: str = "1 day",
                    watermark: str = "1 hour") -> DataFrame:
    """Event-time tumbling-window counts with a watermark: the
    streaming twin of operators.events.user_activity_windows. The
    watermark bounds state: windows older than max(event_time)-
    watermark are finalized and evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
    )


def windowed_distinct_users(events: DataFrame, window: str = "1 day",
                            watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of the sketch tier
    (operators.sketches.sketch_distinct_profile): per-window
    approximate distinct users. approx_count_distinct's HLL partials
    live in the state store per open window and merge incrementally per
    micro-batch — exact COUNT(DISTINCT) is unsupported in streaming
    precisely because its state is unbounded; the sketch IS the
    streaming-shaped answer. Watermark evicts finalized windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("users_approx"))
        .select(F.col("w.start").alias("window_start"), "event_type", "users_approx")
    )


def streaming_sessionize(events: DataFrame, gap: str = "30 minutes",
                         watermark: str = "1 hour") -> DataFrame:
    """Streaming session windows — same session_window expression as
    the batch operator, so batch and stream agree by construction."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


class ChannelSink:
    """``send_to(name)`` / ``close(name)`` (reference lib/send.go:31-56):
    values pushed to a named channel consumed by the host.

    Spark-first: a named foreachBatch sink. ``send_to`` attaches the
    sink to a stream; the host's ``consume`` callback receives each
    micro-batch DataFrame (the channel), and ``close`` stops the query
    (the reference's close-channel signal).
    """

    def __init__(self, name: str, consume: Callable[[DataFrame, int], Any]):
        self.name = name
        self.consume = consume
        self.query = None

    def send_to(self, df: DataFrame, checkpoint: str | None = None,
                output_mode: str | None = None, **trigger: Any):
        writer = df.writeStream.foreachBatch(self._on_batch).queryName(self.name)
        if output_mode:
            writer = writer.outputMode(output_mode)
        if checkpoint:
            writer = writer.option("checkpointLocation", checkpoint)
        if trigger:
            writer = writer.trigger(**trigger)
        self.query = writer.start()
        return self.query

    def _on_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        self.consume(batch_df, batch_id)

    def close(self) -> None:
        if self.query is not None:
            self.query.stop()
            self.query = None


def run_stream_to_list(df: DataFrame, timeout_s: float = 120.0) -> list:
    """Test helper: drain a streaming DataFrame with availableNow into
    a list of Rows (driver-side — test scale only).

    Uses complete output mode so windows still open when input is
    exhausted (the watermark never passes the final window in a finite
    replay) are emitted too; each batch's output is the full result, so
    only the last batch is kept."""
    rows: list = []

    def on_batch(b: DataFrame, _i: int) -> None:
        rows[:] = b.collect()

    sink = ChannelSink("collector", on_batch)
    q = sink.send_to(df, output_mode="complete", availableNow=True)
    q.awaitTermination(timeout_s)
    sink.close()
    return rows


def stream_stream_join(left: DataFrame, right: DataFrame,
                       on: str, left_ts: str = "ts", right_ts: str = "ts",
                       watermark: str = "1 hour", within: str = "30 minutes") -> DataFrame:
    """Watermarked stream-stream inner join: each side buffers only
    rows younger than its watermark, and the time-bound predicate lets
    the engine evict state — unbounded joins are refused by Spark for
    exactly the reason they'd die at scale."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.select(
        F.col(on).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[c for c in right.columns if c not in (on, right_ts)],
    ).withWatermark("_rts", watermark)
    cond = (
        (F.col(on) == F.col("_rk"))
        & (F.col("_rts") >= F.col(left_ts) - F.expr(f"INTERVAL {within}"))
        & (F.col("_rts") <= F.col(left_ts) + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, cond, "inner").drop("_rk")


def streaming_dedup(events: DataFrame, keys: list[str],
                    ts_col: str = "ts", watermark: str = "1 hour") -> DataFrame:
    """Exactly-once-per-key within the watermark horizon
    (dropDuplicatesWithinWatermark): the streaming twin of exact dedup
    — state holds one entry per key and is evicted once the watermark
    passes, so memory is bounded by the horizon, not the stream."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def streaming_near_dup(docs: DataFrame, text_col: str = "text",
                       ts_col: str = "ts", watermark: str = "1 hour",
                       bits: int = 60) -> DataFrame:
    """Streaming NEAR-duplicate suppression: the streaming twin of
    batch simhash dedup (operators/dedup.py). Each document's
    ``bits``-bit SimHash signature becomes the dedup key for
    dropDuplicatesWithinWatermark — documents whose token multisets
    agree (signature-identical near-dups) collapse to the first
    arrival inside the watermark horizon.

    Scale/state shape: state is one entry per DISTINCT signature seen
    within the horizon (evicted by watermark), not per document; the
    signature itself is the same map-side JVM column program as the
    batch path, so the stream adds zero Python and zero extra
    shuffles beyond the dedup exchange. Hamming-adjacent (not
    signature-identical) near-dups need the batch pigeonhole pass —
    the streaming tier deliberately trades that recall for bounded
    per-row state, the same trade dropDuplicatesWithinWatermark makes
    for exact keys."""
    from mito_spark.operators.dedup import simhash_signature

    return (
        docs.withColumn("_sig", simhash_signature(F.col(text_col), bits=bits))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_sig"])
    )
