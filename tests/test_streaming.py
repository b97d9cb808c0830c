"""Structured Streaming twins + channel sinks + as-of join."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mito_spark.operators.asof import asof_join
from mito_spark.streaming.stream_ops import (
    ChannelSink,
    run_stream_to_list,
    streaming_sessionize,
    stream_events_from_parquet,
    windowed_counts,
)


def test_streaming_windowed_counts_match_batch(spark, sf_dir):
    from mito_spark.engine import load_table
    from mito_spark.operators.events import user_activity_windows

    stream = stream_events_from_parquet(spark, sf_dir)
    out = run_stream_to_list(windowed_counts(stream))
    batch = {
        (r.day, r.event_type): r.n_events
        for r in user_activity_windows(spark, sf_dir).collect()
    }
    streamed = {(r.window_start, r.event_type): r.n_events for r in out}
    assert streamed == batch  # same expression ⇒ same result, batch or stream


def test_streaming_sessionize_runs(spark, sf_dir):
    stream = stream_events_from_parquet(spark, sf_dir)
    rows = run_stream_to_list(streaming_sessionize(stream))
    assert len(rows) > 0
    assert all(r.n_events >= 1 for r in rows)


def test_channel_sink_send_to_close(spark, sf_dir):
    batches = []
    sink = ChannelSink("ch", lambda df, i: batches.append((i, df.count())))
    stream = stream_events_from_parquet(spark, sf_dir).select("event_id")
    q = sink.send_to(stream, availableNow=True)
    q.awaitTermination(120)
    sink.close()
    assert sink.query is None  # closed
    assert sum(n for _, n in batches) == 1000  # sf0.001 events


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00"), (1, "2024-01-01 00:30:00"), (2, "2024-01-01 00:10:00")],
        "k bigint, lt string",
    ).select("k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:05:00", 10.0), (1, "2024-01-01 00:20:00", 20.0),
         (3, "2024-01-01 00:00:00", 99.0)],
        "k bigint, rt string, v double",
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "v")
    out = asof_join(left, right, on="k", left_ts="lt", right_ts="rt", value_cols=["v"])
    got = {(r.k, r.lt.minute): r.right_v for r in out.collect()}
    assert got[(1, 10)] == 10.0   # most recent prior
    assert got[(1, 30)] == 20.0   # advances with time
    assert got[(2, 10)] is None   # no right rows for key


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 01:00:00")], "k bigint, lt string"
    ).select("k", F.col("lt").cast("timestamp").alias("lt"))
    right = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 5.0)], "k bigint, rt string, v double"
    ).select("k", F.col("rt").cast("timestamp").alias("rt"), "v")
    loose = asof_join(left, right, "k", "lt", "rt", ["v"]).collect()[0]
    tight = asof_join(left, right, "k", "lt", "rt", ["v"], tolerance="30 minutes").collect()[0]
    assert loose.right_v == 5.0
    assert tight.right_v is None  # match older than tolerance dropped


def test_per_key_cursor_matches_batch(spark, sf_dir):
    """The stateful per-key cursor, drained over micro-batches, must
    equal the batch groupBy — state carried through the store is the
    same computation as a shuffle-aggregate."""
    from mito_spark.engine import load_table
    from mito_spark.streaming.stateful import latest_rows, per_key_cursor

    stream = stream_events_from_parquet(spark, sf_dir)
    rows = []
    sink = ChannelSink("cursors", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(per_key_cursor(stream), output_mode="update", availableNow=True)
    q.awaitTermination(120)
    sink.close()
    final = latest_rows(rows)

    batch = {
        r.user_id: r
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.sum("value").alias("total_value"),
        )
        .collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        s = final[uid]
        assert s.n_events == b.n_events
        assert s.first_ts == b.first_ts and s.last_ts == b.last_ts
        assert abs(s.total_value - b.total_value) < 1e-6


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Self-join events↔events on user_id within ±30min: the streaming
    result (complete drain) must equal the equivalent batch join."""
    from mito_spark.engine import load_table
    from mito_spark.streaming.stream_ops import stream_stream_join

    left = stream_events_from_parquet(spark, sf_dir).select("user_id", "ts", "event_id")
    right = stream_events_from_parquet(spark, sf_dir).select(
        "user_id", "ts", F.col("event_id").alias("rid")
    )
    joined = stream_stream_join(left, right, on="user_id", within="30 minutes")
    rows = []
    sink = ChannelSink("ssj", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(joined.select("event_id", "rid"), availableNow=True)
    q.awaitTermination(120)
    sink.close()

    ev = load_table(spark, sf_dir, "events")
    l = ev.select("user_id", "ts", "event_id")
    r = ev.select(F.col("user_id").alias("u2"), F.col("ts").alias("ts2"), F.col("event_id").alias("rid"))
    batch = (
        l.join(r, (F.col("user_id") == F.col("u2"))
               & (F.col("ts2") >= F.col("ts") - F.expr("INTERVAL 30 minutes"))
               & (F.col("ts2") <= F.col("ts") + F.expr("INTERVAL 30 minutes")))
        .select("event_id", "rid")
    )
    got = {(r_.event_id, r_.rid) for r_ in rows}
    want = {(r_.event_id, r_.rid) for r_ in batch.collect()}
    assert got == want


def test_streaming_dedup_bounded_state(spark, sf_dir):
    from mito_spark.streaming.stream_ops import streaming_dedup

    stream = stream_events_from_parquet(spark, sf_dir)
    deduped = streaming_dedup(stream, ["user_id"], watermark="10 days")
    rows = []
    sink = ChannelSink("dedup", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(deduped.select("user_id"), availableNow=True)
    q.awaitTermination(120)
    sink.close()
    seen = [r.user_id for r in rows]
    assert len(seen) == len(set(seen))  # at most one row per user within horizon


def test_per_key_cursor_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Restart semantics: a second run over NEW files with the SAME
    checkpoint must resume per-key state, not recount — the engine-side
    guarantee behind the reference's carried-state loop."""
    from mito_spark.engine import load_table
    from mito_spark.streaming.stateful import latest_rows, per_key_cursor

    ev = load_table(spark, sf_dir, "events")
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    src = tmp_path / "src"
    ckpt = str(tmp_path / "ckpt")
    half1.coalesce(1).write.mode("overwrite").parquet(str(src))

    schema = ev.schema
    rows: list = []

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src))
        sink = ChannelSink("resume", lambda b, _i: rows.extend(b.collect()))
        q = sink.send_to(per_key_cursor(stream), checkpoint=ckpt,
                         output_mode="update", availableNow=True)
        q.awaitTermination(120)
        sink.close()

    run_once()                      # processes half1
    first = latest_rows(rows)
    # drop the second half in as new files, same checkpoint → resume
    half2.coalesce(1).write.mode("append").parquet(str(src))
    run_once()
    final = latest_rows(rows)

    batch = {
        r.user_id: r
        for r in ev.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value")
        ).collect()
    }
    assert set(final) == set(batch)
    for uid, b in batch.items():
        assert final[uid].n_events == b.n_events  # state carried, not recounted
        assert abs(final[uid].total_value - b.total_value) < 1e-6
    # and the first run genuinely saw only half the data
    assert sum(r.n_events for r in first.values()) < sum(r.n_events for r in final.values())


def test_tws_probe_evidence(spark):
    """Version-probe for transformWithState (VERDICT r2 #8 / r4 next#6):
    the JVM operator exists in this build — the gap is solely the
    Python state protocol's protobuf dependency, absent under the
    do-not-install policy. This asserts the probe result instead of
    silently skipping, so the evidence lands in every pytest run."""
    from pyspark.sql.group import GroupedData

    from mito_spark.streaming.tws import tws_available

    # API surface present in pyspark 4.1.2
    assert hasattr(GroupedData, "transformWithStateInPandas")
    # protocol dependency absent -> documented skip of the live twin
    try:
        from google.protobuf import descriptor  # noqa: F401

        have_protobuf = True
    except ImportError:
        have_protobuf = False
    assert tws_available() == have_protobuf
    if not have_protobuf:
        # the live query fails at Python state-server startup with
        # ImportError on google.protobuf.descriptor (captured r5);
        # sessionize's oracled batch twin + applyInPandasWithState
        # remain the active backends
        assert True


def test_timer_sessionization_matches_declarative(spark, sf_dir):
    """Timer-driven sessions (transformWithStateInPandas) must agree
    with the declarative session_window twin on closed sessions."""
    import pytest

    from mito_spark.streaming.tws import sessionize_with_timers, tws_available

    if not tws_available():
        pytest.skip("transformWithState needs google.protobuf (not in this container)")

    stream = stream_events_from_parquet(spark, sf_dir)
    rows = []
    sink = ChannelSink("tws", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(sessionize_with_timers(stream, gap_seconds=1800),
                     availableNow=True)
    q.awaitTermination(180)
    sink.close()

    declarative = {
        (r.user_id, r.session_start): r.n_events
        for r in run_stream_to_list(streaming_sessionize(stream, gap="30 minutes"))
    }
    got = {(r.user_id, r.session_start): r.n_events for r in rows}
    # timer sessions close only when the watermark passes; the final
    # still-open session per key never emits in a finite replay, so the
    # timer output must be a subset that agrees exactly where emitted
    assert got  # something closed
    for k, n in got.items():
        assert declarative.get(k) == n, f"session {k} disagrees"


def test_streaming_windowed_distinct_matches_batch_sketch(spark, sf_dir):
    """The streaming HLL estimate per window must equal the batch
    approx_count_distinct over the same slice — identical sketch,
    incrementally merged vs one-shot."""
    import pyspark.sql.functions as F

    from mito_spark.engine import load_table
    from mito_spark.streaming.stream_ops import windowed_distinct_users

    stream = stream_events_from_parquet(spark, sf_dir)
    streamed = {
        (r.window_start, r.event_type): r.users_approx
        for r in run_stream_to_list(windowed_distinct_users(stream))
    }
    ev = load_table(spark, sf_dir, "events")
    batch = {
        (r.day, r.event_type): r.users_approx
        for r in ev.groupBy(
            F.window("ts", "1 day").alias("w"), "event_type"
        )
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("users_approx"))
        .select(F.col("w.start").alias("day"), "event_type", "users_approx")
        .collect()
    }
    assert streamed == batch


def test_streaming_near_dup_collapses_signature_twins(spark, sf_dir, tmp_path):
    """Near-duplicate texts (identical token multisets → identical
    simhash) collapse to first arrival; distinct texts all survive."""
    from mito_spark.operators.dedup import simhash_signature
    from mito_spark.streaming.stream_ops import streaming_near_dup

    src = tmp_path / "docs"
    base = spark.createDataFrame(
        [
            (1, "alpha beta gamma", "2024-01-01 10:00:00"),
            (2, "alpha  beta   gamma", "2024-01-01 10:05:00"),  # ws-only twin
            (3, "delta epsilon zeta", "2024-01-01 10:10:00"),
            (4, "alpha beta gamma", "2024-01-01 10:15:00"),  # exact twin
            (5, "eta theta iota", "2024-01-01 10:20:00"),
        ],
        "doc_id long, text string, ts_s string",
    ).select("doc_id", "text", F.col("ts_s").cast("timestamp").alias("ts"))
    base.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(base.schema).parquet(str(src))
    out = streaming_near_dup(stream, watermark="1 hour")
    rows = []
    sink = ChannelSink("neardup", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(out.select("doc_id", "_sig"), availableNow=True)
    q.awaitTermination(120)
    sink.close()

    kept = sorted(r.doc_id for r in rows)
    assert kept == [1, 3, 5]  # 2 and 4 collapse into 1's signature
    # streaming signatures equal the batch column program's
    batch_sigs = {r.doc_id: r.s for r in base.select(
        "doc_id", simhash_signature(F.col("text")).alias("s")).collect()}
    for r in rows:
        assert r._sig == batch_sigs[r.doc_id]


def test_streaming_anomalies_match_python_welford(spark, sf_dir, tmp_path):
    """Prefix-moments anomaly stream vs an exact Python replay of the
    same Welford rule over the same per-user event order."""
    from mito_spark.engine import load_table
    from mito_spark.streaming.stateful import streaming_anomalies

    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    src = tmp_path / "src"
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    rows = []
    sink = ChannelSink("anom", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(streaming_anomalies(stream), output_mode="append", availableNow=True)
    q.awaitTermination(120)
    sink.close()
    got = {(r.user_id, r.event_id) for r in rows}

    # python replay (same order: event_id within each user)
    by_user: dict = {}
    for r in sorted(ev.collect(), key=lambda r: r.event_id):
        by_user.setdefault(r.user_id, []).append((r.event_id, r.value))
    want = set()
    for uid, evs in by_user.items():
        n, mean, m2 = 0, 0.0, 0.0
        for ev_id, v in evs:
            if n >= 10:
                std = (m2 / n) ** 0.5
                if std > 0 and abs(v - mean) > 3.0 * std:
                    want.add((uid, ev_id))
            n += 1
            d = v - mean
            mean += d / n
            m2 += d * (v - mean)
    assert got == want


def test_streaming_retransmit_matches_batch(spark, sf_dir, tmp_path):
    """The streaming manifest equals the batch twin's dropped set —
    same LAG-to-previous-raw-event rule, same eps."""
    from mito_spark.engine import load_table
    from mito_spark.operators.events import events_retransmit_dedup
    from mito_spark.streaming.stateful import streaming_retransmit_dedup

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    src = tmp_path / "retx_src"
    ev.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(ev.schema).parquet(str(src))
    rows = []
    sink = ChannelSink("retx", lambda b, _i: rows.extend(b.collect()))
    q = sink.send_to(
        streaming_retransmit_dedup(stream, eps_s=900.0),
        output_mode="append",
        availableNow=True,
    )
    q.awaitTermination(120)
    sink.close()
    got = {(r.user_id, r.event_type, r.event_id, r.gap_s) for r in rows}

    want = {
        (r.user_id, r.event_type, r.event_id, r.gap_s)
        for r in events_retransmit_dedup(spark, sf_dir, eps_s=900).collect()
    }
    assert got == want


def test_streaming_retransmit_multi_chunk_key(spark, sf_dir, tmp_path):
    """Force a key's micro-batch through MULTIPLE Arrow chunks
    (maxRecordsPerBatch=50 over a 400-event key) and require exact
    equality with the batch twin — per-chunk sorting would replay out
    of order and diverge (the bug the buffered sort fixed)."""
    import datetime as dt

    from mito_spark.operators.events import events_retransmit_dedup
    from mito_spark.streaming.stateful import streaming_retransmit_dedup

    base = dt.datetime(2024, 1, 1)
    # one key, 400 events, alternating small/large gaps; event_ids
    # deliberately NOT in ts order so chunk boundaries scramble time
    rows = []
    for i in range(400):
        ts = base + dt.timedelta(seconds=(i * 37) % 4000)
        rows.append((i, ts, 1, "click", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, value double, props string",
    )
    d = str(tmp_path / "retx_mc")
    ev.coalesce(1).write.parquet(d + "/events.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        stream = spark.readStream.schema(ev.schema).parquet(d + "/events.parquet")
        out = []
        sink = ChannelSink("retx_mc", lambda b, _i: out.extend(b.collect()))
        q = sink.send_to(
            streaming_retransmit_dedup(stream, eps_s=30.0),
            output_mode="append",
            availableNow=True,
        )
        q.awaitTermination(120)
        sink.close()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)

    got = {(r.event_id, r.gap_s) for r in out}
    want = {
        (r.event_id, r.gap_s)
        for r in events_retransmit_dedup(spark, d, eps_s=30).collect()
    }
    assert got == want and len(want) > 0


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    """Batch sessionize and the streaming session_window form must
    produce the SAME sessions (key, start, event count) — they share
    the session_window expression, so divergence would mean the stream
    wrapper (watermark / availableNow replay) changed semantics."""
    from mito_spark.operators.events import sessionize

    batch = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in sessionize(spark, sf_dir).collect()
    }
    stream = stream_events_from_parquet(spark, sf_dir)
    got = {
        (r["user_id"], r["session_start"], r["n_events"])
        for r in run_stream_to_list(streaming_sessionize(stream))
    }
    assert got == batch


def test_streaming_rolling_window_matches_batch_multibatch(spark, sf_dir, tmp_path):
    """VERDICT r6 next#5: the trailing-window feature materialization
    gets the batch-vs-stream equality treatment sessionize got —
    driven over THREE in-order micro-batches (maxFilesPerTrigger=1,
    mtime-staggered ts-range slices), per-event outputs must equal the
    batch RANGE frame exactly (count AND decimal-exact sum)."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.events import events_rolling_window
    from mito_spark.streaming.stateful import streaming_rolling_window

    ev = load_table(spark, sf_dir, "events").where("user_id < 30")
    d = str(tmp_path / "roll")
    dest = d + "/events.parquet"
    # three ts-ordered slices, written oldest-first with staggered
    # mtimes so the file source replays them as in-order micro-batches
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    span = (hi - lo) / 3
    cuts = [lo + span, lo + 2 * span]
    slices = [
        ev.where(F.col("ts") < cuts[0]),
        ev.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.where(F.col("ts") >= cuts[1]),
    ]
    seen: set = set()
    base_t = time.time()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            fp = os.path.join(dest, f)
            os.utime(fp, (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    out = []
    sink = ChannelSink("rollwin", lambda b, _i: out.extend(b.collect()))
    q = sink.send_to(streaming_rolling_window(stream), output_mode="append", availableNow=True)
    q.awaitTermination(180)
    sink.close()

    got = {(r.event_id, r.n_events_trailing, r.value_trailing) for r in out}
    want = {
        (r.event_id, r.n_events_trailing, r.value_trailing)
        for r in events_rolling_window(spark, d).collect()
    }
    assert len(got) == len(want) and got == want and len(want) > 100


def test_streaming_user_ewma_matches_batch_multibatch(spark, sf_dir, tmp_path):
    """VERDICT r7 next#6: the per-user EWMA recurrence as a stream —
    three ts-ordered micro-batches (slice cuts land mid-day, so open
    days SPAN batches and re-emit); the LAST update-mode row per
    (user, day) must equal the batch operator exactly (decimal-exact
    daily sum AND per-step-rounded ewma)."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.events import events_user_ewma
    from mito_spark.streaming.stateful import streaming_user_ewma

    ev = load_table(spark, sf_dir, "events").where("user_id < 30")
    d = str(tmp_path / "ewma")
    dest = d + "/events.parquet"
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    span = (hi - lo) / 3
    cuts = [lo + span, lo + 2 * span]
    slices = [
        ev.where(F.col("ts") < cuts[0]),
        ev.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.where(F.col("ts") >= cuts[1]),
    ]
    seen: set = set()
    base_t = time.time()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            fp = os.path.join(dest, f)
            os.utime(fp, (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    out = []
    sink = ChannelSink("ewmastream", lambda b, _i: out.extend(b.collect()))
    q = sink.send_to(streaming_user_ewma(stream), output_mode="update", availableNow=True)
    q.awaitTermination(180)
    sink.close()

    got = {}
    for r in out:  # update mode: later batches overwrite earlier rows
        got[(r.user_id, r.day)] = (r.daily_value, r.ewma)
    want = {
        (r.user_id, r.day): (r.daily_value, r.ewma)
        for r in events_user_ewma(spark, d).collect()
    }
    assert len(want) > 50 and got == want


def test_streaming_user_ewma_calendar_matches_batch_multibatch(spark, sf_dir, tmp_path):
    """Calendar-decay twin: three ts-ordered micro-batches; gap-day
    rows (x=0, decayed) must materialize exactly as the batch date
    spine produces them, and the LAST update-mode row per (user, day)
    must equal the batch operator bit-for-bit."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.events import events_user_ewma_calendar
    from mito_spark.streaming.stateful import streaming_user_ewma_calendar

    ev = load_table(spark, sf_dir, "events").where("user_id < 30")
    d = str(tmp_path / "ewmacal")
    dest = d + "/events.parquet"
    lo, hi = ev.selectExpr("min(ts)", "max(ts)").first()
    span = (hi - lo) / 3
    cuts = [lo + span, lo + 2 * span]
    slices = [
        ev.where(F.col("ts") < cuts[0]),
        ev.where((F.col("ts") >= cuts[0]) & (F.col("ts") < cuts[1])),
        ev.where(F.col("ts") >= cuts[1]),
    ]
    seen: set = set()
    base_t = time.time()
    for i, sl in enumerate(slices):
        sl.coalesce(1).write.mode("append").parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            fp = os.path.join(dest, f)
            os.utime(fp, (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    out = []
    sink = ChannelSink("ewmacalstream", lambda b, _i: out.extend(b.collect()))
    q = sink.send_to(
        streaming_user_ewma_calendar(stream), output_mode="update", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()

    got = {}
    for r in out:
        got[(r.user_id, r.day)] = (r.daily_value, r.ewma)
    want = {
        (r.user_id, r.day): (r.daily_value, r.ewma)
        for r in events_user_ewma_calendar(spark, d).collect()
    }
    # the calendar spine is strictly larger than the observed-day set
    # whenever any user has a quiet day — require real gap coverage
    assert sum(1 for (_, _day), (v, _) in want.items() if v == 0.0) > 0
    assert len(want) > 50 and got == want


def test_streaming_weighted_sample_matches_batch_any_order(spark, sf_dir, tmp_path):
    """The ES reservoir twin must equal the batch operator bit-for-bit
    after the full stream — under an ARBITRARY (doc_id mod 3,
    non-chronological) micro-batch split, since content-derived keys
    make the top-k merge order-independent. Each touched stratum
    re-emits its whole reservoir, so the LAST emission per source is
    the comparison unit (evicted docs have no retraction rows)."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.sampling import weighted_sample_es
    from mito_spark.streaming.stateful import streaming_weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    d = str(tmp_path / "ws")
    dest = d + "/documents.parquet"
    seen: set = set()
    base_t = time.time()
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            fp = os.path.join(dest, f)
            os.utime(fp, (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    latest: dict = {}

    def on_batch(b, _i):
        rows = b.collect()
        for src in {r.source for r in rows}:
            latest[src] = [r for r in rows if r.source == src]

    sink = ChannelSink("wsstream", on_batch)
    q = sink.send_to(
        streaming_weighted_sample(stream), output_mode="update", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()

    got = {
        (r.source, r.doc_id): (r.n_chars, r.es_key, r.es_rank)
        for rows in latest.values()
        for r in rows
    }
    want = {
        (r.source, r.doc_id): (r.n_chars, r.es_key, r.es_rank)
        for r in weighted_sample_es(spark, d).collect()
    }
    assert len(want) > 0 and got == want


def test_streaming_hll_distinct_matches_batch_any_order(spark, sf_dir, tmp_path):
    """The live HLL register summary must equal the batch
    hll_distinct_by bit-for-bit after the full stream, under a
    non-chronological (doc_id mod 3) split — register merge is MAX, so
    arrival order and batch boundaries cannot matter."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.sketches import hll_distinct_by
    from mito_spark.operators.text import _tokens
    from mito_spark.streaming.stateful import streaming_hll_distinct

    docs = load_table(spark, sf_dir, "documents")
    d = str(tmp_path / "hll")
    dest = d + "/documents.parquet"
    seen: set = set()
    base_t = time.time()
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
        .select(
            "source", F.explode(_tokens(F.lower(F.col("text")))).alias("item")
        )
    )
    latest: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            latest[r.source] = (r.n_hll, r.v_empty, r.branch)

    sink = ChannelSink("hllstream", on_batch)
    q = sink.send_to(
        streaming_hll_distinct(stream), output_mode="update", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()

    batch_items = docs.select(
        "source", F.explode(_tokens(F.lower(F.col("text")))).alias("item")
    )
    want = {
        r.source: (r.n_hll, r.v_empty, r.branch)
        for r in hll_distinct_by(batch_items, "source", "item").collect()
    }
    assert len(want) > 1 and latest == want


@pytest.mark.parametrize("n_files", [1, 3])
def test_streaming_paragraph_dedup_matches_batch_rank(
    spark, sf_dir, tmp_path, n_files
):
    """The live first-occurrence flag must equal the batch rank
    (rn > 1) on the SAME chunk frame after the full stream, under
    chronological (doc_id-range) splits at any micro-batch size —
    the in-order contract, like the EWMA twins."""
    import os
    import time

    from pyspark.sql import Window

    from mito_spark.engine import load_table
    from mito_spark.operators.dedup import PARA_CHUNK_TOKENS, _token_window_chunks
    from mito_spark.streaming.stateful import streaming_paragraph_dedup

    docs = load_table(spark, sf_dir, "documents")
    chunks = _token_window_chunks(docs, PARA_CHUNK_TOKENS)
    want = {
        (r.doc_id, r.chunk_idx): r.is_dup
        for r in chunks.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("h").orderBy(F.asc("doc_id"), F.asc("chunk_idx"))
            ),
        )
        .select("doc_id", "chunk_idx", (F.col("rn") > 1).alias("is_dup"))
        .collect()
    }
    n_docs = docs.agg(F.max("doc_id")).first()[0] + 1
    d = str(tmp_path / f"parastream{n_files}")
    dest = d + "/chunks.parquet"
    seen: set = set()
    base_t = time.time()
    for i in range(n_files):
        lo, hi = i * n_docs // n_files, (i + 1) * n_docs // n_files
        chunks.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)).coalesce(
            1
        ).write.mode("append").parquet(dest)
        for f in os.listdir(dest):
            if f not in seen:
                seen.add(f)
                os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    got: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            got[(r.doc_id, r.chunk_idx)] = r.is_dup

    sink = ChannelSink(f"parastream{n_files}", on_batch)
    q = sink.send_to(
        streaming_paragraph_dedup(stream), output_mode="append", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()
    assert got == want


def test_streaming_quantile_sketch_matches_batch_any_order(spark, sf_dir, tmp_path):
    """The live histogram's final estimates must equal the batch
    quantile sketch's est_* columns bit-for-bit after the full stream,
    under a non-chronological (event_id mod 3) split — bucket-count
    merge is ADDITION, so arrival order and batch boundaries cannot
    matter. Width is frozen from the batch derivation (max/bins), the
    deployment contract."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.sketches import (
        QS_BINS,
        quantile_sketch_calibration,
    )
    from mito_spark.streaming.stateful import streaming_quantile_sketch

    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("value")).collect()[0][0]
    width = mx / float(QS_BINS)

    d = str(tmp_path / "qsk")
    dest = d + "/ev.parquet"
    base_t = time.time()
    seen: set = set()
    for i in range(3):
        ev.select("event_id", "event_type", "value").where(
            F.col("event_id") % 3 == i
        ).coalesce(1).write.mode("append").parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
        .select("event_type", "value")
    )
    latest: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            latest[r.event_type] = (r.n, r.est_p50, r.est_p95, r.est_p99)

    sink = ChannelSink("qskstream", on_batch)
    q = sink.send_to(
        streaming_quantile_sketch(stream, width),
        output_mode="update",
        availableNow=True,
    )
    q.awaitTermination(180)
    sink.close()

    want = {
        r.event_type: (r.n, r.est_p50, r.est_p95, r.est_p99)
        for r in quantile_sketch_calibration(spark, sf_dir).collect()
    }
    assert len(want) > 1 and latest == want


def test_cdc_python_chunker_matches_jvm_frame(spark, sf_dir):
    """The stream-side Python chunker must reproduce the batch JVM
    chunk frame EXACTLY — same boundaries, same chunk order, same
    content — on the whole gate corpus."""
    import hashlib

    from mito_spark.engine import load_table
    from mito_spark.operators.dedup import CDC_WINDOW, _cdc_boundaries_py, _cdc_chunks

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # ADVICE r11: a doc of EXACTLY window length once chunked as
    # ['k', 'kqzmspdeu oqrx '] on the JVM side (sequence(2,1) is the
    # DESCENDING range [2,1]) while both the Python mirror and the
    # oracle saw one chunk — pin the guarded edge plus its neighbors
    edge = spark.createDataFrame(
        [
            (900001, "kkqzmspdeu oqrx "),
            (900002, "a" * (CDC_WINDOW - 1)),
            (900003, "b" * CDC_WINDOW),
            (900004, "c" * (CDC_WINDOW + 1)),
        ],
        "doc_id long, text string",
    )
    docs = docs.unionByName(edge)
    jvm = sorted(
        (r.doc_id, r.chunk_idx, hashlib.md5(r.chunk.encode()).hexdigest())
        for r in _cdc_chunks(docs).collect()
    )
    py = []
    for r in docs.select("doc_id", "text").collect():
        for k, c in enumerate(_cdc_boundaries_py(r.text or "")):
            py.append((r.doc_id, k, hashlib.md5(c.encode()).hexdigest()))
    assert jvm == sorted(py) and len(jvm) > 0


def test_streaming_cdc_dedup_matches_batch_rank(spark, sf_dir, tmp_path):
    """The live CDC first-occurrence flag must equal the batch rank
    (rn > 1) over the SAME chunk frame after the full stream, under
    chronological doc_id-range splits — the in-order contract shared
    with the paragraph twin."""
    import hashlib
    import os
    import time

    from pyspark.sql import Window

    from mito_spark.engine import load_table
    from mito_spark.operators.dedup import _cdc_chunks
    from mito_spark.streaming.stateful import streaming_cdc_chunk_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    d = str(tmp_path / "cdcstream")
    dest = d + "/docs.parquet"
    base_t = time.time()
    seen: set = set()
    cut = max_id // 3 + 1
    for i in range(3):
        docs.where(
            (F.col("doc_id") >= i * cut) & (F.col("doc_id") < (i + 1) * cut)
        ).coalesce(1).write.mode("append").parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    got: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            got[(r.doc_id, r.chunk_idx)] = (r.h, r.is_dup)

    sink = ChannelSink("cdcstream", on_batch)
    q = sink.send_to(
        streaming_cdc_chunk_dedup(stream), output_mode="append", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()

    chunks = _cdc_chunks(docs).select(
        "doc_id", "chunk_idx", F.md5("chunk").alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_idx")
    want = {
        (r.doc_id, r.chunk_idx): (r.h, r.rn > 1)
        for r in chunks.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert len(want) > 100 and got == want


def test_streaming_isotropy_matches_batch_any_order(spark, sf_dir, tmp_path):
    """The live isotropy monitor's final per-label emission must equal
    the batch embedding_isotropy_report run on that label's slice —
    bit-for-bit, under a non-chronological (vec_id mod 3) split: the
    fixed-point moment state merges by integer ADDITION, so arrival
    order and batch boundaries cannot matter."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.similarity import (
        _norm,
        embedding_isotropy_report,
    )
    from mito_spark.streaming.stateful import streaming_isotropy

    emb = load_table(spark, sf_dir, "embeddings")
    labels = sorted(r.label for r in emb.select("label").distinct().collect())
    want = {}
    for lb in labels:
        d = str(tmp_path / f"iso{lb}")
        emb.where(F.col("label") == lb).write.parquet(d + "/embeddings.parquet")
        r = embedding_isotropy_report(spark, d).collect()[0]
        want[lb] = tuple(r)

    d = str(tmp_path / "isostream")
    dest = d + "/emb.parquet"
    base_t = time.time()
    seen: set = set()
    for i in range(3):
        emb.where(F.col("vec_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
        .select("label", F.col("embedding").cast("array<double>").alias("x"))
        .select("label", "x", _norm(F.col("x")).alias("nm"))
        .where(F.col("nm") > 0)
        .select(
            "label", "nm", F.transform("x", lambda v: v / F.col("nm")).alias("u")
        )
    )
    latest: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            latest[r.label] = (
                r.n_vectors,
                r.mean_norm,
                r.norm_cv,
                r.mean_pairwise_cosine,
                r.centroid_norm,
            )

    sink = ChannelSink("isostream", on_batch)
    q = sink.send_to(
        streaming_isotropy(stream), output_mode="update", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()
    assert set(latest) == set(want) and len(want) >= 2
    assert latest == want


def test_streaming_burstiness_matches_batch_any_order(spark, sf_dir, tmp_path):
    """The live burstiness monitor's final per-term emission must
    equal the batch groupBy moments bit-for-bit under a
    non-chronological (doc_id mod 3) split — integer addition state,
    so arrival order and batch boundaries cannot matter; adaptation
    must also match term_burstiness_report's column on its rows."""
    import os
    import time

    from mito_spark.engine import load_table
    from mito_spark.operators.text import _tokens
    from mito_spark.operators.quality import term_burstiness_report
    from mito_spark.streaming.stateful import (
        burstiness_stream_rows,
        streaming_burstiness,
    )

    docs = load_table(spark, sf_dir, "documents")
    want = {
        r.w: (r.df, r.cf, r.s2)
        for r in docs.select(
            "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("w")
        )
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.sum(F.col("tf") * F.col("tf")).alias("s2"),
        )
        .collect()
    }

    d = str(tmp_path / "burststream")
    dest = d + "/docs.parquet"
    base_t = time.time()
    seen: set = set()
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = burstiness_stream_rows(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    latest: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            latest[r.term] = (r.df, r.cf, r.s2, r.adaptation)

    sink = ChannelSink("burststream", on_batch)
    q = sink.send_to(
        streaming_burstiness(stream), output_mode="update", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()
    assert set(latest) == set(want) and len(want) > 5
    for t, (df, cf, s2) in want.items():
        got = latest[t]
        assert got[:3] == (df, cf, s2), t
    report = {r.term: r.adaptation for r in term_burstiness_report(spark, sf_dir).collect()}
    for t, a in report.items():
        assert abs(latest[t][3] - a) < 1e-12, t


def test_streaming_kmv_matches_batch_and_replay_idempotent(spark, sf_dir, tmp_path):
    """The KMV twin's final per-source sketch must equal the batch
    bottom-k under a non-chronological split — AND under a REPLAYED
    slice (file 0 delivered twice): bottom-k min-union is idempotent,
    the state contract the additive-counter twins cannot make."""
    import os
    import time
    from decimal import ROUND_HALF_UP, Decimal

    from mito_spark.engine import load_table
    from mito_spark.operators.dedup import _hash60, _staged_shingles
    from mito_spark.operators.topk import per_key_topk
    from mito_spark.streaming.stateful import kmv_stream_rows, streaming_kmv_distinct

    k = 128
    docs = load_table(spark, sf_dir, "documents")
    items = (
        _staged_shingles(docs, 3, id_col="source")
        .select("source", F.explode("sh").alias("s"))
        .select("source", _hash60(F.col("s"), F.lit("kmv")).alias("h"))
        .distinct()
    )
    sk = per_key_topk(items, "source", [F.asc("h")], k, rank_name="r")
    want: dict = {}
    for r in sk.collect():
        want.setdefault(r.source, []).append(r.h)
    for s in want:
        want[s] = sorted(want[s])

    d = str(tmp_path / "kmvstream")
    dest = d + "/docs.parquet"
    base_t = time.time()
    seen: set = set()
    for i, sl in enumerate([0, 1, 2, 0]):  # slice 0 REPLAYED last
        docs.where(F.col("doc_id") % 3 == sl).coalesce(1).write.mode(
            "append"
        ).parquet(dest)
        for f in os.listdir(dest):
            if f in seen:
                continue
            seen.add(f)
            os.utime(os.path.join(dest, f), (base_t + 100 * i, base_t + 100 * i))
    schema = spark.read.parquet(dest).schema
    stream = kmv_stream_rows(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dest)
    )
    latest: dict = {}

    def on_batch(b, _i):
        for r in b.collect():
            latest[r.source] = (r.n_sketch, r.theta, r.est_distinct)

    sink = ChannelSink("kmvstream", on_batch)
    q = sink.send_to(
        streaming_kmv_distinct(stream, k=k), output_mode="update", availableNow=True
    )
    q.awaitTermination(180)
    sink.close()
    assert set(latest) == set(want) and len(want) >= 2
    space = float(1 << 60)
    for s, hs in want.items():
        n, theta, est = latest[s]
        assert n == len(hs) and theta == hs[-1], s
        if n < k:
            assert est == float(n), s
        else:
            expect = float(
                Decimal(repr(float(k - 1) * space / float(theta))).quantize(
                    Decimal("1e-6"), ROUND_HALF_UP
                )
            )
            assert est == expect, s
