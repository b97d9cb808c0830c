"""Range-join semantics (half-open boundaries, bucket-boundary
correctness) and plan shape (equi-join shuffle, never a nested-loop)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from mito_spark.operators.rangejoin import range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


def test_half_open_and_cross_bucket(spark):
    """lo inclusive, hi exclusive; an interval spanning a bucket
    boundary still matches points in both buckets exactly once."""
    points = spark.createDataFrame(
        [("u", _ts(0), 1), ("u", _ts(59), 2), ("u", _ts(60), 3), ("u", _ts(90), 4), ("v", _ts(30), 5)],
        "k string, ts timestamp, pid int",
    )
    # interval [00:30, 01:30) with 1h buckets spans buckets 0 and 1
    intervals = spark.createDataFrame(
        [("u", _ts(30), _ts(90), 100)], "k string, lo timestamp, hi timestamp, iid int"
    )
    got = sorted(
        r.pid
        for r in range_join(points, intervals, on="k", ts="ts", lo="lo", hi="hi").collect()
    )
    # pid 2 (00:59) and 3 (01:00) inside; 1 (00:00) before lo; 4 (01:30)
    # AT hi → excluded (half-open); 5 is another key
    assert got == [2, 3]


def test_pairs_meet_in_exactly_one_bucket(spark):
    """No duplicate pairs even though intervals explode into several
    buckets (the point's single bucket picks exactly one copy)."""
    points = spark.createDataFrame([("u", _ts(10), 1)], "k string, ts timestamp, pid int")
    intervals = spark.createDataFrame(
        [("u", _ts(0), _ts(300), 9)], "k string, lo timestamp, hi timestamp, iid int"
    )
    rows = range_join(points, intervals, on="k", ts="ts", lo="lo", hi="hi").collect()
    assert len(rows) == 1


def test_plan_is_equi_join(spark, sf_dir):
    """The bucketization must reach the physical plan as a hash/merge
    equi-join — not BroadcastNestedLoopJoin or CartesianProduct."""
    from pyspark.sql import SparkSession

    from mito_spark.operators.rangejoin import events_purchase_window

    jvm = SparkSession.getActiveSession()._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    plan = events_purchase_window(spark, sf_dir)._jdf.queryExecution().explainString(mode)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
