"""want_more continuation protocol (reference mito.go:186-204,
testdata/want_more.txt / FIXTURES.md F3)."""

from __future__ import annotations

import pytest

from mito_spark.streaming.continuation import ContinuationDriver, cursor_summary, paginate_dataframe


def test_want_more_sequence(spark):
    # F3: state {n:0}; step increments n, want_more while n+1 < 5
    def step(s, state):
        n = state["n"] + 1
        return {"n": n, "want_more": n + 1 < 5}

    drv = ContinuationDriver(step)
    final = drv.run(spark, {"n": 0})
    assert final == {"n": 4, "want_more": False}
    assert [h["n"] for h in drv.history] == [1, 2, 3, 4]


def test_runaway_loop_bounded(spark):
    drv = ContinuationDriver(lambda s, st: {"want_more": True}, max_steps=7)
    with pytest.raises(RuntimeError):
        drv.run(spark, {})


def test_paginate_dataframe(spark):
    # pages of 3 ids, 3 pages
    def fetch(s, cursor):
        page = cursor.get("page", 0)
        df = s.range(page * 3, page * 3 + 3)
        return df, {"page": page + 1, "want_more": page + 1 < 3}

    out = paginate_dataframe(spark, fetch, {"page": 0})
    assert sorted(r.id for r in out.collect()) == list(range(9))


def test_cursor_summary(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-02 00:00:00",)], "t string"
    ).selectExpr("cast(t as timestamp) as timestamp")
    c = cursor_summary(df)
    assert c["timestamps"]["first"].day == 1
    assert c["timestamps"]["last"].day == 2
