"""The reference's flagship pipeline (example.cel on example.json,
FIXTURES.md F1) ported Spark-first — semantic golden test."""

from __future__ import annotations

import pyspark.sql.functions as F

from mito_spark.plans.example_pipeline import run_example_pipeline

F1_ROWS = [
    (["a", "b"], ["1", "2"], "random information for first"),
    (["aa", "bb"], ["12", "22", "33"], "random information for second"),
    (["a", "b"], [], "random information for third"),
    ([], ["1", "2"], "random information for fourth"),
    (None, ["1", "2"], "random information for fifth"),
    (["y", "z"], ["-1", "-2", "-3"], None),  # no `other` → filtered out
]


def _events(spark):
    return spark.createDataFrame(
        F1_ROWS, "let array<string>, num array<string>, other string"
    )


def test_cartesian_and_passthrough_counts(spark):
    ev = _events(spark)
    enriched, _ = run_example_pipeline(ev, now=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    rows = enriched.collect()
    # events 1,2 (2×2 + 3×2 combos) + events 3,4,5 pass through; event 6 dropped
    assert len(rows) == 4 + 6 + 3
    both = [r for r in rows if r.num_value is not None]
    assert len(both) == 10
    firsts = [r for r in both if "first" in r.other]
    assert sorted((r.num_value, r.let_value) for r in firsts) == [
        ("1", "a"), ("1", "b"), ("2", "a"), ("2", "b"),
    ]


def test_original_preserved_and_numlet(spark):
    ev = _events(spark)
    enriched, _ = run_example_pipeline(ev, now=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    r = [x for x in enriched.collect() if x.other == "random information for first"][0]
    assert '"let":["a","b"]' in r.original and '"num":["1","2"]' in r.original
    assert r.numlet == ["1", "2", "a", "b"]


def test_passthrough_has_no_product_fields(spark):
    ev = _events(spark)
    enriched, _ = run_example_pipeline(ev, now=F.lit("2024-01-01 00:00:00").cast("timestamp"))
    pt = [x for x in enriched.collect() if x.other == "random information for third"][0]
    assert pt.num_value is None and pt.let_value is None and pt.numlet is None
    assert pt.original is not None


def test_cursor_summary(spark):
    ev = _events(spark)
    now = F.lit("2024-01-01 00:00:00").cast("timestamp")
    _, cursor = run_example_pipeline(ev, now=now)
    c = cursor.collect()[0]
    assert c.first == c.last  # single pinned `now`, like the reference's eval-start time
    assert len(c.list) == 13
