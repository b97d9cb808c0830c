"""Property-based tests (hypothesis) — beyond the reference's test
strategy (SURVEY §5: upstream has no randomized testing). Each example
runs the real column program and compares against the plain-Python
semantics of the reference functions."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import given, settings, strategies as st

from mito_spark.functions import collections as C
from mito_spark.functions import strings

_SET = settings(max_examples=12, deadline=None)

# printable-ish text without surrogates; keeps Python/JVM comparisons honest
_txt = st.text(alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]), max_size=30)


@_SET
@given(st.lists(st.lists(st.lists(st.integers(-100, 100), max_size=4), max_size=4), max_size=4))
def test_flatten_deep_matches_python(spark, nested):
    df = spark.createDataFrame([(nested,)], "x array<array<array<bigint>>>")
    got = df.select(C.flatten_deep(df, "x").alias("f")).first().f
    want = [i for a in nested for b in a for i in b]
    assert got == want


@_SET
@given(st.lists(st.tuples(_txt, _txt), min_size=1, max_size=20))
def test_string_index_semantics_match_go(spark, pairs):
    # Go strings.Index/Count/HasPrefix over arbitrary unicode == ours
    df = spark.createDataFrame(pairs, "s string, sub string")
    rows = df.select(
        "s",
        "sub",
        strings.index_of("s", F.col("sub")).alias("idx"),
        strings.has_prefix("s", F.col("sub")).alias("pre"),
    ).collect()
    for r in rows:
        assert r.idx == r.s.find(r.sub)
        assert r.pre == r.s.startswith(r.sub)


@_SET
@given(st.dictionaries(st.text(min_size=1, max_size=8), st.integers(-1000, 1000), max_size=8))
def test_keys_values_sorted_contract(spark, d):
    df = spark.createDataFrame([(d,)], "m map<string,bigint>")
    row = df.select(
        C.keys_sorted(F.col("m")).alias("k"), C.values_sorted(F.col("m")).alias("v")
    ).first()
    want_keys = sorted(d)
    assert row.k == want_keys
    assert row.v == [d[k] for k in want_keys]


@_SET
@given(st.lists(st.integers(-10**6, 10**6), min_size=1, max_size=30))
def test_arr_min_max_match_python(spark, xs):
    df = spark.createDataFrame([(xs,)], "x array<bigint>")
    row = df.select(C.arr_min("x").alias("lo"), C.arr_max("x").alias("hi")).first()
    assert row.lo == min(xs) and row.hi == max(xs)


@_SET
@given(st.text(alphabet="ab ", max_size=40), st.integers(1, 4))
def test_chunk_reconstruction(spark, text, stride_extra):
    """Chunking with overlap=0 reconstructs the token stream exactly."""
    from mito_spark.operators.text import _tokens

    df = spark.createDataFrame([(text,)], "text string")
    toks = df.select(_tokens(F.col("text")).alias("t")).first().t
    n = 2 * stride_extra  # chunk size, no overlap
    starts = list(range(1, max(len(toks), 1) + 1, n))
    rebuilt = []
    for s in starts:
        rebuilt.extend(toks[s - 1 : s - 1 + n])
    assert rebuilt == toks
