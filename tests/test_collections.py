"""Collections semantics against the reference's documented examples
(FIXTURES.md F2; /root/reference/lib/collections.go doc examples)."""

from __future__ import annotations

import pyspark.sql.functions as F

from mito_spark.functions import collections as C


def _doc_df(spark):
    # F2: a=[{b:1},{b:2},{b:3}], b=[{b:-1,c:10},{b:-2,c:20},{b:-3,c:30}]
    return spark.createDataFrame(
        [([(1,), (2,), (3,)], [(-1, 10), (-2, 20), (-3, 30)])],
        "a array<struct<b int>>, b array<struct<b int, c int>>",
    ).select(F.struct("a", "b").alias("doc"))


def test_collate_single_path(spark):
    df = _doc_df(spark)
    assert df.select(C.collate(df, "doc", "a.b").alias("r")).first().r == [1, 2, 3]


def test_collate_multi_path_concats_in_order(spark):
    df = _doc_df(spark)
    assert df.select(C.collate(df, "doc", ["a.b", "b.b"]).alias("r")).first().r == [1, 2, 3, -1, -2, -3]


def test_collate_escaped_dot():
    assert C.split_path(r"a\.b.c") == ["a.b", "c"]
    assert C.split_path("a.b.c") == ["a", "b", "c"]


def test_drop_removes_nested_field(spark):
    df = _doc_df(spark)
    r = df.select(C.drop_path(df, "doc", "b.b").alias("r")).first().r
    assert r.a == [(1,), (2,), (3,)]
    assert [row.asDict() for row in r.b] == [{"c": 10}, {"c": 20}, {"c": 30}]


def test_drop_missing_field_is_noop(spark):
    df = _doc_df(spark)
    r = df.select(C.drop_path(df, "doc", "nope").alias("r")).first().r
    assert r.a == [(1,), (2,), (3,)]


def test_drop_empty_filters_empty_collections(spark):
    df = spark.createDataFrame(
        [({"x": [1, 2], "y": []}, [[1], [], [2]])],
        "m map<string,array<int>>, n array<array<int>>",
    )
    row = df.select(
        C.drop_empty(df, "m").alias("m"), C.drop_empty(df, "n").alias("n")
    ).first()
    assert row.m == {"x": [1, 2]}
    assert row.n == [[1], [2]]


def test_flatten_deep(spark):
    df = spark.createDataFrame([([[[1, 2], [3]], [[4]]],)], "x array<array<array<int>>>")
    assert df.select(C.flatten_deep(df, "x").alias("r")).first().r == [1, 2, 3, 4]


def test_map_merges(spark):
    df = spark.range(1)
    a = F.create_map(F.lit("a"), F.lit(1), F.lit("b"), F.lit(2))
    b = F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3))
    row = df.select(
        C.map_with(a, b).alias("w"),
        C.map_with_update(a, b).alias("wu"),
        C.map_with_replace(a, b).alias("wr"),
    ).first()
    assert row.w == {"a": 1, "b": 9, "c": 3}  # RHS wins, new keys added
    assert row.wu == {"a": 1, "b": 2, "c": 3}  # existing kept
    assert row.wr == {"a": 1, "b": 9}  # only existing overwritten


def test_zip_keys_values(spark):
    df = spark.range(1)
    m = C.zip_map(F.array(F.lit("b"), F.lit("a")), F.array(F.lit(2), F.lit(1)))
    row = df.select(
        m.alias("m"), C.keys_sorted(m).alias("k"), C.values_sorted(m).alias("v")
    ).first()
    assert row.m == {"a": 1, "b": 2}
    assert row.k == ["a", "b"]
    assert row.v == [1, 2]


def test_zip_size_mismatch_is_null_not_error(spark):
    df = spark.range(1)
    row = df.select(C.zip_map(F.array(F.lit("a")), F.array(F.lit(1), F.lit(2))).alias("m")).first()
    assert row.m is None


def test_min_max(spark):
    df = spark.createDataFrame([([3, 1, 2],)], "x array<int>")
    row = df.select(C.arr_min("x").alias("mn"), C.arr_max("x").alias("mx")).first()
    assert (row.mn, row.mx) == (1, 3)
