"""Smoke coverage for every remaining public function builder — each
is executed at least once on type-appropriate input so latent runtime
errors (like the decode() UTF-8 throw) cannot hide in unexercised
paths."""

from __future__ import annotations

import pyspark.sql.functions as F

from mito_spark.functions import crypto, jsonfns, timefns, tryfns
from mito_spark.functions.regexpfns import RegexpRegistry


def test_json_functions(spark):
    df = spark.createDataFrame(
        [('{"a": 1, "b": "x"}', '{"a":1}{"a":2}{"a":3}')], "j string, stream string"
    )
    row = df.select(
        jsonfns.decode_json("j", "a int, b string").alias("d"),
        jsonfns.decode_json_stream("stream", "a int").alias("s"),
        jsonfns.get_json_path("j", "$.b").alias("g"),
        jsonfns.encode_json(F.struct(F.lit(1).alias("a"))).alias("e"),
    ).first()
    assert row.d.a == 1 and row.d.b == "x"
    assert [x.a for x in row.s] == [1, 2, 3]
    assert row.g == "x"
    assert row.e == '{"a":1}'


def test_decode_json_dyn_infers_schema(spark):
    df = spark.createDataFrame([('{"k": 5}',), ('{"k": 7}',)], "j string")
    col = jsonfns.decode_json_dyn(df, "j")
    rows = df.select(col.alias("d")).collect()
    assert [r.d.k for r in rows] == [5, 7]


def test_crypto_bytes_variants(spark):
    df = spark.createDataFrame([("hello world",)], "s string")
    row = df.select(
        crypto.md5_bytes("s").alias("m"),
        crypto.sha1_bytes("s").alias("s1"),
        crypto.sha256_bytes("s").alias("s2"),
        crypto.base64_decode(crypto.base64("s")).cast("string").alias("b"),
        crypto.hmac_bytes("s", "sha1", b"key").alias("h1"),
        crypto.uuid4().alias("u"),
    ).first()
    assert row.m.hex() == "5eb63bbbe01eeed093cb22bb8f5acdc3"  # bytes, not hex string
    assert len(row.s1) == 20 and len(row.s2) == 32
    assert row.b == "hello world"
    assert len(row.h1) == 20
    import re

    assert re.fullmatch(r"[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[0-9a-f]{4}-[0-9a-f]{12}", row.u)


def test_try_family(spark):
    df = spark.createDataFrame([(2**62, 3)], "big long, small int")
    row = df.select(
        tryfns.try_add("big", F.col("big")).alias("overflow"),
        tryfns.try_multiply("big", F.lit(4)).alias("mul"),
        tryfns.try_cast(F.lit("not a number"), "int").alias("badcast"),
        tryfns.try_cast(F.lit("41"), "int").alias("okcast"),
        tryfns.try_keyed(F.lit(1) / F.lit(0), F.lit(True), "err", "div by zero").alias("keyed"),
    ).first()
    assert row.overflow is None and row.mul is None  # overflow absorbed
    assert row.badcast is None and row.okcast == 41
    assert row.keyed.error == {"err": "div by zero"} and row.keyed.value is None


def test_now_pinned_is_constant_within_query(spark):
    df = spark.range(100).select(timefns.now_pinned().alias("t"))
    assert df.distinct().count() == 1  # one timestamp per evaluation, like `now`


def test_regexp_submatches(spark):
    reg = RegexpRegistry({"kv": r"([a-z]+)=([0-9]+)"})
    df = spark.createDataFrame([("a=1 b=22",)], "s string")
    row = df.select(
        reg.re_find_submatch("kv", "s").alias("sm"),
        reg.re_find_all_submatch("kv", "s").alias("all"),
    ).first()
    assert row.sm == ["a=1", "a", "1"]  # full match + groups, Go shape
    assert row.all == [["a=1", "a", "1"], ["b=22", "b", "22"]]


def test_now_instant_vs_pinned(spark):
    import time as _t

    df = spark.range(4)
    t0 = df.select(timefns.now_instant().alias("t")).first().t
    _t.sleep(1.2)
    t1 = df.select(timefns.now_instant().alias("t")).first().t
    assert t1 > t0  # advances between evaluations (call-time clock)
