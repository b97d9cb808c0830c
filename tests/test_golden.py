"""Golden-output scenario harness — the reference's test strategy
(SURVEY §5: 70 txtar scripts comparing exact JSON stdout) re-expressed
data-driven: each scenario is (input JSON doc, named op, expected JSON
output), executed through the real engine (schema inference → column
program → to_json) and compared exactly.

Scenarios mirror reference testdata files (cited per scenario)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest


def _as_map(col, typ: str = "map<string,int>"):
    # spark.read.json infers {"a":1} as a struct; re-parse as a map
    return F.from_json(F.to_json(col), typ)

from mito_spark.functions import collections as C

# (name, reference file, input doc, op, expected output-JSON value)
SCENARIOS = [
    (
        "collate_a",
        "testdata/collate_a.txt",
        {"a": [{"b": 1}, {"b": 2}, {"b": 3}], "b": [{"b": -1, "c": 10}, {"b": -2, "c": 20}, {"b": -3, "c": 30}]},
        lambda df: C.collate(df, "doc", "a.b"),
        [1, 2, 3],
    ),
    (
        "collate_a_b.b",
        "testdata/collate_a_b.b.txt",
        {"a": [{"b": 1}, {"b": 2}, {"b": 3}], "b": [{"b": -1, "c": 10}, {"b": -2, "c": 20}, {"b": -3, "c": 30}]},
        lambda df: C.collate(df, "doc", ["a.b", "b.b"]),
        [1, 2, 3, -1, -2, -3],
    ),
    (
        "drop_a",
        "testdata/drop_a.txt",
        {"a": [{"b": 1}], "b": [{"b": -1, "c": 10}]},
        lambda df: C.drop_path(df, "doc", "b.b"),
        {"a": [{"b": 1}], "b": [{"c": 10}]},
    ),
    (
        # uniform depth (typed arrays): the reference's *ragged* dyn
        # nesting (flatten_mixed.txt) maps to variant, not static arrays
        "flatten_ints",
        "testdata/flatten_ints.txt",
        {"x": [[[1, 2], [3]], [[4], [5, 6]]]},
        lambda df: C.flatten_deep(df, "doc.x"),
        [1, 2, 3, 4, 5, 6],
    ),
    (
        "max_min",
        "testdata/max.txt + min.txt",
        {"v": [3, 1, 4, 1, 5]},
        lambda df: F.struct(
            C.arr_max(F.col("doc.v")).alias("max"), C.arr_min(F.col("doc.v")).alias("min")
        ),
        {"max": 5, "min": 1},
    ),
    (
        "with",
        "testdata/with.txt",
        {"m": {"a": 1, "b": 2}},
        lambda df: C.map_with(
            _as_map(F.col("doc.m")), F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3))
        ),
        {"a": 1, "b": 9, "c": 3},
    ),
    (
        "with_update",
        "testdata/with_update.txt",
        {"m": {"a": 1, "b": 2}},
        lambda df: C.map_with_update(
            _as_map(F.col("doc.m")), F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3))
        ),
        {"a": 1, "b": 2, "c": 3},  # keep existing
    ),
    (
        "with_replace",
        "testdata/with_replace.txt",
        {"m": {"a": 1, "b": 2}},
        lambda df: C.map_with_replace(
            _as_map(F.col("doc.m")), F.create_map(F.lit("b"), F.lit(9), F.lit("c"), F.lit(3))
        ),
        {"a": 1, "b": 9},  # only existing keys overwritten
    ),
    (
        "keys_values_sorted",
        "testdata/keys.txt + values.txt",
        {"m": {"c": 3, "a": 1, "b": 2}},
        lambda df: F.struct(
            C.keys_sorted(_as_map(F.col("doc.m"))).alias("keys"),
            C.values_sorted(_as_map(F.col("doc.m"))).alias("values"),
        ),
        {"keys": ["a", "b", "c"], "values": [1, 2, 3]},
    ),
    (
        "zip",
        "testdata/zip.txt",
        {"k": ["x", "y"], "v": [1, 2]},
        lambda df: C.zip_map(F.col("doc.k"), F.col("doc.v").cast("array<int>")),
        {"x": 1, "y": 2},
    ),
    (
        # reference crypto goldens (testdata/{md5,sha256,base64,hex}.txt,
        # lib/crypto.go:100-157): known digests for "hello world"
        "crypto_goldens",
        "testdata/md5.txt + sha256.txt + base64.txt + hex.txt",
        {"s": "hello world"},
        lambda df: (lambda F, cr: F.struct(
            cr.md5_hex(F.col("doc.s")).alias("md5"),
            cr.sha256_hex(F.col("doc.s")).alias("sha256"),
            cr.base64(F.col("doc.s")).alias("b64"),
            cr.base64_raw(F.col("doc.s")).alias("b64r"),
            cr.hex_lower(F.encode(F.col("doc.s"), "UTF-8")).alias("hex"),
        ))(__import__("pyspark.sql.functions", fromlist=["F"]), __import__("mito_spark.functions.crypto", fromlist=["crypto"])),
        {
            "md5": "5eb63bbbe01eeed093cb22bb8f5acdc3",
            "sha256": "b94d27b9934d3e08a52e52d7da7dabfac484efe37a5380ee9088f7ace2efcde9",
            "b64": "aGVsbG8gd29ybGQ=",
            "b64r": "aGVsbG8gd29ybGQ",
            "hex": "68656c6c6f20776f726c64",
        },
    ),
    (
        # testdata/format_time.txt semantics: Go reference-time layouts
        "format_time_layouts",
        "testdata/format_time.txt + time_layout.txt",
        {"t": "2023-10-05 15:04:05"},
        lambda df: (lambda F, tf: F.struct(
            tf.format_time(F.to_timestamp(F.col("doc.t")), "2006-01-02").alias("date"),
            tf.format_time(F.to_timestamp(F.col("doc.t")), "Kitchen").alias("kitchen"),
            tf.format_time(F.to_timestamp(F.col("doc.t")), "Mon Jan _2 15:04:05 2006").alias("ansic"),
        ))(__import__("pyspark.sql.functions", fromlist=["F"]), __import__("mito_spark.functions.timefns", fromlist=["timefns"])),
        {"date": "2023-10-05", "kitchen": "3:04PM", "ansic": "Thu Oct 5 15:04:05 2023"},
    ),
    (
        "json_encode_decode",
        "testdata/json_encode.txt + json_decode.txt",
        {"msg": "hello world", "n": 7},
        lambda df: F.from_json(F.to_json(F.col("doc")), "msg string, n int"),
        {"msg": "hello world", "n": 7},
    ),
    (
        # ragged dyn flatten: depth varies per element, maps are leaves
        "flatten_mixed",
        "testdata/flatten_mixed.txt",
        {"x": "[[{\"a\":1,\"b\":[10,11]}],[2,3],[[[4]],[5,6]]]"},
        lambda df: (lambda J: F.from_json(J.flatten_json(F.col("doc.x")), "array<string>"))(
            __import__("mito_spark.functions.jsonfns", fromlist=["jsonfns"])
        ),
        ['{"a":1,"b":[10,11]}', "2", "3", "4", "5", "6"],
    ),
    (
        # has(state.?x.?y.z) over a doc with no x at all → false, no error
        "optional_types",
        "testdata/optional_types.txt",
        {"n": 0},
        lambda df: (lambda J: F.struct(
            J.has_json_path(F.to_json(F.col("doc")), "x.y.z").alias("has_x_y_z"),
            J.has_json_path(F.to_json(F.col("doc")), "n").alias("has_n"),
        ))(__import__("mito_spark.functions.jsonfns", fromlist=["jsonfns"])),
        {"has_x_y_z": False, "has_n": True},
    ),
    (
        # as(v, expr) let-binding: alias + reuse, no runtime op
        # (makeAs collections.go:1098-1113 rewrites to [v].map(..)[0])
        "as_let_binding",
        "testdata/as.txt",
        {"a": 1, "b": 2},
        lambda df: (lambda v: F.struct(
            (v.getField("a") == 1).alias("pred"),
            C.map_with(_as_map(v), F.create_map(F.lit("c"), F.lit(3))).alias("merged"),
        ))(F.col("doc")),
        {"pred": True, "merged": {"a": 1, "b": 2, "c": 3}},
    ),
]


def _run(spark, doc, op):
    df = spark.read.json(spark.sparkContext.parallelize([json.dumps(doc)]))
    df = df.select(F.struct(*df.columns).alias("doc"))
    out = df.select(F.to_json(op(df)).alias("j")).first().j
    return json.loads(out)


@pytest.mark.parametrize("name,ref,doc,op,want", SCENARIOS, ids=[s[0] for s in SCENARIOS])
def test_golden(spark, name, ref, doc, op, want):
    got = _run(spark, doc, op)
    assert got == want, f"{name} (mirrors {ref}): {got!r} != {want!r}"
