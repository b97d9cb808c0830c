"""JSON encode/decode (reference: /root/reference/lib/json.go,
doc :40-81).

Dynamic-schema strategy (SURVEY.md §1.4): when the caller knows the
schema, ``decode_json`` compiles to from_json (fully typed, codegen);
when not, ``decode_json_dyn`` samples the column to infer a schema on
the driver (one tiny job) so the per-row path is still from_json —
never a Python loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def encode_json(col) -> Column:
    """value → compact JSON string (json.go:207-247)."""
    return F.to_json(_c(col))


def decode_json(col, schema) -> Column:
    """string/bytes → typed value (json.go:249-266); schema is a DDL
    string or DataType."""
    return F.from_json(_c(col).cast("string"), schema)


def decode_json_dyn(df: DataFrame, column: str, sample_rows: int = 1000) -> Column:
    """Schema-on-read for a dynamic JSON column: infer the schema from
    a bounded sample (driver-side, one small job), then decode the full
    column JVM-side. At 100 TB the sample cost is constant; the decode
    is distributed."""
    sample = [r[0] for r in df.select(column).where(F.col(column).isNotNull()).limit(sample_rows).collect()]
    spark = df.sparkSession
    inferred = spark.read.json(spark.sparkContext.parallelize(sample)).schema
    return F.from_json(_c(column), inferred)


def decode_json_stream(col, element_schema) -> Column:
    """Concatenated or newline-delimited JSON stream in one value →
    array of typed values (json.go:268-289; reference golden
    json_decode_stream.txt uses '{"a":1}{"b":2}' with no separator).

    Object boundaries are normalized to a JSON array (}{ → },{ — the
    \\s* also absorbs NDJSON newlines) and decoded in one from_json.
    Caveat vs the reference's real streaming decoder: a string VALUE
    containing '}{' would split wrongly; route such payloads through
    sources.files.read_ndjson (a real per-line parser) instead."""
    if isinstance(element_schema, str):
        arr_schema = f"array<struct<{element_schema}>>"
    else:
        from pyspark.sql.types import ArrayType

        arr_schema = ArrayType(element_schema)
    s = F.trim(_c(col).cast("string"))
    normalized = F.regexp_replace(s, r"\}\s*\{", "},{")
    return F.from_json(F.concat(F.lit("["), normalized, F.lit("]")), arr_schema)


def get_json_path(col, path: str) -> Column:
    """Untyped point lookup without full decode — pushdown-friendly for
    one-field access on huge JSON blobs. Accepts a bare dotted path
    ('b.c') or a full JSONPath ('$.b.c')."""
    jpath = path if path.startswith("$") else f"$.{path}"
    return F.get_json_object(_c(col), jpath)


def has_json_path(col, path: str) -> Column:
    """``has(state.?x.?y.z)`` on dynamic data (optional-access chain,
    reference testdata/optional_types.txt; enabled at mito.go:83): true
    iff the full path exists. Variant-based so a missing intermediate
    field is null-absorbed, never an analysis or runtime error; malformed
    JSON is also false (error-as-value)."""
    jpath = path if path.startswith("$") else f"$.{path}"
    return F.try_variant_get(F.try_parse_json(_c(col).cast("string")), jpath, "variant").isNotNull()


def flatten_json(col) -> Column:
    """Ragged depth-first flatten of a *dynamic* JSON array — the dyn
    fallback for ``list.flatten()`` when element depth varies per row
    (reference testdata/flatten_mixed.txt: [[{..}],[2,3],[[[4]],[5,6]]]
    → [{..},2,3,4,5,6]; collections.go:560-583 — lists are recursed,
    maps are leaves). Static uniform-depth arrays should use
    collections.flatten_deep (pure built-ins); this path is an
    Arrow-batched pandas UDF because ragged depth is unknowable at plan
    time. Returns the flattened array re-encoded as a JSON string."""
    import json as _json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _flat(s):
        def one(v):
            if v is None:
                return None
            try:
                data = _json.loads(v)
            except ValueError:
                return None  # error-as-value: malformed input → null
            out = []

            def rec(x):
                if isinstance(x, list):
                    for e in x:
                        rec(e)
                else:
                    out.append(x)

            rec(data)
            return _json.dumps(out, separators=(",", ":"))

        return s.map(one)

    # real annotation objects: the module's postponed annotations would
    # otherwise reach pandas_udf as unresolvable strings
    _flat.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_flat, "string")(_c(col).cast("string"))
