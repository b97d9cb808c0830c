"""Declarative pipeline specs — compile once, evaluate per batch.

The reference's entry points (SURVEY §3; /root/reference/mito.go:59-206,
mito.go:300-306) are (1) a CLI taking a program + a JSON state document
and printing a JSON result, and (2) a library embedding that compiles
the program once and evaluates it per message batch. This module is the
Spark-first equivalent of that contract: a JSON **pipeline spec** is
compiled ONCE into a `DataFrame -> DataFrame` function — compilation
errors (bad expression, unknown op) surface at compile time, the
Catalyst analyzer/optimizer plays the role of env.Compile/env.Program —
and the compiled pipeline is applied to any number of input batches.

Expressions inside specs are Spark SQL expression strings parsed by
Catalyst (`F.expr`), NOT a reimplemented expression language: the CEL
capability surface maps onto SQL expressions plus this engine's column
builders (mito_spark.functions.*), per the SURVEY §2.1 table.

Spec shape::

    {"ops": [
      {"op": "select",  "exprs": {"out_name": "<sql expr>", ...}},
      {"op": "with",    "exprs": {"name": "<sql expr>", ...}},
      {"op": "filter",  "expr": "<sql boolean expr>"},
      {"op": "explode", "column": "arr", "as": "x"},
      {"op": "flatten", "column": "arr"},
      {"op": "drop",    "columns": ["a", "b"]},
      {"op": "drop_path", "column": "doc", "paths": ["a.b"]},
      {"op": "collate", "column": "doc", "path": "a.b", "as": "vals"},
      {"op": "group_agg", "keys": ["k"], "aggs": {"n": "count(*)"}},
      {"op": "order_by", "exprs": ["n DESC", "k"]},
      {"op": "limit",   "n": 10},
      {"op": "sql",     "query": "SELECT ... FROM __this__"}
    ]}

`sql` is the escape hatch: the current frame is exposed as the
`__this__` view, so any Spark SQL (joins against registered tables,
window functions, lateral views) composes with the op list.
"""

from __future__ import annotations

import json
from collections.abc import Callable
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PipelineFn = Callable[[DataFrame], DataFrame]


class SpecError(ValueError):
    """Compile-time spec failure (unknown op / missing key) — the
    analog of the reference's compile-stage abort (mito.go:317-320)."""


def _exprs(mapping: dict[str, str]) -> list[Column]:
    return [F.expr(e).alias(name) for name, e in mapping.items()]


def _compile_op(op: dict[str, Any]) -> PipelineFn:
    kind = op.get("op")
    if kind == "select":
        cols = dict(op["exprs"])
        return lambda df: df.select(*_exprs(cols))
    if kind == "with":
        # `with` merge semantics: add-or-overwrite (collections.go:585-594)
        cols = {name: F.expr(e) for name, e in op["exprs"].items()}
        return lambda df: df.withColumns(cols)
    if kind == "filter":
        pred = op["expr"]
        return lambda df: df.where(F.expr(pred))
    if kind == "explode":
        col, alias = op["column"], op.get("as", op["column"])
        return lambda df: df.select(
            *[c for c in df.columns if c != col], F.explode(F.expr(col)).alias(alias)
        )
    if kind == "flatten":
        col = op["column"]

        def _flatten(df: DataFrame) -> DataFrame:
            from mito_spark.functions.collections import flatten_deep

            return df.withColumn(col.split(".")[0], flatten_deep(df, col))

        return _flatten
    if kind == "drop":
        cols = list(op["columns"])
        return lambda df: df.drop(*cols)
    if kind == "drop_path":
        col, paths = op["column"], list(op["paths"])

        def _drop(df: DataFrame) -> DataFrame:
            from mito_spark.functions.collections import drop_path

            return df.withColumn(col, drop_path(df, col, paths))

        return _drop
    if kind == "collate":
        col, path, alias = op["column"], op["path"], op.get("as", "collated")

        def _collate(df: DataFrame) -> DataFrame:
            from mito_spark.functions.collections import collate

            return df.withColumn(alias, collate(df, col, path))

        return _collate
    if kind == "group_agg":
        keys, aggs = list(op["keys"]), dict(op["aggs"])
        return lambda df: df.groupBy(*keys).agg(*_exprs(aggs))
    if kind == "order_by":
        def _sort_col(e: str) -> Column:
            txt = e.strip()
            low = txt.lower()
            for suffix, flip in ((" desc", True), (" asc", False)):
                if low.endswith(suffix):
                    c = F.expr(txt[: -len(suffix)])
                    return c.desc() if flip else c.asc()
            return F.expr(txt)

        sort_cols = [_sort_col(e) for e in op["exprs"]]
        return lambda df: df.orderBy(*sort_cols)
    if kind == "limit":
        n = int(op["n"])
        return lambda df: df.limit(n)
    if kind == "sql":
        query = op["query"]

        def _sql(df: DataFrame) -> DataFrame:
            df.createOrReplaceTempView("__this__")
            return df.sparkSession.sql(query)

        return _sql
    raise SpecError(f"unknown op: {kind!r}")


def compile_pipeline(spec: dict[str, Any] | str) -> PipelineFn:
    """Spec → composed DataFrame function. Raises SpecError on unknown
    ops immediately; expression syntax/resolution errors surface on
    first application (Catalyst analysis — like the reference's
    check stage)."""
    if isinstance(spec, str):
        spec = json.loads(spec)
    ops = spec.get("ops")
    if not isinstance(ops, list):
        raise SpecError("spec must carry an 'ops' list")
    steps = [_compile_op(o) for o in ops]

    def run(df: DataFrame) -> DataFrame:
        for step in steps:
            df = step(df)
        return df

    return run
