"""User-defined global variables (reference lib/globals.go:34-100).

The reference binds host-provided constants into the expression
environment with best-effort static types. Spark-first equivalent:
literal columns folded into the plan — Catalyst constant-folds them,
so a global costs nothing at runtime. The accepted host kinds mirror
globals.go:85-100: bool/int/float/str primitives, bytes, datetime
(timestamp), timedelta (day-time interval), lists, and dicts.
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def lit_global(value: Any) -> Column:
    """One host value → one literal Column with the parity type map."""
    if isinstance(value, dict):
        items: list[Column] = []
        for k, v in value.items():
            items.append(F.lit(k))
            items.append(lit_global(v))
        return F.create_map(*items)
    if isinstance(value, (list, tuple)):
        return F.array(*[lit_global(v) for v in value])
    if isinstance(value, _dt.timedelta):
        return F.expr(f"INTERVAL '{value.total_seconds()}' SECOND")
    # bool/int/float/str/bytes/datetime are native F.lit kinds
    return F.lit(value)


def bind_globals(df: DataFrame, globs: dict[str, Any]) -> DataFrame:
    """Attach every global as a column (the expression-environment
    binding). Plan cost: zero — literals constant-fold."""
    out = df
    for name, value in globs.items():
        out = out.withColumn(name, lit_global(value))
    return out
