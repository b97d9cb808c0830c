"""Error-as-value convention (reference: /root/reference/lib/try.go
:96-138, lib/debug.go :57-91).

CEL errors are values that flow through expressions; Spark kills the
task instead. The engine's convention: fallible expressions are wrapped
so failures become NULL (Spark's try_* family) or a struct
``{value, error}`` — never a task failure. This is the uniform
"try-ification" described in SURVEY.md §4.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def try_result(value: Column, error_when: Column, errmsg: Column | str) -> Column:
    """Build the ``{value, error}`` result struct: error populated and
    value nulled when ``error_when`` holds (try.go:116-134)."""
    msg = F.lit(errmsg) if isinstance(errmsg, str) else errmsg
    return F.struct(
        F.when(~error_when, value).alias("value"),
        F.when(error_when, msg).alias("error"),
    )


def try_keyed(value: Column, error_when: Column, key: str, errmsg: Column | str) -> Column:
    """``try(e, key)`` → value or ``{key: errmsg}`` (try.go:125-134)."""
    msg = F.lit(errmsg) if isinstance(errmsg, str) else errmsg
    return F.struct(
        F.when(~error_when, value).alias("value"),
        F.when(error_when, F.create_map(F.lit(key), msg)).alias("error"),
    )


def is_error(result: Column) -> Column:
    """``is_error(e)`` (try.go:136-138) on a result struct."""
    return _c(result).getField("error").isNotNull()


# try_* passthroughs: Spark's built-in error-absorbing arithmetic —
# the direct analogue of CEL's error-absorbing operators.
def try_divide(a, b) -> Column:
    return F.try_divide(_c(a), _c(b))


def try_add(a, b) -> Column:
    return F.try_add(_c(a), _c(b))


def try_multiply(a, b) -> Column:
    return F.try_multiply(_c(a), _c(b))


def try_cast(col, dtype: str) -> Column:
    return _c(col).try_cast(dtype)


def try_element_at(col, key) -> Column:
    """Optional access ``a.?b`` / ``x[?i]`` — NULL instead of error."""
    return F.try_element_at(_c(col), key if isinstance(key, Column) else F.lit(key))


def debug_observe(df, tag: str, *aggs):
    """``debug(tag, v)`` pass-through logging (debug.go:70-91) →
    df.observe: metrics collect on an Observation without perturbing
    the plan — the Spark-native version of log-and-continue. Returns
    (df, observation); read ``observation.get`` after an action."""
    from pyspark.sql import Observation

    if not aggs:
        return df, None
    obs = Observation(tag)
    return df.observe(obs, *aggs), obs


def debug_observe_result(df, tag: str, result_col):
    """Non-strict ``debug`` argument parity (debug.go:60-64,70-91:
    ``OverloadIsNonStrict`` — the CEL overload accepts ERROR values as
    its argument, logs them, and returns them unperturbed; a strict
    function would propagate the error instead of observing it).

    The engine's error-as-value convention carries errors in the
    ``{value, error}`` result struct, so the Spark twin observes a
    result-struct column and counts BOTH sides — error rows are
    loggable values here, never task failures — while the column flows
    through the returned DataFrame unchanged. Returns
    (df, observation); after an action ``observation.get`` yields
    {n_rows, n_errors, n_values} under the tag."""
    from pyspark.sql import Observation

    c = _c(result_col)
    obs = Observation(tag)
    return (
        df.observe(
            obs,
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(is_error(c).cast("long")).alias("n_errors"),
            F.sum((~is_error(c)).cast("long")).alias("n_values"),
        ),
        obs,
    )
