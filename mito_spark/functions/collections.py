"""Collections / dataflow-core operators.

Capability parity with the reference's collections library
(/root/reference/lib/collections.go: collate :885-971, drop :753-831,
drop_empty :652-744, flatten :560-583, with/with_update/with_replace
:585-622, zip :1005-1023, keys :1025-1053, values :1055-1096,
min/max compare :973-1003) — re-expressed as *schema-driven Catalyst
expression generators*, not an interpreter.

Why schema-driven: the reference walks dynamic JSON values at runtime.
Spark knows the static schema, so path descent (`a.b.c` through
structs, arrays and maps) is compiled once into nested
`getField`/`transform`/`element_at`/`flatten` built-ins that run
JVM-side inside whole-stage codegen — no Python in the row path, which
is what makes these viable over 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def split_path(path: str) -> list[str]:
    """Split a dotted path, honoring backslash-escaped dots
    (reference doc: lib/collections.go:117-131 — ``"a\\.b"`` is a
    literal key ``a.b``)."""
    parts: list[str] = []
    buf: list[str] = []
    i = 0
    while i < len(path):
        c = path[i]
        if c == "\\" and i + 1 < len(path) and path[i + 1] == ".":
            buf.append(".")
            i += 2
        elif c == ".":
            parts.append("".join(buf))
            buf = []
            i += 1
        else:
            buf.append(c)
            i += 1
    parts.append("".join(buf))
    return parts


def _field_type(dtype: DataType, name: str) -> DataType:
    if isinstance(dtype, StructType):
        return dtype[name].dataType
    if isinstance(dtype, MapType):
        return dtype.valueType
    raise ValueError(f"cannot descend into {dtype.simpleString()} with key {name!r}")


def _ndims(dtype: DataType) -> int:
    n = 0
    while isinstance(dtype, ArrayType):
        n += 1
        dtype = dtype.elementType
    return n


def _flatten_all(col: Column, dtype: DataType) -> tuple[Column, DataType]:
    """Fully flatten nested arrays (depth known from schema)."""
    while isinstance(dtype, ArrayType) and isinstance(dtype.elementType, ArrayType):
        col = F.flatten(col)
        dtype = dtype.elementType
    return col, dtype


def _collate_expr(col: Column, dtype: DataType, parts: list[str]) -> tuple[Column, DataType]:
    """Recursive core of collate: returns an ARRAY column of leaf
    values gathered at ``parts``, descending through arrays and
    splicing array leaves (collections.go:911-971 semantics)."""
    if not parts:
        if isinstance(dtype, ArrayType):
            return _flatten_all(col, dtype)
        return F.array(col), ArrayType(dtype)
    head, rest = parts[0], parts[1:]
    if isinstance(dtype, ArrayType):
        # Descend through the list: collate each element, then splice.
        elem = dtype.elementType
        inner_dtype_holder: list[DataType] = []

        def _lam(x: Column) -> Column:
            c, dt = _collate_expr(x, elem, parts)
            inner_dtype_holder.append(dt)
            return c

        mapped = F.transform(col, _lam)
        inner_dt = inner_dtype_holder[0]
        return _flatten_all(mapped, ArrayType(inner_dt))
    if isinstance(dtype, StructType):
        return _collate_expr(col.getField(head), _field_type(dtype, head), rest)
    if isinstance(dtype, MapType):
        return _collate_expr(F.element_at(col, F.lit(head)), dtype.valueType, rest)
    raise ValueError(f"path component {head!r} cannot be applied to {dtype.simpleString()}")


def collate(df: DataFrame, column: str, path: str | list[str]) -> Column:
    """``doc.collate(path | [paths])`` — gather all values at dotted
    path(s) into a single array, descending through intervening arrays
    and flattening array leaves. Multiple paths concatenate in order.

    Returns a Column usable in ``df.select``/``withColumn``.
    """
    dtype = df.schema[column].dataType
    paths = [path] if isinstance(path, str) else list(path)
    pieces = [_collate_expr(F.col(column), dtype, split_path(p))[0] for p in paths]
    return pieces[0] if len(pieces) == 1 else F.concat(*pieces)


def _drop_expr(col: Column, dtype: DataType, parts: list[str]) -> Column:
    """Remove the field at ``parts``, recursing through arrays
    (collections.go:767-831)."""
    head, rest = parts[0], parts[1:]
    if isinstance(dtype, ArrayType):
        return F.transform(col, lambda x: _drop_expr(x, dtype.elementType, parts))
    if isinstance(dtype, StructType):
        names = [f.name for f in dtype.fields]
        if head not in names:
            return col
        if not rest:
            return col.dropFields(f"`{head}`")
        return col.withField(
            f"`{head}`", _drop_expr(col.getField(head), dtype[head].dataType, rest)
        )
    if isinstance(dtype, MapType):
        if not rest:
            return F.map_filter(col, lambda k, _v: k != F.lit(head))
        return F.transform_values(
            col,
            lambda k, v: F.when(
                k == F.lit(head), _drop_expr(v, dtype.valueType, rest)
            ).otherwise(v),
        )
    return col


def drop_path(df: DataFrame, column: str, path: str | list[str]) -> Column:
    """``doc.drop(path | [paths])`` — remove fields at dotted paths,
    recursing into arrays of structs/maps."""
    dtype = df.schema[column].dataType
    paths = [path] if isinstance(path, str) else list(path)
    col = F.col(column)
    for p in paths:
        col = _drop_expr(col, dtype, split_path(p))
        # dtype of struct changes after dropFields; recompute lazily is
        # complex — applying sequential drops on distinct paths is safe
        # because _drop_expr only inspects the static path names.
    return col


def _drop_empty_expr(col: Column, dtype: DataType) -> Column:
    """Recursively null-out / filter-out empty lists and maps.

    Typed-Spark adaptation of collections.go:652-744: dynamic JSON can
    physically remove a key; a typed row cannot, so empties inside
    arrays are *filtered out* and empties at struct/map positions become
    NULL. Empty strings are kept, matching the reference.
    """
    if isinstance(dtype, ArrayType):
        elem = dtype.elementType
        cleaned = F.transform(col, lambda x: _drop_empty_expr(x, elem))
        if isinstance(elem, (ArrayType, MapType)):
            cleaned = F.filter(cleaned, lambda x: x.isNotNull() & (F.size(x) > 0))
        else:
            cleaned = F.filter(cleaned, lambda x: x.isNotNull())
        return F.when(F.size(cleaned) > 0, cleaned)
    if isinstance(dtype, MapType):
        cleaned = F.transform_values(col, lambda _k, v: _drop_empty_expr(v, dtype.valueType))
        cleaned = F.map_filter(cleaned, lambda _k, v: v.isNotNull())
        return F.when(F.size(cleaned) > 0, cleaned)
    if isinstance(dtype, StructType):
        out = col
        for f in dtype.fields:
            if isinstance(f.dataType, (ArrayType, MapType, StructType)):
                out = out.withField(f"`{f.name}`", _drop_empty_expr(out.getField(f.name), f.dataType))
        return out
    return col


def _dtype_at(df: DataFrame, column: str) -> DataType:
    """Resolve a possibly-dotted column reference ('doc.x.y') to its
    static type by walking struct fields."""
    parts = column.split(".")
    dtype: DataType = df.schema[parts[0]].dataType
    for part in parts[1:]:
        dtype = _field_type(dtype, part)
    return dtype


def drop_empty(df: DataFrame, column: str) -> Column:
    """``doc.drop_empty()`` — empty lists/maps removed recursively
    (filtered inside arrays, nulled elsewhere); empty strings kept."""
    return _drop_empty_expr(F.col(column), _dtype_at(df, column))


def flatten_deep(df: DataFrame, column: str) -> Column:
    """``list.flatten()`` — full depth-first flatten. Depth is read
    from the static schema, so this compiles to ``flatten`` applied
    (ndims-1) times — O(depth) built-in calls, no UDF
    (collections.go:560-583)."""
    dtype = _dtype_at(df, column)
    col = F.col(column)
    for _ in range(_ndims(dtype) - 1):
        col = F.flatten(col)
    return col


def arr_min(col: Column | str) -> Column:
    """``list.min()`` (collections.go:171-193) → built-in array_min."""
    return F.array_min(col)


def arr_max(col: Column | str) -> Column:
    return F.array_max(col)


def map_with(a: Column, b: Column) -> Column:
    """``m.with(n)`` — merge maps, right side wins on key conflicts
    (collections.go:585-594). Built from map_filter+map_concat so it
    never trips Spark's duplicate-key policy."""
    return F.map_concat(F.map_filter(a, lambda k, _v: ~F.map_contains_key(b, k)), b)


def map_with_update(a: Column, b: Column) -> Column:
    """``m.with_update(n)`` — merge, existing keys kept
    (collections.go:596-608)."""
    return F.map_concat(a, F.map_filter(b, lambda k, _v: ~F.map_contains_key(a, k)))


def map_with_replace(a: Column, b: Column) -> Column:
    """``m.with_replace(n)`` — only keys already present are
    overwritten (collections.go:610-622)."""
    return F.map_concat(
        F.map_filter(a, lambda k, _v: ~F.map_contains_key(b, k)),
        F.map_filter(b, lambda k, _v: F.map_contains_key(a, k)),
    )


def zip_map(keys: Column, values: Column) -> Column:
    """``keys.zip(values)`` → map; error on length mismatch surfaces
    as NULL (error-as-value convention) rather than task failure
    (collections.go:1005-1023)."""
    return F.when(F.size(keys) == F.size(values), F.map_from_arrays(keys, values))


def keys_sorted(m: Column) -> Column:
    """``m.keys()`` — sorted key list (collections.go:1025-1053)."""
    return F.array_sort(F.map_keys(m))


def values_sorted(m: Column) -> Column:
    """``m.values()`` — values ordered by sorted key
    (collections.go:1055-1096)."""
    return F.transform(F.array_sort(F.map_keys(m)), lambda k: F.element_at(m, k))
