"""Column-expression builders mirroring the reference's function
libraries (see SURVEY.md §2). All hot-path functions compile to built-in
Catalyst expressions (whole-stage codegen); Python/pandas UDFs appear
only where no built-in exists (hmac, limited-count replace, Go layout
quirks) and are Arrow-batched.
"""

from mito_spark.functions.collections import (
    arr_max,
    arr_min,
    collate,
    drop_empty,
    drop_path,
    flatten_deep,
    keys_sorted,
    map_with,
    map_with_replace,
    map_with_update,
    values_sorted,
    zip_map,
)
from mito_spark.functions import strings, crypto, timefns, regexpfns, jsonfns, tryfns

__all__ = [
    "collate",
    "drop_path",
    "drop_empty",
    "flatten_deep",
    "arr_min",
    "arr_max",
    "map_with",
    "map_with_update",
    "map_with_replace",
    "zip_map",
    "keys_sorted",
    "values_sorted",
    "strings",
    "crypto",
    "timefns",
    "regexpfns",
    "jsonfns",
    "tryfns",
]
