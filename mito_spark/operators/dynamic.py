"""Dynamic-schema ("dyn") processing via Spark 4 VariantType.

The reference's entire data model is schemaless: `state` is CEL Dyn,
fields are discovered at runtime (SURVEY §1.1/§1.3). The Spark-native
mapping (SURVEY §1.4) is the variant column: parse once into a binary
semi-structured encoding, access fields with try_variant_get (typed,
null on miss — the `.?` optional-access semantics), and recover the
observed schema with schema_of_variant_agg.

Scale notes: variant parse + field access are JVM expressions
(codegen'd, no Python); unlike schema-on-read JSON strings, repeated
field access does not re-parse the document. For point lookups of one
field, get_json_object on the raw string (events_props_extract) is
still cheaper — variant wins when several fields are touched or types
matter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse props to variant once, extract a typed field, aggregate.
    Missing/mistyped fields become nulls (error-as-value), counted
    explicitly — never task failures."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("k_sum"),
            F.max("k").alias("k_max"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias("k_missing"),
            F.count(F.lit(1)).alias("n"),
        )
    )


PROPS_VARIANT_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS k_missing,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def events_props_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``has(state.?props.?k)`` over the event stream: optional-chain
    presence checks on dynamic JSON (reference optional_types.txt +
    has() macro, mito.go:83). A probe of a path that never exists
    (missing.x) exercises null-absorption — no error, just false —
    while staying JVM-side (variant expressions, no Python)."""
    from mito_spark.functions.jsonfns import has_json_path

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_type",
            has_json_path(F.col("props"), "k").alias("has_k"),
            has_json_path(F.col("props"), "missing.x").alias("has_missing"),
        )
        .groupBy("event_type")
        .agg(
            F.sum(F.col("has_k").cast("bigint")).alias("n_with_k"),
            F.sum(F.col("has_missing").cast("bigint")).alias("n_with_missing"),
            F.count(F.lit(1)).alias("n"),
        )
    )


PROPS_PRESENCE_SQL = """
SELECT event_type,
       CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_k,
       CAST(SUM(CASE WHEN json_extract(props, '$.missing.x') IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_with_missing,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def infer_dynamic_schema(df: DataFrame, column: str) -> str:
    """Observed-schema discovery over a dynamic column
    (schema_of_variant_agg): the engine-side answer to "what fields
    does this stream actually carry?" — one aggregate, no sampling
    collect."""
    return (
        df.select(F.parse_json(F.col(column)).alias("v"))
        .agg(F.schema_of_variant_agg("v").alias("s"))
        .collect()[0]["s"]
    )
