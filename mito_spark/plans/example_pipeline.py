"""Spark-first port of the reference's canonical pipeline
(/root/reference/example.cel on /root/reference/example.json — the
README walkthrough and the de-facto flagship query of the engine).

Reference semantics (example.cel:1-35):
  1. keep events where `other` is present and non-empty;
  2. if both `num` and `let` are non-empty: Cartesian product of the
     two array fields, each combo merged (`with`) into the event along
     with @timestamp/@triggered stamps, the original event re-encoded
     as JSON, and numlet = num+let;
  3. otherwise: the event passes through with only the stamps and
     original;
  4. flatten + drop_empty;
  5. cursor summary: collate('@timestamp') → {first: min, last: max,
     list: all}.

Spark mapping: the per-event Cartesian product is explode × explode
(row-level, so 100 TB of events never builds per-row product arrays
unless asked); the single-branch is a unioned select; the cursor is a
global agg. `with` (map merge, RHS wins) appears as withColumn /
struct rebuild — schema-first instead of dynamic-map mutation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def run_example_pipeline(events: DataFrame, now=None) -> tuple[DataFrame, DataFrame]:
    """events: DataFrame with (let array<string>, num array<string>,
    other string, ...). Returns (enriched_events, cursor).

    ``now`` defaults to current_timestamp() — pinned per query by
    Spark, matching the reference's eval-start `now` (lib/time.go:151).
    Pass a literal for deterministic tests.
    """
    if now is None:
        now = F.current_timestamp()

    base = events.where(F.col("other").isNotNull() & (F.col("other") != ""))
    original = F.to_json(F.struct(*[F.col(c) for c in events.columns]))

    has_both = (
        F.col("num").isNotNull()
        & (F.size("num") > 0)
        & F.col("let").isNotNull()
        & (F.size("let") > 0)
    )

    # Cartesian branch: explode × explode — the row-level form of the
    # reference's nested comprehension (example.cel:4-13)
    cartesian = (
        base.where(has_both)
        .withColumn("original", original)
        .withColumn("numlet", F.concat(F.col("num"), F.col("let")))
        .withColumn("num_v", F.explode("num"))
        .withColumn("let_v", F.explode("let"))
    )
    cartesian = cartesian.select(
        *[c for c in events.columns if c not in ("num", "let")],
        F.col("num_v").alias("num_value"),
        F.col("let_v").alias("let_value"),
        "original",
        "numlet",
        now.alias("triggered"),
        now.alias("timestamp"),
    )

    # pass-through branch (S × Ø): stamps + original only
    passthrough = base.where(~has_both).select(
        *[c for c in events.columns if c not in ("num", "let")],
        F.lit(None).cast("string").alias("num_value"),
        F.lit(None).cast("string").alias("let_value"),
        original.alias("original"),
        F.lit(None).cast("array<string>").alias("numlet"),
        now.alias("triggered"),
        now.alias("timestamp"),
    )

    enriched = cartesian.unionByName(passthrough)

    # cursor summary (example.cel:28-34): collate('@timestamp') →
    # {first, last, list}
    cursor = enriched.agg(
        F.min("timestamp").alias("first"),
        F.max("timestamp").alias("last"),
        F.collect_list("timestamp").alias("list"),
    )
    return enriched, cursor
