"""Skew mitigation utilities.

First line of defense is AQE's skew-join splitting (on in
engine.get_spark); salting is the explicit fallback for cases AQE
can't rewrite — e.g. a hot key that dominates one side of a shuffle
join, or pre-aggregation fan-in. The pattern: spread the skewed side
across `salt` sub-keys, replicate the other side once per sub-key,
join on (key, salt). Replication cost is |small side| × salt, so salt
is chosen per hot-key weight, not globally large.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s key distribution has hot keys:
    rows of ``skewed`` scatter uniformly over ``salt`` sub-partitions
    (deterministic xxhash64 of the whole row — no RNG, so retries and
    speculative tasks agree); ``other`` is replicated ``salt`` times
    via an exploded literal range. Result equals the plain join for
    ``inner`` and ``left`` (each skewed row carries exactly one salt,
    so unmatched left rows emit once; unmatched right rows emit
    nothing). ``right``/``full`` are rejected: the replicated side
    would emit each unmatched right row once per salt value.

    At 100 TB: use AQE first; reach for this when one key exceeds what
    a single task can hold, and scope it to the hot keys by unioning a
    salted join over hot keys with a plain join over the rest.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only (got {how!r}): "
            "the replicated side duplicates unmatched rows under "
            "right/full outer semantics"
        )
    keys = [on] if isinstance(on, str) else list(on)
    scatter = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt))
    left = skewed.withColumn("_salt", scatter)
    right = other.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = left.join(right, keys + ["_salt"], how)
    return out.drop("_salt")


def explain_shuffle_count(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan — the unit test for
    'did I add a shuffle I didn't mean to'. Broadcast exchanges are
    excluded: they replicate a small side, they don't repartition."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def hot_keys(
    df: DataFrame,
    key_cols: str | list[str],
    sample_fraction: float = 0.01,
    top: int = 20,
    min_share: float = 0.001,
) -> DataFrame:
    """Pre-flight skew diagnostic: estimate each key's share of the
    table from a deterministic hash sample, returning the ``top`` keys
    whose estimated share exceeds ``min_share`` — the list you feed to
    the hot-key branch of a scoped salted_join.

    Deterministic by construction (md5-threshold sampling over the
    full row content — NOT monotonically_increasing_id, which varies
    with partition layout): re-running the diagnostic, or running it
    after a repartition, selects the identical sample. Rows identical
    in every column sample together — acceptable for a share estimate.
    One aggregation over the sample, never a full-table groupBy; the
    output is capped at ``top`` rows."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    u = F.conv(
        F.substring(
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in df.columns])),
            1,
            15,
        ),
        16,
        10,
    ).cast("double") / float(1 << 60)
    sampled = df.where(u < sample_fraction)
    n_sampled = sampled.count()
    if n_sampled == 0:
        return df.sparkSession.createDataFrame(
            [], "key string, est_share double, n_sampled bigint"
        )
    return (
        sampled.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_sampled"))
        .withColumn("est_share", F.round(F.col("n_sampled") / F.lit(n_sampled), 6))
        .where(F.col("est_share") >= min_share)
        .orderBy(F.desc("est_share"), *keys)
        .limit(top)
        .select(
            F.concat_ws("|", *[F.col(c).cast("string") for c in keys]).alias("key"),
            "est_share",
            "n_sampled",
        )
    )
