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
