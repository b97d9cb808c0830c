"""MMR re-ranking: diversification semantics + determinism."""

from __future__ import annotations

import math

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from mito_spark.operators.mmr import mmr_rerank

SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ]
)


def _unit(angle: float) -> list[float]:
    return [math.cos(angle), math.sin(angle), 0.0, 0.0]


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    """Query along x. Candidates: a tight near-duplicate cluster ~5-7
    degrees away IN THE XY-PLANE (high relevance, mutually ~identical)
    and one diverse candidate 40 degrees away in the ORTHOGONAL xz-
    plane (lower relevance, but its similarity to the cluster is
    attenuated by the extra dimension — the geometry where
    diversification can actually win; on a 1-D arc relevance decays
    exactly as fast as dissimilarity grows and greedy-by-relevance is
    MMR-optimal). Plain top-3 = the three clones; MMR top-3 must
    include the diverse candidate."""
    deg = math.pi / 180
    rows = [
        (0, _unit(0.0), 0),  # the query
        (10, _unit(5 * deg), 0),  # clone 1 (best rel)
        (11, _unit(6 * deg), 0),  # clone 2
        (12, _unit(7 * deg), 0),  # clone 3
        # diverse: same 40-degree relevance cost, rotated into z
        (20, [math.cos(40 * deg), 0.0, math.sin(40 * deg), 0.0], 0),
        (30, [0.0, 0.0, 0.0, 1.0], 0),  # orthogonal filler
        (31, [0.0, 0.0, 1.0, 0.0], 0),
    ]
    p = str(tmp_path / "emb")
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(p + "/embeddings.parquet")
    out = mmr_rerank(spark, p, n_queries=1, m=6, k=3, lam=0.5).collect()
    got = [r.neighbor_id for r in sorted(out, key=lambda r: r.rank)]
    assert got[0] == 10  # rank 1 = pure relevance
    assert 20 in got, f"diverse candidate not selected: {got}"
    assert set(got) != {10, 11, 12}  # not the clone cluster


def test_mmr_rank_structure(spark, sf_dir):
    out = mmr_rerank(spark, sf_dir, n_queries=5, m=10, k=4).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 5
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == [1, 2, 3, 4]
        assert len({r.neighbor_id for r in rs}) == 4  # no repeats
