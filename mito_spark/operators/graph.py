"""Distributed connected components over the duplicate-pair graph —
the last stage of real corpus dedup: pairs → clusters → one canonical
document per cluster.

The reference stops at pair emission (its dedup surface is
pair-producing; SURVEY §2 notes no clustering op), but a 100 TB
training pipeline cannot: transitive duplicates (A~B, B~C, A!~C by
direct similarity) must collapse into ONE keep-decision, which needs
the connected components of the pair graph.

Algorithm: alternating Large-Star / Small-Star from Kiveris et al.,
"Connected Components in MapReduce and Beyond" (SOCC'14) — O(log n)
rounds to contract every component into a star centered on its
minimum node id, each round two shuffles (one window partition per
orientation). This beats naive min-label propagation, whose round
count is the component *diameter* (adversarial duplicate chains —
near-identical crawl snapshots — make that unbounded).

Scale notes:
- per-round state is the edge list itself; no collect of nodes or
  components to the driver — the only driver-side values are the
  2-number convergence signature (count + xxhash64 sum) per round;
- ``localCheckpoint`` each round truncates lineage, or iteration k's
  plan nests k window stages and the DAG re-executes from round 0;
- hot nodes (a component's minimum) concentrate edges on one key in
  the window partition — inherent to star contraction; rounds keep
  per-key fan-in bounded by component size which shrinks
  geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _large_star(e: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u})."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = F.least(F.col("u"), F.min("v").over(Window.partitionBy("u")))
    return (
        sym.withColumn("m", m)
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges (big → small); for each node u: connect every
    smaller neighbor (and u itself) to min(N_small(u) ∪ {u})."""
    oriented = (
        e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    withmin = oriented.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    to_min = withmin.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = withmin.select("u", F.col("m").alias("v")).distinct()
    return to_min.union(self_edge).distinct()


def _signature(e: DataFrame) -> tuple[int, int]:
    """(n_edges, order-free hash-sum) — the bounded driver-side
    convergence probe."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        # bit_xor: order-free and overflow-free under ANSI mode
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame, src: str = "src", dst: str = "dst", max_iter: int = 25
) -> DataFrame:
    """Labels each node of the undirected graph ``edges`` with its
    component's minimum node id. Returns (node, component); every node
    incident to an edge appears exactly once at convergence. Star
    contraction converges in O(log n) rounds, so ``max_iter`` is a
    runaway cap that legitimate inputs never hit; exhausting it
    RAISES rather than returning a partially contracted labeling —
    downstream is a destructive dedup manifest, and a silent partial
    result would emit duplicate rows per doc and wrong canonical
    picks (ADVICE r4)."""
    e = (
        edges.select(F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        # materialize BEFORE the loop: round 1 references e twice
        # (union with its reverse), which would execute the upstream
        # pair-producing plan — possibly a full LSH pipeline — twice
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    converged = False
    # max_iter + 1: convergence is detected by two consecutive equal
    # signatures, so a graph needing exactly max_iter contraction
    # rounds still gets its (no-op) confirmation round instead of a
    # spurious raise
    for _ in range(max_iter + 1):
        e = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = _signature(e)
        if sig == prev_sig:
            converged = True
            break
        prev_sig = sig
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "star contraction is O(log n), so this indicates a pathological "
            "edge stream — refusing to emit a partial labeling"
        )
    # converged: e is (node → component-min) for every non-root node
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return (
        e.union(roots)
        .distinct()
        .select(F.col("u").alias("node"), F.col("v").alias("component"))
    )


def dedup_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: MinHash-LSH duplicate pairs → connected
    components → per-cluster canonical pick (min doc_id). Output one
    row per clustered document: (cluster_id, doc_id, cluster_size,
    is_canonical) — the keep/drop manifest a dedup job applies."""
    from mito_spark.operators.dedup import minhash_lsh_dedup

    pairs = minhash_lsh_dedup(spark, sf_dir)
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("component").alias("cluster_id"),
            F.col("node").alias("doc_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def _cc_sql() -> str:
    from mito_spark.operators.dedup import MINHASH_LSH_SQL

    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({MINHASH_LSH_SQL}) mh
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
), comp AS (
  SELECT u AS doc_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
)
SELECT c.cluster_id, c.doc_id, s.cluster_size,
       c.doc_id = c.cluster_id AS is_canonical
FROM comp c
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id) s
  USING (cluster_id)
ORDER BY c.cluster_id, c.doc_id
"""


CC_SQL = _cc_sql()


def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """queries() entry: the embedding-space sibling of
    dedup_connected_components — LSH-blocked cosine near-dup pairs
    (similarity.embedding_near_dup) → connected components → canonical
    pick per cluster. Same star-contraction core, different pair
    generator: one CC implementation serves every dedup signal."""
    from mito_spark.operators.similarity import embedding_near_dup

    pairs = embedding_near_dup(spark, sf_dir)
    cc = connected_components(pairs, "id_a", "id_b")
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("component").alias("cluster_id"),
            F.col("node").alias("vec_id"),
            "cluster_size",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
        .orderBy("cluster_id", "vec_id")
    )


def _embedding_cc_sql() -> str:
    from mito_spark.operators.similarity import NEAR_DUP_SQL

    return f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({NEAR_DUP_SQL}) nd
), sym AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
), reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v <> r.u
), comp AS (
  SELECT u AS vec_id, LEAST(u, MIN(v)) AS cluster_id FROM reach GROUP BY u
)
SELECT c.cluster_id, c.vec_id, s.cluster_size,
       c.vec_id = c.cluster_id AS is_canonical
FROM comp c
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id) s
  USING (cluster_id)
ORDER BY c.cluster_id, c.vec_id
"""


EMBEDDING_CC_SQL = _embedding_cc_sql()
