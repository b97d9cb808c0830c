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

from mito_spark.engine import load_table


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


def _small_star(e: DataFrame, pre_oriented: bool = False) -> DataFrame:
    """Orient edges (big → small); for each node u: connect every
    smaller neighbor (and u itself) to min(N_small(u) ∪ {u}).

    ``pre_oriented``: the input is already distinct with u > v on
    every row — true for ``_large_star`` output, whose every edge is
    (v_orig, m) with v_orig > u_orig >= m — so the orient projection,
    the self-loop filter and the distinct (a full shuffle per round)
    are no-ops and are skipped."""
    oriented = (
        e
        if pre_oriented
        else e.select(F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    withmin = oriented.withColumn("m", F.min("v").over(Window.partitionBy("u")))
    to_min = withmin.where(F.col("v") != F.col("m")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = withmin.select("u", F.col("m").alias("v")).distinct()
    return to_min.union(self_edge).distinct()


def _is_star_forest(e: DataFrame) -> bool:
    """Convergence probe: the alternating-star fixpoints are exactly
    the depth-1 star forests (Kiveris et al. §3) pointing at component
    minima: every row child-to-smaller-parent (u > v), every node with
    at most one parent edge (u values unique), and no node both a
    child and a parent (u and v columns disjoint) — then each parent
    is smaller than all its children, so it IS the component min. The
    u > v clause is free on post-round frames (``_small_star`` only
    emits u > v) but rejects a wrongly-oriented INITIAL edge list that
    happens to be star-shaped (labels would not be minima). Detecting
    the star directly ends the loop one round earlier than the r1-r12
    two-equal-signatures probe, which needed a full (no-op)
    contraction round plus its probe to confirm the fixpoint. One
    aggregate job over the tagged node list — same bounded
    3-numbers-to-the-driver discipline as ``_signature``."""
    tagged = e.select(
        F.col("u").alias("node"), F.lit(1).alias("t"), (F.col("u") > F.col("v")).alias("ok")
    ).unionAll(e.select(F.col("v").alias("node"), F.lit(2).alias("t"), F.lit(True).alias("ok")))
    row = (
        tagged.groupBy("node")
        .agg(
            F.min("t").alias("mn"),
            F.max("t").alias("mx"),
            F.count(F.when(F.col("t") == 1, 1)).alias("deg_u"),
            F.min("ok").alias("all_ok"),
        )
        .agg(
            F.count(F.when((F.col("mn") == 1) & (F.col("mx") == 2), 1)).alias("both"),
            F.coalesce(F.max("deg_u"), F.lit(0)).alias("max_deg"),
            F.coalesce(F.min("all_ok"), F.lit(True)).alias("oriented"),
        )
        .first()
    )
    return int(row["both"]) == 0 and int(row["max_deg"]) <= 1 and bool(row["oriented"])


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
    converged = False
    # max_iter + 1 probe slots: a graph needing exactly max_iter
    # contraction rounds still gets its final star check instead of a
    # spurious raise
    for _ in range(max_iter + 1):
        if _is_star_forest(e):
            converged = True
            break
        e = _small_star(_large_star(e), pre_oriented=True).localCheckpoint(eager=True)
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds; "
            "star contraction is O(log n), so this indicates a pathological "
            "edge stream — refusing to emit a partial labeling"
        )
    # converged: e is (node → component-min) for every non-root node.
    # e is distinct with u > v on every row and roots is distinct with
    # u == v, so the branches are disjoint and each is duplicate-free —
    # the r1-r12 union-level distinct was a redundant full shuffle
    roots = e.select(F.col("v").alias("u"), F.col("v")).distinct()
    return e.union(roots).select(F.col("u").alias("node"), F.col("v").alias("component"))


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


def dedup_canonical_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-based canonical pick per duplicate cluster — what a
    production dedup actually keeps: ``dedup_connected_components``'s
    min-doc_id canonical is arbitrary; real pipelines keep the BEST
    representative of each near-dup cluster (longest / highest-quality
    variant — the curation convention in RefinedWeb-style pipelines),
    so the drop decision and the quality filter compose instead of
    fighting (keep-first can discard the one good copy of a page and
    keep its truncated mirror).

    Canonical rule: highest ``quality_score`` in the cluster, doc_id
    ascending on ties — deterministic on any partitioning. Output one
    row per CLUSTERED doc: (cluster_id, doc_id, cluster_size, quality,
    is_canonical); unclustered docs are absent (they keep themselves).

    Pure composition of two oracled chains (MinHash CC + the quality
    heuristic) joined on doc_id; the rank window is keyed by cluster
    (cluster count scales with the corpus — no collapse; cluster SIZES
    are the bounded dimension). The oracle composes both twins.
    """
    from pyspark.sql import Window

    from mito_spark.operators.dedup import minhash_lsh_dedup
    from mito_spark.operators.text import quality_score

    pairs = minhash_lsh_dedup(spark, sf_dir)
    cc = connected_components(pairs, "id_a", "id_b")
    q = quality_score(spark, sf_dir).select(
        F.col("doc_id").alias("node"), "quality"
    )
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    ranked = (
        cc.join(q, "node")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("component").orderBy(
                    F.desc("quality"), F.asc("node")
                )
            ),
        )
    )
    return (
        ranked.join(sizes, "component")
        .select(
            F.col("component").alias("cluster_id"),
            F.col("node").alias("doc_id"),
            "cluster_size",
            "quality",
            (F.col("rk") == 1).alias("is_canonical"),
        )
        .orderBy("cluster_id", "doc_id")
    )


def _canonical_quality_sql() -> str:
    from mito_spark.operators.dedup import MINHASH_LSH_SQL
    from mito_spark.operators.text import QUALITY_SQL

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
), q AS ({QUALITY_SQL}
), sized AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM comp GROUP BY cluster_id
), ranked AS (
  SELECT c.cluster_id, c.doc_id, q.quality,
         ROW_NUMBER() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.quality DESC, c.doc_id ASC) AS rk
  FROM comp c JOIN q ON c.doc_id = q.doc_id
)
SELECT r.cluster_id, r.doc_id, s.cluster_size, r.quality, r.rk = 1 AS is_canonical
FROM ranked r JOIN sized s USING (cluster_id)
ORDER BY r.cluster_id, r.doc_id
"""


CANONICAL_QUALITY_SQL = _canonical_quality_sql()


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


def label_propagation(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = 2,
    k: int = 5,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Semi-supervised label propagation over the kNN graph
    (Zhu & Ghahramani 2002, discrete-majority form): seed nodes
    (vec_id % 4 == 0) keep their true label; each round, every
    still-unlabeled node takes the MAJORITY label among its labeled
    kNN neighbors (ties -> smallest label id; no labeled neighbor ->
    stays unlabeled). Labels are monotone — once assigned, fixed —
    which makes the unrolled ``rounds`` iterations deterministic and
    bit-portable to the SQL twin. Propagation is GATED on the seed
    predicate, not on lab's nullness, so a seed whose true label is
    NULL stays NULL rather than absorbing a neighbor vote — the
    'seeds keep their true label' invariant holds even on nullable
    label columns (ADVICE r5).

    The label-spreading pass every curation pipeline runs to extend a
    small hand-labeled set over the corpus before domain filtering.

    Scale shape: edges come from similarity.knn_graph (LSH-blocked,
    never O(n²)) and are checkpointed once; pass a precomputed
    ``edges`` frame (vec_id, neighbor_id) to reuse a graph you
    already built — a composed report then pays the kNN construction
    once instead of per consumer (VERDICT r5 wrong#3). Each round is
    one edge-keyed join + one (node, label) rollup + one per-node
    pick — all shuffles on vec_id, plan growth bounded by per-round
    localCheckpoint (the MMR lesson, mmr.py).
    """
    from mito_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    if edges is None:
        edges = knn_graph(spark, sf_dir, k=k)
    edges = edges.select("vec_id", "neighbor_id").localCheckpoint()
    is_seed = F.col("vec_id") % 4 == 0
    cur = emb.select(
        "vec_id",
        "label",
        F.when(is_seed, F.col("label")).alias("lab"),
    )
    for _ in range(rounds):
        nb = cur.select(
            F.col("vec_id").alias("neighbor_id"), F.col("lab").alias("nlab")
        )
        votes = (
            edges.join(nb, "neighbor_id")
            .where(F.col("nlab").isNotNull())
            .groupBy("vec_id", "nlab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("c"), F.asc("nlab"))
        pick = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("vec_id", F.col("nlab").alias("plab"))
        )
        cur = (
            cur.join(pick, "vec_id", "left")
            .select(
                "vec_id",
                "label",
                F.when(is_seed, F.col("lab"))
                .otherwise(F.coalesce("lab", "plab"))
                .alias("lab"),
            )
            .localCheckpoint()
        )
    return cur.select(
        "vec_id",
        F.col("label").alias("true_label"),
        (F.col("vec_id") % 4 == 0).alias("is_seed"),
        F.col("lab").alias("pred_label"),
    )


def _lp_ctes(rounds: int = 2, prefix: str = "") -> tuple[list[str], str]:
    """Label-propagation CTE chain (references a ``knn`` CTE supplied
    by the caller). ``prefix`` namespaces the CTE names so the chain
    composes with other unrolled chains in one statement
    (graph_report). Returns (cte_defs, final_relation_name)."""
    p = prefix
    parts = [
        f"""{p}r0 AS (
  SELECT vec_id, label, CASE WHEN vec_id % 4 = 0 THEN label END AS lab
  FROM embeddings
)""",
    ]
    for r in range(1, rounds + 1):
        parts.append(f"""{p}v{r} AS (
  SELECT e.vec_id, n.lab AS nlab, COUNT(*) AS c
  FROM knn e JOIN {p}r{r - 1} n ON e.neighbor_id = n.vec_id
  WHERE n.lab IS NOT NULL GROUP BY e.vec_id, n.lab
)""")
        parts.append(f"""{p}p{r} AS (
  SELECT vec_id, nlab FROM (
    SELECT vec_id, nlab,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY c DESC, nlab) AS rn
    FROM {p}v{r}
  ) WHERE rn = 1
)""")
        parts.append(f"""{p}r{r} AS (
  SELECT a.vec_id, a.label,
         CASE WHEN a.vec_id % 4 = 0 THEN a.lab
              ELSE COALESCE(a.lab, b.nlab) END AS lab
  FROM {p}r{r - 1} a LEFT JOIN {p}p{r} b ON a.vec_id = b.vec_id
)""")
    return parts, f"{p}r{rounds}"


def _lp_sql(rounds: int = 2, k: int = 5) -> str:
    from mito_spark.operators.similarity import _knn_graph_sql

    ctes, final = _lp_ctes(rounds)
    return (
        ",\n".join([f"WITH knn AS ({_knn_graph_sql(k=k)})"] + ctes)
        + f"""
SELECT vec_id, label AS true_label, vec_id % 4 = 0 AS is_seed,
       lab AS pred_label
FROM {final}
"""
    )


LABEL_PROP_SQL = _lp_sql()


def dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size distribution of the near-dup components — the
    one-screen report a dedup run is judged by (how much mass sits in
    how-big clusters): (cluster_size, n_clusters, n_docs, docs_dropped
    = n_docs - n_clusters). Composes dedup_connected_components; the
    histogram has at most |distinct sizes| rows at any corpus size."""
    cc = dedup_connected_components(spark, sf_dir)
    return (
        cc.groupBy("cluster_size")
        .agg(
            F.count_distinct("cluster_id").alias("n_clusters"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            (F.col("n_docs") - F.col("n_clusters")).alias("docs_dropped"),
        )
        .orderBy("cluster_size")
    )


def _cluster_stats_sql() -> str:
    return f"""
WITH cc AS ({CC_SQL})
SELECT cluster_size,
       COUNT(DISTINCT cluster_id) AS n_clusters,
       COUNT(*) AS n_docs,
       COUNT(*) - COUNT(DISTINCT cluster_id) AS docs_dropped
FROM cc GROUP BY cluster_size ORDER BY cluster_size
"""


CLUSTER_STATS_SQL = _cluster_stats_sql()


PR_ROUNDS = 3
PR_DAMPING = 0.85


def knn_pagerank(
    spark: SparkSession,
    sf_dir: str,
    rounds: int = PR_ROUNDS,
    d: float = PR_DAMPING,
    k: int = 5,
    edges: DataFrame | None = None,
) -> DataFrame:
    """PageRank over the kNN graph, ``rounds`` unrolled power
    iterations (Brin & Page 1998): rank'(v) = (1−d)/N + d·Σ
    rank(u)/outdeg(u) over in-neighbors u — the centrality score a
    curation pipeline uses to pick canonical/representative documents
    inside near-dup neighborhoods (rank mass concentrates on the
    vectors most linked-to by their neighbors).

    Engine-exact float discipline: per-edge contributions are rounded
    to 12dp and summed as DECIMAL(38,12) (order-free — a double sum
    over shuffled edges is partition-order-dependent), the damping
    update runs in doubles with the same literal arithmetic on both
    engines, and each round's ranks are re-rounded to 12dp so the next
    round's inputs are identical bit patterns. The DuckDB twin unrolls
    the same rounds over the same knn SQL.

    Dangling mass IS redistributed (the full textbook update): LSH
    blocking can leave nodes with zero out-edges (9 of 500 at
    sf0.001), so without the dangling term total rank leaks ~1.5% per
    graph and the scores stop being a distribution. Each round the
    dangling nodes' mass (a decimal-exact 1-row aggregate, broadcast
    in-plan — never a driver collect) is spread uniformly:
    r'(v) = (1−d)/N + d·(Σ contribs(v) + dangling/N). Total mass
    stays 1 up to output rounding (asserted by test).

    Scale shape: per round one edge-keyed join + one dst rollup — the
    same two shuffles as label_propagation — plus a 1-row anti-join
    aggregate for the dangling mass; per-round localCheckpoint bounds
    plan growth (the MMR lesson). Pass a precomputed ``edges`` frame
    to reuse a graph you already built.
    """
    from mito_spark.operators.similarity import knn_graph

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id")
    if edges is None:
        edges = knn_graph(spark, sf_dir, k=k)
    edges = edges.select("vec_id", "neighbor_id").localCheckpoint()
    n_row = emb.agg(F.count(F.lit(1)).alias("n_nodes"))
    outdeg = edges.groupBy("vec_id").agg(F.count(F.lit(1)).alias("outdeg"))
    nodes = emb.crossJoin(F.broadcast(n_row))  # 1x1 broadcast of N
    cur = nodes.select(
        "vec_id", "n_nodes", (F.lit(1.0) / F.col("n_nodes")).alias("rank")
    )
    for _ in range(rounds):
        contribs = (
            cur.join(outdeg, "vec_id")
            .join(edges, "vec_id")
            .select(
                F.col("neighbor_id").alias("dst"),
                F.round(F.col("rank") / F.col("outdeg"), 12)
                .cast("decimal(38,12)")
                .alias("c"),
            )
        )
        sums = contribs.groupBy("dst").agg(F.sum("c").alias("s"))
        dang = (
            cur.join(outdeg, "vec_id", "left_anti")
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(38,12)")),
                    F.lit(0).cast("decimal(38,12)"),
                ).alias("dm")
            )
        )
        cur = (
            nodes.join(sums, nodes["vec_id"] == sums["dst"], "left")
            .crossJoin(F.broadcast(dang))  # 1-row dangling mass
            .select(
                nodes["vec_id"],
                "n_nodes",
                F.round(
                    F.lit(1.0 - d) / F.col("n_nodes")
                    + F.lit(d)
                    * (
                        F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                        + F.col("dm").cast("double") / F.col("n_nodes")
                    ),
                    12,
                ).alias("rank"),
            )
            .localCheckpoint()
        )
    return cur.select("vec_id", F.round("rank", 6).alias("pagerank")).orderBy("vec_id")


def _pr_ctes(
    rounds: int = PR_ROUNDS, d: float = PR_DAMPING, prefix: str = ""
) -> tuple[list[str], str]:
    """PageRank CTE chain (references a caller-supplied ``knn`` CTE);
    ``prefix`` namespaces the chain for composition (graph_report).
    Returns (cte_defs, final_relation_name)."""
    p = prefix
    om_d = repr(1.0 - d)  # same IEEE literal both engines
    parts = [
        f"{p}n AS (SELECT COUNT(*) AS n_nodes FROM embeddings)",
        f"{p}deg AS (SELECT vec_id, COUNT(*) AS outdeg FROM knn GROUP BY vec_id)",
        f"""{p}r0 AS (
  SELECT vec_id, 1.0 / (SELECT n_nodes FROM {p}n) AS rank FROM embeddings
)""",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""{p}c{i} AS (
  SELECT e.neighbor_id AS dst,
         CAST(ROUND(r.rank / g.outdeg, 12) AS DECIMAL(38,12)) AS c
  FROM {p}r{i - 1} r JOIN {p}deg g USING (vec_id) JOIN knn e ON r.vec_id = e.vec_id
)""")
        parts.append(f"""{p}s{i} AS (
  SELECT dst, SUM(c) AS s FROM {p}c{i} GROUP BY dst
)""")
        parts.append(f"""{p}dm{i} AS (
  SELECT COALESCE(SUM(CAST(rank AS DECIMAL(38,12))), 0) AS dm
  FROM {p}r{i - 1} WHERE vec_id NOT IN (SELECT vec_id FROM {p}deg)
)""")
        parts.append(f"""{p}r{i} AS (
  SELECT b.vec_id,
         ROUND({om_d} / (SELECT n_nodes FROM {p}n)
               + {d} * (COALESCE(CAST(s AS DOUBLE), 0.0)
                        + CAST((SELECT dm FROM {p}dm{i}) AS DOUBLE) / (SELECT n_nodes FROM {p}n)), 12) AS rank
  FROM embeddings b LEFT JOIN {p}s{i} ON b.vec_id = {p}s{i}.dst
)""")
    return parts, f"{p}r{rounds}"


def _pagerank_sql(rounds: int = PR_ROUNDS, d: float = PR_DAMPING, k: int = 5) -> str:
    from mito_spark.operators.similarity import _knn_graph_sql

    ctes, final = _pr_ctes(rounds, d)
    return (
        ",\n".join([f"WITH knn AS ({_knn_graph_sql(k=k)})"] + ctes)
        + f"\nSELECT vec_id, ROUND(rank, 6) AS pagerank FROM {final} ORDER BY vec_id\n"
    )


PAGERANK_SQL = _pagerank_sql()


def graph_report(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """The composed per-node graph report — kNN graph built ONCE,
    consumed by FOUR analyses (VERDICT r6 wrong#3 closed; r7 next#5
    folds the neighborhood-density consumer in so every graph reader
    shares the one build):

    - label_propagation(edges=...) → pred_label (+ seed flags),
    - knn_pagerank(edges=...)      → pagerank,
    - an in-degree rollup over the same edges → in_degree (the
      how-often-am-I-someone's-neighbor popularity signal; kNN
      out-degree is ~k by construction, in-degree is the skewed,
      informative one),
    - graph_clustering(edges=...)  → degree / n_triangles /
      clustering_coeff over the symmetrized graph (tight-clump vs
      boundary-point signal).

    The LSH-blocked kNN construction — the dominant cost — is paid
    once at the edges localCheckpoint; each consumer's re-checkpoint
    copies the materialized edge list (|V|·k rows), never re-runs the
    LSH pipeline. A/B in BENCH_NOTES: vs running the consumers
    separately (each building its own graph), the composition saves
    the full cost of every build after the first.

    The oracle composes all unrolled chains (namespaced CTEs) plus
    the degree rollups over ONE shared knn CTE — the same share-the-
    graph shape, hash-checked end-to-end.
    """
    from mito_spark.operators.similarity import knn_graph

    edges = knn_graph(spark, sf_dir, k=k).select("vec_id", "neighbor_id").localCheckpoint()
    lp = label_propagation(spark, sf_dir, edges=edges)
    pr = knn_pagerank(spark, sf_dir, edges=edges)
    indeg = edges.groupBy(F.col("neighbor_id").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("in_degree")
    )
    cl = _clustering_frame(edges)
    return (
        lp.join(pr, "vec_id")
        .join(indeg, "vec_id", "left")
        .join(cl, "vec_id", "left")
        .select(
            "vec_id",
            "true_label",
            "is_seed",
            "pred_label",
            "pagerank",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("degree", F.lit(0)).alias("degree"),
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            "clustering_coeff",
        )
        .orderBy("vec_id")
    )


def _graph_report_sql(
    lp_rounds: int = 2,
    pr_rounds: int = PR_ROUNDS,
    d: float = PR_DAMPING,
    k: int = 5,
) -> str:
    from mito_spark.operators.similarity import _knn_graph_sql

    lp_ctes, lp_final = _lp_ctes(lp_rounds, prefix="lp_")
    pr_ctes, pr_final = _pr_ctes(pr_rounds, d, prefix="pr_")
    indeg = "ind AS (SELECT neighbor_id AS vec_id, COUNT(*) AS in_degree FROM knn GROUP BY neighbor_id)"
    return (
        ",\n".join(
            [f"WITH knn AS ({_knn_graph_sql(k=k)})"]
            + lp_ctes
            + pr_ctes
            + [indeg]
            + _clustering_ctes(prefix="cl_")
        )
        + f"""
SELECT l.vec_id, l.label AS true_label, l.vec_id % 4 = 0 AS is_seed,
       l.lab AS pred_label, ROUND(p.rank, 6) AS pagerank,
       COALESCE(i.in_degree, 0) AS in_degree,
       {_clustering_select_cols("cd", "cp")}
FROM {lp_final} l
JOIN {pr_final} p ON l.vec_id = p.vec_id
LEFT JOIN ind i ON l.vec_id = i.vec_id
LEFT JOIN cl_deg cd ON l.vec_id = cd.vec_id
LEFT JOIN cl_per_node cp ON l.vec_id = cp.vec_id
ORDER BY l.vec_id
"""
    )


# (GRAPH_REPORT_SQL is assigned after the clustering CTE helpers it
# splices in — see the bottom of the clustering section)


def graph_clustering(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over
    the (symmetrized) kNN graph — the neighborhood-density signal that
    separates documents sitting in tight near-duplicate clumps
    (coefficient → 1: my neighbors know each other; prime semdedup
    candidates) from hub-ish boundary points (→ 0). Watts & Strogatz
    1998 local coefficient: C_v = 2·T_v / (deg_v·(deg_v−1)), NULL for
    deg < 2 (undefined, not zero).

    Plan: symmetrize + orient (a<b) the edge list once, count each
    triangle exactly once as an ordered triple (a<b<c) via two
    edge-keyed self-joins — the standard distributed triangle join
    (node-keyed shuffles; hub skew is AQE's skew-join case), then one
    explode to per-corner counts. Work is bounded by the kNN edge list
    (|V|·k rows), never the corpus. Accepts a precomputed ``edges``
    frame like the other graph consumers (build the graph once, feed
    every analysis).
    """
    from mito_spark.operators.similarity import knn_graph

    if edges is None:
        edges = knn_graph(spark, sf_dir, k=k)
    return _clustering_frame(edges).orderBy("vec_id")


def _clustering_frame(edges: DataFrame) -> DataFrame:
    """The unordered per-node (degree, n_triangles, clustering_coeff)
    frame over a precomputed edge list — shared by the standalone
    ``graph_clustering`` and the composed ``graph_report`` (which
    orders once at the end; an inner sort would just be a wasted
    exchange under the report's joins)."""
    e = edges.select(
        F.col("vec_id").cast("long").alias("u"),
        F.col("neighbor_id").cast("long").alias("v"),
    )
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).where(
        F.col("u") != F.col("v")
    ).distinct().localCheckpoint()
    deg = sym.groupBy(F.col("u").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    und = sym.where(F.col("u") < F.col("v"))
    e1 = und.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = und.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = und.select(F.col("u").alias("a2"), F.col("v").alias("c2"))
    tri = (
        e1.join(e2, "b")
        .join(e3, (F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("vec_id"))
        .groupBy("vec_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.join(per_node, "vec_id", "left")
        .select(
            "vec_id",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
            F.when(
                F.col("degree") >= 2,
                F.round(
                    (2 * F.coalesce("n_triangles", F.lit(0))).cast("double")
                    / (F.col("degree") * (F.col("degree") - 1)).cast("double"),
                    6,
                ),
            ).alias("clustering_coeff"),
        )
    )


def _clustering_ctes(prefix: str = "") -> list[str]:
    """Namespaced clustering CTE list over a shared ``knn`` CTE —
    consumed by the standalone twin and spliced into the composed
    graph_report twin (same share-the-graph shape as _lp_ctes /
    _pr_ctes). Ends with {p}deg and {p}per_node."""
    p = prefix
    return [
        f"""{p}sym AS (
  SELECT DISTINCT u, v FROM (
    SELECT vec_id AS u, neighbor_id AS v FROM knn
    UNION ALL
    SELECT neighbor_id AS u, vec_id AS v FROM knn
  ) WHERE u <> v
)""",
        f"""{p}deg AS (
  SELECT u AS vec_id, COUNT(*) AS degree FROM {p}sym GROUP BY u
)""",
        f"""{p}und AS (
  SELECT u, v FROM {p}sym WHERE u < v
)""",
        f"""{p}tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM {p}und e1
  JOIN {p}und e2 ON e2.u = e1.v
  JOIN {p}und e3 ON e3.u = e1.u AND e3.v = e2.v
)""",
        f"""{p}per_node AS (
  SELECT node AS vec_id, COUNT(*) AS n_triangles FROM (
    SELECT unnest([a, b, c]) AS node FROM {p}tri
  ) GROUP BY node
)""",
    ]


def _clustering_select_cols(d: str = "d", p: str = "p") -> str:
    """The three output expressions over the deg / per_node join
    aliases — shared verbatim by both twins (COALESCE on degree is
    value-neutral for the standalone twin, where every selected node
    comes FROM deg, and covers the composed twin's LEFT JOIN)."""
    return f"""COALESCE(CAST({d}.degree AS BIGINT), 0) AS degree,
       CAST(COALESCE({p}.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN {d}.degree >= 2
            THEN ROUND(CAST(2 * COALESCE({p}.n_triangles, 0) AS DOUBLE)
                       / ({d}.degree * ({d}.degree - 1)), 6)
       END AS clustering_coeff"""


def _graph_clustering_sql(k: int = 5) -> str:
    from mito_spark.operators.similarity import _knn_graph_sql

    ctes = ",\n".join([f"WITH knn AS ({_knn_graph_sql(k=k)})"] + _clustering_ctes())
    return (
        ctes
        + f"""
SELECT d.vec_id,
       {_clustering_select_cols()}
FROM deg d LEFT JOIN per_node p ON d.vec_id = p.vec_id
ORDER BY d.vec_id
"""
    )


GRAPH_CLUSTERING_SQL = _graph_clustering_sql()
GRAPH_REPORT_SQL = _graph_report_sql()


# --- k-core decomposition (iterative peeling, unrolled) --------------

KCORE_K = 4
KCORE_ROUNDS = 12


def graph_kcore(
    spark: SparkSession,
    sf_dir: str,
    kcore: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
    k: int = 5,
    edges: DataFrame | None = None,
) -> DataFrame:
    """k-core membership over the (symmetrized) kNN graph by iterative
    peeling (Seidman 1983; Batagelj-Zaversnik): each round drops every
    node whose degree within the surviving subgraph is < ``kcore``.
    The k-core is the density backbone a curation pipeline keeps when
    it wants only documents embedded in mutually-similar regions
    (boilerplate farms and template clusters survive; isolated and
    chain-like points peel off) — the graph-native complement of
    semdedup's centroid view.

    Determinism contract: BOTH engines unroll exactly ``rounds`` peel
    rounds — no fixpoint test, so there is no convergence-detection
    divergence at any scale; once peeling stabilizes, further rounds
    are identity, and convergence within the default budget is
    pytest-pinned at the gate SFs (tests/test_graph.py runs rounds+1
    and asserts identical membership). The production form adds the
    CC-style signature check (_signature) to stop early — same plan
    per round, one extra 1-row aggregate.

    Scale shape: every round is two alive-semi-joins on the edge list
    + one node-keyed count — all shuffles keyed on node id over a
    frame bounded by |V|·k (the kNN edge list, never the corpus), with
    per-round localCheckpoint (the MMR plan-growth lesson). Accepts a
    precomputed ``edges`` frame like every other graph consumer.

    Output: one row per graph node — vec_id, in_kcore, and the node's
    degree within the final core (NULL for peeled nodes).
    """
    from mito_spark.operators.similarity import knn_graph

    if edges is None:
        edges = knn_graph(spark, sf_dir, k=k)
    e = edges.select(
        F.col("vec_id").cast("long").alias("u"),
        F.col("neighbor_id").cast("long").alias("v"),
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    nodes = sym.select(F.col("u").alias("vec_id")).distinct().localCheckpoint()
    alive = nodes
    for _ in range(rounds):
        alive = (
            sym.join(alive.select(F.col("vec_id").alias("u")), "u")
            .join(alive.select(F.col("vec_id").alias("v")), "v")
            .groupBy(F.col("u").alias("vec_id"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= kcore)
            .select("vec_id")
            .localCheckpoint()
        )
    core_deg = (
        sym.join(alive.select(F.col("vec_id").alias("u")), "u")
        .join(alive.select(F.col("vec_id").alias("v")), "v")
        .groupBy(F.col("u").alias("vec_id"))
        .agg(F.count(F.lit(1)).alias("core_degree"))
    )
    in_core = alive.select("vec_id", F.lit(True).alias("alive"))
    return (
        nodes.join(in_core, "vec_id", "left")
        .join(core_deg, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("alive", F.lit(False)).alias("in_kcore"),
            F.when(
                F.col("alive").isNotNull(),
                F.coalesce("core_degree", F.lit(0)),
            ).alias("core_degree"),
        )
    )


def _kcore_ctes(
    kcore: int = KCORE_K, rounds: int = KCORE_ROUNDS, prefix: str = ""
) -> tuple[list[str], str]:
    """Namespaced unrolled peel chain over a shared ``knn`` CTE (the
    _lp_ctes / _clustering_ctes composition convention). Ends with the
    final alive set; also defines {p}ka0 (all nodes) and {p}kcd (core
    degrees)."""
    p = prefix
    parts = [
        f"""{p}ksym AS MATERIALIZED (
  SELECT DISTINCT u, v FROM (
    SELECT vec_id AS u, neighbor_id AS v FROM knn
    UNION ALL
    SELECT neighbor_id AS u, vec_id AS v FROM knn
  ) WHERE u <> v
)""",
        f"{p}ka0 AS MATERIALIZED (SELECT DISTINCT u AS vec_id FROM {p}ksym)",
    ]
    for r in range(1, rounds + 1):
        # MATERIALIZED is load-bearing: each round references the
        # previous alive set twice, and DuckDB inlines plain CTEs -
        # 12 unrolled rounds would otherwise duplicate the knn scan
        # 2^12 times (observed as 'Too many open files')
        parts.append(f"""{p}ka{r} AS MATERIALIZED (
  SELECT e.u AS vec_id FROM {p}ksym e
  JOIN {p}ka{r - 1} x ON e.u = x.vec_id
  JOIN {p}ka{r - 1} y ON e.v = y.vec_id
  GROUP BY e.u HAVING COUNT(*) >= {kcore}
)""")
    parts.append(f"""{p}kcd AS (
  SELECT e.u AS vec_id, CAST(COUNT(*) AS BIGINT) AS core_degree
  FROM {p}ksym e
  JOIN {p}ka{rounds} x ON e.u = x.vec_id
  JOIN {p}ka{rounds} y ON e.v = y.vec_id
  GROUP BY e.u
)""")
    return parts, f"{p}ka{rounds}"


def _kcore_sql(
    kcore: int = KCORE_K, rounds: int = KCORE_ROUNDS, k: int = 5
) -> str:
    from mito_spark.operators.similarity import _knn_graph_sql

    ctes, final = _kcore_ctes(kcore, rounds)
    return (
        ",\n".join([f"WITH knn AS ({_knn_graph_sql(k=k)})"] + ctes)
        + f"""
SELECT n.vec_id,
       a.vec_id IS NOT NULL AS in_kcore,
       CASE WHEN a.vec_id IS NOT NULL
            THEN CAST(COALESCE(cd.core_degree, 0) AS BIGINT) END AS core_degree
FROM ka0 n
LEFT JOIN {final} a ON n.vec_id = a.vec_id
LEFT JOIN kcd cd ON n.vec_id = cd.vec_id
"""
    )


KCORE_SQL = _kcore_sql()


def dataset_split_by_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEAKAGE-SAFE train/val/test split — the FIX for what
    ``split_leakage_check`` measures: the split hash is keyed on the
    near-dup CLUSTER id (connected component of the MinHash-LSH pair
    graph; unclustered docs key on their own doc_id), so every member
    of a near-dup cluster lands in the SAME split and no J >= 0.5 pair
    can ever straddle train/eval — leakage is zero BY CONSTRUCTION
    with respect to the dedup graph, not merely measured after the
    fact (pytest re-runs the leakage probe under this split and
    asserts empty). The standard group-aware split (GroupShuffleSplit
    semantics) at corpus scale.

    Output: per split, doc count, distinct group count, and how many
    docs took a CLUSTER key rather than their own id — the columns
    that show the group structure actually bound the assignment.

    Scale shape: the pair graph + CC are the audited
    ``dedup_connected_components`` chain; the group key is one
    LEFT-JOIN of the CC labels onto the corpus doc ids (cluster count
    << corpus); the split label is a pure md5 column (zero extra
    shuffle, same ``hash_split`` engine-portable rule as
    ``dataset_split``); the rollup is 3 rows. Different salt
    ('splitc:v1') than dataset_split: the two assignments are
    independent deals.
    """
    from mito_spark.operators.dedup import minhash_lsh_dedup
    from mito_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = minhash_lsh_dedup(spark, sf_dir)
    cc = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    grouped = docs.join(cc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("cluster_id", "doc_id").alias("group_key"),
        F.col("cluster_id").isNotNull().alias("clustered"),
    )
    split = hash_split(
        F.col("group_key"), {"train": 0.9, "val": 0.05, "test": 0.05}, salt="splitc:v1"
    )
    return (
        grouped.select(split.alias("split"), "group_key", "clustered")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("group_key").alias("n_groups"),
            F.coalesce(F.sum(F.col("clustered").cast("int")), F.lit(0))
            .cast("bigint")
            .alias("n_clustered_docs"),
        )
        .orderBy("split")
    )


def _split_by_cluster_sql() -> str:
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
), grouped AS (
  SELECT d.doc_id,
         COALESCE(c.cluster_id, d.doc_id) AS group_key,
         c.cluster_id IS NOT NULL AS clustered
  FROM (SELECT doc_id FROM documents) d
  LEFT JOIN comp c USING (doc_id)
), assigned AS (
  SELECT group_key, clustered,
         CASE WHEN u < 0.9 THEN 'train' WHEN u < 0.95 THEN 'val' ELSE 'test' END AS split
  FROM (SELECT group_key, clustered,
               CAST('0x' || substr(md5('splitc:v1:' || CAST(group_key AS VARCHAR)), 1, 15) AS BIGINT)
                 / 1152921504606846976.0 AS u
        FROM grouped)
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT group_key) AS BIGINT) AS n_groups,
       CAST(coalesce(SUM(CASE WHEN clustered THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_clustered_docs
FROM assigned GROUP BY split ORDER BY split
"""


SPLIT_BY_CLUSTER_SQL = _split_by_cluster_sql()


# --- degree assortativity (Newman 2002) -----------------------------------


def graph_assortativity(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    edges: DataFrame | None = None,
) -> DataFrame:
    """Degree assortativity of the (symmetrized) kNN graph — Newman
    (PRL 2002): the Pearson correlation of end-point degrees over the
    directed symmetrized edge set. The one-number summary of the
    graph's HUB STRUCTURE that the per-node clustering report can't
    give: r < 0 is hub-and-spoke (a few attractor documents — shared
    boilerplate — collect edges from low-degree satellites; prime
    canonical-pick / boilerplate-filter targets), r > 0 is
    degree-stratified clumps (dense near-dup communities, the
    semdedup case), r ≈ 0 is the unstructured background.

    Parity discipline is lineitem_correlations': all six moments
    (n, Σdx, Σdy, Σdxdy, Σdx², Σdy²) are EXACT integer sums; the
    correlation assembles in double arithmetic on those exact
    operands (products taken after the cast, so nothing overflows
    int64 at scale), try_divide NULLs a zero-variance (regular)
    graph identically on both engines.

    Scale shape: work is bounded by the edge list (|V|·k rows, never
    the corpus): symmetrize → degree rollup → two broadcast-eligible
    degree joins → one 1-row moment aggregate, every stage map-side
    combinable. Accepts a precomputed ``edges`` frame like the other
    graph consumers (build the graph once, feed every analysis).
    """
    from mito_spark.operators.similarity import knn_graph

    if edges is None:
        edges = knn_graph(spark, sf_dir, k=k)
    e = edges.select(
        F.col("vec_id").cast("long").alias("u"),
        F.col("neighbor_id").cast("long").alias("v"),
    )
    sym = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()  # feeds the degree rollup and both joins
    )
    deg = sym.groupBy(F.col("u").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    de = sym.join(
        deg.select(F.col("vec_id").alias("u"), F.col("degree").alias("dx")), "u"
    ).join(
        deg.select(F.col("vec_id").alias("v"), F.col("degree").alias("dy")), "v"
    )
    m = de.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"),
        F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum("degree").alias("degsum")
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    num = n * F.col("sxy").cast("double") - sx * sy
    den = F.sqrt(
        (n * F.col("sxx").cast("double") - sx * sx)
        * (n * F.col("syy").cast("double") - sy * sy)
    )
    return m.crossJoin(F.broadcast(nodes)).select(
        F.col("n_nodes"),
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.round(
            F.col("degsum").cast("double") / F.col("n_nodes").cast("double"), 6
        ).alias("mean_degree"),
        F.round(F.try_divide(num, den), 6).alias("assortativity"),
    )


def _assortativity_sql(k: int = 5) -> str:
    from mito_spark.operators.similarity import _knn_graph_sql

    return f"""
WITH knn AS ({_knn_graph_sql(k=k)}),
asym AS (
  SELECT DISTINCT u, v FROM (
    SELECT vec_id AS u, neighbor_id AS v FROM knn
    UNION ALL
    SELECT neighbor_id AS u, vec_id AS v FROM knn
  ) WHERE u <> v
),
adeg AS MATERIALIZED (
  SELECT u AS vec_id, CAST(COUNT(*) AS BIGINT) AS degree FROM asym GROUP BY u
),
de AS (
  SELECT du.degree AS dx, dv.degree AS dy
  FROM asym JOIN adeg du ON asym.u = du.vec_id
            JOIN adeg dv ON asym.v = dv.vec_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dx) AS BIGINT) AS sx, CAST(SUM(dy) AS BIGINT) AS sy,
         CAST(SUM(dx * dy) AS BIGINT) AS sxy,
         CAST(SUM(dx * dx) AS BIGINT) AS sxx,
         CAST(SUM(dy * dy) AS BIGINT) AS syy
  FROM de
),
nodes AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes, CAST(SUM(degree) AS BIGINT) AS degsum
  FROM adeg
)
SELECT n_nodes,
       CAST(n / 2 AS BIGINT) AS n_edges,
       ROUND(CAST(degsum AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6) AS mean_degree,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
         AS assortativity
FROM m CROSS JOIN nodes
"""


GRAPH_ASSORTATIVITY_SQL = _assortativity_sql()
