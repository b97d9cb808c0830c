"""Approximate-nearest-neighbor search over an embedding column
(array<float>).

Two tiers, as a real 100 TB pipeline would ship them:

- ``cosine_topk_bruteforce``: exact top-k for a bounded query set.
  The query side is collected (bounded, small) and broadcast; the
  corpus side streams — per corpus row the cost is |Q|·d multiply-adds
  in a codegen'd HOF, and the per-partition top-k is taken before any
  shuffle (window over a corpus-id-partitioned frame would shuffle the
  corpus; instead we aggregate top-k per query which shuffles only
  |Q|·k candidate rows). Exact, and the oracle for the bucketed tier.

- ``cosine_topk_lsh``: random-hyperplane (sign) LSH — corpus hashed
  once into 2^H buckets via H deterministic pseudo-random hyperplanes
  (md5-derived, engine-portable); queries probe their own bucket plus
  Hamming-1 neighbors. Turns the scan into a bucket-equi-join; recall
  traded for ~2^H reduction in pairs scored.

Dot products accumulate in float64 left-to-right (F.aggregate fold),
matching the oracle's evaluation order so scores are reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mito_spark.engine import load_table, spread
from mito_spark.operators.topk import per_key_topk


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def _cosine(a: Column, b: Column) -> Column:
    """Cosine with error-as-value semantics: a zero-norm vector yields
    NULL (try_divide), never a task failure; desc ordering ranks NULL
    last, so degenerate vectors can't crowd out real neighbors."""
    return F.try_divide(_dot(a, b), _norm(a) * _norm(b))


def cosine_topk_bruteforce(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Exact cosine top-k: queries = vec_id < n_queries, corpus = all
    vectors (self excluded). Returns (query_id, neighbor_id, cos_sim
    rounded to 6dp, rank)."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    joined = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("q"), F.col("v")).alias("cos"),
        )
        .where(F.col("cos").isNotNull())  # zero-norm vectors: no similarity defined
    )
    # two-stage top-k: the corpus-sized rank never collapses into
    # n_queries partitions (operators/topk.py — exact, same results)
    return per_key_topk(
        joined, "query_id", [F.desc("cos"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")


def _cosine_sql(n_queries: int = 10, k: int = 10) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < {n_queries}
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         list_sum(list_transform(range(1, len(q)+1), i -> q[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, len(q)+1), i -> q[i]*q[i])))
              * sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i])))) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


COSINE_TOPK_SQL = _cosine_sql()


def cosine_topk_filtered(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Filtered ANN — vector search under a metadata predicate (the
    production 'WHERE label = X ORDER BY similarity' pattern).

    This is the PRE-filter form: the label equality rides the join
    condition, so candidates are restricted *before* scoring — no
    wasted dot products, and top-k is never starved by the filter
    (post-filtering an unfiltered top-k can return < k rows). At scale
    the same shape applies with the filter pushed to the corpus scan
    (partition/Z-order on the label) — candidate work is proportional
    to the selectivity, not the corpus."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"), F.col("v").alias("q")
    )
    joined = emb.join(
        F.broadcast(queries),
        (F.col("vec_id") != F.col("query_id")) & (F.col("label") == F.col("qlabel")),
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        _cosine(F.col("q"), F.col("v")).alias("cos"),
    ).where(F.col("cos").isNotNull())
    return per_key_topk(
        joined, "query_id", [F.desc("cos"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", "label", F.round("cos", 6).alias("cos_sim"), "rank")


def _cosine_filtered_sql(n_queries: int = 10, k: int = 10) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS q FROM e WHERE vec_id < {n_queries}
), scored AS (
  SELECT query_id, e.vec_id AS neighbor_id, e.label,
         list_sum(list_transform(range(1, len(q)+1), i -> q[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, len(q)+1), i -> q[i]*q[i])))
              * sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i])))) AS cos
  FROM e, q WHERE e.vec_id <> q.query_id AND e.label = q.qlabel
), ranked AS (
  SELECT query_id, neighbor_id, label, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, label, ROUND(cos, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


COSINE_FILTERED_SQL = _cosine_filtered_sql()

_LSH_BITS = 8


def auto_lsh_bits(
    n_rows: int,
    target_bucket_size: int = 64,
    min_bits: int = 4,
    max_bits: int = 24,
) -> int:
    """Bucket width scaled to the corpus: 2^bits ≈ n / target_bucket_size,
    so the expected bucket population — and therefore the in-bucket
    self-join cost — stays constant as the corpus grows. A fixed width
    caps the pair reduction at 2^bits regardless of n (at 100 TB an
    8-bit table degenerates to 256 near-quadratic buckets); this rule
    keeps per-bucket work O(target_bucket_size²) at any scale."""
    import math

    if n_rows <= target_bucket_size:
        return min_bits
    return max(min_bits, min(max_bits, math.ceil(math.log2(n_rows / target_bucket_size))))


_CELL_TARGET = 1000
_MIN_CELLS = 16


def auto_n_cells(
    n_rows: int,
    target_cell_size: int = _CELL_TARGET,
    min_cells: int = _MIN_CELLS,
    max_cells: int = 1 << 20,
) -> int:
    """Cell count scaled to the corpus: n_cells ≈ n / target_cell_size
    (SemDeDup trains k ≈ 0.1% of N for the same reason). The per-cell
    pairwise pass costs Σ|cell|²; with a FIXED cell count that is
    O(n²/n_cells) — quadratic at any constant — while this rule keeps
    E|cell| = target_cell_size, so total pairwise work is
    O(n · target_cell_size): linear in the corpus. The embedding-space
    sibling of ``auto_lsh_bits``.

    The floor (16) matches the static DuckDB oracle twins, which are
    generated at n_cells=16: for corpora up to 16·target rows — every
    gate SF — the derived value IS 16, so auto-scaling and the static
    oracle coincide exactly; beyond that the oracle SF never travels.
    The cap (2^20 cells, ~10^9 rows at the default target) is where a
    flat in-plan centroid table stops making sense — past it, swap the
    coarse quantizer for a hierarchical one (cluster the centroids)
    rather than growing k."""
    return max(min_cells, min(max_cells, n_rows // target_cell_size))


def auto_nprobe(n_cells: int) -> int:
    """Probe-cell count derived from the cell count so the RECALL
    posture is scale-invariant (r8 verdict next#4): the measured
    sf0.01 IVFADC end-to-end ladder (BENCH_NOTES r8) showed a fixed
    nprobe=4 probes 25% of a 16-cell quantizer for only 0.59
    recall@10, while 8/16 reaches 0.78 — small quantizers need a
    LARGE probe fraction because each cell is coarse. Rule:
    nprobe = min(n_cells, max(4, ceil(2·sqrt(n_cells)),
    ceil(0.015·n_cells))) — 2·sqrt gives a probe FRACTION that decays
    as 2/sqrt(n_cells) (50% at the 16-cell gate floor → 6% at 1024
    cells), bottoming out at the 1.5% floor production IVF deployments
    run (at auto_n_cells ≈ 0.1%·N, 1.5% of cells ≈ 1.5% of corpus
    bytes per query batch). At the gate floor (auto_n_cells = 16 for
    every gate SF) this derives 8, the value the static oracle SQL
    twins are generated with."""
    import math

    return min(
        n_cells,
        max(4, math.ceil(2 * math.sqrt(n_cells)), math.ceil(0.015 * n_cells)),
    )


def _hyperplane(dim: int, h: int, table: int = 0) -> list[float]:
    """Deterministic pseudo-random hyperplane h of table ``table``:
    component i derived from md5 of the (table, h, i) coordinates →
    uniform in [-1, 1). Engine-portable and seedless. Table 0 keeps the
    legacy ``h:i`` seed so existing oracle SQL and stored buckets are
    stable; tables ≥ 1 are independent families for banded multi-table
    LSH."""
    import hashlib

    out = []
    for i in range(dim):
        seed = f"{h}:{i}" if table == 0 else f"t{table}:{h}:{i}"
        hx = hashlib.md5(seed.encode()).hexdigest()[:15]
        out.append((int(hx, 16) / float(1 << 60)) * 2.0 - 1.0)
    return out


def lsh_bucket_expr(v: Column, dim: int, bits: int = _LSH_BITS, table: int = 0) -> Column:
    """Sign-LSH bucket id: bit h = (v · hyperplane_h) >= 0. Hyperplanes
    are literal arrays folded into the plan (bits × dim doubles —
    trivially small); per-row cost bits·d FMAs, no shuffle."""
    acc = F.lit(0).cast("bigint")
    for h in range(bits):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, h, table)])
        bit = (_dot(v, plane) >= 0).cast("bigint")
        acc = acc + F.shiftleft(bit, h)
    return acc


def cosine_topk_lsh(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    dim: int = 64,
    bits: int | None = _LSH_BITS,
) -> DataFrame:
    """Bucketed ANN: score only corpus vectors whose LSH bucket is
    within Hamming distance 1 of the query's bucket (multi-probe).
    Output schema matches the brute-force tier so recall can be
    measured by joining the two.

    ``bits=None`` derives the width from the corpus size
    (``auto_lsh_bits``) so bucket population stays constant as the
    corpus grows; the driver-gated entry pins bits=8 to match the
    static oracle SQL."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if bits is None:
        bits = auto_lsh_bits(emb.count())
    emb = emb.withColumn("bucket", lsh_bucket_expr(F.col("v"), dim, bits))
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q"), F.col("bucket").alias("qb")
    )
    # multi-probe: query bucket + all Hamming-1 buckets
    probes = queries.select(
        "query_id",
        "q",
        F.explode(
            F.array(
                F.col("qb"),
                *[F.col("qb").bitwiseXOR(F.lit(1 << b)) for b in range(bits)],
            )
        ).alias("bucket"),
    )
    joined = (
        emb.join(F.broadcast(probes), "bucket")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("q"), F.col("v")).alias("cos"),
        )
        .where(F.col("cos").isNotNull())  # zero-norm vectors: no similarity defined
    )
    # two-stage top-k: the corpus-sized rank never collapses into
    # n_queries partitions (operators/topk.py — exact, same results)
    return per_key_topk(
        joined, "query_id", [F.desc("cos"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")


def embedding_near_dup(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.45,
    bits: int | None = _LSH_BITS,
    n_tables: int = 1,
    dim: int = 64,
) -> DataFrame:
    # 0.45 default is tuned to this synthetic corpus (max pairwise
    # cosine ≈ 0.51); production near-dup filtering would use ≥0.9.
    """Embedding-cosine near-duplicate pairs via LSH bucket blocking:
    pairs sharing a bucket (in any table), cosine ≥ threshold. The
    embedding-space sibling of minhash_lsh_dedup.

    Scale knobs (the 100 TB path):

    - ``bits=None`` derives the width from the corpus size
      (``auto_lsh_bits``) so expected bucket population — and the
      in-bucket self-join cost — stays constant as the corpus grows.
      The driver-gated entry pins bits=8 to match the static oracle.
    - ``n_tables > 1`` is banded multi-table LSH, mirroring
      minhash_lsh_dedup's band structure: each table is an independent
      hyperplane family; a pair is a candidate if it collides in ANY
      table. Wider ``bits`` sharpens precision (smaller buckets),
      more tables recover the recall that narrow single-table widths
      bought with huge buckets. Candidates are deduplicated before the
      cosine re-rank, so each surviving pair is scored once.

    One shuffle per plan: rows explode to (table, bucket) keys, the
    self-join shuffles on that composite key, and only colliding pairs
    reach the cosine computation — O(n²) never materializes."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if bits is None:
        bits = auto_lsh_bits(emb.count())
    keyed = emb.select(
        "vec_id",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_bucket_expr(F.col("v"), dim, bits, table=t).alias("b"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    )
    pairs = (
        keyed.alias("a")
        .join(keyed.alias("b"), "tb")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .distinct()
        .select(
            "id_a",
            "id_b",
            _cosine(F.col("va"), F.col("vb")).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos_sim"))
    )
    return pairs


# --- DuckDB oracle twins for the LSH tiers ----------------------------
# The hyperplanes are md5-derived constants, so the whole LSH pipeline
# is deterministic and SQL-expressible: the planes are inlined as list
# literals (Python float repr round-trips exactly into DuckDB DOUBLE,
# and F.lit() embeds the identical double in the Spark plan).


def _dot_sql(a: str, b: str, dim: int = 64) -> str:
    return f"list_sum(list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i]))"


def _bucket_sql(vcol: str = "v", dim: int = 64, bits: int = _LSH_BITS, table: int = 0) -> str:
    terms = []
    for h in range(bits):
        plane = "[" + ", ".join(repr(x) for x in _hyperplane(dim, h, table)) + "]"
        terms.append(
            f"(CASE WHEN {_dot_sql(vcol, f'({plane})', dim)} >= 0 THEN {1 << h} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _cosine_lsh_sql(n_queries: int = 10, k: int = 10, dim: int = 64) -> str:
    probe_list = ", ".join(["qb"] + [f"xor(qb, {1 << b})" for b in range(_LSH_BITS)])
    cos = f"{_dot_sql('b.v', 'probes.q', dim)} / (sqrt({_dot_sql('probes.q', 'probes.q', dim)}) * sqrt({_dot_sql('b.v', 'b.v', dim)}))"
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), b AS (
  SELECT vec_id, v, {_bucket_sql('v', dim)} AS bucket FROM e
), q AS (
  SELECT vec_id AS query_id, v AS q, bucket AS qb FROM b WHERE vec_id < {n_queries}
), probes AS (
  SELECT query_id, q, unnest([{probe_list}]) AS bucket FROM q
), joined AS (
  SELECT query_id, b.vec_id AS neighbor_id, {cos} AS cos
  FROM b JOIN probes ON b.bucket = probes.bucket AND b.vec_id <> probes.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM joined
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


COSINE_LSH_SQL = _cosine_lsh_sql()


def _near_dup_sql(threshold: float = 0.45, dim: int = 64) -> str:
    cos = f"{_dot_sql('x.v', 'y.v', dim)} / (sqrt({_dot_sql('x.v', 'x.v', dim)}) * sqrt({_dot_sql('y.v', 'y.v', dim)}))"
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), b AS (
  SELECT vec_id, v, {_bucket_sql('v', dim)} AS bucket FROM e
), pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, {cos} AS cos
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT DISTINCT id_a, id_b, ROUND(cos, 6) AS cos_sim
FROM pairs WHERE cos >= {threshold}
"""


NEAR_DUP_SQL = _near_dup_sql()


# --- IVF (inverted-file) ANN: the coarse-quantizer scale path ---------


# Training sample: vectors whose md5(vec_id) hex starts with one of
# these characters (4/16 = 25%). Hash sampling is unbiased under
# time-ordered / sharded id assignment, where an id-range cap would
# train the quantizer on the oldest shard only.
_IVF_TRAIN_HEX = ("0", "1", "2", "3")


def _ivf_train_sample(emb: DataFrame) -> DataFrame:
    s = emb.where(
        F.substring(F.md5(F.col("vec_id").cast("string")), 1, 1).isin(*_IVF_TRAIN_HEX)
    )
    # Degenerate-corpus guard: a tiny corpus can hash-sample to ZERO
    # rows, which would leave k-means with no seeds (IndexError in
    # _kmeans_centroids — found by the degenerate net, r6). Train on
    # the full frame instead: on corpora small enough to empty the
    # sample, full training is what you want anyway, and at any real
    # scale the sample is never empty so the take(1) probe is the only
    # cost and the oracle's sample-trained path is untouched.
    #
    # ORACLE ASYMMETRY (ADVICE r6): no DuckDB twin (IVF / semdedup /
    # refresh / persisted-SQ8) carries this fallback — their k-means
    # chains always train on the hash sample. On a corpus tiny enough
    # to trigger the fallback (< ~4 rows sampled), Spark and the
    # oracle train on different sets and the documented bit-parity
    # contract does not hold; the gate SFs (≥ sf0.001, 500+ vectors)
    # never trigger it, so the hash gate stays meaningful where it
    # runs. The fallback trades parity-on-degenerate-corpora for
    # not-crashing — the right trade for a guard rail.
    if not s.take(1):
        return emb
    return s


def _kmeans_centroids(train: DataFrame, n_cells: int, iters: int = 3) -> list[list[float]]:
    """Distributed Lloyd iterations: assignment + per-cell mean are
    DataFrame jobs (shuffle on cell id); only the centroid table
    (n_cells × dim floats) ever reaches the driver.

    Every step is deterministic with a PINNED evaluation order so an
    independent engine (the DuckDB oracle) reproduces the centroids
    bit-for-bit: seeds are the n_cells smallest rows in md5(vec_id)
    order (TakeOrdered — no global row_number), and per-cell means
    accumulate in vec_id order via an ordered fold rather than
    F.avg (whose shuffle-order float sums are run-dependent).

    Training runs on the hash sample (coarse quantizers need cluster
    SHAPE, not every point — faiss trains IVF on samples for the same
    reason); assignment of the full corpus happens once, after
    training. The ordered-fold mean collects each cell's training
    members into one array, so the sample fraction must keep per-cell
    training membership bounded (at 100 TB: tighten _IVF_TRAIN_HEX,
    not the loop)."""
    seeds = (
        train.select("v", F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id")
        .orderBy("h", "vec_id")
        .limit(n_cells)
        .select("v")
        .collect()
    )
    centroids = [list(r.v) for r in seeds][:n_cells]
    dim = len(centroids[0])

    # Ordered per-cell sums (r13): for wide vectors, ONE fold with an
    # array<double> accumulator — the r9-r12 form ran a separate
    # F.aggregate PER DIMENSION, i.e. 64 interpreted folds over the
    # same sorted member list per cell per iteration. acc[i]
    # accumulates in the identical vec_id order the per-dim folds
    # used (zip_with preserves element order and the fold sequence is
    # unchanged), so every per-dim sum is IEEE-bit-identical — the
    # oracle's centroid arithmetic still matches bit-for-bit. For
    # NARROW vectors (the dim-8 PQ sub-trainings) the zip_with
    # allocation per element costs more than the passes it saves
    # (measured 2.05 → 2.22 s on ann_ivfadc at 10×), so small dims
    # keep the per-dim folds.
    if dim >= 16:
        zeros = F.array(*[F.lit(0.0) for _ in range(dim)])
        sums = F.aggregate(
            F.col("l"),
            zeros,
            lambda acc, x: F.zip_with(acc, x.getField("v"), lambda a, b: a + b),
        )
    else:

        def dim_sum(i: int):
            # closure factory: a 2-arg lambda per dimension (a
            # default-arg third param would make Spark see a 3-arg
            # HOF lambda)
            return lambda acc, x: acc + x.getField("v")[i]

        sums = F.array(
            *[F.aggregate(F.col("l"), F.lit(0.0), dim_sum(i)) for i in range(dim)]
        )

    for _ in range(iters):
        cell = _nearest_cell_expr(centroids)
        rows = (
            train.select(cell.alias("cell"), "vec_id", "v")
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("vec_id", "v"))).alias("l"))
            .select(
                "cell",
                F.size("l").alias("n"),
                sums.alias("s"),
            )
            .collect()
        )
        # cells that captured no training points keep their centroid
        for r in rows:
            centroids[r.cell] = [x / r.n for x in r.s]
    return centroids


def _nearest_cell_expr(centroids: list[list[float]]) -> Column:
    """argmin over centroid literals: per-row cost cells × dim FMAs,
    folded into codegen — the centroid table rides in the plan."""
    dists = [
        F.aggregate(
            F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    pairs = F.array(*[F.struct(d.alias("d"), F.lit(i).alias("i")) for i, d in enumerate(dists)])
    return F.array_min(pairs).getField("i")


def cosine_topk_ivf(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int | None = None,
    nprobe: int | None = None,
) -> DataFrame:
    """IVF ANN: k-means coarse quantizer → corpus partitioned into
    cells → each query scores only its ``nprobe`` nearest cells.
    Returns the brute-force schema so recall is measurable by join.

    ``n_cells=None`` (the default) derives the cell count from the
    corpus size (``auto_n_cells``) so per-cell population — and the
    per-query probe cost N·nprobe/n_cells — stays constant as the
    corpus grows; at gate SFs the rule floors to 16, matching the
    static oracle SQL exactly. ``nprobe=None`` derives the probe
    count from the cell count (``auto_nprobe`` — 8 at the 16-cell
    gate floor, the static oracle's constant).

    100 TB shape: the centroid table is tiny and broadcast in-plan; the
    corpus is scanned once to tag cells (in production: written
    partitioned by cell, so probes prune partitions); per-query work
    drops from N to ~N·nprobe/n_cells.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    if nprobe is None:
        nprobe = auto_nprobe(n_cells)
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    # localCheckpoint (not persist): tagged feeds both the query side
    # and the corpus side of the probe join; checkpoint blocks are
    # GC-cleaned with the frame instead of pinning the session cache
    # (VERDICT r4 wrong#4)
    tagged = emb.withColumn("cell", _nearest_cell_expr(centroids)).localCheckpoint()
    # query-side: nprobe nearest cells per query
    dists = [
        F.aggregate(
            F.zip_with(F.col("q"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    cell_pairs = F.array(*[F.struct(d.alias("d"), F.lit(i).alias("i")) for i, d in enumerate(dists)])
    probe_cells = F.transform(
        F.slice(F.array_sort(cell_pairs), 1, nprobe), lambda p: p.getField("i")
    )
    queries = (
        tagged.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("q"))
        .withColumn("cell", F.explode(probe_cells))
    )
    joined = (
        tagged.join(F.broadcast(queries), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cosine(F.col("q"), F.col("v")).alias("cos"),
        )
        .where(F.col("cos").isNotNull())  # zero-norm vectors: no similarity defined
    )
    # two-stage top-k: the corpus-sized rank never collapses into
    # n_queries partitions (operators/topk.py — exact, same results)
    return per_key_topk(
        joined, "query_id", [F.desc("cos"), F.asc("neighbor_id")], k
    ).select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")


def _kmeans_tagged_sql(n_cells: int = 16, iters: int = 3, dim: int = 64) -> str:
    """Shared oracle head: seeds → unrolled Lloyd iterations → full-
    corpus cell assignment, ending with the ``tagged`` CTE open for a
    caller-appended continuation. Used by the IVF oracle and the
    semdedup oracle — one definition of the order-pinned k-means."""

    def dist(v: str, c: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"
        )

    hexes = ", ".join(f"'{h}'" for h in _IVF_TRAIN_HEX)
    parts = [
        f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), train AS (
  SELECT vec_id, v FROM e
  WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, 1) IN ({hexes})
), cent0 AS (
  SELECT cell, c FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cell,
           v AS c
    FROM train
  ) WHERE cell < {n_cells}
)"""
    ]
    prev = "cent0"
    for it in range(1, iters + 1):
        parts.append(
            f""", a{it} AS (
  SELECT vec_id, v, cell FROM (
    SELECT t.vec_id, t.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {dist('t.v', 'c.c')} ASC, c.cell ASC) AS rn
    FROM train t CROSS JOIN {prev} c
  ) WHERE rn = 1
), m{it} AS (
  SELECT cell, list(v ORDER BY vec_id) AS l, count(*) AS n FROM a{it} GROUP BY cell
), cent{it} AS (
  SELECT p.cell,
         CASE WHEN m{it}.cell IS NULL THEN p.c
              ELSE list_transform(range(1, {dim + 1}),
                                  i -> list_sum(list_transform(m{it}.l, x -> x[i])) / m{it}.n)
         END AS c
  FROM {prev} p LEFT JOIN m{it} ON p.cell = m{it}.cell
)"""
        )
        prev = f"cent{it}"
    parts.append(
        f""", tagged AS (
  SELECT vec_id, v, cell FROM (
    SELECT t.vec_id, t.v, c.cell,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {dist('t.v', 'c.c')} ASC, c.cell ASC) AS rn
    FROM e t CROSS JOIN {prev} c
  ) WHERE rn = 1
)"""
    )
    return "".join(parts)


def _ivf_sql(
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int | None = None,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """Full re-derivation of the IVF pipeline — seeds, 3 unrolled Lloyd
    iterations, assignment, probe, scoring — in DuckDB SQL. Bit-for-bit
    agreement with the Spark side holds because every float reduction
    is order-pinned on both engines: seeds sort by md5(vec_id), means
    sum in vec_id order, distances/dots fold left-to-right over the
    index range, and all argmins tie-break on cell id. ``nprobe=None``
    derives via ``auto_nprobe(n_cells)`` — the same rule as the Spark
    side, so the static constant stays in lockstep."""
    if nprobe is None:
        nprobe = auto_nprobe(n_cells)

    def dist(v: str, c: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"
        )

    prev = f"cent{iters}"
    cos = (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> p.q[i] * g.v[i]))"
        f" / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> p.q[i]*p.q[i])))"
        f" * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> g.v[i]*g.v[i]))))"
    )
    parts = [_kmeans_tagged_sql(n_cells, iters, dim)]
    parts.append(
        f""", probe AS (
  SELECT query_id, q, cell FROM (
    SELECT t.vec_id AS query_id, t.v AS q, c.cell,
           ROW_NUMBER() OVER (PARTITION BY t.vec_id
                              ORDER BY {dist('t.v', 'c.c')} ASC, c.cell ASC) AS rn
    FROM e t CROSS JOIN {prev} c
    WHERE t.vec_id < {n_queries}
  ) WHERE rn <= {nprobe}
), scored AS (
  SELECT p.query_id, g.vec_id AS neighbor_id, {cos} AS cos
  FROM tagged g JOIN probe p ON g.cell = p.cell AND g.vec_id <> p.query_id
), ranked AS (
  SELECT query_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}"""
    )
    return "".join(parts)


COSINE_IVF_SQL = _ivf_sql()


# --- IVF cell-balance monitor ------------------------------------------


def ivf_balance_report(
    spark: SparkSession, sf_dir: str, n_cells: int | None = None
) -> DataFrame:
    """MEASURED IVF cell-population balance — the ANN sibling of
    ``lsh_bucket_skew_report``: a probe's cost is the population of
    the cells it routes to, so per-query latency variance IS cell
    imbalance (a 10× hot cell makes every query probing it 10× the
    mean — p99 amplification the mean-recall curves never show; Faiss
    documents the same pathology as "imbalance factor"). Per cell:
    population, corpus share, imbalance vs the uniform ideal
    (n_vecs·n_cells/n — 1.0 is perfectly balanced, the Faiss metric
    per cell), and the cumulative share of the hottest-first ordering
    (how much of the corpus the top cells hold). Empty cells simply
    have no row — their count is n_cells minus the rows, and every
    empty cell means some other cell is hot.

    Scale shape: the audited IVF tagging chain (broadcast centroids,
    one scan) + a |cells|-bounded count; the running-share window
    orders ≤ n_cells rows, never the corpus. Shares sum as exact
    6dp decimals so the cumulative column is order-free-exact on both
    engines. ``n_cells=None`` derives via ``auto_n_cells`` (floors to
    16 at gate SFs — the static oracle's constant, same contract as
    the IVF tier itself).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    tagged = emb.withColumn("cell", _nearest_cell_expr(centroids))
    sizes = tagged.groupBy("cell").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = sizes.agg(F.sum("n_vecs").alias("n"))
    w = (
        Window.orderBy(F.desc("n_vecs"), F.asc("cell"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    share6 = F.round(
        F.col("n_vecs").cast("double") / F.col("n").cast("double"), 6
    ).cast("decimal(18,6)")
    return (
        sizes.crossJoin(F.broadcast(tot))
        .select(
            "cell",
            "n_vecs",
            share6.alias("sh"),
            F.round(
                F.col("n_vecs").cast("double")
                * float(n_cells)
                / F.col("n").cast("double"),
                6,
            ).alias("imbalance"),
        )
        .withColumn("cum_share", F.round(F.sum("sh").over(w).cast("double"), 6))
        .select(
            "cell",
            "n_vecs",
            F.col("sh").cast("double").alias("share"),
            "imbalance",
            "cum_share",
        )
        .orderBy(F.desc("n_vecs"), F.asc("cell"))
    )


def _ivf_balance_sql(n_cells: int = 16, iters: int = 3, dim: int = 64) -> str:
    return (
        _kmeans_tagged_sql(n_cells, iters, dim)
        + f""", sizes AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM tagged GROUP BY cell
), tot AS (
  SELECT CAST(SUM(n_vecs) AS BIGINT) AS n FROM sizes
), sh AS (
  SELECT cell, n_vecs,
         CAST(ROUND(CAST(n_vecs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS DECIMAL(18,6)) AS sh,
         ROUND(CAST(n_vecs AS DOUBLE) * {float(n_cells)!r} / CAST(n AS DOUBLE), 6) AS imbalance
  FROM sizes CROSS JOIN tot
)
SELECT cell, n_vecs, CAST(sh AS DOUBLE) AS share, imbalance,
       ROUND(CAST(SUM(sh) OVER (ORDER BY n_vecs DESC, cell ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 6) AS cum_share
FROM sh
ORDER BY n_vecs DESC, cell ASC
"""
    )


IVF_BALANCE_SQL = _ivf_balance_sql()


def cosine_topk_sq8(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    rerank_factor: int = 4,
) -> DataFrame:
    """Scalar-quantized (int8) ANN: candidate generation on 4x-smaller
    codes, exact re-rank on floats — the memory-bound scale path where
    the corpus's int8 codes fit in a fraction of the float footprint
    (the same two-phase shape FAISS SQ8 / ScaNN use).

    Phase 1 scores every (query, corpus) pair with an INTEGER dot
    product over the int8 codes (symmetric per-vector quantization
    from operators/quantize.py) — integer arithmetic, so candidate
    scores are exact and engine-portable, no float-order concerns;
    per-query top k·rerank_factor survive. Phase 2 re-ranks the
    survivors with the exact float cosine. Recall < 1 only when
    quantization reorders neighbors across the candidate boundary —
    rerank_factor buys it back (pytest measures recall vs brute
    force; the ORACLE reproduces this entire pipeline, so the gate
    checks exactness of the implementation, not recall).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    amax = F.array_max(F.transform(F.col("v"), F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    coded = emb.withColumn("scale", scale).withColumn(
        "code",
        F.transform(F.col("v"), lambda x: F.floor(x * F.col("scale") + F.lit(0.5)).cast("long")),
    )
    queries = coded.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        F.col("code").alias("qcode"),
    )
    # phase 1: exact-integer candidate scores on codes
    int_dot = F.aggregate(
        F.zip_with(F.col("qcode"), F.col("code"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # slim candidate stage + two-stage top-k (operators/topk.py): the
    # corpus-sized scoring emits ids + the integer score only — the
    # floats SQ8 exists to shrink never enter the shuffle, and the cut
    # doesn't collapse into n_queries partitions
    cand = (
        coded.select("vec_id", "code")
        .join(
            F.broadcast(queries.select("query_id", "qcode")),
            F.col("vec_id") != F.col("query_id"),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            int_dot.alias("iscore"),
        )
    )
    survivors = per_key_topk(
        cand, "query_id", [F.desc("iscore"), F.asc("neighbor_id")], k * rerank_factor,
        rank_name="crank",
    ).select("query_id", "neighbor_id")
    # phase 2: exact float re-rank — survivor ids broadcast back onto
    # the float column (k·rerank_factor rows per query in the output)
    rerank = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(queries.select("query_id", "q")), "query_id")
        .select("query_id", "neighbor_id", _cosine(F.col("q"), F.col("v")).alias("cos"))
        .where(F.col("cos").isNotNull())
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")
    )


def _sq8_sql(n_queries: int = 10, k: int = 10, rerank_factor: int = 4) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), coded AS (
  SELECT vec_id, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
              THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
              ELSE 0.0 END AS scale
  FROM e
), codes AS (
  SELECT vec_id, v,
         list_transform(v, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS code
  FROM coded
), q AS (
  SELECT vec_id AS query_id, v AS qv, code AS qcode FROM codes WHERE vec_id < {n_queries}
), cand AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         CAST(list_sum(list_transform(range(1, len(qcode)+1), i -> qcode[i] * code[i])) AS BIGINT) AS iscore,
         qv, v
  FROM codes c, q WHERE c.vec_id <> q.query_id
), survivors AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY iscore DESC, neighbor_id) AS crank
    FROM cand
  ) WHERE crank <= {k * rerank_factor}
), rerank AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))
              * sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i])))) AS cos
  FROM survivors
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim, rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM rerank
) WHERE rank <= {k}
"""


COSINE_SQ8_SQL = _sq8_sql()


# --- binary (1-bit) quantization tier ---------------------------------


def cosine_topk_binary(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    rerank_factor: int = 8,
) -> DataFrame:
    """Binary-quantized ANN: 1-bit sign codes, Hamming-distance
    candidate generation, exact float re-rank — the bottom rung of the
    quantization ladder (fp32 → SQ8 → PQ → 1-bit) and the cheapest
    serving tier there is: d=64 packs into TWO 32-bit words (16 bytes
    vs 256 fp32 bytes, 16×), and the candidate distance is
    XOR + popcount (`F.bit_count`) — integer ALU ops inside
    whole-stage codegen, the same primitive Faiss's IndexBinaryFlat
    and Lucene/Elasticsearch BBQ serve with. Sign-random-projection
    theory (Charikar STOC'02) makes Hamming on sign bits a monotone
    estimator of angle: P[bit differs] = θ/π per hyperplane — here the
    hyperplanes are the coordinate axes, i.e. the code is sign(v)
    itself, the "binary quantization" of the embedding.

    Packing is a Horner fold per 32-bit word (acc·2 + bit over an
    array slice) — exact integers < 2^32 in a long, identical algebra
    on both engines (the oracle writes the same sum as Σ bit_i·2^w−i).
    For d > 64 the code generalizes to an array of words (slice per
    32 dims); the two-column form keeps the gate corpus's d=64 flat.

    Phase 1 scores every (query, corpus) pair on codes only — the
    16-byte rows are all that rides the candidate stage; floats never
    enter until phase 2 re-ranks the k·rerank_factor survivors (ties
    in 64-bit Hamming are dense, so the factor is 8, not SQ8's 4 —
    recall measured in pytest vs brute force; the oracle reproduces
    the pipeline exactly, so the gate checks implementation, not
    recall).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )

    def word(start: int) -> Column:
        # Horner over one 32-dim slice: Σ bit_p · 2^(32-p), exact long
        return F.aggregate(
            F.slice(F.col("bits"), start, 32),
            F.lit(0).cast("long"),
            lambda acc, x: acc * 2 + x,
        )

    # checkpoint the SLIM code frame only — (vec_id, w0, w1) is the
    # 16-byte representation binary quantization exists to ship; the
    # float vectors stay on the scan and enter only the phase-2
    # rerank join (checkpointing them alongside would materialize the
    # exact footprint the tier is built to avoid)
    coded = (
        emb.withColumn(
            "bits", F.transform(F.col("v"), lambda x: (x > 0).cast("long"))
        )
        .select("vec_id", word(1).alias("w0"), word(33).alias("w1"))
        .localCheckpoint()  # feeds the candidate join's both sides
    )
    queries = coded.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("w0").alias("qw0"),
        F.col("w1").alias("qw1"),
    )
    qvecs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q")
    )
    ham = F.bit_count(F.col("w0").bitwiseXOR(F.col("qw0"))) + F.bit_count(
        F.col("w1").bitwiseXOR(F.col("qw1"))
    )
    cand = coded.join(
        F.broadcast(queries),
        F.col("vec_id") != F.col("query_id"),
    ).select("query_id", F.col("vec_id").alias("neighbor_id"), ham.alias("hamming"))
    survivors = per_key_topk(
        cand,
        "query_id",
        [F.asc("hamming"), F.asc("neighbor_id")],
        k * rerank_factor,
        rank_name="crank",
    ).select("query_id", "neighbor_id")
    rerank = (
        emb.select(F.col("vec_id").alias("neighbor_id"), "v")
        .join(F.broadcast(survivors), "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select("query_id", "neighbor_id", _cosine(F.col("q"), F.col("v")).alias("cos"))
        .where(F.col("cos").isNotNull())
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")
    )


def _binary_sql(n_queries: int = 10, k: int = 10, rerank_factor: int = 8) -> str:
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), bitsv AS (
  SELECT vec_id, v,
         list_transform(v, x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bits
  FROM e
), coded AS (
  -- length-aware Horner (matches the Spark fold over the ACTUAL
  -- slice, so short/degenerate vectors agree: empty slice -> 0)
  SELECT vec_id, v,
         COALESCE(CAST(list_sum(list_transform(range(1, least(32, len(bits))+1),
                  i -> bits[i] * CAST(2**(least(32, len(bits))-i) AS BIGINT))) AS BIGINT), 0) AS w0,
         COALESCE(CAST(list_sum(list_transform(range(33, len(bits)+1),
                  i -> bits[i] * CAST(2**(len(bits)-i) AS BIGINT))) AS BIGINT), 0) AS w1
  FROM bitsv
), q AS (
  SELECT vec_id AS query_id, v AS qv, w0 AS qw0, w1 AS qw1 FROM coded WHERE vec_id < {n_queries}
), cand AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         bit_count(xor(c.w0, q.qw0)) + bit_count(xor(c.w1, q.qw1)) AS hamming,
         qv, v
  FROM coded c, q WHERE c.vec_id <> q.query_id
), survivors AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id) AS crank
    FROM cand
  ) WHERE crank <= {k * rerank_factor}
), rerank AS (
  SELECT query_id, neighbor_id,
         list_sum(list_transform(range(1, len(qv)+1), i -> qv[i] * v[i]))
           / (sqrt(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])))
              * sqrt(list_sum(list_transform(range(1, len(v)+1), i -> v[i]*v[i])))) AS cos
  FROM survivors
)
SELECT query_id, neighbor_id, ROUND(cos, 6) AS cos_sim, rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM rerank
) WHERE rank <= {k}
"""


COSINE_BINARY_SQL = _binary_sql()


# --- rank-biased overlap: ANN serving quality beyond recall ------------

RBO_P = 0.9  # persistence: top-weighted, ~"expected viewing depth 10"


def _rbo_contrib(k: int, p: float) -> list[float]:
    """Per-matched-item RBO contribution lookup: an item first present
    in BOTH top-d lists at depth e = max(rank_a, rank_b) contributes
    Σ_{d=e..k} (1−p)·p^(d−1)/d. Python-computed doubles interpolated
    into BOTH engines' plans, so parity is by construction."""
    out = []
    for e in range(1, k + 1):
        out.append(sum((1.0 - p) * p ** (d - 1) / d for d in range(e, k + 1)))
    return out


def ann_rbo_report(
    spark: SparkSession,
    sf_dir: str,
    n_queries: int = 10,
    k: int = 10,
    p: float = RBO_P,
) -> DataFrame:
    """Rank-Biased Overlap of the binary-quantized tier's ranking vs
    exact brute force, per query (Webber, Moffat & Zobel TOIS'10) —
    the serving-quality metric recall@k cannot see: recall counts SET
    membership, RBO weights agreement by DEPTH with geometric decay
    (1−p)p^(d−1), so a tier that nails ranks 1-3 but scrambles 8-10
    scores near 1 while an equal-recall tier that misses the head
    scores low — exactly how serving quality is experienced. The
    truncated RBO_MIN convention (no extrapolation residual;
    documented, weights sum to 1−p^k ≈ 0.651 at k=10, p=0.9) keeps
    the statistic a finite sum both engines reproduce bit-for-bit:
    each matched item's contribution is a k-entry lookup of
    Python-precomputed doubles (same literals in both plans), summed
    9dp-decimal order-free.

    Scale shape: both legs are the audited tiers (each never more
    than |Q|·k output rows); the comparison is a |Q|·k equi-join +
    a |Q|-row rollup — nothing corpus-sized. The ANN family's
    third measurement surface: recall (set), RBO (rank), nprobe/
    ablation curves (cost).
    """
    exact = cosine_topk_bruteforce(spark, sf_dir, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_e")
    )
    approx = cosine_topk_binary(spark, sf_dir, n_queries=n_queries, k=k).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_a")
    )
    contrib = _rbo_contrib(k, p)
    lut = F.array(*[F.lit(c) for c in contrib])
    matched = exact.join(approx, ["query_id", "neighbor_id"]).select(
        "query_id",
        F.round(
            F.element_at(lut, F.greatest("r_e", "r_a").cast("int")), 9
        )
        .cast("decimal(18,9)")
        .alias("c"),
    )
    agg = matched.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_overlap"),
        F.round(F.sum("c").cast("double"), 6).alias("rbo"),
    )
    qids = exact.select("query_id").distinct()
    return (
        qids.join(agg, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            F.coalesce("rbo", F.lit(0.0)).alias("rbo"),
        )
        .orderBy("query_id")
    )


def _rbo_sql(n_queries: int = 10, k: int = 10, p: float = RBO_P) -> str:
    """Composed twin: the brute-force chain and the full binary-tier
    chain as namespaced CTEs, then the same lookup-join-rollup."""
    contrib = _rbo_contrib(k, p)
    lut = "[" + ", ".join(repr(c) for c in contrib) + "]"
    cos = (
        "list_sum(list_transform(range(1, len({q})+1), i -> {q}[i] * {v}[i]))"
        " / (sqrt(list_sum(list_transform(range(1, len({q})+1), i -> {q}[i]*{q}[i])))"
        " * sqrt(list_sum(list_transform(range(1, len({v})+1), i -> {v}[i]*{v}[i]))))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), xq AS (
  SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < {n_queries}
), xscored AS (
  SELECT query_id, e.vec_id AS neighbor_id,
         {cos.format(q='xq.q', v='e.v')} AS cos
  FROM e JOIN xq ON e.vec_id <> xq.query_id
), exact AS (
  SELECT query_id, neighbor_id, rank AS r_e FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM xscored
  ) WHERE rank <= {k}
), bitsv AS (
  SELECT vec_id, v,
         list_transform(v, x -> CASE WHEN x > 0 THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bits
  FROM e
), coded AS (
  SELECT vec_id, v,
         COALESCE(CAST(list_sum(list_transform(range(1, least(32, len(bits))+1),
                  i -> bits[i] * CAST(2**(least(32, len(bits))-i) AS BIGINT))) AS BIGINT), 0) AS w0,
         COALESCE(CAST(list_sum(list_transform(range(33, len(bits)+1),
                  i -> bits[i] * CAST(2**(len(bits)-i) AS BIGINT))) AS BIGINT), 0) AS w1
  FROM bitsv
), bq AS (
  SELECT vec_id AS query_id, v AS qv, w0 AS qw0, w1 AS qw1 FROM coded WHERE vec_id < {n_queries}
), bcand AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         bit_count(xor(c.w0, bq.qw0)) + bit_count(xor(c.w1, bq.qw1)) AS hamming,
         qv, v
  FROM coded c, bq WHERE c.vec_id <> bq.query_id
), bsurv AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY hamming ASC, neighbor_id) AS crank
    FROM bcand
  ) WHERE crank <= {k * 8}
), brerank AS (
  SELECT query_id, neighbor_id,
         {cos.format(q='qv', v='v')} AS cos
  FROM bsurv
), approx AS (
  SELECT query_id, neighbor_id, rank AS r_a FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM brerank
  ) WHERE rank <= {k}
), matched AS (
  SELECT exact.query_id,
         CAST(ROUND(({lut})[GREATEST(r_e, r_a)], 9) AS DECIMAL(18,9)) AS c
  FROM exact JOIN approx
    ON exact.query_id = approx.query_id AND exact.neighbor_id = approx.neighbor_id
), agg AS (
  SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_overlap,
         ROUND(CAST(SUM(c) AS DOUBLE), 6) AS rbo
  FROM matched GROUP BY query_id
)
SELECT q.query_id,
       COALESCE(a.n_overlap, 0) AS n_overlap,
       COALESCE(a.rbo, 0.0) AS rbo
FROM (SELECT DISTINCT query_id FROM exact) q
LEFT JOIN agg a USING (query_id)
ORDER BY q.query_id
"""


ANN_RBO_SQL = _rbo_sql()


# --- SemDeDup: semantic dedup via k-means + intra-cluster cosine ------


def semdedup(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
    threshold: float = 0.95,
) -> DataFrame:
    """Semantic deduplication, the SemDeDup recipe (Abbas et al. 2023,
    arXiv:2303.09540): k-means-cluster the embedding space, then
    within each cluster drop vectors whose cosine similarity to an
    earlier cluster member exceeds ``threshold`` — catching semantic
    duplicates (same content re-rendered, translations, templated
    spam) that shingle-based dedup can't see.

    Keep rule (deterministic, engine-portable): a vector is DROPPED
    iff some SAME-CELL vector with a LOWER vec_id is >= threshold
    similar; its ``dup_of`` is the lowest such id. No transitive
    chasing — the paper's per-cluster pruning, not CC (for full
    transitive clusters compose with operators.graph).

    100 TB shape: clustering bounds the quadratic — the pairwise pass
    runs per cell, so cost is Σ|cell|², and ``n_cells=None`` (the
    default) scales the cell count with the corpus via ``auto_n_cells``
    (the paper uses ~0.1% of N): E|cell| stays at the target size, so
    the default call path is O(n·target) — it CANNOT silently go
    quadratic as the corpus grows (at gate SFs the rule floors to 16,
    matching the static oracle). The centroid table is tiny and rides
    in the plan (same _kmeans_centroids as IVF), and the per-cell
    self-join shuffles on cell id only. Reuses the order-pinned
    k-means so the DuckDB oracle re-derives identical cells, then
    identical pairs."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    tagged = emb.withColumn(
        "cell", _nearest_cell_expr(centroids).cast("bigint")
    ).localCheckpoint()
    a, b = tagged.alias("a"), tagged.alias("b")
    cos = _cosine(F.col("a.v"), F.col("b.v"))
    dups = (
        a.join(b, "cell")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .where(cos >= threshold)
        .groupBy(F.col("b.vec_id").alias("vec_id"))
        .agg(F.min(F.col("a.vec_id")).alias("dup_of"))
    )
    return (
        tagged.join(dups, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            F.col("dup_of").isNotNull().alias("dropped"),
            "dup_of",
        )
        .orderBy("vec_id")
    )


def _semdedup_sql(n_cells: int = 16, threshold: float = 0.95, iters: int = 3, dim: int = 64) -> str:
    cos = (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i] * b.v[i]))"
        f" / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> a.v[i]*a.v[i])))"
        f" * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> b.v[i]*b.v[i]))))"
    )
    return (
        _kmeans_tagged_sql(n_cells, iters, dim)
        + f""", dups AS (
  SELECT b.vec_id AS vec_id, MIN(a.vec_id) AS dup_of
  FROM tagged a JOIN tagged b ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE NOT isnan({cos}) AND {cos} >= {threshold}
  GROUP BY b.vec_id
)
SELECT t.vec_id, t.cell, d.dup_of IS NOT NULL AS dropped, d.dup_of
FROM tagged t LEFT JOIN dups d ON t.vec_id = d.vec_id
ORDER BY t.vec_id
"""
    )


SEMDEDUP_SQL = _semdedup_sql()


def embedding_cluster_profile(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
) -> DataFrame:
    """Corpus-shape diagnostics over the k-means cells: per cell the
    member count, the mean distance to the centroid (cluster
    tightness), and the dominant label with its share — the report a
    curation pipeline reads before deciding cluster-level actions
    (drop a spam-dominated cell, upsample a sparse one; the cluster
    inspection step of SemDeDup-style curation).

    Scale shape: one pass to tag + one groupBy(cell); the per-cell
    mean accumulates 9dp-decimal contributions (order-free, oracle-
    exact). Output is n_cells rows; ``n_cells=None`` derives the
    count from the corpus (``auto_n_cells``, floor 16 = the static
    oracle's constant at gate SFs)."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    dists = [
        F.aggregate(
            F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    # assigned-cell distance = the argmin's distance (ties share d²)
    tagged = emb.select(
        "vec_id",
        "label",
        _nearest_cell_expr(centroids).cast("bigint").alias("cell"),
        F.round(F.sqrt(F.array_min(F.array(*dists))), 9).cast("decimal(28,9)").alias("dist"),
    )
    per_cell = tagged.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("dist").alias("dist_sum"),
    )
    label_counts = tagged.groupBy("cell", "label").agg(F.count(F.lit(1)).alias("n"))
    dominant = label_counts.groupBy("cell").agg(
        F.max_by(
            F.struct("label", "n"),
            # deterministic argmax: count first, label as tie-break
            F.struct(F.col("n"), F.col("label")),
        ).alias("top")
    )
    return (
        per_cell.join(dominant, "cell")
        .select(
            "cell",
            "n_members",
            F.round(F.col("dist_sum").cast("double") / F.col("n_members"), 6).alias("mean_dist"),
            F.col("top.label").alias("dominant_label"),
            F.round(F.col("top.n").cast("double") / F.col("n_members"), 6).alias("dominant_share"),
        )
        .orderBy("cell")
    )


def _cluster_profile_sql(n_cells: int = 16, iters: int = 3, dim: int = 64) -> str:
    dist = (
        f"sqrt(list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (t.v[i]-c.c[i])*(t.v[i]-c.c[i]))))"
    )
    return (
        _kmeans_tagged_sql(n_cells, iters, dim).replace(
            "WITH e AS (\n  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
            "WITH e AS (\n  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings",
        )
        + f""", tagged_l AS (
  SELECT t.vec_id, e.label, t.cell,
         CAST(ROUND({dist}, 9) AS DECIMAL(28,9)) AS dist
  FROM tagged t JOIN e ON t.vec_id = e.vec_id JOIN cent{iters} c ON t.cell = c.cell
), per_cell AS (
  SELECT cell, COUNT(*) AS n_members, SUM(dist) AS dist_sum FROM tagged_l GROUP BY cell
), lc AS (
  SELECT cell, label, COUNT(*) AS n FROM tagged_l GROUP BY cell, label
), dom AS (
  SELECT cell, label, n FROM (
    SELECT cell, label, n,
           ROW_NUMBER() OVER (PARTITION BY cell ORDER BY n DESC, label DESC) AS rn
    FROM lc
  ) WHERE rn = 1
)
SELECT p.cell, p.n_members,
       ROUND(CAST(p.dist_sum AS DOUBLE) / p.n_members, 6) AS mean_dist,
       d.label AS dominant_label,
       ROUND(CAST(d.n AS DOUBLE) / p.n_members, 6) AS dominant_share
FROM per_cell p JOIN dom d ON p.cell = d.cell
ORDER BY p.cell
"""
    )


CLUSTER_PROFILE_SQL = _cluster_profile_sql()


_OUTLIER_Z = 2.0


def embedding_outlier_report(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
    z: float = _OUTLIER_Z,
) -> DataFrame:
    """Per-cell embedding OUTLIER report — the pruning companion to
    ``embedding_cluster_profile`` (SemDeDup-style curation drops not
    only near-dups near the centroid but also far-from-centroid noise
    points — encoder failures, off-distribution content): per k-means
    cell, the distance-to-centroid mean and std, and how many members
    sit beyond mean + z·std (the prune candidates).

    Float discipline: per-member distance and squared distance round
    to 9dp and sum as DECIMAL(28,9) (squares are rounded from the
    DOUBLE square — never a decimal×decimal product, the precision-38
    overflow rule); mean/std derive from those sums with the identical
    expression tree on both engines (IEEE sqrt is correctly rounded,
    so the z-threshold compare agrees bit-for-bit). The flag pass
    joins the n_cells-row stats frame back as a broadcast.

    Scale shape: one tag pass (centroid literals in-plan, no shuffle)
    checkpointed for its two consumers, one groupBy(cell), one
    broadcast-join flag pass, n_cells rows out. ``n_cells=None``
    derives via ``auto_n_cells`` (floor 16 = the static oracle).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    dists = [
        F.aggregate(
            F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    d2 = F.array_min(F.array(*dists))
    tagged = emb.select(
        "vec_id",
        _nearest_cell_expr(centroids).cast("bigint").alias("cell"),
        F.round(F.sqrt(d2), 9).cast("decimal(28,9)").alias("dist"),
        F.round(d2, 9).cast("decimal(28,9)").alias("dist_sq"),
    ).localCheckpoint()
    n = F.col("n_members").cast("double")
    mean_d = F.col("sd").cast("double") / n
    std_d = F.sqrt(
        F.greatest(F.col("sd2").cast("double") / n - mean_d * mean_d, F.lit(0.0))
    )
    stats = (
        tagged.groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("dist").alias("sd"),
            F.sum("dist_sq").alias("sd2"),
        )
        .select(
            "cell",
            "n_members",
            mean_d.alias("mean_d"),
            std_d.alias("std_d"),
        )
    )
    flags = (
        tagged.join(F.broadcast(stats), "cell")
        .where(
            F.col("dist").cast("double") > F.col("mean_d") + F.lit(z) * F.col("std_d")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_outliers"))
    )
    return (
        stats.join(flags, "cell", "left")
        .select(
            "cell",
            "n_members",
            F.round("mean_d", 6).alias("mean_dist"),
            F.round("std_d", 6).alias("std_dist"),
            F.coalesce("n_outliers", F.lit(0)).alias("n_outliers"),
            F.round(
                F.coalesce("n_outliers", F.lit(0)).cast("double")
                / F.col("n_members").cast("double"),
                6,
            ).alias("outlier_fraction"),
        )
        .orderBy("cell")
    )


def _outlier_report_sql(
    n_cells: int = 16, iters: int = 3, dim: int = 64, z: float = _OUTLIER_Z
) -> str:
    d2 = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (t.v[i]-c.c[i])*(t.v[i]-c.c[i])))"
    )
    return (
        _kmeans_tagged_sql(n_cells, iters, dim)
        + f""", td AS (
  SELECT t.vec_id, t.cell,
         CAST(ROUND(sqrt({d2}), 9) AS DECIMAL(28,9)) AS dist,
         CAST(ROUND({d2}, 9) AS DECIMAL(28,9)) AS dist_sq
  FROM tagged t JOIN cent{iters} c ON t.cell = c.cell
), stats AS (
  SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_members,
         CAST(SUM(dist) AS DOUBLE) / COUNT(*) AS mean_d,
         sqrt(greatest(CAST(SUM(dist_sq) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(dist) AS DOUBLE) / COUNT(*)) * (CAST(SUM(dist) AS DOUBLE) / COUNT(*)), 0)) AS std_d
  FROM td GROUP BY cell
), flags AS (
  SELECT td.cell, CAST(COUNT(*) AS BIGINT) AS n_outliers
  FROM td JOIN stats s ON td.cell = s.cell
  WHERE CAST(td.dist AS DOUBLE) > s.mean_d + {z} * s.std_d
  GROUP BY td.cell
)
SELECT s.cell, s.n_members,
       ROUND(s.mean_d, 6) AS mean_dist,
       ROUND(s.std_d, 6) AS std_dist,
       COALESCE(f.n_outliers, 0) AS n_outliers,
       ROUND(CAST(COALESCE(f.n_outliers, 0) AS DOUBLE) / s.n_members, 6) AS outlier_fraction
FROM stats s LEFT JOIN flags f ON s.cell = f.cell
ORDER BY s.cell
"""
    )


OUTLIER_REPORT_SQL = _outlier_report_sql()


def knn_graph(
    spark: SparkSession,
    sf_dir: str,
    k: int = 5,
    bits: int = _LSH_BITS,
    n_tables: int = 2,
    dim: int = 64,
) -> DataFrame:
    """k-nearest-neighbor GRAPH construction: for EVERY corpus vector,
    its top-k cosine neighbors among LSH-bucket candidates — the
    all-nodes sibling of the query-set top-k tiers, and the input
    shape for kNN-graph clustering / label propagation / graph-based
    dedup over a training corpus.

    Scale shape: candidates come from ``n_tables`` independent
    hyperplane families (a pair is considered if it collides in ANY
    table — multi-table recall without widening buckets); per-node
    ranking shuffles on vec_id, which is inherent to "top-k PER NODE"
    and uniform (no skew). O(n²) never materializes — per-node
    candidate count is bounded by bucket population × n_tables, held
    constant at scale via auto_lsh_bits. Deterministic rank tie-break
    on neighbor id keeps the graph engine-portable.

    r13 optimization round (guide §2.3/§3): (1) bucket ids — the
    bits·d-FMA interpreted fold, the query's dominant per-row compute —
    are computed ONCE per (vector, table) into a 16-byte/row ids+bucket
    frame, checkpointed so the candidate self-join's two sides read it
    instead of each re-hashing the corpus; the before-plan also
    BROADCAST the vector-carrying side of that join (corpus vectors in
    a broadcast — a scale non-starter). (2) Vector norms are computed
    per VECTOR, not per candidate pair (two of the three 64-step folds
    in ``_cosine`` were per-pair norm recomputation). (3) The null-cos
    filter is the algebraic ``na*nb != 0`` pre/post-filter instead of
    ``cos IS NOT NULL``, which Catalyst pushed into the join condition
    and thereby evaluated the whole cosine fold TWICE per pair (§4.4's
    duplicated-expression trap, HOF edition). Same rows out: cos is
    NULL iff its denominator is 0 or an input is NULL (try_divide), and
    Spark orders NaN like the old plan did (NaN != 0.0 is true, so NaN
    norms pass both forms)."""
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    keyed = emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("t"),
                        lsh_bucket_expr(F.col("v"), dim, bits, table=t).alias("b"),
                    )
                    for t in range(n_tables)
                ]
            )
        ).alias("tb"),
    ).localCheckpoint()  # n·n_tables rows × ~16 bytes: ids + bucket only
    ids = (
        keyed.alias("a")
        .join(keyed.alias("b"), "tb")
        .where(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_id"),
            F.col("b.vec_id").alias("neighbor_id"),
        )
        .distinct()  # collides-in-any-table: dedup on the 2-id key ONLY
        # — the vectors never enter the pair-generation join; they
        # rejoin below (as the SQL twin does)
    )
    vecs = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .withColumn("nv", _norm(F.col("v")))
        # zero/null-norm vectors can never yield a non-null cosine —
        # prune them before the joins (NaN norms pass, as before)
        .where(F.col("nv").isNotNull() & (F.col("nv") != 0.0))
    )
    cand = (
        ids.join(
            vecs.select(
                F.col("vec_id").alias("nb_"),
                F.col("v").alias("vb"),
                F.col("nv").alias("nb"),
            ),
            F.col("neighbor_id") == F.col("nb_"),
        )
        .join(
            vecs.select("vec_id", F.col("v").alias("va"), F.col("nv").alias("na")),
            "vec_id",
        )
        .where(F.col("na") * F.col("nb") != F.lit(0.0))  # underflow guard ≡ cos NOT NULL
        .select(
            "vec_id",
            "neighbor_id",
            F.try_divide(
                _dot(F.col("va"), F.col("vb")), F.col("na") * F.col("nb")
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.round("cos", 6).alias("cos_sim"), "rank")
    )


def _knn_graph_sql(k: int = 5, bits: int = _LSH_BITS, n_tables: int = 2, dim: int = 64) -> str:
    cos = (
        f"{_dot_sql('x.v', 'y.v', dim)} / "
        f"(sqrt({_dot_sql('x.v', 'x.v', dim)}) * sqrt({_dot_sql('y.v', 'y.v', dim)}))"
    )
    tables = "\nUNION ALL\n".join(
        f"SELECT vec_id, v, {t} AS t, {_bucket_sql('v', dim, bits, table=t)} AS b FROM e"
        for t in range(n_tables)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), keyed AS (
  {tables}
), cand AS (
  SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS neighbor_id
  FROM keyed x JOIN keyed y ON x.t = y.t AND x.b = y.b AND x.vec_id <> y.vec_id
), scored AS (
  SELECT c.vec_id, c.neighbor_id, {cos} AS cos
  FROM cand c JOIN e x ON c.vec_id = x.vec_id JOIN e y ON c.neighbor_id = y.vec_id
), ranked AS (
  SELECT vec_id, neighbor_id, cos,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank
  FROM scored WHERE NOT isnan(cos)
)
SELECT vec_id, neighbor_id, ROUND(cos, 6) AS cos_sim, rank
FROM ranked WHERE rank <= {k}
"""


KNN_GRAPH_SQL = _knn_graph_sql()


def cluster_silhouette(
    spark: SparkSession,
    sf_dir: str,
    n_cells: int | None = None,
) -> DataFrame:
    """Per-cell simplified silhouette over the k-means cells: for each
    point, a = distance to its own centroid, b = distance to the
    nearest OTHER centroid, s = (b-a)/max(a,b); the report is each
    cell's member count and mean s — the cluster-quality gate a
    curation pipeline reads BEFORE acting on cluster structure
    (semdedup prunes, cluster-level drops, domain upsampling): a cell
    with mean s near 0 is not a real clump, and decisions keyed on it
    are noise. The centroid form (simplified silhouette, Hruschka et
    al. 2004) replaces classic silhouette's O(n) per-point pairwise
    term with a centroid lookup — the only silhouette computable at
    corpus scale, and the standard proxy for it.

    Scale shape: identical to embedding_cluster_profile — ONE corpus
    pass against the in-plan centroid table (n_cells x dim literals;
    per row 2·cells·dim FMAs inside codegen), one groupBy(cell) on
    9dp-decimal s-sums (order-free, oracle-exact). Nothing else
    shuffles; output is n_cells rows. ``n_cells=None`` derives the
    cell count from the corpus (``auto_n_cells``, floor 16 = the
    static oracle's constant at every gate SF).

    Parity contract: a and b come from the SAME sorted (d², cell)
    pairs the assignment argmin uses (ties break on cell id on both
    engines); (b-a)/greatest(a,b) is the identical expression tree on
    both sides, rounded to 9dp before the decimal sum. Coincident
    centroids (a = b = 0) score s = 0 by the guard, matching the SQL
    CASE. Reference parity: the reference has no clustering surface
    (SURVEY §2 — pure expression engine); this extends the
    LLM-pipeline tier alongside semdedup/cluster_profile.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    if n_cells < 2:
        raise ValueError("cluster_silhouette needs >= 2 cells (b is undefined)")
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    dists = [
        F.aggregate(
            F.zip_with(F.col("v"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    pairs = F.array_sort(
        F.array(*[F.struct(d.alias("d"), F.lit(i).alias("i")) for i, d in enumerate(dists)])
    )
    a = F.sqrt(pairs[0].getField("d"))
    b = F.sqrt(pairs[1].getField("d"))
    s = F.when(F.greatest(a, b) == 0, F.lit(0.0)).otherwise(
        (b - a) / F.greatest(a, b)
    )
    tagged = emb.select(
        pairs[0].getField("i").cast("bigint").alias("cell"),
        F.round(s, 9).cast("decimal(28,9)").alias("s"),
    )
    return (
        tagged.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_members"), F.sum("s").alias("s_sum"))
        .select(
            "cell",
            "n_members",
            F.round(F.col("s_sum").cast("double") / F.col("n_members"), 6).alias(
                "mean_silhouette"
            ),
        )
        .orderBy("cell")
    )


def _cluster_silhouette_sql(n_cells: int = 16, iters: int = 3, dim: int = 64) -> str:
    dist = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (t.v[i]-c.c[i])*(t.v[i]-c.c[i])))"
    )
    return (
        _kmeans_tagged_sql(n_cells, iters, dim)
        + f""", dm AS (
  SELECT t.vec_id, c.cell, {dist} AS d2,
         ROW_NUMBER() OVER (PARTITION BY t.vec_id
                            ORDER BY {dist} ASC, c.cell ASC) AS rn
  FROM e t CROSS JOIN cent{iters} c
), ab AS (
  SELECT vec_id,
         MIN(CASE WHEN rn = 1 THEN cell END) AS cell,
         sqrt(MIN(CASE WHEN rn = 1 THEN d2 END)) AS a,
         sqrt(MIN(CASE WHEN rn = 2 THEN d2 END)) AS b
  FROM dm GROUP BY vec_id
), sil AS (
  SELECT cell,
         CAST(ROUND(CASE WHEN greatest(a, b) = 0 THEN 0.0
                         ELSE (b - a) / greatest(a, b) END, 9)
              AS DECIMAL(28,9)) AS s
  FROM ab
)
SELECT cell, COUNT(*) AS n_members,
       ROUND(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS mean_silhouette
FROM sil GROUP BY cell ORDER BY cell
"""
    )


CLUSTER_SILHOUETTE_SQL = _cluster_silhouette_sql()


_JL_TABLE = 7  # independent hyperplane family (never used by LSH tables 0/1)
_JL_OUT_DIM = 16
_JL_SAMPLE_HEX = ("0", "1")
_JL_SAMPLE_TARGET = 1024


def auto_sample_hex(n_rows: int, target: int = _JL_SAMPLE_TARGET) -> tuple[str, ...]:
    """Derive the md5-prefix sample for the JL measurement leg so the
    expected sample size stays BOUNDED as the corpus grows — the
    measurement cost is |S|²·out_dim, so a fixed sampling fraction
    (the r8 manual knob) grows the pair work quadratically with n.
    Rule: fraction f = min(1/8, target/n), quantized to m prefixes of
    k hex chars (f ≈ m/16^k, m in [1, 15] after quantization), so
    E|S| ∈ [~target/2, target] once n > 8·target and E|S| = n/8 below
    that. The same discipline as ``auto_n_cells``/``auto_lsh_bits``:
    at every gate SF (n <= 8·target) the derived value IS the static
    ("0", "1") the oracle SQL was generated with, so auto-scaling and
    the static twin coincide exactly."""
    import math

    if n_rows <= 0:
        return _JL_SAMPLE_HEX
    f = min(1.0 / 8.0, target / n_rows)
    k = max(1, math.ceil(math.log(1.0 / f, 16)))
    m = max(1, int((16**k) * f))
    return tuple(format(i, f"0{k}x") for i in range(m))


def jl_projection_report(
    spark: SparkSession,
    sf_dir: str,
    out_dim: int = _JL_OUT_DIM,
    dim: int = 64,
    sample_hex: tuple[str, ...] | None = None,
) -> DataFrame:
    """Random-projection (Johnson-Lindenstrauss) distortion report:
    project the embedding column dim → out_dim through a deterministic
    dense random matrix, then MEASURE what the projection does to
    pairwise Euclidean distances on a hash-sampled vector set — a
    histogram of projected/original distance ratios (0.05-wide
    buckets) with per-bucket pair counts and mean ratio. This is the
    go/no-go report for running clustering / dedup / ANN on the
    cheaper projected vectors: JL guarantees ratios concentrate near
    1 at out_dim = O(log n / eps²) (Johnson & Lindenstrauss 1984;
    dense ±-style matrices per Achlioptas 2003), and this measures the
    actual spread for THIS corpus and THIS out_dim — the
    dimensionality-reduction sibling of lsh_recall_report /
    ann_pq_recall_report (measure the approximation, don't trust the
    formula).

    The matrix rows reuse the ``_hyperplane`` generator (an
    independent family, table 7): entries uniform in [-1, 1),
    E[r²] = 1/3, so each output coordinate is scaled by
    sqrt(3/out_dim) to make projected distances unbiased estimates of
    the originals. Projection is one corpus-pass of out_dim·dim FMAs
    per row against in-plan literals — zero shuffle, the same
    plan shape as lsh_bucket_expr. The measurement leg hash-samples
    vectors by md5 prefix; ``sample_hex`` defaults to
    ``auto_sample_hex`` on the corpus count, which caps E|S| at
    ~_JL_SAMPLE_TARGET as n grows (measurement cost |S|²·out_dim,
    independent of the corpus) and coincides with the static oracle's
    ("0", "1") at every gate SF.

    Parity: plane literals, the sqrt(3/out_dim) scale, and every
    fold are identical expression trees on both engines; ratios round
    to 9dp before the decimal mean sums. Pairs at original distance
    exactly 0 are excluded on both sides (ratio undefined).
    """
    import math

    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if sample_hex is None:
        sample_hex = auto_sample_hex(emb.count())
    if len({len(h) for h in sample_hex}) != 1:
        # mixed prefix widths compare an N-char md5 prefix against a
        # different-width literal — some can never match, silently
        # shrinking the sample; fail loudly instead (auto_sample_hex
        # always emits a uniform width)
        raise ValueError(f"sample_hex prefixes must share one length: {sample_hex}")
    scale = math.sqrt(3.0 / out_dim)
    projs = [
        (
            _dot(F.col("v"), F.array(*[F.lit(x) for x in _hyperplane(dim, j, table=_JL_TABLE)]))
            * F.lit(scale)
        ).alias(f"p{j}")
        for j in range(out_dim)
    ]
    sample = (
        emb.where(
            F.substring(
                F.md5(F.col("vec_id").cast("string")), 1, len(sample_hex[0])
            ).isin(*sample_hex)
        )
        .select("vec_id", "v", F.array(*projs).alias("p"))
        .localCheckpoint()  # pairs below explode the HOF chain otherwise
    )
    a, b = sample.alias("a"), sample.alias("b")
    sq = lambda x, y: F.aggregate(  # noqa: E731
        F.zip_with(x, y, lambda u, w: (u - w) * (u - w)), F.lit(0.0), lambda acc, t: acc + t
    )
    pairs = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.sqrt(sq(F.col("a.v"), F.col("b.v"))).alias("od"),
            F.sqrt(sq(F.col("a.p"), F.col("b.p"))).alias("pd"),
        )
        .where(F.col("od") > 0)
        .select((F.col("pd") / F.col("od")).alias("ratio"))
    )
    bucketed = pairs.select(
        (F.floor(F.col("ratio") * 20).cast("double") / F.lit(20.0)).alias("ratio_bucket"),
        F.round("ratio", 9).cast("decimal(28,9)").alias("r"),
    )
    return (
        bucketed.groupBy("ratio_bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"), F.sum("r").alias("r_sum"))
        .select(
            "ratio_bucket",
            "n_pairs",
            F.round(F.col("r_sum").cast("double") / F.col("n_pairs"), 6).alias("mean_ratio"),
        )
        .orderBy("ratio_bucket")
    )


def _jl_report_sql(
    out_dim: int = _JL_OUT_DIM,
    dim: int = 64,
    sample_hex: tuple[str, ...] = _JL_SAMPLE_HEX,
) -> str:
    import math

    scale = repr(math.sqrt(3.0 / out_dim))
    proj_items = []
    for j in range(out_dim):
        plane = "[" + ", ".join(repr(x) for x in _hyperplane(dim, j, table=_JL_TABLE)) + "]"
        proj_items.append(f"{_dot_sql('v', f'({plane})', dim)} * {scale}")
    if len({len(h) for h in sample_hex}) != 1:
        raise ValueError(f"sample_hex prefixes must share one length: {sample_hex}")
    hexes = ", ".join(f"'{h}'" for h in sample_hex)
    klen = len(sample_hex[0])
    dsq = lambda x, y, d: (  # noqa: E731
        f"list_sum(list_transform(range(1, {d + 1}), i -> ({x}[i]-{y}[i])*({x}[i]-{y}[i])))"
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), s AS (
  SELECT vec_id, v, [{", ".join(proj_items)}] AS p
  FROM e WHERE substr(md5(CAST(vec_id AS VARCHAR)), 1, {klen}) IN ({hexes})
), pr AS (
  SELECT sqrt({dsq('a.v', 'b.v', dim)}) AS od,
         sqrt({dsq('a.p', 'b.p', out_dim)}) AS pd
  FROM s a JOIN s b ON a.vec_id < b.vec_id
), rt AS (
  SELECT pd / od AS ratio FROM pr WHERE od > 0
), bk AS (
  SELECT CAST(floor(ratio * 20) AS DOUBLE) / 20.0 AS ratio_bucket,
         CAST(ROUND(ratio, 9) AS DECIMAL(28,9)) AS r
  FROM rt
)
SELECT ratio_bucket, COUNT(*) AS n_pairs,
       ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 6) AS mean_ratio
FROM bk GROUP BY ratio_bucket ORDER BY ratio_bucket
"""


JL_REPORT_SQL = _jl_report_sql()


# --- dimension-truncation (matryoshka-style) recall ablation -----------

MRL_DIMS = (8, 16, 32, 64)  # truncation ladder; 64 = the full dim,
# whose recall-1.0 row is the report's self-check anchor


def embedding_dim_ablation_report(
    spark: SparkSession, sf_dir: str, n_queries: int = 10, k: int = 10
) -> DataFrame:
    """Recall of DIMENSION-TRUNCATED cosine retrieval against the
    full-dimension exact top-k — the measurement behind
    matryoshka-style dim reduction (Kusupati et al., NeurIPS'22:
    serve the first d coordinates, pay d/D of the bandwidth) and the
    cheapest ANN memory lever there is (no codebooks, no training —
    just read fewer coordinates). One row per d in MRL_DIMS:
    (dim, n_truth, n_caught, recall) over the standing bounded query
    set; the d = full-dim row must read recall 1.0 (self-check
    anchor, pytest-pinned).

    Relation to the rest of the ANN family: jl_projection_report
    measures RANDOM-projection distortion on pair distances; this
    measures PREFIX-truncation retrieval quality — the two
    dimensionality levers a serving stack chooses between — and the
    SQ8/PQ tiers quantize precision instead of dimension. Together
    the four reports are the compression decision table.

    Scale shape (r13 optimization round, guide §2.2/§4.4): ONE
    brute-force scoring pass computes every rung's prefix cosine in
    the same row — the before-plan ran |MRL_DIMS| separate
    corpus×queries passes (4 scans, 4 two-stage topks, 12 HOF folds
    per pair; norms were re-folded per PAIR per rung). Now norms fold
    once per VECTOR per rung, each pair pays only the 4 prefix dot
    folds, the (dim, cos) ladder explodes in-row, and a single
    composite-key two-stage ``per_key_topk`` over (dim, query_id)
    ranks all rungs at once. Each rung's cosine is the identical
    expression tree (dot over zip_with of prefix slices; try_divide by
    the norm product), so scores — and the selected top-k — are
    bit-identical to the per-rung form. The intersection join is
    k·n_queries·|dims| rows. Integer-exact counts; recall is one 6dp
    try_divide.
    """

    def _prefix_norms(col: str, prefix: str):
        return [
            F.sqrt(
                _dot(F.slice(F.col(col), 1, d), F.slice(F.col(col), 1, d))
            ).alias(f"{prefix}{d}")
            for d in MRL_DIMS
        ]

    emb = (
        spread(load_table(spark, sf_dir, "embeddings"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
        .select("vec_id", "v", *_prefix_norms("v", "nv"))
        .localCheckpoint()
    )
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("q"),
        *[F.col(f"nv{d}").alias(f"nq{d}") for d in MRL_DIMS],
    )
    # explode a LITERAL dim array (free to re-evaluate — the
    # interpreted-HOF Generate rule) and compute each emitted row's
    # cosine afterwards via a CASE whose matching branch is the exact
    # per-rung expression: one d-length fold per (pair, dim) row.
    cos_case = F.when(
        F.col("dim") == MRL_DIMS[0],
        F.try_divide(
            _dot(
                F.slice(F.col("q"), 1, MRL_DIMS[0]), F.slice(F.col("v"), 1, MRL_DIMS[0])
            ),
            F.col(f"nq{MRL_DIMS[0]}") * F.col(f"nv{MRL_DIMS[0]}"),
        ),
    )
    for d in MRL_DIMS[1:]:
        cos_case = cos_case.when(
            F.col("dim") == d,
            F.try_divide(
                _dot(F.slice(F.col("q"), 1, d), F.slice(F.col("v"), 1, d)),
                F.col(f"nq{d}") * F.col(f"nv{d}"),
            ),
        )
    scored = (
        emb.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "q",
            "v",
            *[F.col(f"nq{d}") for d in MRL_DIMS],
            *[F.col(f"nv{d}") for d in MRL_DIMS],
            F.explode(F.array(*[F.lit(d) for d in MRL_DIMS])).alias("dim"),
        )
        .select("query_id", "neighbor_id", "dim", cos_case.alias("cos"))
        .where(F.col("cos").isNotNull())
    )
    tk = per_key_topk(
        scored, ["dim", "query_id"], [F.desc("cos"), F.asc("neighbor_id")], k
    ).select("dim", "query_id", "neighbor_id")
    full_dim = max(MRL_DIMS)
    tk = tk.localCheckpoint()  # ≤ |dims|·n_queries·k rows — bounded
    truth = tk.where(F.col("dim") == full_dim).select("query_id", "neighbor_id")
    n_truth = truth.count()
    caught = (
        tk.join(truth, ["query_id", "neighbor_id"])
        .groupBy("dim")
        .agg(F.count(F.lit(1)).alias("n_caught"))
    )
    dims = spark.createDataFrame([(d,) for d in MRL_DIMS], "dim int")
    return (
        dims.join(caught, "dim", "left")
        .select(
            F.col("dim").cast("bigint").alias("dim"),
            F.lit(n_truth).cast("bigint").alias("n_truth"),
            F.coalesce(F.col("n_caught"), F.lit(0)).cast("bigint").alias("n_caught"),
            F.round(
                F.try_divide(
                    F.coalesce(F.col("n_caught"), F.lit(0)).cast("double"),
                    F.lit(float(n_truth)),
                ),
                6,
            ).alias("recall"),
        )
        .orderBy("dim")
    )


def _dim_ablation_sql(n_queries: int = 10, k: int = 10) -> str:
    def cos(d: int) -> str:
        rng = f"range(1, {d} + 1)"
        return (
            f"list_sum(list_transform({rng}, i -> q[i] * v[i]))"
            f" / (sqrt(list_sum(list_transform({rng}, i -> q[i]*q[i])))"
            f" * sqrt(list_sum(list_transform({rng}, i -> v[i]*v[i]))))"
        )

    parts = [
        f"""
WITH e AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), q AS MATERIALIZED (
  SELECT vec_id AS query_id, v AS q FROM e WHERE vec_id < {n_queries}
)"""
    ]
    full = max(MRL_DIMS)
    for d in MRL_DIMS:
        parts.append(f""", top{d} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
    FROM (SELECT query_id, e.vec_id AS neighbor_id, {cos(d)} AS cos
          FROM e, q WHERE e.vec_id <> q.query_id)
    WHERE cos IS NOT NULL)
  WHERE rank <= {k}
)""")
    rows = []
    for d in MRL_DIMS:
        rows.append(f"""SELECT CAST({d} AS BIGINT) AS dim,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM top{full}) AS n_truth,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM top{d} t1 JOIN top{full} t2 USING (query_id, neighbor_id)) AS n_caught,
       ROUND(CAST((SELECT COUNT(*) FROM top{d} t1 JOIN top{full} t2 USING (query_id, neighbor_id)) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM top{full}) AS DOUBLE), 6) AS recall""")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(rows) + "\nORDER BY dim\n"


DIM_ABLATION_SQL = _dim_ablation_sql()


# --- IVF nprobe-recall curve (the ANN serving-knob ladder) -------------

NPROBE_LADDER = (1, 2, 4, 8, 16)


def ann_nprobe_curve_report(
    spark: SparkSession,
    sf_dir: str,
    nprobes: tuple[int, ...] = NPROBE_LADDER,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int | None = None,
) -> DataFrame:
    """Measured recall-vs-cost ladder for the IVF probe knob — the ANN
    sibling of ``lsh_curve_report`` (the two knob tables a serving
    rollout reads): per nprobe rung, the fraction of the corpus each
    query scores (nprobe / n_cells — THE cost number at any scale:
    expected scanned rows = N·nprobe/n_cells) and the measured
    recall@k against the exact brute-force truth. This is the curve
    ``auto_nprobe``'s derived value (8 at the 16-cell gate floor) was
    justified from in r9 — now a standing, oracled report instead of
    a one-off bring-up measurement.

    Scale shape: ONE k-means train and ONE cell-tag pass (both
    checkpointed) feed every rung; the truth leg is the audited
    brute-force tier over the bounded standing query set; each rung
    adds only its probe join (output ∝ nprobe/n_cells of the corpus
    per query) and a k·n_queries-row intersection. Counts
    integer-exact; recall and probe_frac are 6dp.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if n_cells is None:
        n_cells = auto_n_cells(emb.count())
    truth = (
        cosine_topk_bruteforce(spark, sf_dir, n_queries=n_queries, k=k)
        .select("query_id", "neighbor_id")
        .localCheckpoint()
    )
    n_truth = truth.count()
    centroids = _kmeans_centroids(_ivf_train_sample(emb), n_cells)
    tagged = emb.withColumn("cell", _nearest_cell_expr(centroids)).localCheckpoint()
    dists = [
        F.aggregate(
            F.zip_with(
                F.col("q"), F.array(*[F.lit(x) for x in c]), lambda a, b: (a - b) * (a - b)
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        for c in centroids
    ]
    cell_pairs = F.array(
        *[F.struct(d.alias("d"), F.lit(i).alias("i")) for i, d in enumerate(dists)]
    )
    # r13 fold (the lsh_curve / dim_ablation pattern, guide §2.4): the
    # rungs are NESTED PREFIXES of one per-query cell ranking, so the
    # r9-r12 per-rung loop (one probe join + cosine pass + top-k +
    # truth intersect PER nprobe — Σ nprobe/n_cells corpus-fraction
    # cosine passes) collapses into ONE scored pass at the max rung:
    # each candidate carries its cell's probe rank, explodes into the
    # rungs that reach it (rung > pos — slim int rows AFTER the cosine
    # is computed once), and one composite-key top-k ranks every rung.
    # Ordering source (array_sort over (dist, cell-index) structs),
    # cosine values, per-rung candidate sets and the (desc cos, asc id)
    # total order are byte-identical to the per-rung loop.
    max_probe = min(max(nprobes), n_cells)
    probe_cells = F.transform(
        F.slice(F.array_sort(cell_pairs), 1, max_probe),
        lambda p: p.getField("i"),
    )
    qex = (
        tagged.where(F.col("vec_id") < n_queries)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("q"))
        .select("query_id", "q", F.posexplode(probe_cells).alias("pos", "cell"))
    )
    scored = (
        tagged.join(F.broadcast(qex), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "pos",
            _cosine(F.col("q"), F.col("v")).alias("cos"),
        )
        .where(F.col("cos").isNotNull())
    )
    rung_arr = F.array(*[F.lit(np).cast("bigint") for np in nprobes])
    exploded = scored.select(
        "query_id",
        "neighbor_id",
        "cos",
        F.explode(F.filter(rung_arr, lambda r: r > F.col("pos"))).alias("nprobe"),
    )
    tk = per_key_topk(
        exploded, ["nprobe", "query_id"], [F.desc("cos"), F.asc("neighbor_id")], k
    ).select("nprobe", "query_id", "neighbor_id")
    caught = (
        tk.join(truth, ["query_id", "neighbor_id"])
        .groupBy("nprobe")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_caught"))
    )
    # per-rung 1-row literal frames (the lsh_curve rung-frame pattern):
    # probe_frac/recall keep the exact per-rung literal IEEE
    # expressions of the old loop; a rung no candidate reaches
    # coalesces to the same zero its empty aggregate produced
    outs = []
    for nprobe in nprobes:
        outs.append(
            spark.range(1).select(
                F.lit(nprobe).cast("bigint").alias("nprobe"),
                F.round(
                    F.lit(float(min(nprobe, n_cells))) / F.lit(float(n_cells)), 6
                ).alias("probe_frac"),
                F.lit(n_truth).cast("bigint").alias("n_truth"),
            )
        )
    rungs = outs[0]
    for o in outs[1:]:
        rungs = rungs.unionAll(o)
    return (
        rungs.join(caught, "nprobe", "left")
        .select(
            "nprobe",
            "probe_frac",
            "n_truth",
            F.coalesce(F.col("n_caught"), F.lit(0).cast("bigint")).alias("n_caught"),
            F.round(
                F.try_divide(
                    F.coalesce(F.col("n_caught"), F.lit(0).cast("bigint")).cast(
                        "double"
                    ),
                    F.lit(float(n_truth)),
                ),
                6,
            ).alias("recall"),
        )
        .orderBy("nprobe")
    )


def _nprobe_curve_sql(
    nprobes: tuple[int, ...] = NPROBE_LADDER,
    n_queries: int = 10,
    k: int = 10,
    n_cells: int = 16,
    iters: int = 3,
    dim: int = 64,
) -> str:
    def dist(v: str, c: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> ({v}[i]-{c}[i])*({v}[i]-{c}[i])))"
        )

    prev = f"cent{iters}"
    cos = (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> p.q[i] * g.v[i]))"
        f" / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> p.q[i]*p.q[i])))"
        f" * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> g.v[i]*g.v[i]))))"
    )
    bcos = (
        f"list_sum(list_transform(range(1, {dim + 1}), i -> q.q[i] * g.v[i]))"
        f" / (sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> q.q[i]*q.q[i])))"
        f" * sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> g.v[i]*g.v[i]))))"
    )
    parts = [_kmeans_tagged_sql(n_cells, iters, dim)]
    # materialize the shared legs: tagged and the probe ranking are
    # referenced by every rung (the DuckDB CTE-inlining lesson)
    parts.append(
        f""", taggedm AS MATERIALIZED (
  SELECT vec_id, v, cell FROM tagged
), pranked AS MATERIALIZED (
  SELECT t.vec_id AS query_id, t.v AS q, c.cell,
         ROW_NUMBER() OVER (PARTITION BY t.vec_id
                            ORDER BY {dist('t.v', 'c.c')} ASC, c.cell ASC) AS rn
  FROM e t CROSS JOIN {prev} c
  WHERE t.vec_id < {n_queries}
), truthk AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vec_id AS query_id, g.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY {bcos.replace('q.q', 'q.v')} DESC, g.vec_id) AS rank
    FROM e q CROSS JOIN e g
    WHERE q.vec_id < {n_queries} AND g.vec_id <> q.vec_id
      AND {bcos.replace('q.q', 'q.v')} IS NOT NULL)
  WHERE rank <= {k}
)"""
    )
    rows = []
    for nprobe in nprobes:
        npx = min(nprobe, n_cells)
        parts.append(f""", top{nprobe} AS MATERIALIZED (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, g.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id ORDER BY {cos} DESC, g.vec_id) AS rank
    FROM taggedm g
    JOIN (SELECT query_id, q, cell FROM pranked WHERE rn <= {npx}) p
      ON g.cell = p.cell AND g.vec_id <> p.query_id
    WHERE {cos} IS NOT NULL)
  WHERE rank <= {k}
)""")
        rows.append(f"""SELECT CAST({nprobe} AS BIGINT) AS nprobe,
       ROUND(CAST({float(npx)!r} AS DOUBLE) / CAST({float(n_cells)!r} AS DOUBLE), 6) AS probe_frac,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM truthk) AS n_truth,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM top{nprobe} t1 JOIN truthk t2 USING (query_id, neighbor_id)) AS n_caught,
       ROUND(CAST((SELECT COUNT(*) FROM top{nprobe} t1 JOIN truthk t2 USING (query_id, neighbor_id)) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM truthk) AS DOUBLE), 6) AS recall""")
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(rows) + "\nORDER BY nprobe\n"


NPROBE_CURVE_SQL = _nprobe_curve_sql()


# --- inter-dimension correlation (redundancy detector) -------------------

CORR_TOP_K = 20


def embedding_correlation_report(
    spark: SparkSession, sf_dir: str, top_k: int = CORR_TOP_K
) -> DataFrame:
    """Top correlated embedding-dimension pairs — the REDUNDANCY
    detector that tells ``embedding_dim_ablation`` where its cheap
    truncation wins come from: two dimensions carrying |corr| ≈ 1 are
    one dimension of information, so the ablation can drop one for
    free, and a whitening/PCA step is worth its cost exactly when
    this table's head is heavy. Completes the embedding-hygiene
    family (outliers, drift, JL width, ablation, THIS).

    Pearson r per (i < j) pair from exact moment sums: per-dim Σx and
    Σx² and per-pair Σxy accumulate as 9dp-rounded DECIMALs (float32
    inputs widen to double exactly; products are correctly-rounded
    doubles — the house decimal-sum convention), so both engines see
    identical moments; cov/var/corr arithmetic is then an identical
    IEEE expression tree. Near-constant dims whose 9dp-rounded
    variance collapses to <= 0 clamp to 0 and NULL out of the ranking
    via try_divide on both engines.

    Scale shape (r12 optimization round): the O(n·d²/2) pair products
    are generated IN-ROW — posexplode dim i while carrying the vector,
    then posexplode the carried vector again for j > i — so every
    product is born in the scan stage and the partial aggregate
    collapses it map-side to d²/2 keys per task; the only exchange
    carries tasks × d²/2 rows. The r12-build form materialized the
    (vec, dim, x) frame (localCheckpoint) and SELF-JOINED it on
    vec_id: a corpus-sized checkpoint write, a broadcast of n·d rows,
    and n·d²/2 join outputs born AFTER the join — measured 7.1 s at
    sf0.1 vs 2.0 s for the in-row form, and at 100 TB the broadcast
    build side would not even fit (the moments stay mergeable, so a
    sampled run remains the same plan on a FILTER'd scan).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))

    def dec(c):
        return F.round(c, 9).cast("decimal(28,9)")

    x = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    stats = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    pxy = (
        emb.select(F.col("embedding").alias("e"), F.posexplode("embedding").alias("i", "xfi"))
        .select("i", F.col("xfi").cast("double").alias("xi"), F.posexplode("e").alias("j", "xfj"))
        .where(F.col("j") > F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(dec(F.col("xi") * F.col("xfj").cast("double"))).alias("sxy"))
    )
    si = stats.select(
        F.col("dim").alias("i"),
        F.col("n").alias("n"),
        F.col("sx").alias("sx_i"),
        F.col("sxx").alias("sxx_i"),
    )
    sj = stats.select(
        F.col("dim").alias("j"),
        F.col("sx").alias("sx_j"),
        F.col("sxx").alias("sxx_j"),
    )
    n = F.col("n").cast("double")
    mi = F.col("sx_i").cast("double") / n
    mj = F.col("sx_j").cast("double") / n
    cov = F.col("sxy").cast("double") / n - mi * mj
    vi = F.greatest(F.col("sxx_i").cast("double") / n - mi * mi, F.lit(0.0))
    vj = F.greatest(F.col("sxx_j").cast("double") / n - mj * mj, F.lit(0.0))
    corr = F.try_divide(cov, F.sqrt(vi * vj))
    return (
        pxy.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            F.col("i").cast("int").alias("dim_i"),
            F.col("j").cast("int").alias("dim_j"),
            F.round(cov, 6).alias("cov"),
            F.round(corr, 6).alias("corr"),
        )
        .where(F.col("corr").isNotNull())
        .orderBy(F.desc(F.abs(F.col("corr"))), F.asc("dim_i"), F.asc("dim_j"))
        .limit(top_k)
    )


CORRELATION_REPORT_SQL = f"""
WITH x AS (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), stats AS (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(ROUND(x, 9) AS DECIMAL(28,9))) AS sx,
         SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,9))) AS sxx
  FROM x GROUP BY dim
), pxy AS (
  SELECT a.dim AS i, b.dim AS j,
         SUM(CAST(ROUND(a.x * b.x, 9) AS DECIMAL(28,9))) AS sxy
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim < b.dim
  GROUP BY 1, 2
), m AS (
  SELECT i, j,
         CAST(sxy AS DOUBLE) / CAST(si.n AS DOUBLE)
           - (CAST(si.sx AS DOUBLE) / CAST(si.n AS DOUBLE))
             * (CAST(sj.sx AS DOUBLE) / CAST(si.n AS DOUBLE)) AS cov,
         GREATEST(CAST(si.sxx AS DOUBLE) / CAST(si.n AS DOUBLE)
           - (CAST(si.sx AS DOUBLE) / CAST(si.n AS DOUBLE))
             * (CAST(si.sx AS DOUBLE) / CAST(si.n AS DOUBLE)), 0.0) AS vi,
         GREATEST(CAST(sj.sxx AS DOUBLE) / CAST(si.n AS DOUBLE)
           - (CAST(sj.sx AS DOUBLE) / CAST(si.n AS DOUBLE))
             * (CAST(sj.sx AS DOUBLE) / CAST(si.n AS DOUBLE)), 0.0) AS vj
  FROM pxy JOIN stats si ON si.dim = i JOIN stats sj ON sj.dim = j
)
SELECT CAST(i AS INT) AS dim_i, CAST(j AS INT) AS dim_j,
       ROUND(cov, 6) AS cov,
       ROUND(cov / sqrt(vi * vj), 6) AS corr
FROM m
WHERE cov / sqrt(vi * vj) IS NOT NULL
ORDER BY ABS(corr) DESC, dim_i, dim_j
LIMIT {CORR_TOP_K}
"""


# --- PCA / whitening step (explained-variance ladder) ---------------------

PCA_COMPONENTS = 4
PCA_ITERS = 24


def _pca_cov_rows(spark: SparkSession, sf_dir: str):
    """Collect the BOUNDED covariance matrix of the embedding columns
    as ({(i, j): cov}, {i: mean}) — d <= 64 so this is <= 4096 values
    regardless of corpus size. The corpus-sized work (moment sums)
    runs in Spark with ``embedding_correlation_report``'s exact
    decimal-sum recipe (9dp-rounded DECIMAL(28,9) moments -> identical
    doubles on both engines); every matrix entry is 9dp-rounded so the
    driver-side iteration and the oracle's unrolled SQL iteration
    start from identical bit patterns. The mean vector (sx/n as plain
    correctly-rounded double division of the exact decimal sum — the
    arithmetic the oracle's ``muv`` CTE repeats) rides along for the
    All-but-the-Top centering step in the whitening report."""
    emb = spread(load_table(spark, sf_dir, "embeddings"))

    def dec(c):
        return F.round(c, 9).cast("decimal(28,9)")

    # r12 optimization: same in-row pair-product shape as
    # embedding_correlation_report — no checkpoint, no vec_id join;
    # the pair products are born in the scan stage and collapse
    # map-side to d²/2 keys.
    x = emb.select(F.posexplode("embedding").alias("dim", "xf")).select(
        "dim", F.col("xf").cast("double").alias("x")
    )
    stats = x.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("x"))).alias("sx"),
        F.sum(dec(F.col("x") * F.col("x"))).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    mi = F.col("sx").cast("double") / nd
    diag = stats.select(
        F.col("dim").alias("i"),
        F.round(
            F.greatest(F.col("sxx").cast("double") / nd - mi * mi, F.lit(0.0)), 9
        ).alias("c"),
        mi.alias("mu"),
    ).collect()
    pxy = (
        emb.select(F.col("embedding").alias("e"), F.posexplode("embedding").alias("i", "xfi"))
        .select("i", F.col("xfi").cast("double").alias("xi"), F.posexplode("e").alias("j", "xfj"))
        .where(F.col("j") > F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(dec(F.col("xi") * F.col("xfj").cast("double"))).alias("sxy"))
    )
    si = stats.select(
        F.col("dim").alias("i"), "n", F.col("sx").alias("sx_i")
    )
    sj = stats.select(F.col("dim").alias("j"), F.col("sx").alias("sx_j"))
    nn = F.col("n").cast("double")
    m_i = F.col("sx_i").cast("double") / nn
    m_j = F.col("sx_j").cast("double") / nn
    upper = (
        pxy.join(F.broadcast(si), "i")
        .join(F.broadcast(sj), "j")
        .select(
            "i",
            "j",
            F.round(F.col("sxy").cast("double") / nn - m_i * m_j, 9).alias("c"),
        )
        .collect()
    )
    cov: dict = {}
    mu: dict = {}
    for r in diag:
        cov[(r["i"], r["i"])] = float(r["c"])
        mu[r["i"]] = float(r["mu"])
    for r in upper:
        cov[(r["i"], r["j"])] = float(r["c"])
        cov[(r["j"], r["i"])] = float(r["c"])
    return cov, mu


def pca_projection_report(
    spark: SparkSession,
    sf_dir: str,
    k: int = PCA_COMPONENTS,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """Top-k principal components of the embedding covariance by
    POWER ITERATION with deflation (von Mises & Pollaczek-Geiringer
    1929; Golub & Van Loan §7.3) — the explained-variance ladder that
    ``embedding_correlation_report`` points at: a heavy correlated
    head there means the top eigenvalues here carry most of the
    trace, and var_ratio/cum_var_ratio quantify EXACTLY how much a
    PCA/whitening projection would keep — the principled counterpart
    to ``embedding_dim_ablation``'s prefix-truncation check and
    ``jl_projection_report``'s oblivious random projection.
    Completes the embedding-hygiene family.

    Per component: init v = e_m at the argmax-diagonal dim (ties ->
    smallest dim), ``iters`` fixed unrolled iterations of
    v <- C v / ||C v||, eigenvalue = v'Cv, then deflate
    C <- C - lambda v v' and repeat. Fixed iteration count is the
    knn_pagerank discipline: both engines run the SAME arithmetic the
    SAME number of times, so results agree bit-for-bit regardless of
    convergence rate. Float discipline: every matvec/λ sum is a
    decimal sum of 9dp-rounded terms (order-free); normalized vector
    entries and deflated matrix entries are re-rounded to 9dp so the
    next step's inputs are identical bit patterns on both engines; a
    non-positive norm (zero/deflated-to-rank matrix) keeps the
    previous vector and yields eigenvalue 0. Output per component:
    eigenvalue, var_ratio (lambda/trace), cum_var_ratio, top_dim (the
    dimension with the largest |loading|, ties -> smallest), and
    top_loading (its |value|) — all sign-convention-free.

    Scale shape: the corpus-sized work is the moment pass (one scan +
    the O(n*d^2/2) pair shuffle ``embedding_correlation_report``
    already prices — and like there, the moments are mergeable so a
    sampled run is the same plan on a FILTER'd scan). The iteration
    operand is the d x d matrix — d <= 64, CORPUS-INDEPENDENT — so it
    runs driver-side on a bounded collect: 4*24 matvecs over <= 4096
    entries is microseconds, where the knn_pagerank-style distributed
    loop would schedule ~100 tiny jobs to do the same arithmetic
    (that loop iterates a CORPUS-sized frame, which must stay
    distributed; this one does not).
    """
    from decimal import ROUND_HALF_UP, Decimal

    def r6(v: float) -> float:
        return float(Decimal(repr(v)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    def dsum(terms) -> float:
        return float(sum(Decimal(repr(t)) for t in terms) or 0)

    cov, _mu = _pca_cov_rows(spark, sf_dir)
    schema = (
        "component int, eigenvalue double, var_ratio double, "
        "cum_var_ratio double, top_dim int, top_loading double"
    )
    dims = sorted({i for i, _ in cov})
    if not dims:
        return spark.createDataFrame([], schema)
    trace = dsum(cov[(i, i)] for i in dims)

    rows = []
    cum = 0.0
    for comp, (lam, v) in enumerate(_power_components(cov, k, iters), 1):
        top = min(dims, key=lambda i: (-abs(v[i]), i))
        cum = cum + lam
        rows.append(
            (
                comp,
                r6(lam),
                r6(lam / trace) if trace != 0 else None,
                r6(cum / trace) if trace != 0 else None,
                top,
                r6(abs(v[top])),
            )
        )
    return spark.createDataFrame(rows, schema)


def _power_components(cov: dict, k: int, iters: int) -> list:
    """The deflated power-iteration core shared by
    ``pca_projection_report`` and ``whitening_isotropy_report``:
    returns [(eigenvalue, {dim: loading}), ...] for the top-k
    components, with the exact 9dp/decimal arithmetic the unrolled
    SQL twins reproduce step for step (extracted verbatim — a second
    pasted copy is how twins drift)."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    def r9(v: float) -> float:
        return float(Decimal(repr(v)).quantize(Decimal("1e-9"), ROUND_HALF_UP))

    def dsum(terms) -> float:
        return float(sum(Decimal(repr(t)) for t in terms) or 0)

    dims = sorted({i for i, _ in cov})

    def matvec(c: dict, v: dict) -> dict:
        return {
            i: dsum(r9(c[(i, j)] * v[j]) for j in dims if (i, j) in c)
            for i in dims
        }

    out = []
    cur = dict(cov)
    for _comp in range(1, k + 1):
        m = min(dims, key=lambda i: (-cur.get((i, i), 0.0), i))
        v = {i: 1.0 if i == m else 0.0 for i in dims}
        for _ in range(iters):
            w = matvec(cur, v)
            nrm = math.sqrt(dsum(r9(w[i] * w[i]) for i in dims))
            if nrm > 0:
                v = {i: r9(w[i] / nrm) for i in dims}
        wf = matvec(cur, v)
        lam = dsum(r9(v[i] * wf[i]) for i in dims)
        out.append((lam, v))
        cur = {
            (i, j): r9(cur[(i, j)] - lam * v[i] * v[j])
            for (i, j) in cur
        }
    return out


def _pca_chain(k: int = PCA_COMPONENTS, iters: int = PCA_ITERS) -> str:
    """The unrolled power-iteration CTE chain (moments → mat1 → per
    component init/matvec/normalize/deflate) shared by the PCA report
    twin and the whitening twin — ends open after mat{k+1}, with
    ``x``/``stats``/``dims``/``tr``/``lam{c}``/``top{c}``/
    ``v{c}_{iters}`` all addressable."""
    parts = [
        """WITH x AS MATERIALIZED (
  SELECT vec_id,
         generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS x
  FROM embeddings
), stats AS MATERIALIZED (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(ROUND(x, 9) AS DECIMAL(28,9))) AS sx,
         SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,9))) AS sxx
  FROM x GROUP BY dim
), dims AS MATERIALIZED (
  SELECT dim AS i FROM stats
), pxy AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j,
         SUM(CAST(ROUND(a.x * b.x, 9) AS DECIMAL(28,9))) AS sxy
  FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.dim < b.dim
  GROUP BY 1, 2
), up AS MATERIALIZED (
  SELECT i, j,
         ROUND(CAST(sxy AS DOUBLE) / CAST(si.n AS DOUBLE)
           - (CAST(si.sx AS DOUBLE) / CAST(si.n AS DOUBLE))
             * (CAST(sj.sx AS DOUBLE) / CAST(si.n AS DOUBLE)), 9) AS m
  FROM pxy JOIN stats si ON si.dim = i JOIN stats sj ON sj.dim = j
), dg AS MATERIALIZED (
  SELECT dim AS i, dim AS j,
         ROUND(GREATEST(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 0.0), 9) AS m
  FROM stats
), mat1 AS MATERIALIZED (
  SELECT i, j, m FROM dg
  UNION ALL SELECT i, j, m FROM up
  UNION ALL SELECT j AS i, i AS j, m FROM up
), tr AS MATERIALIZED (
  SELECT CAST(SUM(CAST(m AS DECIMAL(38,9))) AS DOUBLE) AS trace FROM dg
)"""
    ]
    for c in range(1, k + 1):
        parts.append(f""", init{c} AS MATERIALIZED (
  SELECT i FROM mat{c} WHERE i = j ORDER BY m DESC, i LIMIT 1
), v{c}_0 AS MATERIALIZED (
  SELECT d.i, CASE WHEN d.i = (SELECT i FROM init{c}) THEN 1.0 ELSE 0.0 END AS v
  FROM dims d
)""")
        for t in range(1, iters + 1):
            parts.append(f""", w{c}_{t} AS MATERIALIZED (
  SELECT m.i, CAST(SUM(CAST(ROUND(m.m * v.v, 9) AS DECIMAL(38,9))) AS DOUBLE) AS w
  FROM mat{c} m JOIN v{c}_{t - 1} v ON m.j = v.i GROUP BY m.i
), n{c}_{t} AS MATERIALIZED (
  SELECT sqrt(CAST(SUM(CAST(ROUND(w * w, 9) AS DECIMAL(38,9))) AS DOUBLE)) AS nrm
  FROM w{c}_{t}
), v{c}_{t} AS MATERIALIZED (
  SELECT w.i,
         CASE WHEN n.nrm > 0 THEN ROUND(w.w / n.nrm, 9) ELSE p.v END AS v
  FROM w{c}_{t} w JOIN v{c}_{t - 1} p ON p.i = w.i, n{c}_{t} n
)""")
        parts.append(f""", wf{c} AS MATERIALIZED (
  SELECT m.i, CAST(SUM(CAST(ROUND(m.m * v.v, 9) AS DECIMAL(38,9))) AS DOUBLE) AS w
  FROM mat{c} m JOIN v{c}_{iters} v ON m.j = v.i GROUP BY m.i
), lam{c} AS MATERIALIZED (
  SELECT CAST(SUM(CAST(ROUND(v.v * w.w, 9) AS DECIMAL(38,9))) AS DOUBLE) AS lam
  FROM v{c}_{iters} v JOIN wf{c} w ON w.i = v.i
), top{c} AS MATERIALIZED (
  SELECT i, ABS(v) AS a FROM v{c}_{iters} ORDER BY ABS(v) DESC, i LIMIT 1
), mat{c + 1} AS MATERIALIZED (
  SELECT m.i, m.j, ROUND(m.m - l.lam * vi.v * vj.v, 9) AS m
  FROM mat{c} m
  JOIN v{c}_{iters} vi ON vi.i = m.i
  JOIN v{c}_{iters} vj ON vj.i = m.j, lam{c} l
)""")
    return "".join(parts)


def _pca_sql(k: int = PCA_COMPONENTS, iters: int = PCA_ITERS) -> str:
    """Unrolled power-iteration twin: the same moment CTEs as
    CORRELATION_REPORT_SQL build mat1, then k x iters matvec+normalize
    CTE pairs with the identical 9dp/decimal discipline."""
    sel = []
    for c in range(1, k + 1):
        cumsum = " + ".join(f"(SELECT lam FROM lam{j})" for j in range(1, c + 1))
        sel.append(f"""SELECT {c} AS component,
       ROUND(l.lam, 6) AS eigenvalue,
       ROUND(l.lam / NULLIF(t.trace, 0), 6) AS var_ratio,
       ROUND(({cumsum}) / NULLIF(t.trace, 0), 6) AS cum_var_ratio,
       CAST(tp.i AS INT) AS top_dim,
       ROUND(tp.a, 6) AS top_loading
FROM lam{c} l, tr t, top{c} tp""")
    return _pca_chain(k, iters) + "\n" + "\nUNION ALL\n".join(sel) + "\nORDER BY component\n"


PCA_PROJECTION_SQL = _pca_sql()


# --- isotropy / anisotropy datasheet row ----------------------------------


def embedding_isotropy_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-space ISOTROPY datasheet row — the cheap screen that says
    whether the PCA/whitening step (``pca_projection_report``) and the
    mean-centering trick (Mu & Viswanath ICLR'18, "All-but-the-Top")
    are worth running at all: contextual/static embedding spaces are
    routinely anisotropic (Ethayarajh EMNLP'19 — average pairwise
    cosine far above 0), which degrades cosine retrieval and
    embedding-dedup thresholds alike.

    The trick that makes it a SCAN, not a pair join: for unit-
    normalized vectors u, the average pairwise cosine over all n(n−1)
    ordered pairs is (||Σu||² − n) / (n(n−1)) — so ONE per-dim sum of
    u (a d-row rollup) replaces the O(n²) pair enumeration that the
    correlation report honestly prices. Columns: n_vectors, mean_norm
    and norm_cv of the RAW vectors (a high CV flags norm outliers —
    the hubness precursor), mean_pairwise_cosine (the Ethayarajh
    anisotropy estimate; 0 = isotropic), and centroid_norm =
    ||mean(u)|| (the All-but-the-Top common-direction mass; equals
    sqrt of the cosine estimate's numerator scaled — reported
    separately because it is the quantity the centering fix removes).

    Float discipline: per-row norms are left-to-right F.aggregate
    folds (the module's dot convention, matched by the oracle's
    list_sum); all cross-row sums are 9dp-decimal (order-free);
    zero-norm vectors drop via the nm > 0 filter on both engines;
    n < 2 yields NULL mean_pairwise_cosine via try_divide. Scale
    shape: one scan + one d-row rollup + one 1-row join — no shuffle
    carries more than d rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return _iso_scalar_row(
        emb.select(F.col("embedding").cast("array<double>").alias("x"))
    )


def _iso_scalar_row(xs: DataFrame) -> DataFrame:
    """The one-scan isotropy rollup over a frame with column ``x``
    (array<double>) — shared by ``embedding_isotropy_report`` (raw
    space) and ``whitening_isotropy_report`` (raw AND All-but-the-Top
    space; a pasted second copy is how twins drift)."""

    def dec(c: Column) -> Column:
        return F.round(c, 9).cast("decimal(38,9)")

    base = xs.select("x", _norm(F.col("x")).alias("nm")).where(F.col("nm") > 0)
    staged = base.select(
        "nm", F.transform("x", lambda v: v / F.col("nm")).alias("u")
    ).localCheckpoint()  # feeds the scalar agg AND the per-dim rollup
    scalars = staged.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col("nm"))).alias("sn"),
        F.sum(dec(F.col("nm") * F.col("nm"))).alias("snn"),
    )
    dimsums = (
        staged.select(F.posexplode("u").alias("dim", "v"))
        .groupBy("dim")
        .agg(F.sum(dec(F.col("v"))).alias("su"))
    )
    ssq = dimsums.agg(
        F.sum(
            dec(F.col("su").cast("double") * F.col("su").cast("double"))
        ).alias("ssq")
    )
    n = F.col("n").cast("double")
    mean_norm = F.col("sn").cast("double") / n
    var_norm = F.greatest(
        F.col("snn").cast("double") / n - mean_norm * mean_norm, F.lit(0.0)
    )
    ssqd = F.col("ssq").cast("double")
    return scalars.crossJoin(F.broadcast(ssq)).select(
        F.col("n").cast("bigint").alias("n_vectors"),
        F.round(mean_norm, 6).alias("mean_norm"),
        F.round(F.try_divide(F.sqrt(var_norm), mean_norm), 6).alias("norm_cv"),
        F.round(F.try_divide(ssqd - n, n * (n - F.lit(1.0))), 6).alias(
            "mean_pairwise_cosine"
        ),
        F.round(F.sqrt(ssqd) / n, 6).alias("centroid_norm"),
    )


# --- All-but-the-Top whitening, measured by the isotropy yardstick ----

WHITEN_COMPONENTS = 2


def whitening_isotropy_report(
    spark: SparkSession,
    sf_dir: str,
    m: int = WHITEN_COMPONENTS,
    iters: int = PCA_ITERS,
) -> DataFrame:
    """All-but-the-Top embedding post-processing (Mu & Viswanath
    ICLR'18) APPLIED and MEASURED: subtract the mean vector, project
    out the top-m principal components (x' = (x−μ) − Σ_c ((x−μ)·v_c)
    v_c), and report the isotropy datasheet row BEFORE and AFTER —
    the closing step of the embedding-hygiene family: the correlation
    report finds the redundancy, the PCA report prices its
    eigenvalue mass, the isotropy report flags the anisotropy, and
    this one performs the standard fix and proves (or disproves) on
    THIS corpus that mean_pairwise_cosine and centroid_norm collapse
    toward 0 (ABTT's whole claim — retrieval cosines regain dynamic
    range). m = 2 follows the paper's d/100 rule-of-thumb rounded up
    for d = 64.

    Parity discipline: μ and the v_c come from the audited PCA
    machinery (shared ``_power_components`` core — 9dp-rounded
    loadings, exact-decimal moment sums), enter the plan as literal
    arrays, and the oracle re-derives them in the SAME unrolled CTE
    chain; per-vector dots/projections are left-to-right folds
    (the module's cosine convention, = list_sum); both stages' stats
    are the shared ``_iso_scalar_row`` rollup.

    Scale shape: corpus-sized work is the moment pass (priced by the
    correlation report) + TWO isotropy scans (raw, projected); the
    projection itself is a per-row d-length map against broadcast
    literals — no shuffle. The d×d iteration is corpus-independent
    driver work, exactly as in ``pca_projection_report``.
    """
    cov, mu = _pca_cov_rows(spark, sf_dir)
    schema = (
        "stage string, n_vectors bigint, mean_norm double, norm_cv double, "
        "mean_pairwise_cosine double, centroid_norm double"
    )
    if not cov:
        return spark.createDataFrame([], schema)
    dims = sorted({i for i, _ in cov})
    comps = _power_components(cov, m, iters)
    emb = load_table(spark, sf_dir, "embeddings")
    xs = emb.select(F.col("embedding").cast("array<double>").alias("x"))
    raw = _iso_scalar_row(xs).select(F.lit("raw").alias("stage"), "*")
    mu_lit = F.array(*[F.lit(mu[i]) for i in dims])
    vlits = [F.array(*[F.lit(v[i]) for i in dims]) for (_lam, v) in comps]
    y = xs.select(F.zip_with("x", mu_lit, lambda a, b: a - b).alias("y"))
    dotted = y.select(
        "y",
        *[
            F.aggregate(
                F.zip_with("y", vlits[c], lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, t: acc + t,
            ).alias(f"d{c + 1}")
            for c in range(len(comps))
        ],
    )
    zcol = F.col("y")
    for c in range(len(comps)):
        vl = vlits[c]
        dc = F.col(f"d{c + 1}")
        zcol = F.zip_with(zcol, vl, lambda a, b: a - dc * b)
    z = dotted.select(zcol.alias("x"))
    ab = _iso_scalar_row(z).select(F.lit("abtt").alias("stage"), "*")
    return ab.unionByName(raw).orderBy("stage")


def _iso_sql_ctes(p: str, src: str, xcol: str) -> str:
    """Namespaced isotropy-rollup CTEs over ``{src}.{xcol}`` (a
    DOUBLE[] column) — the SQL mirror of ``_iso_scalar_row``, shared
    by the whitening twin's raw and projected stages."""
    return f""", {p}base AS MATERIALIZED (
  SELECT {xcol} AS x, sqrt(list_sum(list_transform({xcol}, e -> e * e))) AS nm
  FROM {src}
), {p}staged AS MATERIALIZED (
  SELECT nm, list_transform(x, v -> v / nm) AS u FROM {p}base WHERE nm > 0
), {p}scalars AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(nm, 9) AS DECIMAL(38,9))) AS sn,
         SUM(CAST(ROUND(nm * nm, 9) AS DECIMAL(38,9))) AS snn
  FROM {p}staged
), {p}dimsums AS (
  SELECT dim, SUM(CAST(ROUND(v, 9) AS DECIMAL(38,9))) AS su
  FROM (SELECT generate_subscripts(u, 1) - 1 AS dim, unnest(u) AS v FROM {p}staged)
  GROUP BY dim
), {p}sq AS (
  SELECT SUM(CAST(ROUND(CAST(su AS DOUBLE) * CAST(su AS DOUBLE), 9) AS DECIMAL(38,9))) AS ssq
  FROM {p}dimsums
)"""


def _iso_sql_select(p: str, stage: str) -> str:
    return f"""SELECT '{stage}' AS stage,
       CAST(n AS BIGINT) AS n_vectors,
       ROUND(CAST(sn AS DOUBLE) / n, 6) AS mean_norm,
       ROUND(sqrt(GREATEST(CAST(snn AS DOUBLE) / n
                 - (CAST(sn AS DOUBLE) / n) * (CAST(sn AS DOUBLE) / n), 0.0))
             / nullif(CAST(sn AS DOUBLE) / n, 0), 6) AS norm_cv,
       ROUND((CAST(ssq AS DOUBLE) - n) / nullif(n * (n - 1.0), 0), 6) AS mean_pairwise_cosine,
       ROUND(sqrt(CAST(ssq AS DOUBLE)) / n, 6) AS centroid_norm
FROM {p}scalars, {p}sq"""


def _whitening_sql(m: int = WHITEN_COMPONENTS, iters: int = PCA_ITERS) -> str:
    comp_lists = "".join(
        f""", c{c} AS MATERIALIZED (
  SELECT list(v ORDER BY i) AS c FROM v{c}_{iters}
)"""
        for c in range(1, m + 1)
    )
    cross = " CROSS JOIN ".join(f"c{c}" for c in range(1, m + 1))
    dot_exprs = ",\n         ".join(
        f"list_sum(list_transform(range(1, len(y)+1), i -> y[i] * c{c}.c[i])) AS d{c}"
        for c in range(1, m + 1)
    )
    sub = " - ".join(f"d{c} * c{c}.c[i]" for c in range(1, m + 1))
    return (
        _pca_chain(m, iters)
        + f""", muv AS MATERIALIZED (
  SELECT dim AS i, CAST(sx AS DOUBLE) / n AS mu FROM stats
), mul AS MATERIALIZED (
  SELECT list(mu ORDER BY i) AS mu FROM muv
){comp_lists}, vecs AS MATERIALIZED (
  SELECT vec_id, list(x ORDER BY dim) AS xv FROM x GROUP BY vec_id
), yv AS MATERIALIZED (
  SELECT vec_id, list_transform(range(1, len(xv)+1), i -> xv[i] - mul.mu[i]) AS y
  FROM vecs CROSS JOIN mul
), dots AS MATERIALIZED (
  SELECT vec_id, y,
         {dot_exprs}
  FROM yv CROSS JOIN {cross}
), proj AS MATERIALIZED (
  SELECT vec_id, list_transform(range(1, len(y)+1), i -> y[i] - {sub}) AS z
  FROM dots CROSS JOIN {cross}
)"""
        + _iso_sql_ctes("r", "vecs", "xv")
        + _iso_sql_ctes("a", "proj", "z")
        + "\n"
        + _iso_sql_select("a", "abtt")
        + "\nUNION ALL\n"
        + _iso_sql_select("r", "raw")
        + "\nORDER BY stage\n"
    )


WHITENING_ISOTROPY_SQL = _whitening_sql()


ISOTROPY_SQL = """
WITH base AS MATERIALIZED (
  SELECT list_transform(embedding, e -> CAST(e AS DOUBLE)) AS x,
         sqrt(list_sum(list_transform(embedding, e -> CAST(e AS DOUBLE) * CAST(e AS DOUBLE)))) AS nm
  FROM embeddings
), staged AS MATERIALIZED (
  SELECT nm, list_transform(x, v -> v / nm) AS u
  FROM base WHERE nm > 0
), scalars AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(nm, 9) AS DECIMAL(38,9))) AS sn,
         SUM(CAST(ROUND(nm * nm, 9) AS DECIMAL(38,9))) AS snn
  FROM staged
), dimsums AS (
  SELECT dim, SUM(CAST(ROUND(v, 9) AS DECIMAL(38,9))) AS su
  FROM (
    SELECT generate_subscripts(u, 1) - 1 AS dim, unnest(u) AS v FROM staged
  ) GROUP BY dim
), sq AS (
  SELECT SUM(CAST(ROUND(CAST(su AS DOUBLE) * CAST(su AS DOUBLE), 9) AS DECIMAL(38,9))) AS ssq
  FROM dimsums
)
SELECT CAST(n AS BIGINT) AS n_vectors,
       ROUND(CAST(sn AS DOUBLE) / n, 6) AS mean_norm,
       ROUND(sqrt(GREATEST(CAST(snn AS DOUBLE) / n
                 - (CAST(sn AS DOUBLE) / n) * (CAST(sn AS DOUBLE) / n), 0.0))
             / nullif(CAST(sn AS DOUBLE) / n, 0), 6) AS norm_cv,
       ROUND((CAST(ssq AS DOUBLE) - n) / nullif(n * (n - 1.0), 0), 6) AS mean_pairwise_cosine,
       ROUND(sqrt(CAST(ssq AS DOUBLE)) / n, 6) AS centroid_norm
FROM scalars, sq
"""
