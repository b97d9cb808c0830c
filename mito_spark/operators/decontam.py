"""Benchmark decontamination + Gopher-style repetition-quality rules
for training-corpus preparation over the `documents` table.

North-star LLM-pipeline surface (not reference parity — the reference
engine, elastic/mito, has no corpus operators; its closest analogue is
the per-value text processing in lib/strings.go). Shapes follow the
published recipes:

- Decontamination: 13-gram overlap against a benchmark/probe set
  (GPT-3 appendix C / Gopher section A.5 style). Both sides build
  distinct 13-token-shingle hashes; the probe side is benchmark-sized
  (small) and broadcast; contamination = fraction of a doc's distinct
  shingles that appear in the probe set. The join is a hash equi-join
  on the shingle hash — an all-pairs document comparison never exists.
- Repetition rules: Gopher table A1 style duplicate-line fraction,
  duplicate-word fraction, and top-2/3-gram share, computed per-row
  with sorted-array run-length folds — zero shuffles, so the filter
  runs at parquet-scan bandwidth at any corpus size.

Scale design (100 TB):
- The probe shingle set is bounded by benchmark size (millions of
  shingles at most) → broadcast; the corpus side never shuffles except
  the per-doc hit count, which is |matching shingles| rows, tiny.
- Per-doc distinct shingles are computed map-side (array_distinct on
  the row) before the explode, so the exploded stream is already
  deduplicated.
- Repetition metrics are pure column programs (aggregate folds over
  sorted n-gram arrays) — no groupBy, no window, no Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.engine import load_table
from mito_spark.operators.text import _tokens

# 13 is the standard decontamination shingle width (GPT-3/Gopher).
NGRAM_N = 13
# Probe set = every 19th doc: a deterministic, SQL-expressible stand-in
# for "the benchmark suite" over the synthetic corpus.
PROBE_MOD = 19
# Contamination threshold: >= 80% of a doc's distinct shingles occur
# in the probe set. Compared in exact integer arithmetic (n_hit*5 >=
# n_grams*4) so both engines agree bit-for-bit.
CONTAM_NUM, CONTAM_DEN = 4, 5


def _shingle_hashes(toks: Column, n: int) -> Column:
    """Distinct md5 hashes of every n-token shingle — md5 is a Catalyst
    built-in, so shingling is JVM-side and engine-portable."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda s: F.md5(F.array_join(F.slice(toks, s, n), " ")),
    )
    # Guard BEFORE the sequence: for short docs sequence(1, k<1) counts
    # DOWN through 0 and slice(_, 0, _) throws — the row-level filter
    # upstream is not enough once Catalyst fuses filter+project.
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def decontaminate(
    spark: SparkSession,
    sf_dir: str,
    n: int = NGRAM_N,
    probe_mod: int = PROBE_MOD,
) -> DataFrame:
    """Per-document probe-set overlap: (doc_id, n_grams, n_probe_hits,
    overlap_frac, contaminated) for every doc with >= n tokens.

    Plan: one broadcast of the probe shingle set, one explode-join to
    count hits, one small groupBy(doc_id) on the hit stream. Nothing
    quadratic; corpus docs never compare with each other.

    Two plan subtleties matter enormously here (23s -> ~2s at sf0.1):

    - ``toks`` is STAGED as a real column before any HOF references
      it. Higher-order functions are interpreted (outside whole-stage
      codegen), so a lambda body that embeds the tokenization
      *expression* re-runs the regexp split once per array element;
      an attribute reference is a free row lookup. CollapseProject
      keeps the stage because the reference is non-cheap and used
      more than once.
    - ``explode_outer`` instead of ``explode``: InferFiltersFromGenerate
      only fires for inner generates, and the filters it infers
      (size(ghs)>0, isnotnull(ghs)) get pushed below the projection
      with the full shingle expression inlined — recomputing the
      tokenization per shingle position per row. The outer generate
      emits a null gh for empty arrays, which the per_doc filter
      already precludes.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = _tokens(F.lower(F.col("text")))
    per_doc = (
        docs.select("doc_id", toks.alias("toks"))
        .where(F.size("toks") >= n)
        .select("doc_id", _shingle_hashes(F.col("toks"), n).alias("ghs"))
    )
    probe = (
        per_doc.where(F.col("doc_id") % probe_mod == 0)
        .select(F.explode_outer("ghs").alias("gh"))
        .distinct()
    )
    hits = (
        per_doc.select("doc_id", F.explode_outer("ghs").alias("gh"))
        .join(F.broadcast(probe), "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0))
    return (
        per_doc.select("doc_id", F.size("ghs").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            n_hit.alias("n_probe_hits"),
            F.round(n_hit.cast("double") / F.col("n_grams"), 6).alias("overlap_frac"),
            (n_hit * CONTAM_DEN >= F.col("n_grams") * CONTAM_NUM).alias("contaminated"),
        )
    )


DECONTAM_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks
  FROM documents
), spans AS (
  SELECT doc_id, toks, unnest(range(1, len(toks) - {NGRAM_N} + 2)) AS s
  FROM tok WHERE len(toks) >= {NGRAM_N}
), dg AS (
  SELECT DISTINCT doc_id, md5(array_to_string(toks[s:s+{NGRAM_N - 1}], ' ')) AS gh
  FROM spans
), probe AS (
  SELECT DISTINCT gh FROM dg WHERE doc_id % {PROBE_MOD} = 0
), tot AS (
  SELECT doc_id, count(*) AS n_grams FROM dg GROUP BY doc_id
), hits AS (
  SELECT dg.doc_id, count(*) AS n_hit FROM dg JOIN probe USING (gh) GROUP BY dg.doc_id
)
SELECT tot.doc_id AS doc_id,
       n_grams,
       coalesce(n_hit, 0) AS n_probe_hits,
       round(CAST(coalesce(n_hit, 0) AS DOUBLE) / n_grams, 6) AS overlap_frac,
       coalesce(n_hit, 0) * {CONTAM_DEN} >= n_grams * {CONTAM_NUM} AS contaminated
FROM tot LEFT JOIN hits ON tot.doc_id = hits.doc_id
"""


def _max_run_len(arr: Column) -> Column:
    """Count of the most frequent element = longest equal-run in the
    sorted array; computed as an aggregate fold, per-row, no shuffle."""
    srt = F.array_sort(arr)
    init = F.struct(
        F.lit(0).alias("run"), F.lit(0).alias("best"), F.lit("").alias("prev")
    )

    def step(acc: Column, x: Column) -> Column:
        run = F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(
            F.lit(1)
        )
        return F.struct(
            run.alias("run"),
            F.greatest(acc.getField("best"), run).alias("best"),
            x.alias("prev"),
        )

    return F.aggregate(srt, init, step, lambda acc: acc.getField("best"))


def _ngrams(toks: Column, n: int) -> Column:
    """Space-joined n-grams; empty array when the doc is too short.
    The n_tok >= n guard matters: sequence(1, k) with k < 1 would
    produce a DESCENDING sequence, not an empty one."""
    joined = F.transform(
        F.sequence(F.lit(1), F.size(toks) - n + 1),
        lambda s: F.array_join(F.slice(toks, s, n), " "),
    )
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per document:

    - dup_word_frac: 1 - distinct/total tokens
    - dup_line_frac: 1 - distinct/total non-empty trimmed lines
    - top2_share / top3_share: share of all 2-/3-grams taken by the
      single most frequent one
    - repetition_flag: Gopher-ish thresholds (dup lines > 30%,
      top-2-gram > 20%, top-3-gram > 18%), evaluated in exact integer
      arithmetic so the flag is engine-portable.

    Entirely shuffle-free: every metric is a column program over the
    row's own token/line arrays (run-length folds over sorted arrays
    stand in for a groupBy-count of the mode).
    """
    docs = load_table(spark, sf_dir, "documents")
    # Stage toks/lines as columns, then the scalar metrics as columns,
    # THEN the derived ratios: every HOF lambda reads attributes, and
    # the run-length folds are computed once even though two output
    # columns reference them (see decontaminate's plan notes).
    lines = F.filter(
        F.transform(F.split(F.col("text"), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""),
    )
    staged = docs.select(
        "doc_id", _tokens(F.lower(F.col("text"))).alias("toks"), lines.alias("lines")
    )
    tk, ln = F.col("toks"), F.col("lines")
    metrics = staged.select(
        "doc_id",
        F.size(tk).alias("n_tok"),
        F.size(F.array_distinct(tk)).alias("n_dist"),
        F.size(ln).alias("n_lines"),
        F.size(F.array_distinct(ln)).alias("n_dlines"),
        _max_run_len(_ngrams(tk, 2)).alias("run2"),
        _max_run_len(_ngrams(tk, 3)).alias("run3"),
    )
    n_tok, n_dist = F.col("n_tok"), F.col("n_dist")
    n_lines, n_dlines = F.col("n_lines"), F.col("n_dlines")
    run2, run3 = F.col("run2"), F.col("run3")
    tot2 = F.greatest(n_tok - 1, F.lit(0))
    tot3 = F.greatest(n_tok - 2, F.lit(0))
    flag = (
        ((n_lines - n_dlines) * 10 > n_lines * 3)
        | (run2 * 5 > tot2)
        | (run3 * 50 > tot3 * 9)
    )
    return metrics.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round((n_tok - n_dist).cast("double") / F.greatest(n_tok, F.lit(1)), 6).alias(
            "dup_word_frac"
        ),
        F.round(
            (n_lines - n_dlines).cast("double") / F.greatest(n_lines, F.lit(1)), 6
        ).alias("dup_line_frac"),
        F.round(run2.cast("double") / F.greatest(tot2, F.lit(1)), 6).alias("top2_share"),
        F.round(run3.cast("double") / F.greatest(tot3, F.lit(1)), 6).alias("top3_share"),
        flag.alias("repetition_flag"),
    )


# The oracle computes the mode counts by explode+groupBy — a different
# algorithm than the Spark run-length fold, which is the point: two
# independent derivations must agree bit-for-bit.
REPETITION_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS toks,
         list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)), x -> x <> '') AS lines
  FROM documents
), g2 AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM base WHERE len(toks) >= 2)
), a2 AS (
  SELECT doc_id, max(c) AS top2 FROM (
    SELECT doc_id, gram, count(*) AS c FROM g2 GROUP BY doc_id, gram
  ) GROUP BY doc_id
), g3 AS (
  SELECT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS gram
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM base WHERE len(toks) >= 3)
), a3 AS (
  SELECT doc_id, max(c) AS top3 FROM (
    SELECT doc_id, gram, count(*) AS c FROM g3 GROUP BY doc_id, gram
  ) GROUP BY doc_id
)
SELECT b.doc_id AS doc_id,
       len(toks) AS n_tokens,
       round(CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE)
             / greatest(len(toks), 1), 6) AS dup_word_frac,
       round(CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)
             / greatest(len(lines), 1), 6) AS dup_line_frac,
       round(CAST(coalesce(top2, 0) AS DOUBLE)
             / greatest(len(toks) - 1, 1), 6) AS top2_share,
       round(CAST(coalesce(top3, 0) AS DOUBLE)
             / greatest(len(toks) - 2, 1), 6) AS top3_share,
       ((len(lines) - len(list_distinct(lines))) * 10 > len(lines) * 3
        OR coalesce(top2, 0) * 5 > greatest(len(toks) - 1, 0)
        OR coalesce(top3, 0) * 50 > greatest(len(toks) - 2, 0) * 9) AS repetition_flag
FROM base b
LEFT JOIN a2 ON b.doc_id = a2.doc_id
LEFT JOIN a3 ON b.doc_id = a3.doc_id
"""
