"""want_more continuation protocol (reference mito.go:186-204,
testdata/want_more.txt / FIXTURES.md F3)."""

from __future__ import annotations

import pytest

from mito_spark.streaming.continuation import ContinuationDriver, cursor_summary, paginate_dataframe


def test_want_more_sequence(spark):
    # F3: state {n:0}; step increments n, want_more while n+1 < 5
    def step(s, state):
        n = state["n"] + 1
        return {"n": n, "want_more": n + 1 < 5}

    drv = ContinuationDriver(step)
    final = drv.run(spark, {"n": 0})
    assert final == {"n": 4, "want_more": False}
    assert [h["n"] for h in drv.history] == [1, 2, 3, 4]


def test_runaway_loop_bounded(spark):
    drv = ContinuationDriver(lambda s, st: {"want_more": True}, max_steps=7)
    with pytest.raises(RuntimeError):
        drv.run(spark, {})


def test_paginate_dataframe(spark):
    # pages of 3 ids, 3 pages
    def fetch(s, cursor):
        page = cursor.get("page", 0)
        df = s.range(page * 3, page * 3 + 3)
        return df, {"page": page + 1, "want_more": page + 1 < 3}

    out = paginate_dataframe(spark, fetch, {"page": 0})
    assert sorted(r.id for r in out.collect()) == list(range(9))


def test_cursor_summary(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-02 00:00:00",)], "t string"
    ).selectExpr("cast(t as timestamp) as timestamp")
    c = cursor_summary(df)
    assert c["timestamps"]["first"].day == 1
    assert c["timestamps"]["last"].day == 2


# ---------- continuation x incremental_dedup, end-to-end ----------

def _doc_text(tag: str) -> str:
    return " ".join(f"{tag}w{j}" for j in range(20))


_CANON = {i: _doc_text(f"c{i}") for i in range(5)}
# pages of the "crawl": exact dup of canon 2, cross-page dup (110
# duplicates 101, accepted one page earlier — only catchable because
# accepted docs FOLD INTO the canon between pages), dup of a dropped
# doc's ORIGINAL (120 -> 101, not 110: 110 was dropped, never entered
# the canon), and uniques
_PAGES = [
    [(100, _CANON[2]), (101, _doc_text("u101")), (102, _doc_text("u102"))],
    [(110, _doc_text("u101")), (111, _doc_text("u111")), (112, _CANON[0])],
    [(120, _doc_text("u101")), (121, _doc_text("u121"))],
]
_EXPECT_DUP_OF = {
    100: 2, 101: None, 102: None,
    110: 101, 111: None, 112: 0,
    120: 101, 121: None,
}


@pytest.fixture(scope="module")
def doc_server():
    import http.server
    import json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            page = int(parse_qs(urlparse(self.path).query).get("page", ["0"])[0])
            docs = _PAGES[page] if page < len(_PAGES) else []
            body = json.dumps(
                [{"doc_id": i, "text": t} for i, t in docs]
            ).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/docs?page={{page}}"
    srv.shutdown()


def _canon_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in _CANON.items()], "doc_id long, text string"
    )


def test_ingest_dedup_continuation_flags_cross_page_dups(spark, doc_server):
    """The want_more/cursor loop driving incremental_dedup: exact-dup
    flags vs the SEED canon, plus the cross-page dup only a growing
    canon can catch (110 -> 101), plus the dropped-doc rule (120 maps
    to 101, the accepted original, never to dropped 110)."""
    from mito_spark.streaming.ingest_dedup import ingest_dedup_continuation

    flags = ingest_dedup_continuation(
        spark, doc_server, len(_PAGES), _canon_df(spark)
    ).collect()
    assert {r.doc_id: r.dup_of for r in flags} == _EXPECT_DUP_OF
    # dup rows carry the exact verified jaccard (planted dups are exact)
    assert all(r.jaccard == 1.0 for r in flags if r.dup_of is not None)
    # the flag log records which page each doc arrived on
    assert {r.doc_id: r.page for r in flags} == {
        i: p for p, docs in enumerate(_PAGES) for i, _ in docs
    }


@pytest.mark.parametrize("per_batch", [1, 2, 10])
def test_ingest_dedup_stream_equals_continuation_replay(
    spark, doc_server, tmp_path, per_batch
):
    """Batch-vs-replay equality: the foreachBatch stream over the
    checkpointed-offset HTTP source must produce byte-identical flags
    to the driver-side continuation loop at ANY micro-batch size
    (pages are the atomic unit, processed in order inside each
    batch)."""
    from mito_spark.streaming.ingest_dedup import (
        ingest_dedup_continuation,
        ingest_dedup_stream,
    )

    want = sorted(
        tuple(r)
        for r in ingest_dedup_continuation(
            spark, doc_server, len(_PAGES), _canon_df(spark)
        ).collect()
    )
    base = tmp_path / f"b{per_batch}"
    canon_dir = str(base / "canon")
    _canon_df(spark).write.parquet(canon_dir)
    got = sorted(
        tuple(r)
        for r in ingest_dedup_stream(
            spark,
            doc_server,
            len(_PAGES),
            canon_dir,
            str(base / "out"),
            str(base / "ckpt"),
            max_pages_per_batch=per_batch,
        ).collect()
    )
    assert got == want


def _accepted_page0(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in _PAGES[0] if _EXPECT_DUP_OF[i] is None],
        "doc_id long, text string",
    )


def test_ingest_dedup_stream_replay_half_committed_page(
    spark, doc_server, tmp_path
):
    """Crash between the canon append and the flag append (ADVICE r9):
    page 0's ACCEPTED docs are already in the canon — page-tagged, as
    the protocol writes them — but its flags never landed. Replay must
    recompute IDENTICAL flags (the canon view masks exactly the
    uncommitted page's residue rows) and never double-append the
    canon (doc_id anti-join before the append)."""
    import pyspark.sql.functions as F

    from mito_spark.streaming.ingest_dedup import (
        ingest_dedup_continuation,
        ingest_dedup_stream,
    )

    want = sorted(
        tuple(r)
        for r in ingest_dedup_continuation(
            spark, doc_server, len(_PAGES), _canon_df(spark)
        ).collect()
    )
    base = tmp_path / "half"
    canon_dir = str(base / "canon")
    _canon_df(spark).write.parquet(canon_dir)
    _accepted_page0(spark).withColumn("page", F.lit(0)).write.mode("append").parquet(
        canon_dir
    )
    got = sorted(
        tuple(r)
        for r in ingest_dedup_stream(
            spark,
            doc_server,
            len(_PAGES),
            canon_dir,
            str(base / "out"),
            str(base / "ckpt"),
            max_pages_per_batch=2,
        ).collect()
    )
    assert got == want
    canon = spark.read.parquet(canon_dir)
    assert canon.count() == canon.select("doc_id").distinct().count()


def test_ingest_dedup_stream_replay_committed_page_skipped(
    spark, doc_server, tmp_path
):
    """Fully-committed page replay (ADVICE r9): page 0's flags AND
    accepted docs already landed; the replayed source re-delivers the
    page, the sink skips it (flag append is the commit marker), and
    the flag log holds exactly one row per doc."""
    from mito_spark.streaming.ingest_dedup import (
        ingest_dedup_continuation,
        ingest_dedup_stream,
    )

    cont = ingest_dedup_continuation(spark, doc_server, len(_PAGES), _canon_df(spark))
    want = sorted(tuple(r) for r in cont.collect())
    base = tmp_path / "committed"
    canon_dir, out_dir = str(base / "canon"), str(base / "out")
    _canon_df(spark).write.parquet(canon_dir)
    _accepted_page0(spark).write.mode("append").parquet(canon_dir)
    cont.where("page = 0").write.parquet(out_dir)
    got = sorted(
        tuple(r)
        for r in ingest_dedup_stream(
            spark,
            doc_server,
            len(_PAGES),
            canon_dir,
            out_dir,
            str(base / "ckpt"),
            max_pages_per_batch=10,
        ).collect()
    )
    assert got == want  # exactly one flag row per doc — page 0 not re-flagged


def test_ingest_dedup_stream_id_reuse_matches_continuation(spark, tmp_path):
    """A page re-delivering a SEED doc_id (re-crawl / id reuse) must
    flag dup against its canon twin exactly like the continuation
    loop — the orphan mask may hide only half-committed residue,
    never legitimate canon rows that share the page's doc_ids
    (code-review r10 finding #2)."""
    import http.server
    import json as _json
    import threading

    from mito_spark.streaming.ingest_dedup import (
        ingest_dedup_continuation,
        ingest_dedup_stream,
    )

    pages = [
        [(2, _CANON[2]), (201, _doc_text("u201"))],  # doc_id 2 = seed id AND text
        [(2, _doc_text("u202"))],  # same seed id, NEW text: unique despite id clash
    ]

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            page = int(parse_qs(urlparse(self.path).query).get("page", ["0"])[0])
            docs = pages[page] if page < len(pages) else []
            body = _json.dumps([{"doc_id": i, "text": t} for i, t in docs]).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}/docs?page={{page}}"
    try:
        key = lambda t: (t[0], t[3])  # two rows share doc_id 2 — sort by (id, page)
        want = sorted(
            (
                tuple(r)
                for r in ingest_dedup_continuation(
                    spark, url, len(pages), _canon_df(spark)
                ).collect()
            ),
            key=key,
        )
        # the reused id must be flagged dup of its canon twin
        assert any(r[0] == 2 and r[1] == 2 for r in want)
        base = tmp_path / "idreuse"
        canon_dir = str(base / "canon")
        _canon_df(spark).write.parquet(canon_dir)
        got = sorted(
            (
                tuple(r)
                for r in ingest_dedup_stream(
                    spark,
                    url,
                    len(pages),
                    canon_dir,
                    str(base / "out"),
                    str(base / "ckpt"),
                    max_pages_per_batch=1,
                ).collect()
            ),
            key=key,
        )
        assert got == want
    finally:
        srv.shutdown()


_QF_A = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words
_QF_D = "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"
_QF_PAGES = [
    [(300, _QF_A), (301, _QF_D)],
    [(310, _QF_A + " iota kappa lambda"), (311, _QF_D)],
]


@pytest.fixture()
def qf_server():
    import http.server
    import json
    import threading

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            from urllib.parse import parse_qs, urlparse

            page = int(parse_qs(urlparse(self.path).query).get("page", ["0"])[0])
            docs = _QF_PAGES[page] if page < len(_QF_PAGES) else []
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(
                json.dumps([{"doc_id": i, "text": t} for i, t in docs]).encode()
            )

        def log_message(self, *a):
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/docs?page={{page}}"
    srv.shutdown()


def test_ingest_quality_floor_rejects_stay_out_of_canon(
    spark, qf_server, tmp_path
):
    """The composed ingest with the quality floor (min_words=10):
    doc 300 (8 words) bills low_quality and must NOT enter the canon —
    so doc 310, a near-dup of 300 that passes the floor (11 words,
    J=8/11 vs 300), bills ACCEPTED: the corpus kept nothing it would
    duplicate. Doc 311 duplicates accepted 301 and bills dup. The
    streaming twin must agree byte-for-byte."""
    from mito_spark.streaming.ingest_dedup import (
        ingest_dedup_continuation,
        ingest_dedup_stream,
    )

    empty_canon = spark.createDataFrame([], "doc_id long, text string")
    flags = ingest_dedup_continuation(
        spark, qf_server, len(_QF_PAGES), empty_canon, min_words=10
    ).collect()
    cats = {r.doc_id: r.category for r in flags}
    assert cats == {
        300: "low_quality",
        301: "accepted",
        310: "accepted",  # its only near-dup was REJECTED, not kept
        311: "dup",
    }
    assert {r.doc_id: r.dup_of for r in flags}[311] == 301

    base = tmp_path / "qf"
    canon_dir = str(base / "canon")
    empty_canon.write.parquet(canon_dir)
    got = sorted(
        tuple(r)
        for r in ingest_dedup_stream(
            spark,
            qf_server,
            len(_QF_PAGES),
            canon_dir,
            str(base / "out"),
            str(base / "ckpt"),
            max_pages_per_batch=2,
            min_words=10,
        ).collect()
    )
    assert got == sorted(tuple(r) for r in flags)
