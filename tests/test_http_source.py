"""Paginated-HTTP DataSource: batch fan-out and streaming offsets
against a local in-process server (same hermetic-server pattern as the
reference's testscript `serve` command, mito_test.go:78-117)."""

from __future__ import annotations

import http.server
import json
import threading

import pytest

N_PAGES = 10
ROWS_PER_PAGE = 5


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        # /data?page=N → JSON array of ROWS_PER_PAGE items
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        page = int(q.get("page", ["0"])[0])
        if page >= N_PAGES:
            body = b"[]"
        else:
            body = json.dumps(
                [
                    {"id": page * ROWS_PER_PAGE + i, "val": f"p{page}r{i}"}
                    for i in range(ROWS_PER_PAGE)
                ]
            ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/data?page={{page}}"
    srv.shutdown()


def test_batch_fanout_reads_all_pages(spark, server):
    from mito_spark.sources.http_source import parse_json_pages, register

    register(spark)
    pages = (
        spark.read.format("http_paginated")
        .option("url", server)
        .option("n_pages", N_PAGES)
        .option("pages_per_partition", 3)  # 4 parallel partitions
        .load()
    )
    assert pages.rdd.getNumPartitions() == 4
    rows = parse_json_pages(pages, "id bigint, val string").collect()
    assert len(rows) == N_PAGES * ROWS_PER_PAGE
    assert {r.id for r in rows} == set(range(N_PAGES * ROWS_PER_PAGE))


def test_streaming_offsets_paginate(spark, server, tmp_path):
    from mito_spark.sources.http_source import register

    register(spark)
    stream = (
        spark.readStream.format("http_paginated")
        .option("url", server)
        .option("n_pages", N_PAGES)
        .option("max_pages_per_batch", 3)
        .load()
    )
    batches: list[tuple[int, list]] = []
    q = (
        stream.writeStream.foreachBatch(
            lambda df, i: batches.append((i, df.collect()))
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        if sum(len(b) for _, b in batches) >= N_PAGES:
            break
        time.sleep(0.5)
    q.stop()
    pages_seen = sorted(r.page for _, b in batches for r in b)
    assert pages_seen == list(range(N_PAGES))  # every page exactly once
    # micro-batches bounded by max_pages_per_batch — the flow-control knob
    assert all(len(b) <= 3 for _, b in batches)
