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


class _RateLimitedHandler(http.server.BaseHTTPRequestHandler):
    """Emits IETF-draft rate-limit headers at RATE req/s and records
    each request's arrival time; over-budget requests get a 429."""

    RATE = 4.0
    lock = threading.Lock()
    request_times: list[float] = []
    force_429_pages: set[int] = set()
    served_429: list[int] = []

    def do_GET(self):
        import time
        from urllib.parse import parse_qs, urlparse

        q = parse_qs(urlparse(self.path).query)
        page = int(q.get("page", ["0"])[0])
        now = time.monotonic()
        cls = type(self)
        with cls.lock:
            cls.request_times.append(now)
            recent = [t for t in cls.request_times if now - t < 1.0]
            over = len(recent) > cls.RATE
            force = page in cls.force_429_pages
            if force:
                cls.force_429_pages.discard(page)
                cls.served_429.append(page)
        status = 429 if (over or force) else 200
        body = b"[]" if status == 429 else json.dumps([{"page": page}]).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        # draft policy: limit RATE per 1-second window
        self.send_header("Rate-Limit-Limit", f"{int(self.RATE)}, {int(self.RATE)};window=1")
        self.send_header("Rate-Limit-Remaining", str(max(int(self.RATE) - len(recent), 0)))
        self.send_header("Rate-Limit-Reset", "1")
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture()
def ratelimited_server():
    _RateLimitedHandler.request_times = []
    _RateLimitedHandler.force_429_pages = set()
    _RateLimitedHandler.served_429 = []
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _RateLimitedHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/data?page={{page}}"
    srv.shutdown()


def _run_ratelimited_stream(spark, url, tmp_path, n_pages, per_batch=3, timeout=90):
    from mito_spark.sources.http_source import register

    register(spark)
    stream = (
        spark.readStream.format("http_paginated")
        .option("url", url)
        .option("n_pages", n_pages)
        .option("max_pages_per_batch", per_batch)
        .option("rate_limit_policy", "draft")
        .option("rate_limit_window", "1")
        .load()
    )
    batches: list[list] = []
    q = (
        stream.writeStream.foreachBatch(lambda df, i: batches.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="200 milliseconds")
        .start()
    )
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        if sum(len(b) for b in batches) >= n_pages:
            break
        time.sleep(0.3)
    q.stop()
    return batches


def test_stream_paces_to_server_draft_headers(spark, ratelimited_server, tmp_path):
    """The source's request timestamps must respect the rate the
    server's draft headers advertise (reference: limit.Wait before
    every call, policy-updated from each response)."""
    n_pages = 12
    batches = _run_ratelimited_stream(spark, ratelimited_server, tmp_path, n_pages)
    pages = sorted(r.page for b in batches for r in b)
    assert pages == list(range(n_pages))
    assert all(r.status_code == 200 for b in batches for r in b)
    times = sorted(_RateLimitedHandler.request_times)
    assert len(times) >= n_pages
    # sustained rate over the whole run must respect ~RATE req/s
    # (burst allowance covers the first window)
    span = times[-1] - times[0]
    rate = (len(times) - int(_RateLimitedHandler.RATE)) / max(span, 1e-9)
    assert rate <= _RateLimitedHandler.RATE * 1.25, f"paced at {rate:.1f} req/s"
    # and in no sliding 1s window did we exceed the advertised budget
    # by more than 1 (boundary jitter)
    for i, t0 in enumerate(times):
        in_window = sum(1 for t in times[i:] if t - t0 < 1.0)
        assert in_window <= int(_RateLimitedHandler.RATE) + 1


def test_stream_retries_429_and_completes(spark, ratelimited_server, tmp_path):
    """A 429 response is retried after the derived wait and every page
    still arrives exactly once with a 200."""
    _RateLimitedHandler.force_429_pages = {2, 5}
    n_pages = 8
    batches = _run_ratelimited_stream(spark, ratelimited_server, tmp_path, n_pages)
    rows = [r for b in batches for r in b]
    assert sorted(r.page for r in rows) == list(range(n_pages))
    assert all(r.status_code == 200 for r in rows)
    assert sorted(_RateLimitedHandler.served_429) == [2, 5]  # both hit the limiter once
