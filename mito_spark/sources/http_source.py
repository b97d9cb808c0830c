"""Paginated HTTP as a first-class Spark 4 Python DataSource.

The reference drives paginated HTTP ingestion with its `want_more`
loop: evaluate, keep a cursor in state, re-enter while more pages
remain (/root/reference/mito.go:186-204 with lib/http.go sources).
This module maps that protocol onto Spark's source contracts:

- batch (`spark.read.format("http_paginated")`): when the page count
  is known, pages fan out across executors — one InputPartition per
  page chunk, each task fetching its own range with its own rate
  limiter. The reference's loop is inherently sequential; page-range
  fan-out is the distributed upgrade for page-addressable APIs.
- streaming (`spark.readStream.format("http_paginated")`): the cursor
  IS the source offset — micro-batch N covers pages
  [start_N, end_N), committed offsets go to the checkpoint, recovery
  resumes from the last committed page exactly like the reference
  resumes from carried state. `maxPagesPerBatch` bounds each trigger
  (the flow-control knob the reference implements with client-side
  rate limiting).

Rows are (page, status_code, body); body decoding (JSON/CSV/...)
composes downstream with functions.jsonfns / sources.files — same
separation as the reference's request/response maps + mime transforms.

Options:
  url       — template with a ``{page}`` placeholder (required)
  n_pages   — total pages (required; finite sources. For unbounded
              streams set a large bound and stop the query)
  start_page — first page to read (batch reader only, default 0) —
              lets a continuation loop fetch one page per step
              (start_page=i, n_pages=i+1)
  pages_per_partition — batch fan-out granularity (default 8)
  max_pages_per_batch — streaming trigger bound (default 4)
  max_per_second      — per-task rate limit (default: unlimited)
  rate_limit_policy   — "okta" | "draft": derive the pace from the
              server's rate-limit response headers instead of a static
              client rate (reference: lib/limit.go policies feeding
              limit.Wait before every call, lib/http.go:290-292).
              Selecting a policy switches the stream to a driver-paced
              SimpleDataSourceStreamReader — sequential by design,
              because a per-partition fan-out under a server rate
              limit would just burn the quota in parallel; a 429 or a
              low Remaining header adjusts both the in-batch pacing
              and where the next offset batch stops.
  rate_limit_window   — policy window seconds (default 60)
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.errors import PySparkNotImplementedError
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

SCHEMA = StructType(
    [
        StructField("page", IntegerType()),
        StructField("status_code", IntegerType()),
        StructField("body", StringType()),
    ]
)


class _PageRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


def _fetch_range(url_tmpl: str, start: int, end: int, max_per_second: float | None):
    """Fetch pages [start, end) with per-task pacing; errors become
    status_code=-1 rows (error-as-value, never task failure)."""
    import time
    import urllib.request

    interval = 1.0 / max_per_second if max_per_second else 0.0
    last = 0.0
    for page in range(start, end):
        if interval:
            wait = interval - (time.monotonic() - last)
            if wait > 0:
                time.sleep(wait)
            last = time.monotonic()
        try:
            with urllib.request.urlopen(url_tmpl.format(page=page), timeout=30) as r:
                yield (page, int(r.status), r.read().decode("utf-8", "replace"))
        except Exception as e:  # noqa: BLE001 — error-as-value contract
            yield (page, -1, str(e))


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.url = options["url"]
        self.n_pages = int(options["n_pages"])
        self.start = int(options.get("start_page", 0))
        self.chunk = int(options.get("pages_per_partition", 8))
        self.rate = float(options["max_per_second"]) if "max_per_second" in options else None

    def partitions(self):
        return [
            _PageRange(s, min(s + self.chunk, self.n_pages))
            for s in range(self.start, self.n_pages, self.chunk)
        ]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        yield from _fetch_range(self.url, partition.start, partition.end, self.rate)


class _StreamReader(DataSourceStreamReader):
    """Micro-batch reader: offset = next unread page number."""

    def __init__(self, options: dict):
        self.url = options["url"]
        self.n_pages = int(options["n_pages"])
        self.per_batch = int(options.get("max_pages_per_batch", 4))
        self.rate = float(options["max_per_second"]) if "max_per_second" in options else None
        self._current = 0

    def initialOffset(self) -> dict:
        return {"page": 0}

    def latestOffset(self) -> dict:
        # advance the visible end by at most per_batch pages per trigger
        self._current = min(self._current + self.per_batch, self.n_pages)
        return {"page": self._current}

    def partitions(self, start: dict, end: dict):
        if start["page"] >= end["page"]:
            return []
        return [_PageRange(start["page"], end["page"])]

    def read(self, partition: _PageRange) -> Iterator[tuple]:
        yield from _fetch_range(self.url, partition.start, partition.end, self.rate)

    def commit(self, end: dict) -> None:
        # offsets are checkpointed by the engine; nothing to clean up
        pass

    def stop(self) -> None:
        pass


class _RateLimitedStreamReader(SimpleDataSourceStreamReader):
    """Driver-paced micro-batch reader whose pace is DERIVED FROM THE
    SERVER'S RATE-LIMIT HEADERS — the reference's core flow-control
    story (`limit.Wait(ctx)` before every call, then the policy parses
    the response headers to update the limiter).

    Per trigger, ``read(start)`` walks pages forward and for each one:
    waits out the TokenBucket (populated from the previous response's
    headers via the named policy), issues the request, updates the
    bucket from the new headers. A 429 waits out the derived interval
    and retries in place (bounded); if the bucket says the wait
    exceeds the batch's remaining patience and the batch already holds
    rows, the batch CLOSES EARLY — the un-fetched pages become the
    next offset batch, which is how header feedback reshapes
    subsequent batches rather than just sleeping inside one.
    """

    _MAX_429_RETRIES = 3

    def __init__(self, options: dict):
        from mito_spark.sources.ratelimit import POLICIES, TokenBucket

        self.url = options["url"]
        self.n_pages = int(options["n_pages"])
        self.per_batch = int(options.get("max_pages_per_batch", 4))
        policy = options["rate_limit_policy"]
        if policy not in POLICIES:
            raise ValueError(f"unknown rate_limit_policy {policy!r}; registered: {sorted(POLICIES)}")
        self.policy = POLICIES[policy]
        self.window = float(options.get("rate_limit_window", 60.0))
        self.bucket = TokenBucket()

    def initialOffset(self) -> dict:
        return {"page": 0}

    def _get(self, page: int):
        """(status, body, headers) — HTTP errors (incl. 429) come back
        as values with their headers; transport errors as status -1."""
        import urllib.error
        import urllib.request

        try:
            with urllib.request.urlopen(self.url.format(page=page), timeout=30) as r:
                return int(r.status), r.read().decode("utf-8", "replace"), {
                    k: [v] for k, v in r.getheaders()
                }
        except urllib.error.HTTPError as e:
            return int(e.code), e.read().decode("utf-8", "replace"), {
                k: [v] for k, v in e.headers.items()
            }
        except Exception as e:  # noqa: BLE001 — error-as-value contract
            return -1, str(e), {}

    def _update_bucket(self, headers: dict) -> None:
        if headers:
            try:
                state = self.policy(headers, window=self.window)
            except TypeError:  # okta policy takes no window arg
                state = self.policy(headers)
            if state.error is None:
                self.bucket.update_from(state)

    def read(self, start: dict):
        import math
        import time
        from datetime import datetime, timezone

        page = start["page"]
        rows: list[tuple] = []
        while page < self.n_pages and len(rows) < self.per_batch:
            wait = self.bucket.wait_time(datetime.now(timezone.utc))
            if wait > 0 and rows:
                # quota exhausted mid-batch: close early; the remaining
                # pages are the next offset batch (header feedback
                # reshapes batch boundaries, not just in-batch sleeps).
                # wait_time() zeroed the fractional balance as a
                # reservation for a request we now won't make — restore
                # it so the next trigger isn't over-throttled
                if not math.isinf(wait):
                    self.bucket.tokens = min(
                        float(self.bucket.burst), 1.0 - wait * self.bucket.rate
                    )
                break
            if wait > 0 and not math.isinf(wait):
                time.sleep(wait)
            rows.append(self._fetch_with_retry(page))
            page += 1
        return iter(rows), {"page": page}

    def _fetch_with_retry(self, page: int) -> tuple:
        """One paced fetch with the bounded 429 retry loop — shared by
        read() and checkpoint replay so both return the same rows."""
        import math
        import time
        from datetime import datetime, timezone

        status, body, headers = self._get(page)
        self._update_bucket(headers)
        retries = 0
        while status == 429 and retries < self._MAX_429_RETRIES:
            retry_wait = self.bucket.wait_time(datetime.now(timezone.utc))
            time.sleep(retry_wait if 0 < retry_wait < math.inf else 1.0)
            status, body, headers = self._get(page)
            self._update_bucket(headers)
            retries += 1
        return (page, status, body)

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        # checkpoint replay: refetch of the committed page range, paced
        # by the live bucket WITH the same 429 retry loop as read() —
        # a replay right after restart hits a fresh bucket and a still-
        # hot server, exactly when a 429 is most likely, and a replayed
        # (page, 429) row where the original run recorded 200 would
        # break exactly-once semantics
        import math
        import time
        from datetime import datetime, timezone

        for page in range(start["page"], end["page"]):
            wait = self.bucket.wait_time(datetime.now(timezone.utc))
            if wait > 0 and not math.isinf(wait):
                time.sleep(wait)
            yield self._fetch_with_retry(page)

    def commit(self, end: dict) -> None:
        pass


class HttpPaginatedDataSource(DataSource):
    """``format("http_paginated")`` — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "http_paginated"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _BatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        if "rate_limit_policy" in self.options:
            # fall through to simpleStreamReader(): header-adaptive
            # pacing needs the driver-paced sequential reader
            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
            )
        return _StreamReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return _RateLimitedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(HttpPaginatedDataSource)


def parse_json_pages(pages_df, element_schema):
    """Decode each page body (a JSON array) and explode to one row per
    element — the downstream half of the reference's get→decode_json
    pipelines."""
    from pyspark.sql import functions as F

    arr = F.from_json(F.col("body"), f"array<struct<{element_schema}>>")
    return (
        pages_df.where(F.col("status_code") == 200)
        .select("page", F.explode(arr).alias("item"))
        .select("page", "item.*")
    )
