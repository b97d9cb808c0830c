"""HTTP source: request/response maps, auth, and batched execution.

Reference surface (/root/reference/lib/http.go):
  get_request/post_request/request(method, url[, body]) build a
  request *as a map* without executing (http.go:73-168);
  do_request executes a request map → response map (http.go:826-854);
  get/head/post are the fused build+execute forms (http.go:519-635);
  basic_authentication adds the Authorization header to a request map
  (http.go:783-824); every call waits on a client-side rate limiter
  (http.go:290-292).

Spark-first mapping: request specs are rows (a DataFrame of request
structs), execution is ``execute_requests`` — an Arrow-batched
mapInPandas over the request table, so a million API calls fan out
across executors with per-task rate limiting; responses come back as
typed rows (REQUEST_SCHEMA/RESPONSE_SCHEMA mirror the reference's
reqToMap/respToMap field sets, http.go:714-781). Single-cursor
paginated ingestion composes this with the continuation driver
(mito_spark.streaming.continuation) where the loop is inherently
sequential but each page's processing is distributed.

Uses only the Python stdlib (urllib); no network calls happen unless
``execute_requests``/``do_request`` is invoked explicitly.
"""

from __future__ import annotations

import base64
import urllib.error
import urllib.parse
import urllib.request
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    MapType,
    ArrayType,
    StringType,
    StructField,
    StructType,
)

HEADER_TYPE = MapType(StringType(), ArrayType(StringType()))

REQUEST_SCHEMA = StructType(
    [
        StructField("Method", StringType()),
        StructField("URL", StringType()),
        StructField("Header", HEADER_TYPE),
        StructField("ContentLength", LongType()),
        StructField("Host", StringType()),
        StructField("Body", BinaryType()),
    ]
)

RESPONSE_SCHEMA = StructType(
    [
        StructField("Status", StringType()),
        StructField("StatusCode", IntegerType()),
        StructField("Proto", StringType()),
        StructField("Header", HEADER_TYPE),
        StructField("ContentLength", LongType()),
        StructField("Body", BinaryType()),
        StructField("Error", StringType()),
    ]
)


def new_request(method: str, url: str, body: bytes | str | None = None,
                content_type: str | None = None) -> dict[str, Any]:
    """``request(method, url[, body])`` (http.go:108-168) → request
    map. Pure construction, no I/O."""
    data = body.encode() if isinstance(body, str) else body
    header: dict[str, list[str]] = {}
    if content_type:
        header["Content-Type"] = [content_type]
    parsed = urllib.parse.urlparse(url)
    return {
        "Method": method.upper(),
        "URL": url,
        "Header": header,
        "ContentLength": len(data) if data else 0,
        "Host": parsed.netloc,
        "Body": data,
    }


def get_request(url: str) -> dict[str, Any]:
    return new_request("GET", url)


def post_request(url: str, content_type: str, body: bytes | str) -> dict[str, Any]:
    return new_request("POST", url, body, content_type)


def basic_authentication(request: dict[str, Any], user: str, password: str) -> dict[str, Any]:
    """Adds the Authorization header directly (no 401 round-trip — the
    optimization the reference documents at http.go:804-808)."""
    token = base64.b64encode(f"{user}:{password}".encode()).decode()
    out = dict(request)
    header = {k: list(v) for k, v in (out.get("Header") or {}).items()}
    header["Authorization"] = [f"Basic {token}"]
    out["Header"] = header
    return out


def do_request(
    request: dict[str, Any],
    timeout: float = 30.0,
    insecure: bool = False,
    ca_file: str | None = None,
) -> dict[str, Any]:
    """``do_request()`` (http.go:826-854): execute one request map →
    response map. Errors are values (Error field), never exceptions —
    the error-as-value convention.

    TLS (the reference's ``serve_tls`` scenario + ``-insecure`` CLI
    flag, mito.go): HTTPS URLs verify against the system trust store
    by default, so a self-signed server yields an Error value (the
    x509 unknown-authority case the scenario asserts); ``insecure``
    skips verification, ``ca_file`` pins a CA bundle instead —
    verified trust without touching the system store."""
    import ssl

    ctx: ssl.SSLContext | None = None
    if insecure:
        ctx = ssl.create_default_context()
        ctx.check_hostname = False
        ctx.verify_mode = ssl.CERT_NONE
    elif ca_file is not None:
        ctx = ssl.create_default_context(cafile=ca_file)
    req = urllib.request.Request(
        request["URL"],
        data=request.get("Body"),
        method=request.get("Method", "GET"),
    )
    for k, vs in (request.get("Header") or {}).items():
        for v in vs:
            req.add_header(k, v)
    try:
        with urllib.request.urlopen(req, timeout=timeout, context=ctx) as resp:
            body = resp.read()
            headers: dict[str, list[str]] = {}
            for k, v in resp.headers.items():
                headers.setdefault(k, []).append(v)
            return {
                "Status": f"{resp.status} {resp.reason}",
                "StatusCode": resp.status,
                "Proto": "HTTP/1.1",
                "Header": headers,
                "ContentLength": len(body),
                "Body": body,
                "Error": None,
            }
    except urllib.error.HTTPError as e:
        body = e.read()
        return {
            "Status": f"{e.code} {e.reason}",
            "StatusCode": e.code,
            "Proto": "HTTP/1.1",
            "Header": {k: [v] for k, v in (e.headers or {}).items()},
            "ContentLength": len(body),
            "Body": body,
            "Error": None,
        }
    except Exception as e:  # URLError, timeout, ...
        return {
            "Status": None,
            "StatusCode": None,
            "Proto": None,
            "Header": None,
            "ContentLength": None,
            "Body": None,
            "Error": str(e),
        }


def execute_requests(requests_df: DataFrame, timeout: float = 30.0,
                     max_per_second: float | None = None) -> DataFrame:
    """Distributed request execution: DataFrame of REQUEST_SCHEMA rows
    → DataFrame of RESPONSE_SCHEMA rows via Arrow-batched mapInPandas.

    Scale posture: requests partition across executors; per-task
    pacing via ``max_per_second`` (divided by the partition count
    upstream, caller's choice) implements the reference's client-side
    limiter at the right grain — a global limiter would serialize the
    cluster. HTTP errors become Error-field rows, never task failures.
    """
    import time as _time

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        interval = 1.0 / max_per_second if max_per_second else 0.0
        last = 0.0
        for pdf in batches:
            out: list[dict[str, Any]] = []
            for _, row in pdf.iterrows():
                if interval:
                    now = _time.monotonic()
                    wait = interval - (now - last)
                    if wait > 0:
                        _time.sleep(wait)
                    last = _time.monotonic()
                req = {
                    "Method": row["Method"],
                    "URL": row["URL"],
                    "Header": row["Header"],
                    "Body": None if row["Body"] is None else bytes(row["Body"]),
                }
                out.append(do_request(req, timeout=timeout))
            yield pd.DataFrame(out)

    return requests_df.mapInPandas(_run, RESPONSE_SCHEMA)
