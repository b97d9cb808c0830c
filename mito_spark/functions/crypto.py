"""Hash / encoding scalar functions (reference:
/root/reference/lib/crypto.go, doc :38-168).

The reference returns raw *bytes* from md5/sha1/sha256 and lower-case
hex from ``hex``; Spark's built-ins return hex strings (md5/sha1/sha2)
and upper-case hex (``hex``). Builders below normalize to the
reference's conventions. hmac has no Catalyst built-in → Arrow-batched
pandas UDF (the one justified Python hop in this module).
"""

from __future__ import annotations

import hmac as _hmac
import hashlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def base64(x) -> Column:
    """Standard padded base64 of string/bytes (crypto.go:524)."""
    return F.base64(_c(x))


def base64_decode(x) -> Column:
    return F.unbase64(_c(x))


def base64_raw(x) -> Column:
    """Unpadded base64 (crypto.go:548)."""
    return F.rtrim(F.base64(_c(x)), F.lit("="))


def base64_raw_decode(x) -> Column:
    """Re-pad to a multiple of 4 then decode (crypto.go:559)."""
    x = _c(x)
    pad = (4 - F.length(x) % 4) % 4
    return F.unbase64(F.concat(x, F.repeat(F.lit("="), pad.cast("int"))))


def hex_lower(x) -> Column:
    """Lower-case hex to match Go's encoding/hex (crypto.go:572)."""
    return F.lower(F.hex(_c(x)))


def md5_bytes(x) -> Column:
    """md5 → 16 raw bytes (crypto.go:583). unhex(md5(x)) keeps it all
    JVM-side."""
    return F.unhex(F.md5(_c(x)))


def md5_hex(x) -> Column:
    return F.md5(_c(x))


def sha1_bytes(x) -> Column:
    return F.unhex(F.sha1(_c(x)))


def sha1_hex(x) -> Column:
    return F.sha1(_c(x))


def sha256_bytes(x) -> Column:
    return F.unhex(F.sha2(_c(x), 256))


def sha256_hex(x) -> Column:
    return F.sha2(_c(x), 256)


def _make_hmac_udf(algo: str, key: bytes):
    @pandas_udf(BinaryType())
    def _hmac_udf(s: pd.Series) -> pd.Series:
        digestmod = hashlib.sha1 if algo == "sha1" else hashlib.sha256
        return s.map(
            lambda v: None
            if v is None
            else _hmac.new(key, v if isinstance(v, bytes) else str(v).encode(), digestmod).digest()
        )

    return _hmac_udf


def hmac_bytes(x, algo: str, key: bytes) -> Column:
    """hmac(hash, key) → raw mac bytes (crypto.go:628-660). No Spark
    built-in → pandas UDF, Arrow-batched; key is closed over (tiny,
    ships in the serialized task, no broadcast needed)."""
    if algo not in ("sha1", "sha256"):
        raise ValueError(f"unsupported hmac hash {algo!r}")
    return _make_hmac_udf(algo, key)(_c(x))


def uuid4() -> Column:
    """Random v4 uuid (crypto.go:662-668) → built-in nondeterministic
    uuid(); excluded from golden comparisons like the reference's own
    tests (testdata/uuid.txt checks shape only)."""
    return F.uuid()
