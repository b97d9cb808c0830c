"""URL parse/format functions (reference lib/http.go:211-275).

parse_url → a struct mirroring Go's url.URL fields; format_url is its
inverse; parse_query/format_query handle `k=v&k2=v2` maps with
multi-valued keys. All built on Spark's parse_url/url_encode/url_decode
built-ins plus array/map expressions — JVM-side, no UDFs.

Field-name parity: Scheme, User{Username,Password,PasswordSet}, Host,
Path, RawQuery, Fragment (the Go url.URL subset that survives a
round-trip; Opaque/RawPath/ForceQuery exist in Go for edge encodings
we normalize away, as format_url does in the reference golden).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def parse_url_struct(url) -> Column:
    """``s.parse_url()`` → struct(Scheme, User, Host, Path, RawQuery,
    Fragment). User is null when the URL carries no userinfo."""
    u = _c(url)
    userinfo = F.parse_url(u, F.lit("USERINFO"))
    username = F.url_decode(F.split_part(userinfo, F.lit(":"), F.lit(1)))
    has_pass = F.contains(userinfo, F.lit(":"))
    password = F.when(has_pass, F.url_decode(F.split_part(userinfo, F.lit(":"), F.lit(2))))
    user = F.when(
        userinfo.isNotNull(),
        F.struct(
            username.alias("Username"),
            password.alias("Password"),
            has_pass.alias("PasswordSet"),
        ),
    )
    return F.struct(
        F.parse_url(u, F.lit("PROTOCOL")).alias("Scheme"),
        user.alias("User"),
        F.parse_url(u, F.lit("HOST")).alias("Host"),
        F.coalesce(F.parse_url(u, F.lit("PATH")), F.lit("")).alias("Path"),
        F.coalesce(F.parse_url(u, F.lit("QUERY")), F.lit("")).alias("RawQuery"),
        F.coalesce(F.parse_url(u, F.lit("REF")), F.lit("")).alias("Fragment"),
    )


def format_url_struct(u) -> Column:
    """``m.format_url()`` — inverse of parse_url_struct. Userinfo is
    re-escaped; Password only rendered when PasswordSet (the golden
    semantics exercised in the reference's url.txt)."""
    u = _c(u)
    userinfo = F.when(
        u["User"].isNotNull(),
        F.concat(
            F.url_encode(u["User"]["Username"]),
            F.when(
                u["User"]["PasswordSet"],
                F.concat(F.lit(":"), F.url_encode(F.coalesce(u["User"]["Password"], F.lit("")))),
            ).otherwise(F.lit("")),
            F.lit("@"),
        ),
    ).otherwise(F.lit(""))
    return F.concat(
        u["Scheme"],
        F.lit("://"),
        userinfo,
        u["Host"],
        u["Path"],
        F.when(u["RawQuery"] != "", F.concat(F.lit("?"), u["RawQuery"])).otherwise(F.lit("")),
        F.when(u["Fragment"] != "", F.concat(F.lit("#"), u["Fragment"])).otherwise(F.lit("")),
    )


def parse_query_map(q) -> Column:
    """``s.parse_query()`` → map<string, array<string>> preserving
    multi-valued keys and first-seen order of values per key."""
    q = _c(q)
    pairs = F.transform(
        F.filter(F.split(q, "&", -1), lambda p: p != F.lit("")),
        lambda p: F.struct(
            F.url_decode(F.split_part(p, F.lit("="), F.lit(1))).alias("k"),
            F.url_decode(
                F.when(F.contains(p, F.lit("=")), F.split_part(p, F.lit("="), F.lit(2))).otherwise(F.lit(""))
            ).alias("v"),
        ),
    )
    keys = F.array_distinct(F.transform(pairs, lambda p: p["k"]))
    return F.map_from_arrays(
        keys,
        F.transform(
            keys,
            lambda k: F.transform(F.filter(pairs, lambda p: p["k"] == k), lambda p: p["v"]),
        ),
    )


def format_query_map(m) -> Column:
    """``m.format_query()`` — keys sorted (Go url.Values.Encode
    contract), values url-escaped."""
    m = _c(m)
    ks = F.array_sort(F.map_keys(m))
    return F.array_join(
        F.transform(
            ks,
            lambda k: F.array_join(
                F.transform(
                    F.element_at(m, k), lambda v: F.concat(F.url_encode(k), F.lit("="), F.url_encode(v))
                ),
                "&",
            ),
        ),
        "&",
    )
