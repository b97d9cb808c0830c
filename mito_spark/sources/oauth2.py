"""OAuth2 token acquisition for the HTTP source (reference
mito.go:395-506: provider switch over "" (client-credentials /
resource-owner-password), "azure" (tenant-derived token URL + resource
endpoint param), and "google" (service-account JWT-bearer grant via
golang.org/x/oauth2/google with optional domain-wide delegation);
the acquired client decorates every request).

Spark-first shape: the token is fetched ON THE DRIVER at plan-build
time (one tiny POST), then rides into the cluster as a literal
Authorization header on the request maps — executors never hold client
secrets, only the bearer token, and token refresh is a driver-side
re-fetch between micro-batches (the same cadence the reference's
http.Client refreshes under its hood).

Stdlib only; no network I/O unless fetch_token/authorize is called.
"""

from __future__ import annotations

import base64
import hashlib
import json
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any

# endpoints.AzureAD(tenant) in golang.org/x/oauth2 (the reference's
# derivation, mito.go:452) returns the v2.0 endpoint and substitutes
# "common" for an empty tenant.
_AZURE_TOKEN_URL = "https://login.microsoftonline.com/{tenant}/oauth2/v2.0/token"
_JWT_BEARER_GRANT = "urn:ietf:params:oauth:grant-type:jwt-bearer"


@dataclass
class OAuth2Config:
    """Mirrors the reference's YAML config block (mito.go:400-419):
    provider "" does client-credentials by default, with user+password
    switching to the resource-owner-password grant (mito.go:425-444);
    provider "azure" derives the token URL from the tenant and maps
    azure_resource into endpoint_params (mito.go:447-463); provider
    "google" uses the service-account JWT-bearer grant from
    google_jwt_json/google_jwt_file, with google_delegated_account as
    the impersonation subject (mito.go:452-506)."""

    token_url: str = ""
    client_id: str = ""
    client_secret: str = ""
    user: str = ""
    password: str = ""
    scopes: list[str] = field(default_factory=list)
    endpoint_params: dict[str, str] = field(default_factory=dict)
    provider: str = ""
    azure_tenant_id: str = ""
    azure_resource: str = ""
    google_jwt_json: str = ""
    google_jwt_file: str = ""
    google_delegated_account: str = ""
    google_credentials_json: str = ""
    google_credentials_file: str = ""


@dataclass
class Token:
    access_token: str
    token_type: str
    expires_at: float  # epoch seconds; 0 = no expiry reported

    @property
    def expired(self) -> bool:
        return bool(self.expires_at) and time.time() >= self.expires_at - 30


def fetch_token(cfg: OAuth2Config, timeout: float = 30.0) -> Token:
    """One token POST (form-encoded, AuthStyleInParams — the
    auto-detect fallback the reference relies on). Dispatches on
    ``provider`` exactly like the reference's switch (mito.go:424)."""
    provider = cfg.provider.lower()
    if provider == "google":
        return fetch_google_jwt_token(cfg, timeout=timeout)
    if provider == "azure":
        cfg = _azure_normalize(cfg)
    elif provider not in ("",):
        raise ValueError(f"oauth2: unknown provider {cfg.provider!r}")
    if not cfg.token_url:
        # fail here with a named error rather than deep inside urllib
        raise ValueError("oauth2: token_url is required for provider ''")

    form: dict[str, str] = {
        "client_id": cfg.client_id,
        "client_secret": cfg.client_secret,
    }
    if provider == "" and (cfg.user or cfg.password):
        form["grant_type"] = "password"
        form["username"] = cfg.user
        form["password"] = cfg.password
    else:
        form["grant_type"] = "client_credentials"
    if cfg.scopes:
        form["scope"] = " ".join(cfg.scopes)
    form.update(cfg.endpoint_params)
    return _post_token_form(cfg.token_url, form, timeout)


def _azure_normalize(cfg: OAuth2Config) -> OAuth2Config:
    """Azure provider sugar (mito.go:447-463): token URL derived from
    the tenant when unset (endpoints.AzureAD → v2.0 endpoint, empty
    tenant → "common"); azure_resource rides as the ``resource``
    endpoint param. The grant itself is plain client-credentials."""
    token_url = cfg.token_url or _AZURE_TOKEN_URL.format(
        tenant=cfg.azure_tenant_id or "common"
    )
    params = dict(cfg.endpoint_params)
    if cfg.azure_resource:
        params["resource"] = cfg.azure_resource
    out = OAuth2Config(**{**cfg.__dict__, "token_url": token_url, "endpoint_params": params})
    return out


def _post_token_form(token_url: str, form: dict[str, str], timeout: float) -> Token:
    req = urllib.request.Request(
        token_url,
        data=urllib.parse.urlencode(form).encode(),
        headers={"Content-Type": "application/x-www-form-urlencoded"},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        payload = json.loads(resp.read())
    expires = payload.get("expires_in")
    return Token(
        access_token=payload["access_token"],
        token_type=payload.get("token_type", "Bearer"),
        expires_at=time.time() + float(expires) if expires else 0.0,
    )


# --- Google service-account JWT-bearer flow (mito.go:452-506) ---------
# Reference behavior: google.JWTConfigFromJSON(jwt_json, scopes...)
# with Subject = google_delegated_account, i.e. a two-legged flow: the
# client signs a JWT assertion (RS256) with the service account's
# private key and exchanges it at token_uri for an access token.
# Signing is pure stdlib (PEM/DER parse + PKCS#1 v1.5 + modexp): the
# container guarantees no third-party crypto package, and a token POST
# happens on the driver a handful of times per job, so big-int modexp
# performance is irrelevant.


def google_jwt_config(cfg: OAuth2Config) -> dict[str, Any]:
    """Load + validate the service-account JSON exactly like
    google.JWTConfigFromJSON: ``type`` must be service_account, and
    client_email / private_key / token_uri drive the flow."""
    raw = cfg.google_jwt_json
    if not raw and cfg.google_jwt_file:
        with open(cfg.google_jwt_file, encoding="utf-8") as fh:
            raw = fh.read()
    if not raw:
        raise ValueError("oauth2: google provider requires google_jwt_json or google_jwt_file")
    try:
        info = json.loads(raw)
    except json.JSONDecodeError as e:  # mirrors mito.go's json.Valid guard
        raise ValueError(f"invalid google jwt: {raw[:64]}") from e
    if info.get("type") != "service_account":
        raise ValueError(f"oauth2: 'type' field is {info.get('type')!r} (expected 'service_account')")
    for k in ("client_email", "private_key"):
        if not info.get(k):
            raise ValueError(f"oauth2: service account JSON missing {k}")
    info.setdefault("token_uri", "https://oauth2.googleapis.com/token")
    return info


def make_jwt_assertion(
    cfg: OAuth2Config,
    now: float | None = None,
    lifetime: int = 3600,
    info: dict[str, Any] | None = None,
) -> str:
    """Build + sign the RS256 assertion: iss = service-account email,
    scope = joined scopes, aud = token_uri, optional sub for
    domain-wide delegation (googCfg.Subject in the reference). Pass a
    pre-loaded ``info`` to avoid re-reading google_jwt_file on every
    token refresh."""
    if info is None:
        info = google_jwt_config(cfg)
    now = time.time() if now is None else now
    header: dict[str, Any] = {"alg": "RS256", "typ": "JWT"}
    if info.get("private_key_id"):
        header["kid"] = info["private_key_id"]
    claims: dict[str, Any] = {
        "iss": info["client_email"],
        "scope": " ".join(cfg.scopes),
        "aud": info["token_uri"],
        "exp": int(now) + lifetime,
        "iat": int(now),
    }
    if cfg.google_delegated_account:
        claims["sub"] = cfg.google_delegated_account
    signing_input = _b64url(json.dumps(header, separators=(",", ":")).encode()) + b"." + _b64url(
        json.dumps(claims, separators=(",", ":")).encode()
    )
    sig = _rsa_sign_pkcs1_sha256(info["private_key"], signing_input)
    return (signing_input + b"." + _b64url(sig)).decode()


def fetch_google_jwt_token(cfg: OAuth2Config, timeout: float = 30.0) -> Token:
    """Google provider dispatch (mito.go:472-506): the jwt_json/file
    JWT-bearer flow when configured, else credentials_json/file — a
    service_account credential takes the same JWT flow (what
    google.CredentialsFromJSON does under the hood), an
    authorized_user credential exchanges its refresh token."""
    if cfg.google_jwt_json or cfg.google_jwt_file:
        info = google_jwt_config(cfg)
        form = {
            "grant_type": _JWT_BEARER_GRANT,
            "assertion": make_jwt_assertion(cfg, info=info),
        }
        return _post_token_form(cfg.token_url or info["token_uri"], form, timeout)

    raw = cfg.google_credentials_json
    if not raw and cfg.google_credentials_file:
        with open(cfg.google_credentials_file, encoding="utf-8") as fh:
            raw = fh.read()
    if not raw:
        raise ValueError(
            "oauth2: google provider requires google_jwt_json/google_jwt_file "
            "or google_credentials_json/google_credentials_file"
        )
    try:
        info = json.loads(raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"oauth2: error loading credentials: {raw[:64]}") from e
    kind = info.get("type")
    if kind == "service_account":
        jwt_cfg = OAuth2Config(**{**cfg.__dict__, "google_jwt_json": raw})
        form = {
            "grant_type": _JWT_BEARER_GRANT,
            "assertion": make_jwt_assertion(jwt_cfg, info=google_jwt_config(jwt_cfg)),
        }
        return _post_token_form(
            cfg.token_url or info.get("token_uri", "https://oauth2.googleapis.com/token"),
            form,
            timeout,
        )
    if kind == "authorized_user":
        form = {
            "grant_type": "refresh_token",
            "refresh_token": info.get("refresh_token", ""),
            "client_id": info.get("client_id", ""),
            "client_secret": info.get("client_secret", ""),
        }
        return _post_token_form(
            cfg.token_url or "https://oauth2.googleapis.com/token", form, timeout
        )
    raise ValueError(f"oauth2: error loading credentials: unsupported type {kind!r}")


def _b64url(b: bytes) -> bytes:
    return base64.urlsafe_b64encode(b).rstrip(b"=")


# Minimal DER reader — just enough to walk PKCS#8 / PKCS#1 RSA keys.


def _der_tlv(b: bytes, i: int) -> tuple[int, bytes, int]:
    """Returns (tag, value, next_index) for the TLV at offset i.
    Bounds-checked: truncated input raises ValueError, not IndexError
    or a silently-short slice."""
    if i + 2 > len(b):
        raise ValueError("oauth2: malformed DER")
    tag = b[i]
    ln = b[i + 1]
    i += 2
    if ln & 0x80:
        n_bytes = ln & 0x7F
        if n_bytes == 0 or i + n_bytes > len(b):
            raise ValueError("oauth2: malformed DER")
        ln = int.from_bytes(b[i : i + n_bytes], "big")
        i += n_bytes
    if i + ln > len(b):
        raise ValueError("oauth2: malformed DER")
    return tag, b[i : i + ln], i + ln


def _der_seq_ints(body: bytes, count: int) -> list[int]:
    out, i = [], 0
    while len(out) < count and i < len(body):
        tag, val, i = _der_tlv(body, i)
        if tag != 0x02:
            raise ValueError(f"oauth2: expected DER INTEGER, got tag {tag:#x}")
        out.append(int.from_bytes(val, "big"))
    if len(out) < count:
        raise ValueError("oauth2: truncated RSA key")
    return out


def _rsa_key_from_pem(pem: str) -> tuple[int, int, int]:
    """Parse an RSA private key PEM (PKCS#8 'PRIVATE KEY' — what Google
    issues — or PKCS#1 'RSA PRIVATE KEY') to (n, e, d)."""
    lines = [ln.strip() for ln in pem.strip().splitlines()]
    if not lines or "-----BEGIN" not in lines[0]:
        raise ValueError("oauth2: private_key is not PEM")
    if "ENCRYPTED" in lines[0]:
        # would otherwise be misdetected as plain PKCS#8 and fail deep
        # inside the DER walk with a confusing error
        raise ValueError("oauth2: encrypted private keys are not supported")
    pkcs8 = "RSA PRIVATE KEY" not in lines[0]
    der = base64.b64decode("".join(ln for ln in lines if "-----" not in ln))
    if pkcs8:
        # PrivateKeyInfo ::= SEQUENCE { version, algorithm, OCTET STRING key }
        _, outer, _ = _der_tlv(der, 0)
        i = 0
        _, _version, i = _der_tlv(outer, i)
        _, _alg, i = _der_tlv(outer, i)
        tag, der, _ = _der_tlv(outer, i)
        if tag != 0x04:
            raise ValueError("oauth2: malformed PKCS#8 key")
    # RSAPrivateKey ::= SEQUENCE { version, n, e, d, ... }
    _, body, _ = _der_tlv(der, 0)
    _version, n, e, d = _der_seq_ints(body, 4)
    return n, e, d


def _rsa_sign_pkcs1_sha256(pem: str, data: bytes) -> bytes:
    """RSASSA-PKCS1-v1_5 over SHA-256 (RFC 8017 §8.2.1): DigestInfo
    prefix + 0x00 0x01 FF-pad 0x00 framing, then m^d mod n."""
    n, _e, d = _rsa_key_from_pem(pem)
    k = (n.bit_length() + 7) // 8
    digest_info = bytes.fromhex("3031300d060960864801650304020105000420") + hashlib.sha256(data).digest()
    if k < len(digest_info) + 11:
        raise ValueError("oauth2: RSA modulus too small")
    em = b"\x00\x01" + b"\xff" * (k - len(digest_info) - 3) + b"\x00" + digest_info
    return pow(int.from_bytes(em, "big"), d, n).to_bytes(k, "big")


class OAuth2Session:
    """Caches the token, refreshing on expiry — call ``authorize`` to
    stamp a request map (sources.http request dict) with the bearer
    header; pair with ``execute_requests`` for distributed calls."""

    def __init__(self, cfg: OAuth2Config):
        self.cfg = cfg
        self._token: Token | None = None

    def token(self) -> Token:
        if self._token is None or self._token.expired:
            self._token = fetch_token(self.cfg)
        return self._token

    def authorize(self, request: dict[str, Any]) -> dict[str, Any]:
        t = self.token()
        out = dict(request)
        header = {k: list(v) for k, v in (out.get("Header") or {}).items()}
        header["Authorization"] = [f"{t.token_type} {t.access_token}"]
        out["Header"] = header
        return out
