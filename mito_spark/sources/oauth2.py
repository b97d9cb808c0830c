"""OAuth2 token acquisition for the HTTP source (reference
mito.go:395-506: client-credentials / resource-owner-password flows
configured outside expressions; the acquired client decorates every
request).

Spark-first shape: the token is fetched ON THE DRIVER at plan-build
time (one tiny POST), then rides into the cluster as a literal
Authorization header on the request maps — executors never hold client
secrets, only the bearer token, and token refresh is a driver-side
re-fetch between micro-batches (the same cadence the reference's
http.Client refreshes under its hood).

Stdlib only; no network I/O unless fetch_token/authorize is called.
"""

from __future__ import annotations

import json
import time
import urllib.parse
import urllib.request
from dataclasses import dataclass, field
from typing import Any


@dataclass
class OAuth2Config:
    """Mirrors the reference's YAML config block (mito.go:388-419
    subset): client-credentials by default; user+password switches to
    the resource-owner-password grant, exactly like the reference's
    provider "" path (mito.go:425-444)."""

    token_url: str
    client_id: str
    client_secret: str = ""
    user: str = ""
    password: str = ""
    scopes: list[str] = field(default_factory=list)
    endpoint_params: dict[str, str] = field(default_factory=dict)


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
    auto-detect fallback the reference relies on)."""
    form: dict[str, str] = {
        "client_id": cfg.client_id,
        "client_secret": cfg.client_secret,
    }
    if cfg.user or cfg.password:
        form["grant_type"] = "password"
        form["username"] = cfg.user
        form["password"] = cfg.password
    else:
        form["grant_type"] = "client_credentials"
    if cfg.scopes:
        form["scope"] = " ".join(cfg.scopes)
    form.update(cfg.endpoint_params)
    req = urllib.request.Request(
        cfg.token_url,
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
