"""Rate-limit header policy interpreter.

Reference surface (/root/reference/lib/limit.go): ``rate_limit(header,
policy, window)`` interprets HTTP response headers into a limit state
map {rate, next, burst, reset} used to throttle the HTTP source.
Policies: "okta" (X-Rate-Limit-* headers, limit.go:214-258), "draft"
(IETF draft Rate-Limit-* headers incl. quota policies,
limit.go:295-382), and a 6-arg general form naming the three headers
(limit.go:451-512).

This is *driver/connector-side* logic (it gates page fetches in the
continuation loop), so it is plain Python computing the same state map;
``tokens per window`` semantics follow golang.org/x/time/rate as the
reference documents: rate = remaining/window once a window is
anchored, next = rate to apply after reset, burst = remaining.

Implemented from the documented header semantics (Okta developer docs,
IETF draft-ietf-httpapi-ratelimit-headers) — not a translation of the
reference's Go.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from email.utils import parsedate_to_datetime
from typing import Any

INF = float("inf")


@dataclass
class LimitState:
    """{rate, next, burst, reset} map (limit.go:38-85): ``rate`` is the
    sustained tokens/sec until ``reset``, ``next`` the rate after
    reset, ``burst`` the immediately available tokens."""

    rate: float
    next: float
    burst: int
    reset: datetime | None
    headers: str = ""
    error: str | None = None

    def to_map(self) -> dict[str, Any]:
        out: dict[str, Any] = {
            "rate": self.rate,
            "next": self.next,
            "burst": self.burst,
            "headers": self.headers,
        }
        if self.reset is not None:
            out["reset"] = self.reset
        if self.error is not None:
            out["error"] = self.error
        return out


def _first(headers: dict[str, list[str]], key: str) -> str | None:
    for k, v in headers.items():
        if k.lower() == key.lower() and v:
            return v[0]
    return None


def okta_rate_limit(headers: dict[str, list[str]], now: datetime | None = None) -> LimitState:
    """Okta policy: X-Rate-Limit-{Limit,Remaining,Reset(epoch secs)}.
    rate = remaining/(reset-now); zero remaining → rate 0 until reset,
    then limit/window resumes."""
    now = now or datetime.now(timezone.utc)
    limit = _first(headers, "X-Rate-Limit-Limit")
    remaining = _first(headers, "X-Rate-Limit-Remaining")
    reset = _first(headers, "X-Rate-Limit-Reset")
    hdr = f"limit={limit} remaining={remaining} reset={reset}"
    if limit is None or remaining is None or reset is None:
        return LimitState(INF, INF, 0, None, hdr, error="missing X-Rate-Limit headers")
    try:
        lim, rem, rst = float(limit), float(remaining), int(reset)
    except ValueError as e:
        return LimitState(INF, INF, 0, None, hdr, error=f"unparseable rate-limit header: {e}")
    reset_at = datetime.fromtimestamp(rst, tz=timezone.utc)
    window = (reset_at - now).total_seconds()
    if window <= 0:
        window = 1.0
    per_sec = rem / window
    next_per_sec = lim / window if window > 0 else INF
    return LimitState(per_sec, next_per_sec, int(rem), reset_at, hdr)


def _parse_reset(value: str, now: datetime) -> datetime | None:
    """draft Reset: delta-seconds or HTTP-date (limit.go:295-382)."""
    try:
        return now + timedelta(seconds=float(value))
    except ValueError:
        pass
    try:
        return parsedate_to_datetime(value)
    except (TypeError, ValueError):
        return None


def draft_rate_limit(
    headers: dict[str, list[str]], window: float = 60.0, now: datetime | None = None
) -> LimitState:
    """IETF draft policy: Rate-Limit-{Limit,Remaining,Reset}. The Limit
    value may carry quota policies: "12, 12;window=1;burst=1000" — the
    first comma-field is the actual limit; window=N in a matching
    policy overrides the default window."""
    now = now or datetime.now(timezone.utc)
    limit_raw = _first(headers, "Rate-Limit-Limit")
    remaining = _first(headers, "Rate-Limit-Remaining")
    reset_raw = _first(headers, "Rate-Limit-Reset")
    hdr = f"limit={limit_raw} remaining={remaining} reset={reset_raw}"
    if limit_raw is None:
        return LimitState(INF, INF, 0, None, hdr, error="missing Rate-Limit-Limit header")
    parts = [p.strip() for p in limit_raw.split(",")]
    try:
        limit = float(parts[0])
    except ValueError as e:
        return LimitState(INF, INF, 0, None, hdr, error=f"unparseable limit: {e}")
    burst = int(limit)
    win = window
    for policy in parts[1:]:
        fields = [f.strip() for f in policy.split(";")]
        try:
            if fields and float(fields[0]) == limit:
                for fld in fields[1:]:
                    if fld.startswith("window="):
                        win = float(fld.split("=", 1)[1])
                    elif fld.startswith("burst="):
                        burst = int(float(fld.split("=", 1)[1]))
        except ValueError:
            continue
    reset_at = _parse_reset(reset_raw, now) if reset_raw is not None else None
    rem = None
    if remaining is not None:
        try:
            rem = float(remaining)
        except ValueError:
            rem = None
    if rem is not None and reset_at is not None:
        secs = max((reset_at - now).total_seconds(), 1.0)
        return LimitState(rem / secs, limit / win, int(rem), reset_at, hdr)
    return LimitState(limit / win, limit / win, burst, reset_at, hdr)


def general_rate_limit(
    headers: dict[str, list[str]],
    limit_header: str,
    remaining_header: str,
    reset_header: str,
    window: float = 60.0,
    reset_is_epoch: bool = False,
    now: datetime | None = None,
) -> LimitState:
    """6-arg general form (limit.go:451-512): caller names the three
    headers and how to read reset."""
    now = now or datetime.now(timezone.utc)
    mapped = {
        "X-Rate-Limit-Limit": [v] if (v := _first(headers, limit_header)) is not None else [],
        "X-Rate-Limit-Remaining": [v] if (v := _first(headers, remaining_header)) is not None else [],
    }
    reset_val = _first(headers, reset_header)
    if reset_val is not None:
        if not reset_is_epoch:
            # normalize delta-seconds to epoch for the okta-shaped core
            try:
                reset_val = str(int(now.timestamp() + float(reset_val)))
            except ValueError:
                pass
        mapped["X-Rate-Limit-Reset"] = [reset_val]
    return okta_rate_limit({k: v for k, v in mapped.items() if v}, now=now)


POLICIES = {
    "okta": okta_rate_limit,
    "draft": draft_rate_limit,
}


def rate_limit(
    headers: dict[str, list[str]], policy: str, window: float = 60.0, now: datetime | None = None
) -> dict[str, Any]:
    """``rate_limit(header, policy, window)`` (limit.go:38-85) →
    {rate, next, burst, reset[, error]} map. Unknown policy raises —
    matching the registry behavior (mito.go:286-290)."""
    if policy not in POLICIES:
        raise ValueError(f"unknown rate-limit policy {policy!r}; registered: {sorted(POLICIES)}")
    if policy == "draft":
        return draft_rate_limit(headers, window=window, now=now).to_map()
    return okta_rate_limit(headers, now=now).to_map()


class TokenBucket:
    """Client-side limiter the HTTP source waits on before every call
    (reference: rate.Limiter at lib/http.go:290-292). Pure logic —
    callers decide whether to sleep; nothing here blocks executors."""

    def __init__(self, rate: float = INF, burst: int = 1):
        self.rate = rate
        self.burst = burst
        self.tokens = float(burst)
        self.updated: datetime | None = None

    def update_from(self, state: LimitState) -> None:
        self.rate = state.rate
        self.burst = max(state.burst, 1)
        self.tokens = min(self.tokens, float(self.burst))

    def wait_time(self, now: datetime) -> float:
        """Seconds to wait before the next permitted request."""
        if self.updated is not None and self.rate not in (INF, 0):
            self.tokens = min(
                float(self.burst), self.tokens + (now - self.updated).total_seconds() * self.rate
            )
        self.updated = now
        if self.tokens >= 1:
            self.tokens -= 1
            return 0.0
        if self.rate in (0, INF):
            return 0.0 if self.rate == INF else math.inf
        need = 1 - self.tokens
        self.tokens = 0
        return need / self.rate
