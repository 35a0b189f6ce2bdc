"""Held-client token caches — the ST1/ST2 stateful seams.

The reference keeps two auth tokens alive across calls:

- ST1: a GitHub App installation token cached until ~2 minutes before
  expiry, refreshed under a double-checked lock
  (``internal/githubapp/token.go:55-68, 116-192``);
- ST2: a Keycloak bearer token fetched lazily and refreshed once when a
  call comes back 401 (``apiclient/token.go:64-112``,
  ``apiclient/apiclient.go:158-175``).

The engine reproduces the CACHE semantics with the transport injected:
``fetch`` returns ``(token, expires_at_ms)`` however the deployment
obtains one. The JWT signing / PEM parsing of M24/M25 live in
``functions/jwtauth.py`` — ``jwt_token_source`` builds a ``fetch`` for
this cache from an app id + PEM key, pure Python, no network. Both
classes are designed to be constructed once per extract/fetch actor in
``__init__`` (the ST8 held-client seam, ``stages/fetch.py``), exactly
like scanner construction.
"""

from __future__ import annotations

import threading
import time
from typing import Callable

# refresh when less than this remains before expiry
# (tokenRefreshThreshold, internal/githubapp/token.go)
TOKEN_REFRESH_THRESHOLD_MS = 2 * 60 * 1000


def _wall_ms() -> int:
    return int(time.time() * 1000)


class CachedTokenProvider:
    """ST1 — expiring-token cache with double-checked refresh.

    ``token()`` returns the cached value while more than
    ``refresh_threshold_ms`` remains before expiry; otherwise it
    refreshes under a lock, re-checking after acquiring it so
    concurrent callers trigger exactly one fetch
    (``token.go:116-135`` fast path, ``:137-145`` double check).
    ``now_ms`` is injectable for deterministic tests (virtual time,
    like the politeness simulator)."""

    def __init__(
        self,
        fetch: Callable[[], tuple[str, int]],
        now_ms: Callable[[], int] = _wall_ms,
        refresh_threshold_ms: int = TOKEN_REFRESH_THRESHOLD_MS,
    ):
        self._fetch = fetch
        self._now_ms = now_ms
        self._threshold = refresh_threshold_ms
        self._lock = threading.Lock()
        self._token = ""
        self._expires_at_ms = 0
        self.fetch_count = 0

    def _fresh(self) -> bool:
        return bool(self._token) and (
            self._expires_at_ms - self._now_ms() > self._threshold
        )

    def token(self) -> tuple[str, int]:
        if self._fresh():
            return self._token, self._expires_at_ms
        with self._lock:
            if self._fresh():  # double check: a peer refreshed first
                return self._token, self._expires_at_ms
            tok, exp = self._fetch()
            if not tok:
                raise ValueError("token fetch returned an empty token")
            self._token = tok
            self._expires_at_ms = exp
            self.fetch_count += 1
            return self._token, self._expires_at_ms

    def invalidate(self) -> None:
        with self._lock:
            self._token = ""
            self._expires_at_ms = 0


class Unauthorized(Exception):
    """The 401 signal a transport raises when the bearer is rejected."""


class BearerClient:
    """ST2 — lazy bearer token + one refresh-and-retry on 401.

    ``call(fn)`` invokes ``fn(token)``; if it raises ``Unauthorized``
    the token is invalidated, refetched, and the call retried ONCE
    (``apiclient/apiclient.go:158-175``). A second 401 propagates."""

    def __init__(self, provider: CachedTokenProvider):
        self._provider = provider

    def call(self, fn: Callable[[str], object]):
        tok, _ = self._provider.token()
        try:
            return fn(tok)
        except Unauthorized:
            self._provider.invalidate()
            tok, _ = self._provider.token()
            return fn(tok)
