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


class TokenExchangeError(Exception):
    """Installation-token HTTP exchange failed (non-2xx / bad body)."""


class InstallationTokenProvider:
    """ST1 end-to-end: the GitHub App installation-token exchange
    (``internal/githubapp/token.go:55-192``) — ``build_jwt`` (M24/M25,
    ``functions/jwtauth.py``) signs an app JWT, POSTed to
    ``{base_url}/app/installations/{id}/access_tokens`` with the
    reference's headers; the ``(token, expires_at)`` response feeds the
    double-checked ≤2-minute-refresh cache (``CachedTokenProvider``).

    ``base_url`` / ``opener`` / clocks are injectable — tests drive a
    loopback server (the sandbox has no external network); a real
    deployment passes the default GitHub endpoint."""

    GITHUB_API = "https://api.github.com"

    def __init__(
        self,
        app_id: int | str,
        installation_id: int,
        private_key_pem: str,
        base_url: str = GITHUB_API,
        opener=None,
        now_ms: Callable[[], int] = _wall_ms,
        api_version: str = "2022-11-28",
        timeout_s: float = 15.0,  # http.Client{Timeout: 15s}, token.go:106
    ):
        from don_crawler_ray.functions.jwtauth import parse_rsa_private_key

        self._app_id = app_id
        self._installation_id = int(installation_id)
        self._key = parse_rsa_private_key(private_key_pem)
        self._base_url = base_url.rstrip("/")
        self._opener = opener
        self._now_ms = now_ms
        self._api_version = api_version
        self._timeout_s = timeout_s
        self._cache = CachedTokenProvider(self._exchange, now_ms=now_ms)

    @classmethod
    def from_env(cls, environ=None, **kwargs) -> "InstallationTokenProvider":
        """``NewTokenProviderFromEnv`` (``token.go:78-109``): build from
        ``GIT_OAUTH_CLIENTID`` / ``GIT_OAUTH_INSTALLATION_ID`` /
        ``GIT_OAUTH_SECRET``."""
        import os

        env = os.environ if environ is None else environ
        app = env.get("GIT_OAUTH_CLIENTID", "").strip()
        inst = env.get("GIT_OAUTH_INSTALLATION_ID", "").strip()
        secret = env.get("GIT_OAUTH_SECRET", "").strip()
        if not (app and inst and secret):
            raise ValueError(
                "GIT_OAUTH_CLIENTID, GIT_OAUTH_INSTALLATION_ID, and "
                "GIT_OAUTH_SECRET must all be set"
            )
        return cls(int(app), int(inst), secret, **kwargs)

    def _exchange(self) -> tuple[str, int]:
        """One POST /app/installations/{id}/access_tokens
        (``refreshToken``, ``token.go:134-192``). Runs under the
        cache's lock, so concurrent callers cause exactly one POST."""
        import json as _json
        import urllib.error
        import urllib.request
        from datetime import datetime

        from don_crawler_ray.functions.jwtauth import build_jwt

        jwt = build_jwt(self._app_id, self._key, self._now_ms() // 1000)
        req = urllib.request.Request(
            f"{self._base_url}/app/installations/{self._installation_id}/access_tokens",
            method="POST",
        )
        req.add_header("Authorization", f"Bearer {jwt}")
        req.add_header("Accept", "application/vnd.github+json")
        req.add_header("X-GitHub-Api-Version", self._api_version)
        req.add_header("User-Agent", "publiccode-crawler")
        op = self._opener or urllib.request.build_opener()
        try:
            with op.open(req, timeout=self._timeout_s) as resp:
                status, raw = resp.status, resp.read()
        except urllib.error.HTTPError as e:  # non-2xx is a plain result
            status, raw = e.code, e.read()
        if not (200 <= status < 300):
            raise TokenExchangeError(f"github app token request failed: {status}")
        try:
            body = _json.loads(raw)
        except ValueError as e:
            raise TokenExchangeError(f"github app token response decode failed: {e}") from None
        tok = body.get("token", "")
        if not tok:
            raise TokenExchangeError("github app token response missing token")
        try:
            exp = datetime.fromisoformat(str(body.get("expires_at", "")).replace("Z", "+00:00"))
        except ValueError:
            raise TokenExchangeError(
                f"github app token response invalid expires_at: {body.get('expires_at')!r}"
            ) from None
        return tok, int(exp.timestamp() * 1000)

    def token(self) -> tuple[str, int]:
        """Cached installation token + expiry (ms); refreshes when less
        than 2 minutes remain, double-checked under the cache lock."""
        return self._cache.token()

    @property
    def fetch_count(self) -> int:
        return self._cache.fetch_count


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
