"""Live HTTP fetch transport — the opt-in real-network counterpart of
the default page-store lookup fetch.

Reference behavior reproduced (``crawler/crawler.go:349-482``):

- ``http_get_status``: one GET, body drained, returns
  ``(status, headers)`` (``publiccodeGetStatus``, ``:349-382``). A held
  urllib opener per actor is the ST8 held-client seam.
- ``get_status_with_retry``: the retry loop
  (``publiccodeGetStatusWithRetry``, ``:415-447``) — context checked
  BEFORE the first request (a cancelled context performs 0 requests),
  rate-limit classification and wait via the SHARED M21–M23 parsers in
  ``functions.ratelimit`` (the same kernels the virtual-time simulator
  uses, so live and simulated politeness can't drift), retry budget 6,
  and the Go ``select {ctx.Done(), time.After(wait)}`` mirrored as a
  deadline-bounded sleep.
- ``HttpFetchActor``: a ``map_batches`` actor-pool stage that GETs each
  row's URL and appends ``(html binary, http_status int32)``. Politeness
  is a per-host min-interval enforced inside the actor — safe because
  the crawl's bucketed ``groupby(host)`` partitioning gives each host to
  exactly one task, so the actor is the single place requests for that
  host serialize (the same partition-ownership argument as ST5).

Sandbox note: the environment has no external network; tests drive the
transport against a loopback ``http.server`` reproducing the
reference's ``publiccode_retry_test.go:13-80`` matrix. The engine's
default transport remains the page-store lookup.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request

import numpy as np
import pyarrow as pa

from don_crawler_ray.functions.ratelimit import (
    RATE_LIMIT_MAX_RETRIES,
    is_rate_limited_status,
    rate_limit_wait_from_headers,
)

DEFAULT_TIMEOUT_S = 10.0
USER_AGENT = "don-crawler-ray/1.0"


class FetchCancelled(Exception):
    """Context cancelled (Go ``context.Canceled``). ``status`` is the
    last HTTP status observed, 0 if no request was made."""

    def __init__(self, status: int = 0):
        super().__init__(f"fetch cancelled (last status: {status})")
        self.status = status


class FetchDeadlineExceeded(Exception):
    """Context deadline passed (Go ``context.DeadlineExceeded``)."""

    def __init__(self, status: int = 0):
        super().__init__(f"fetch deadline exceeded (last status: {status})")
        self.status = status


class RateLimitExhausted(Exception):
    """Still rate limited after the full retry budget
    (``"request remained rate limited after %d attempts"``)."""

    def __init__(self, status: int, attempts: int):
        super().__init__(f"request remained rate limited after {attempts} attempts")
        self.status = status
        self.attempts = attempts


class FetchContext:
    """Minimal ``context.Context`` analog: cancellation + deadline.

    ``err()`` returns the exception to raise (``FetchCancelled`` /
    ``FetchDeadlineExceeded``) or ``None``; ``remaining()`` the seconds
    until the deadline (``None`` = no deadline). The clock is injectable
    for deterministic tests."""

    def __init__(self, timeout_s: float | None = None, clock=time.monotonic):
        self._clock = clock
        self._cancelled = False
        self._deadline = None if timeout_s is None else clock() + timeout_s

    def cancel(self) -> None:
        self._cancelled = True

    def remaining(self) -> float | None:
        if self._deadline is None:
            return None
        return self._deadline - self._clock()

    def err(self, status: int = 0) -> Exception | None:
        if self._cancelled:
            return FetchCancelled(status)
        rem = self.remaining()
        if rem is not None and rem <= 0:
            return FetchDeadlineExceeded(status)
        return None


def _build_opener() -> urllib.request.OpenerDirector:
    opener = urllib.request.build_opener()
    opener.addheaders = [("User-Agent", USER_AGENT)]
    return opener


def http_get_status(
    url: str,
    headers: dict[str, str] | None = None,
    timeout: float = DEFAULT_TIMEOUT_S,
    opener: urllib.request.OpenerDirector | None = None,
) -> tuple[int, dict[str, str], bytes]:
    """One GET: ``(status, response_headers, body)``. Blank header names
    / empty values are skipped (``crawler.go:364-370``); HTTP error
    statuses are regular results, not exceptions; transport errors
    (connection refused, DNS) propagate as ``URLError``."""
    req = urllib.request.Request(url, method="GET")
    for k, v in (headers or {}).items():
        if not k.strip() or not v:
            continue
        req.add_header(k, v)
    op = opener or _build_opener()
    try:
        with op.open(req, timeout=timeout) as resp:
            body = resp.read()  # drain (connection reuse, crawler.go:378)
            return resp.status, dict(resp.headers.items()), body
    except urllib.error.HTTPError as e:
        body = e.read()
        return e.code, dict(e.headers.items()), body


def get_with_retry(
    url: str,
    headers: dict[str, str] | None = None,
    ctx: FetchContext | None = None,
    opener: urllib.request.OpenerDirector | None = None,
    sleep=None,
    now_fn=None,
) -> tuple[int, dict[str, str], bytes]:
    """``publiccodeGetStatusWithRetry`` (``crawler/crawler.go:415-447``)
    returning ``(status, headers, body)`` of the final response; raises
    ``FetchCancelled`` (0 requests when cancelled up front) /
    ``FetchDeadlineExceeded`` (carrying the last rate-limited status) /
    ``RateLimitExhausted`` after the budget (6 retries, 7 requests)."""
    # late binding: tests patch time.sleep; a def-time default would
    # capture the original and make the retry waits real
    sleep = sleep if sleep is not None else time.sleep
    now_fn = now_fn if now_fn is not None else time.time
    ctx = ctx or FetchContext()
    attempts = 0
    while True:
        e = ctx.err(0)
        if e is not None:
            raise e
        status, resp_headers, body = http_get_status(url, headers, opener=opener)
        if not is_rate_limited_status(status, resp_headers, now_fn()):
            return status, resp_headers, body
        if attempts >= RATE_LIMIT_MAX_RETRIES:
            raise RateLimitExhausted(status, attempts + 1)
        wait = rate_limit_wait_from_headers(resp_headers, now_fn())
        # select {ctx.Done(); time.After(wait)}: if the deadline lands
        # inside the wait, sleep only to the deadline and surface it
        rem = ctx.remaining()
        if rem is not None and rem <= wait:
            if rem > 0:
                sleep(rem)
            raise FetchDeadlineExceeded(status)
        sleep(wait)
        attempts += 1


def get_status_with_retry(
    url: str,
    headers: dict[str, str] | None = None,
    ctx: FetchContext | None = None,
    opener: urllib.request.OpenerDirector | None = None,
    sleep=None,
    now_fn=None,
) -> int:
    """Status-only parity wrapper (the reference signature)."""
    return get_with_retry(url, headers, ctx, opener, sleep, now_fn)[0]


class HttpFetchActor:
    """Actor-pool live-fetch stage:
    ``ds.map_batches(HttpFetchActor, fn_constructor_kwargs=...,
    concurrency=N, batch_size=B)`` over rows with a ``url_col`` column.

    Appends ``html`` (binary; empty on non-200/failed) and
    ``http_status`` (int32; 0 = transport error). The opener is built
    once per actor (ST8); ``min_interval_s`` enforces a per-host gap
    between requests — correct politeness under the crawl's
    host-bucketed partitioning, where one actor owns all of a host's
    rows. ``timeout_s`` bounds each request AND the per-row retry loop
    (a fresh ``FetchContext`` per row)."""

    def __init__(
        self,
        url_col: str = "canonical_url",
        min_interval_s: float = 0.0,
        timeout_s: float = DEFAULT_TIMEOUT_S,
        request_headers: dict[str, str] | None = None,
    ):
        self.url_col = url_col
        self.min_interval_s = min_interval_s
        self.timeout_s = timeout_s
        self.request_headers = request_headers
        self.opener = _build_opener()
        self._next_ok: dict[str, float] = {}  # host -> monotonic time

    def _polite_wait(self, host: str) -> None:
        if self.min_interval_s <= 0:
            return
        now = time.monotonic()
        nxt = self._next_ok.get(host, 0.0)
        if nxt > now:
            time.sleep(nxt - now)
            now = nxt
        self._next_ok[host] = now + self.min_interval_s

    def __call__(self, batch: pa.Table) -> pa.Table:
        from urllib.parse import urlsplit

        urls = batch.column(self.url_col).to_pylist()
        bodies: list[bytes] = []
        statuses = np.zeros(len(urls), dtype=np.int32)
        for i, url in enumerate(urls):
            self._polite_wait(urlsplit(url).netloc)
            try:
                status, _hdrs, body = http_get_status(
                    url, self.request_headers, timeout=self.timeout_s, opener=self.opener
                )
            except (urllib.error.URLError, OSError):
                bodies.append(b"")
                continue
            statuses[i] = status
            bodies.append(body if status == 200 else b"")
        return batch.append_column("html", pa.array(bodies, pa.binary())).append_column(
            "http_status", pa.array(statuses)
        )
