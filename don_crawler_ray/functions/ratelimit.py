"""Rate-limit header parsing + wait policy — politeness scalar functions.

Semantics ported from the reference:
- ``RateLimitResetFromHeaders`` / ``retryAfterReset``
  (``common/rate_limit_headers.go:19-86``): consider ``RateLimit-Reset``
  and ``X-RateLimit-Reset`` (unix seconds; multiple header values and
  comma-separated lists allowed; the LATEST wins), plus ``Retry-After``
  (positive seconds, or an HTTP-date); candidates more than 24 h in the
  future are ignored; non-positive / over-cap Retry-After seconds are
  ignored.
- ``isRateLimitedStatus`` (``crawler/crawler.go:394-412``): 429 always;
  403 only with a Retry-After header, a parseable reset, or
  ``X-RateLimit-Remaining: 0``.
- ``rateLimitWaitFromHeaders`` (``crawler/crawler.go:375-392``): wait
  until reset, capped at 5 min, falling back to 15 s.

Unlike the reference, these run inside politeness actors with an
explicit ``now`` (no wall-clock in library code) so behavior is
deterministic and testable, and the engine defers/requeues rows instead
of sleeping a worker (SURVEY.md §4).
"""

from __future__ import annotations

from email.utils import parsedate_to_datetime

MAX_RATE_LIMIT_RESET_DELAY_S = 24 * 3600  # common/rate_limit_headers.go:10-14
RATE_LIMIT_FALLBACK_WAIT_S = 15.0  # crawler/crawler.go:28
RATE_LIMIT_MAX_WAIT_S = 300.0  # crawler/crawler.go:29
RATE_LIMIT_MAX_RETRIES = 6  # crawler/crawler.go:27

Headers = dict[str, list[str] | str]


def _values(headers: Headers, key: str) -> list[str]:
    """Case-insensitive multi-value header lookup."""
    out: list[str] = []
    lk = key.lower()
    for k, v in headers.items():
        if k.lower() != lk:
            continue
        if isinstance(v, str):
            out.append(v)
        else:
            out.extend(v)
    return out


def retry_after_reset(raw: str, now: float) -> float | None:
    """Parse one Retry-After value to an absolute unix reset time.

    Mirrors ``retryAfterReset`` (``common/rate_limit_headers.go:66-86``):
    integer seconds must be in (0, 24h]; otherwise try HTTP-date.
    """
    value = raw.strip()
    if not value:
        return None
    try:
        seconds = int(value)
    except ValueError:
        try:
            when = parsedate_to_datetime(value)
        except (TypeError, ValueError):
            return None
        if when is None:
            return None
        return when.timestamp()
    if seconds <= 0 or seconds > MAX_RATE_LIMIT_RESET_DELAY_S:
        return None
    return now + seconds


def rate_limit_reset_from_headers(headers: Headers | None, now: float) -> float | None:
    """Latest acceptable reset moment from supported headers, or None.

    Mirrors ``RateLimitResetFromHeaders``
    (``common/rate_limit_headers.go:19-64``).
    """
    if not headers:
        return None
    max_accepted = now + MAX_RATE_LIMIT_RESET_DELAY_S
    latest: float | None = None

    def consider(candidate: float | None) -> None:
        nonlocal latest
        if candidate is None or candidate > max_accepted:
            return
        if latest is None or candidate > latest:
            latest = candidate

    for key in ("RateLimit-Reset", "X-RateLimit-Reset"):
        for raw in _values(headers, key):
            for value in raw.split(","):
                value = value.strip()
                if not value:
                    continue
                try:
                    consider(float(int(value)))
                except ValueError:
                    continue

    for raw in _values(headers, "Retry-After"):
        consider(retry_after_reset(raw, now))

    return latest


def is_rate_limited_status(status_code: int, headers: Headers | None, now: float) -> bool:
    """Mirror of ``isRateLimitedStatus`` (``crawler/crawler.go:394-412``):
    429 always; 403 with Retry-After, a parseable (within-24h) reset, or
    ``X-RateLimit-Remaining: 0``. ``now`` is explicit for determinism
    (the reference uses ``time.Now()`` inside the reset parser)."""
    if status_code == 429:
        return True
    if status_code != 403 or not headers:
        return False
    vals = _values(headers, "Retry-After")
    if vals and vals[0] != "":
        return True
    if rate_limit_reset_from_headers(headers, now) is not None:
        return True
    remaining = _values(headers, "X-RateLimit-Remaining")
    return bool(remaining) and remaining[0] == "0"


def rate_limit_wait_from_headers(headers: Headers | None, now: float) -> float:
    """Mirror of ``rateLimitWaitFromHeaders`` (``crawler/crawler.go:375-392``):
    seconds to defer before retrying a rate-limited host."""
    if not headers:
        return RATE_LIMIT_FALLBACK_WAIT_S
    reset = rate_limit_reset_from_headers(headers, now)
    if reset is not None:
        wait = reset - now
        if wait > RATE_LIMIT_MAX_WAIT_S:
            return RATE_LIMIT_MAX_WAIT_S
        if wait > 0:
            return wait
    return RATE_LIMIT_FALLBACK_WAIT_S
