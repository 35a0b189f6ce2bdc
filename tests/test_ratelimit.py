"""Politeness scalar-function tests — the Go test matrix ported.

Source matrix: ``common/rate_limit_headers_test.go:10-164`` plus the
status classifier (``crawler/crawler.go:394-412``) and wait policy
(``crawler/crawler.go:375-392``). ``now`` is explicit here, so no
clock-skew tolerances are needed.
"""

from email.utils import formatdate

from don_crawler_ray.functions.ratelimit import (
    MAX_RATE_LIMIT_RESET_DELAY_S,
    RATE_LIMIT_FALLBACK_WAIT_S,
    RATE_LIMIT_MAX_WAIT_S,
    is_rate_limited_status,
    rate_limit_reset_from_headers,
    rate_limit_wait_from_headers,
)

NOW = 1699999000.0


class TestRateLimitResetFromHeaders:
    def test_rate_limit_reset(self):
        assert rate_limit_reset_from_headers({"RateLimit-Reset": "1700000000"}, NOW) == 1700000000

    def test_x_rate_limit_reset(self):
        assert rate_limit_reset_from_headers({"X-RateLimit-Reset": "1700000123"}, NOW) == 1700000123

    def test_multiple_values_uses_latest(self):
        h = {"RateLimit-Reset": ["1700000000", "1700000100"]}
        assert rate_limit_reset_from_headers(h, NOW) == 1700000100

    def test_comma_separated_uses_latest(self):
        h = {"RateLimit-Reset": "1700000000, 1700000200"}
        assert rate_limit_reset_from_headers(h, NOW) == 1700000200

    def test_retry_after_seconds(self):
        assert rate_limit_reset_from_headers({"Retry-After": "3"}, NOW) == NOW + 3

    def test_retry_after_multiple_uses_latest(self):
        assert rate_limit_reset_from_headers({"Retry-After": ["1", "3"]}, NOW) == NOW + 3

    def test_retry_after_http_date(self):
        when = 1700001234
        h = {"Retry-After": formatdate(when, usegmt=True)}
        assert rate_limit_reset_from_headers(h, NOW) == when

    def test_retry_after_negative_ignored(self):
        assert rate_limit_reset_from_headers({"Retry-After": "-1"}, NOW) is None

    def test_retry_after_zero_ignored(self):
        assert rate_limit_reset_from_headers({"Retry-After": "0"}, NOW) is None

    def test_retry_after_too_large_ignored(self):
        huge = str(MAX_RATE_LIMIT_RESET_DELAY_S + 1)
        assert rate_limit_reset_from_headers({"Retry-After": huge}, NOW) is None

    def test_retry_after_far_future_date_ignored(self):
        when = NOW + MAX_RATE_LIMIT_RESET_DELAY_S + 3600
        h = {"Retry-After": formatdate(when, usegmt=True)}
        assert rate_limit_reset_from_headers(h, NOW) is None

    def test_reset_far_future_ignored(self):
        far = str(int(NOW + MAX_RATE_LIMIT_RESET_DELAY_S + 10))
        assert rate_limit_reset_from_headers({"RateLimit-Reset": far}, NOW) is None

    def test_invalid_values(self):
        h = {
            "RateLimit-Reset": "not-a-number",
            "X-RateLimit-Reset": "still-not-a-number",
            "Retry-After": "not-a-date",
        }
        assert rate_limit_reset_from_headers(h, NOW) is None

    def test_none_and_empty(self):
        assert rate_limit_reset_from_headers(None, NOW) is None
        assert rate_limit_reset_from_headers({}, NOW) is None

    def test_case_insensitive_keys(self):
        assert rate_limit_reset_from_headers({"x-ratelimit-reset": "1700000001"}, NOW) == 1700000001


class TestIsRateLimitedStatus:
    def test_429_always(self):
        assert is_rate_limited_status(429, None, NOW)
        assert is_rate_limited_status(429, {}, NOW)

    def test_403_with_retry_after(self):
        assert is_rate_limited_status(403, {"Retry-After": "5"}, NOW)

    def test_403_with_reset(self):
        assert is_rate_limited_status(403, {"X-RateLimit-Reset": str(int(NOW + 60))}, NOW)

    def test_403_with_remaining_zero(self):
        assert is_rate_limited_status(403, {"X-RateLimit-Remaining": "0"}, NOW)

    def test_403_plain_not_limited(self):
        assert not is_rate_limited_status(403, {}, NOW)
        assert not is_rate_limited_status(403, {"X-RateLimit-Remaining": "7"}, NOW)

    def test_other_statuses(self):
        assert not is_rate_limited_status(200, {"Retry-After": "5"}, NOW)
        assert not is_rate_limited_status(404, None, NOW)
        assert not is_rate_limited_status(500, None, NOW)


class TestWaitFromHeaders:
    def test_no_headers_fallback(self):
        assert rate_limit_wait_from_headers(None, NOW) == RATE_LIMIT_FALLBACK_WAIT_S

    def test_reset_in_window(self):
        h = {"RateLimit-Reset": str(int(NOW + 42))}
        assert rate_limit_wait_from_headers(h, NOW) == 42

    def test_capped_at_max(self):
        h = {"RateLimit-Reset": str(int(NOW + 3600))}
        assert rate_limit_wait_from_headers(h, NOW) == RATE_LIMIT_MAX_WAIT_S

    def test_past_reset_fallback(self):
        h = {"RateLimit-Reset": str(int(NOW - 10))}
        assert rate_limit_wait_from_headers(h, NOW) == RATE_LIMIT_FALLBACK_WAIT_S
