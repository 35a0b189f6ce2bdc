"""Scripted rate-limit fetch simulation tests (virtual-time politeness)."""

import pyarrow as pa

from don_crawler_ray.functions.ratelimit import (
    RATE_LIMIT_FALLBACK_WAIT_S,
    RATE_LIMIT_MAX_WAIT_S,
)
from don_crawler_ray.stages.ratelimit_sim import (
    STATUS_FETCHED,
    STATUS_RL_FAILED,
    make_fetch_sim_group_fn,
)

NOW = 1_700_000_000.0


def mk_group(host: str, n: int) -> pa.Table:
    return pa.table(
        {
            "canonical_url": pa.array([f"https://{host}/p{i}" for i in range(n)]),
            "host": pa.array([host] * n),
            "rank": pa.array(list(range(n)), pa.int64()),
        }
    )


def test_no_script_all_fetched():
    fn = make_fetch_sim_group_fn({}, NOW)
    out = fn(mk_group("a.example", 5))
    assert out.column("fetch_status").to_pylist() == [STATUS_FETCHED] * 5
    assert out.column("attempts").to_pylist() == [1] * 5
    assert out.column("virtual_wait_ms").to_pylist() == [0] * 5


def test_429_with_retry_after_waits_then_succeeds():
    script = {"a.example": [(1, 429, {"Retry-After": "30"})]}
    fn = make_fetch_sim_group_fn(script, NOW)
    out = fn(mk_group("a.example", 3))
    assert out.column("fetch_status").to_pylist() == [STATUS_FETCHED] * 3
    assert out.column("attempts").to_pylist() == [1, 2, 1]
    assert out.column("virtual_wait_ms").to_pylist() == [0, 30_000, 0]


def test_429_without_headers_uses_fallback():
    script = {"a.example": [(0, 429, {})]}
    out = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 1))
    assert out.column("virtual_wait_ms").to_pylist() == [int(RATE_LIMIT_FALLBACK_WAIT_S * 1000)]


def test_wait_capped_at_five_minutes():
    script = {"a.example": [(0, 429, {"RateLimit-Reset": str(int(NOW + 3600))})]}
    out = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 1))
    assert out.column("virtual_wait_ms").to_pylist() == [int(RATE_LIMIT_MAX_WAIT_S * 1000)]


def test_403_with_remaining_zero_is_rate_limited():
    script = {"a.example": [(0, 403, {"X-RateLimit-Remaining": "0"})]}
    out = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 1))
    assert out.column("attempts").to_pylist() == [2]


def test_plain_403_not_rate_limited():
    script = {"a.example": [(0, 403, {})]}
    out = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 1))
    assert out.column("attempts").to_pylist() == [1]
    assert out.column("virtual_wait_ms").to_pylist() == [0]


def test_exhaustion_after_max_retries():
    # every request of this host is scripted 429 -> retries exhaust
    script = {"a.example": [(i, 429, {"Retry-After": "1"}) for i in range(50)]}
    out = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 1))
    assert out.column("fetch_status").to_pylist() == [STATUS_RL_FAILED]
    assert out.column("attempts").to_pylist()[0] == 7  # 1 + 6 retries

def test_deterministic_across_runs():
    script = {"a.example": [(2, 429, {"Retry-After": "7"}), (5, 429, {})]}
    a = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 8))
    b = make_fetch_sim_group_fn(script, NOW)(mk_group("a.example", 8))
    assert a.equals(b)
