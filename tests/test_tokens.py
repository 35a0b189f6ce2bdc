"""ST1/ST2 token-cache semantics (internal/githubapp/token.go:116-192,
apiclient/apiclient.go:158-175) under a scripted clock."""

import threading

import pytest

from don_crawler_ray.state.tokens import (
    BearerClient,
    CachedTokenProvider,
    Unauthorized,
)


class Clock:
    def __init__(self, t0=0):
        self.t = t0

    def now(self):
        return self.t


def make_fetcher(clock, ttl_ms=60 * 60 * 1000):
    state = {"n": 0}

    def fetch():
        state["n"] += 1
        return f"tok-{state['n']}", clock.now() + ttl_ms

    return fetch, state


class TestCachedTokenProvider:
    def test_cached_until_threshold(self):
        clock = Clock()
        fetch, state = make_fetcher(clock, ttl_ms=60 * 60 * 1000)
        p = CachedTokenProvider(fetch, now_ms=clock.now)
        assert p.token()[0] == "tok-1"
        # 10 minutes pass: plenty of margin, no refetch
        clock.t += 10 * 60 * 1000
        for _ in range(5):
            assert p.token()[0] == "tok-1"
        assert state["n"] == 1

    def test_refresh_within_two_minutes_of_expiry(self):
        clock = Clock()
        fetch, state = make_fetcher(clock, ttl_ms=60 * 60 * 1000)
        p = CachedTokenProvider(fetch, now_ms=clock.now)
        p.token()
        # 59 minutes in: 1 minute remains < 2-minute threshold -> refresh
        clock.t += 59 * 60 * 1000
        assert p.token()[0] == "tok-2"
        assert state["n"] == 2

    def test_double_checked_lock_single_refresh(self):
        clock = Clock()
        calls = []
        gate = threading.Barrier(8)

        def fetch():
            calls.append(1)
            return "tok", clock.now() + 10**9

        p = CachedTokenProvider(fetch, now_ms=clock.now)

        def worker():
            gate.wait()
            p.token()

        threads = [threading.Thread(target=worker) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(calls) == 1  # 8 concurrent callers, one fetch

    def test_empty_token_is_an_error(self):
        p = CachedTokenProvider(lambda: ("", 10**9), now_ms=lambda: 0)
        with pytest.raises(ValueError, match="empty token"):
            p.token()


class TestBearerClient:
    def test_refresh_and_retry_once_on_401(self):
        clock = Clock()
        fetch, state = make_fetcher(clock)
        client = BearerClient(CachedTokenProvider(fetch, now_ms=clock.now))

        def api(token):
            if token == "tok-1":
                raise Unauthorized()
            return f"ok:{token}"

        assert client.call(api) == "ok:tok-2"
        assert state["n"] == 2

    def test_persistent_401_propagates(self):
        clock = Clock()
        fetch, _ = make_fetcher(clock)
        client = BearerClient(CachedTokenProvider(fetch, now_ms=clock.now))

        def api(_token):
            raise Unauthorized()

        with pytest.raises(Unauthorized):
            client.call(api)

    def test_no_refetch_when_call_succeeds(self):
        clock = Clock()
        fetch, state = make_fetcher(clock)
        client = BearerClient(CachedTokenProvider(fetch, now_ms=clock.now))
        for _ in range(3):
            assert client.call(lambda tok: tok) == "tok-1"
        assert state["n"] == 1
