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


class TestInstallationTokenProvider:
    """The live exchange (token.go:55-192) against a loopback server:
    request shape, refresh-≤2-min caching, double-checked concurrency,
    and the error contract."""

    @staticmethod
    def _pem():
        from tests.test_jwtauth import KEY, _pem, _pkcs1_der

        return _pem("RSA PRIVATE KEY", _pkcs1_der(KEY))

    @staticmethod
    def _server(script):
        """script: callable(server) -> (status, json_body_bytes)."""
        import http.server
        import threading

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(self):
                srv = self.server
                srv.calls += 1
                srv.paths.append(self.path)
                srv.auths.append(self.headers.get("Authorization", ""))
                srv.accepts.append(self.headers.get("Accept", ""))
                status, body = script(srv)
                self.send_response(status)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):
                pass

        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        srv.calls, srv.paths, srv.auths, srv.accepts = 0, [], [], []
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        return srv, f"http://127.0.0.1:{srv.server_address[1]}"

    def _provider(self, base_url, clock, **kw):
        from don_crawler_ray.state.tokens import InstallationTokenProvider

        return InstallationTokenProvider(
            app_id=7, installation_id=42, private_key_pem=self._pem(),
            base_url=base_url, now_ms=clock.now, **kw,
        )

    def test_exchange_request_shape_and_cache(self):
        import json

        clock = Clock(t0=1_700_000_000_000)

        def script(srv):
            exp = (clock.now() + 3_600_000) // 1000
            import datetime
            iso = datetime.datetime.fromtimestamp(exp, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
            return 201, json.dumps({"token": f"ghs_{srv.calls}", "expires_at": iso}).encode()

        srv, url = self._server(script)
        try:
            p = self._provider(url, clock)
            tok, exp = p.token()
            assert tok == "ghs_1" and exp > clock.now()
            assert srv.paths == ["/app/installations/42/access_tokens"]
            assert srv.auths[0].startswith("Bearer eyJ")  # a signed JWT
            assert srv.accepts[0] == "application/vnd.github+json"
            # cached while > 2 min remain
            assert p.token()[0] == "ghs_1" and srv.calls == 1
            # < 2 min to expiry -> refresh
            clock.t += 3_600_000 - 60_000
            assert p.token()[0] == "ghs_2" and srv.calls == 2
        finally:
            srv.shutdown(); srv.server_close()

    def test_double_checked_refresh_single_post(self):
        import json

        clock = Clock(t0=1_700_000_000_000)

        def script(srv):
            import time as _t
            _t.sleep(0.05)  # widen the race window
            return 200, json.dumps(
                {"token": f"ghs_{srv.calls}", "expires_at": "2100-01-01T00:00:00Z"}
            ).encode()

        srv, url = self._server(script)
        try:
            p = self._provider(url, clock)
            results = []
            threads = [threading.Thread(target=lambda: results.append(p.token()[0])) for _ in range(8)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert srv.calls == 1 and set(results) == {"ghs_1"}
            assert p.fetch_count == 1
        finally:
            srv.shutdown(); srv.server_close()

    def test_error_contract(self):
        import json

        clock = Clock(t0=1_700_000_000_000)
        from don_crawler_ray.state.tokens import TokenExchangeError

        for status, body, match in [
            (500, b"{}", "request failed: 500"),
            (201, b"not-json", "decode failed"),
            (201, json.dumps({"token": ""}).encode(), "missing token"),
            (201, json.dumps({"token": "t", "expires_at": "yesterday"}).encode(), "invalid expires_at"),
        ]:
            srv, url = self._server(lambda srv: (status, body))
            try:
                with pytest.raises(TokenExchangeError, match=match):
                    self._provider(url, clock).token()
            finally:
                srv.shutdown(); srv.server_close()

    def test_from_env(self):
        from don_crawler_ray.state.tokens import InstallationTokenProvider

        with pytest.raises(ValueError, match="must all be set"):
            InstallationTokenProvider.from_env(environ={})
        p = InstallationTokenProvider.from_env(
            environ={
                "GIT_OAUTH_CLIENTID": "7",
                "GIT_OAUTH_INSTALLATION_ID": "42",
                "GIT_OAUTH_SECRET": self._pem(),
            }
        )
        assert p._installation_id == 42
