"""Live HTTP transport tests — the reference's retry matrix
(``crawler/publiccode_retry_test.go:13-80``) reproduced against a
loopback ``http.server``, plus the actor-pool fetch stage and the
``--transport http`` single-URL path."""

from __future__ import annotations

import http.server
import threading
import time

import pyarrow as pa
import pytest

from don_crawler_ray.functions.ratelimit import (
    RATE_LIMIT_MAX_RETRIES,
    RATE_LIMIT_MAX_WAIT_S,
    rate_limit_wait_from_headers,
)
from don_crawler_ray.stages.http_fetch import (
    FetchCancelled,
    FetchContext,
    FetchDeadlineExceeded,
    HttpFetchActor,
    RateLimitExhausted,
    get_status_with_retry,
    get_with_retry,
    http_get_status,
)


class _ScriptedHandler(http.server.BaseHTTPRequestHandler):
    """Per-server scripted responses: the server instance carries
    ``script`` (a list of (status, headers, body) consumed in order;
    the last entry repeats) and counts ``calls``."""

    def do_GET(self):  # noqa: N802 (stdlib API name)
        srv = self.server
        srv.calls += 1
        idx = min(srv.calls - 1, len(srv.script) - 1)
        status, headers, body = srv.script[idx]
        self.send_response(status)
        for k, v in headers.items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *args):  # silence per-request stderr lines
        pass


@pytest.fixture
def scripted_server():
    """Yields a factory: ``start(script) -> (base_url, server)``."""
    servers = []

    def start(script):
        srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _ScriptedHandler)
        srv.script = script
        srv.calls = 0
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        servers.append(srv)
        return f"http://127.0.0.1:{srv.server_address[1]}/", srv

    yield start
    for srv in servers:
        srv.shutdown()
        srv.server_close()


class TestRetryMatrix:
    def test_cancelled_context_skips_request(self, scripted_server):
        """publiccode_retry_test.go:13-36: a cancelled context performs
        ZERO requests and surfaces the cancellation with status 0."""
        url, srv = scripted_server([(200, {}, b"ok")])
        ctx = FetchContext()
        ctx.cancel()
        with pytest.raises(FetchCancelled) as ei:
            get_status_with_retry(url, ctx=ctx)
        assert ei.value.status == 0
        assert srv.calls == 0

    def test_deadline_during_rate_limit_wait(self, scripted_server):
        """publiccode_retry_test.go:38-71: a 429 with Retry-After: 120
        against a 20 ms deadline makes exactly ONE request, surfaces
        DeadlineExceeded carrying status 429, and returns well under
        the nominal 120 s wait."""
        url, srv = scripted_server([(429, {"Retry-After": "120"}, b"")])
        start = time.monotonic()
        with pytest.raises(FetchDeadlineExceeded) as ei:
            get_status_with_retry(url, ctx=FetchContext(timeout_s=0.02))
        elapsed = time.monotonic() - start
        assert ei.value.status == 429
        assert srv.calls == 1
        assert elapsed < 1.0

    def test_wait_cap(self):
        """publiccode_retry_test.go:73-80: Retry-After: 3600 is capped
        at the 5-minute max wait."""
        assert rate_limit_wait_from_headers({"Retry-After": "3600"}, 0.0) == RATE_LIMIT_MAX_WAIT_S

    def test_retry_then_success(self, scripted_server):
        """One rate-limited response then 200: two requests total, the
        wait honors Retry-After."""
        url, srv = scripted_server(
            [(429, {"Retry-After": "1"}, b""), (200, {}, b"hello")]
        )
        sleeps = []
        status, _hdrs, body = get_with_retry(url, sleep=sleeps.append)
        assert status == 200 and body == b"hello"
        assert srv.calls == 2
        assert sleeps == [1.0]

    def test_403_with_remaining_zero_is_rate_limited(self, scripted_server):
        url, srv = scripted_server(
            [(403, {"X-RateLimit-Remaining": "0"}, b""), (200, {}, b"ok")]
        )
        status = get_status_with_retry(url, sleep=lambda s: None)
        assert status == 200
        assert srv.calls == 2

    def test_exhaustion_after_budget(self, scripted_server):
        """Permanently rate limited: 6 retries -> 7 requests, then the
        'remained rate limited' error carrying the last status."""
        url, srv = scripted_server([(429, {"Retry-After": "1"}, b"")])
        with pytest.raises(RateLimitExhausted) as ei:
            get_status_with_retry(url, sleep=lambda s: None)
        assert ei.value.status == 429
        assert ei.value.attempts == RATE_LIMIT_MAX_RETRIES + 1
        assert srv.calls == RATE_LIMIT_MAX_RETRIES + 1

    def test_non_rl_error_status_returns(self, scripted_server):
        """404 is not rate limiting — returned immediately (the
        reference proceeds without the file)."""
        url, srv = scripted_server([(404, {}, b"")])
        assert get_status_with_retry(url) == 404
        assert srv.calls == 1

    def test_http_get_status_drains_and_reports(self, scripted_server):
        url, _srv = scripted_server([(500, {"X-Err": "yes"}, b"boom")])
        status, headers, body = http_get_status(url)
        assert status == 500 and body == b"boom"
        assert headers.get("X-Err") == "yes"


class TestHttpFetchActor:
    def test_batch_fetch_and_statuses(self, scripted_server):
        url_ok, _ = scripted_server([(200, {}, b"<html><title>T</title></html>")])
        url_404, _ = scripted_server([(404, {}, b"nope")])
        actor = HttpFetchActor(url_col="url")
        batch = pa.table({"url": [url_ok, url_404, "http://127.0.0.1:1/unreachable"]})
        out = actor(batch)
        assert out.column("http_status").to_pylist() == [200, 404, 0]
        bodies = out.column("html").to_pylist()
        assert bodies[0] == b"<html><title>T</title></html>"
        assert bodies[1] == b"" and bodies[2] == b""

    def test_per_host_min_interval(self, scripted_server):
        """Three same-host requests with a 50 ms interval must take at
        least 100 ms — the partition-ownership politeness contract."""
        url, srv = scripted_server([(200, {}, b"ok")])
        actor = HttpFetchActor(url_col="url", min_interval_s=0.05)
        start = time.monotonic()
        actor(pa.table({"url": [url + "a", url + "b", url + "c"]}))
        assert time.monotonic() - start >= 0.1
        assert srv.calls == 3

    def test_actor_in_map_batches(self, ray_session, scripted_server):
        """The stage runs as a real Ray actor pool."""
        import ray

        url, _srv = scripted_server([(200, {}, b"<html>page</html>")])
        ds = ray.data.from_arrow(pa.table({"url": [url + str(i) for i in range(8)]}))
        out = ds.map_batches(
            HttpFetchActor,
            fn_constructor_kwargs={"url_col": "url"},
            concurrency=1,
            batch_size=4,
            batch_format="pyarrow",
        ).take_all()
        assert len(out) == 8
        assert all(r["http_status"] == 200 for r in out)
        assert all(r["html"] == b"<html>page</html>" for r in out)


class TestSingleUrlHttpTransport:
    def test_fetched(self, scripted_server):
        from don_crawler_ray.pipelines.crawl import crawl_single_url

        url, _ = scripted_server(
            [(200, {}, b"<html><head><title>Live</title></head><body><p>hi</p></body></html>")]
        )
        out = crawl_single_url(url, frontier_path=None, transport="http")
        row = out.to_pylist()[0]
        assert row["status"] == "fetched"
        assert "hi" in row["text"]

    def test_rate_limit_exhausted_status(self, scripted_server, monkeypatch):
        import don_crawler_ray.stages.http_fetch as hf
        from don_crawler_ray.pipelines.crawl import crawl_single_url

        monkeypatch.setattr(hf.time, "sleep", lambda s: None)
        url, srv = scripted_server([(429, {"Retry-After": "1"}, b"")])
        out = crawl_single_url(url, frontier_path=None, transport="http")
        assert out.to_pylist()[0]["status"] == "rate_limit_exhausted"
        assert srv.calls == RATE_LIMIT_MAX_RETRIES + 1

    def test_not_found(self, scripted_server):
        from don_crawler_ray.pipelines.crawl import crawl_single_url

        url, _ = scripted_server([(404, {}, b"")])
        out = crawl_single_url(url, frontier_path=None, transport="http")
        assert out.to_pylist()[0]["status"] == "not_found"

    def test_unknown_transport_rejected(self):
        from don_crawler_ray.pipelines.crawl import crawl_single_url

        with pytest.raises(ValueError, match="transport"):
            crawl_single_url("https://x/y", frontier_path=None, transport="carrier-pigeon")
