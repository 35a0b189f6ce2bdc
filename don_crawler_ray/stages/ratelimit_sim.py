"""Scripted rate-limit fetch simulation — politeness retry parity in
virtual time.

Reference semantics reproduced (per host, per request):
- classification: ``isRateLimitedStatus`` (``crawler/crawler.go:394-412``)
- wait: ``rateLimitWaitFromHeaders`` — reset-or-15s-fallback capped at
  5 min (``crawler/crawler.go:375-392``)
- retry budget: 6 attempts (``publiccodeGetStatusWithRetry``,
  ``crawler/crawler.go:415-447``); exhaustion -> failed row (the
  reference proceeds without the file)

Instead of sleeping workers (which stalls a CPU slot and makes timing
nondeterministic — SURVEY §4), the simulator accrues VIRTUAL wait
milliseconds per host. Determinism comes from partition ownership: each
host's rows are processed by exactly one ``map_groups`` call in rank
order, so request indices (and therefore scripted episodes) are
reproducible at any parallelism.

An episode script is ``{host: [(after_n, status, headers), ...]}``:
request number ``after_n`` (0-based, per host) of that host returns
``status`` with ``headers`` until the rate limit "resets" (one retry
later in simulation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from don_crawler_ray.functions.ratelimit import (
    RATE_LIMIT_MAX_RETRIES,
    is_rate_limited_status,
    rate_limit_wait_from_headers,
)

STATUS_FETCHED = "fetched"
STATUS_RL_FAILED = "rate_limit_exhausted"


def make_fetch_sim_group_fn(rl_script: dict[str, list[tuple[int, int, dict]]], virtual_now: float = 1_700_000_000.0):
    """Build the ``groupby(host).map_groups`` callable."""

    def simulate(group: pa.Table) -> pa.Table:
        host = group.column("host")[0].as_py()
        order = pc.sort_indices(group, sort_keys=[("rank", "ascending")])
        g = group.take(order)
        episodes = {e[0]: (e[1], e[2]) for e in rl_script.get(host, [])}

        statuses: list[str] = []
        attempts_out: list[int] = []
        waits_ms: list[int] = []
        vnow = virtual_now
        req_no = 0
        for _ in range(g.num_rows):
            attempts = 0
            wait_ms = 0
            while True:
                attempts += 1
                scripted = episodes.get(req_no)
                req_no += 1
                if scripted is None:
                    statuses.append(STATUS_FETCHED)
                    break
                status, headers = scripted
                if not is_rate_limited_status(status, headers, vnow):
                    # non-RL error statuses: reference proceeds without
                    # the file -> still one attempt, fetched-with-status
                    statuses.append(STATUS_FETCHED)
                    break
                if attempts > RATE_LIMIT_MAX_RETRIES:
                    statuses.append(STATUS_RL_FAILED)
                    break
                w = rate_limit_wait_from_headers(headers, vnow)
                wait_ms += int(w * 1000)
                vnow += w
            attempts_out.append(attempts)
            waits_ms.append(wait_ms)

        return pa.table(
            {
                "canonical_url": g.column("canonical_url"),
                "host": g.column("host"),
                "rank": g.column("rank"),
                "fetch_status": pa.array(statuses, pa.string()),
                "attempts": pa.array(attempts_out, pa.int32()),
                "virtual_wait_ms": pa.array(waits_ms, pa.int64()),
            }
        )

    return simulate
