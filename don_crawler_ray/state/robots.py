"""Minimal deterministic robots.txt evaluation + per-host politeness state.

The reference's politeness is provider-wide gates and blocking sleeps
(ST3/ST4, ``scanner/github.go:26-29, 329-357``, ``scanner/gitlab.go:22``).
Here politeness is per-host state owned by whichever stage processes
that host's group (partition ownership replaces locks — SURVEY.md §4),
and waiting is *virtual*: the scheduler assigns each URL a
deterministic virtual fetch time from the host's token bucket instead
of sleeping a worker. That keeps N- and 4N-parallelism runs
byte-identical in crawl order, which wall-clock sleeps cannot.
"""

from __future__ import annotations


class RobotsRules:
    """Parsed ``User-agent: *`` Disallow prefix rules.

    - ``robots_txt is None`` (fetch 404) -> allow all;
    - unfetchable robots (``__503__`` sentinel in fixtures) -> deny all
      (conservative, counted as robots-denied);
    - empty ``Disallow:`` line -> allow all (standard semantics).
    """

    __slots__ = ("disallow", "deny_all")

    def __init__(self, robots_txt: str | None):
        self.disallow: tuple[str, ...] = ()
        self.deny_all = False
        if robots_txt is None:
            return
        if robots_txt == "__503__":
            self.deny_all = True
            return
        prefixes: list[str] = []
        in_star_group = False
        for raw in robots_txt.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                in_star_group = value == "*"
            elif key == "disallow" and in_star_group:
                if value:
                    prefixes.append(value)
        self.disallow = tuple(prefixes)

    def allowed(self, path: str) -> bool:
        if self.deny_all:
            return False
        for p in self.disallow:
            if path.startswith(p):
                return False
        return True


class HostBudget:
    """Per-host token-bucket in virtual time.

    ``assign(n)`` hands out monotonically increasing virtual fetch
    timestamps honoring ``min_delay_ms`` between request slots and
    ``max_concurrent`` parallel slots — a deterministic restatement of
    the reference's semaphore + sleep politeness
    (``scanner/gitlab.go:22, 37-52``, ``crawler/crawler.go:440-445``).
    """

    __slots__ = ("min_delay_ms", "max_concurrent", "per_round_budget", "_slot_ms")

    def __init__(self, min_delay_ms: int = 0, max_concurrent: int = 1, per_round_budget: int = 0):
        self.min_delay_ms = int(min_delay_ms)
        self.max_concurrent = max(1, int(max_concurrent))
        self.per_round_budget = int(per_round_budget)
        self._slot_ms = [0] * self.max_concurrent

    def assign(self, n: int) -> list[int]:
        """Virtual fetch time (ms) for the next n requests of this host."""
        out: list[int] = []
        slots = self._slot_ms
        k = len(slots)
        delay = self.min_delay_ms
        for i in range(n):
            s = i % k
            t = slots[s]
            out.append(t)
            slots[s] = t + delay if delay > 0 else t + 1
        return out

    def assign_array(self, n: int):
        """Vectorized ``assign``: request i takes slot ``i % k`` whose
        value advances by ``delay`` (or 1) per use — so
        ``t[i] = slot0[i % k] + (i // k) * delta`` in one numpy
        expression. Identical output to ``assign`` (pytest-pinned)."""
        import numpy as np

        k = self.max_concurrent
        delta = self.min_delay_ms if self.min_delay_ms > 0 else 1
        base = np.asarray(self._slot_ms, dtype=np.int64)
        i = np.arange(n, dtype=np.int64)
        out = base[i % k] + (i // k) * delta
        uses = np.bincount(i % k, minlength=k) if n else np.zeros(k, dtype=np.int64)
        self._slot_ms = (base + uses * delta).tolist()
        return out
