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
    """RFC 9309 robots.txt evaluation (deterministic, no network).

    Implemented semantics (all from the public Robots Exclusion
    Protocol, RFC 9309):

    - group selection (§2.2.1): consecutive ``User-agent`` lines open a
      group; a group naming our agent (case-insensitive token match)
      beats the ``*`` group; other agents' groups are ignored;
    - ``Allow`` and ``Disallow`` rules with ``*`` wildcards and a ``$``
      end anchor (§2.2.2-2.2.3); the rule with the LONGEST pattern
      wins, a tie between allow and disallow resolves to allow;
    - empty ``Disallow:`` -> allow all; no matching rule -> allowed;
    - ``Crawl-delay`` (ubiquitous extension) is parsed into
      ``crawl_delay_ms`` for the politeness table to consume — the
      schedule's virtual-time budget remains the single source of
      per-host delay, so parsing it never perturbs existing digests;
    - ``robots_txt is None`` (fetch 404) -> allow all (§2.3.1.3);
    - unfetchable robots (``__503__`` sentinel in fixtures) -> deny all
      (conservative 5xx handling, §2.3.1.4).

    Plain-prefix rules (the only kind the fixtures use) take a fast
    ``startswith`` path; wildcard/anchored rules compile to a regex
    once at parse time.
    """

    __slots__ = ("_rules", "deny_all", "crawl_delay_ms", "disallow", "simple")

    def __init__(self, robots_txt: str | None, agent: str = "*"):
        import re

        # (is_allow, pattern_len, startswith_prefix | None, regex | None)
        self._rules: tuple = ()
        self.deny_all = False
        self.crawl_delay_ms = 0
        # plain-prefix Disallow rules, exposed for the schedule kernels'
        # vectorized Arrow starts_with fast path; ``simple`` is True
        # when that fast path is EXACT (no Allow / wildcard / anchor
        # rules in the selected group)
        self.disallow: tuple[str, ...] = ()
        self.simple = True
        if robots_txt is None:
            return
        if robots_txt == "__503__":
            self.deny_all = True
            return

        agent = agent.lower()
        # group parse: agents -> list of (is_allow, pattern) + delay
        groups: dict[str, list] = {}
        delays: dict[str, float] = {}
        current: list[str] = []
        collecting_agents = True
        for raw in robots_txt.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if not collecting_agents:
                    current = []
                collecting_agents = True
                current.append(value.lower())
                for a in current:
                    groups.setdefault(a, [])
            elif key in ("allow", "disallow"):
                collecting_agents = False
                for a in current:
                    if value:
                        groups.setdefault(a, []).append((key == "allow", value))
                    # empty Disallow: allow-all -> contributes no rule
            elif key == "crawl-delay":
                collecting_agents = False
                try:
                    for a in current:
                        delays[a] = float(value)
                except ValueError:
                    pass

        chosen = agent if agent in groups else "*"
        rules = groups.get(chosen, [])
        self.crawl_delay_ms = int(delays.get(chosen, 0.0) * 1000)

        compiled = []
        plain_disallow = []
        for is_allow, pat in rules:
            if "*" not in pat and not pat.endswith("$"):
                compiled.append((is_allow, len(pat), pat, None))
                if is_allow:
                    self.simple = False
                else:
                    plain_disallow.append(pat)
            else:
                self.simple = False
                anchored = pat.endswith("$")
                body = pat[:-1] if anchored else pat
                rx = "".join(re.escape(c) if c != "*" else ".*" for c in body)
                rx = "^" + rx + ("$" if anchored else "")
                compiled.append((is_allow, len(pat), None, re.compile(rx)))
        self._rules = tuple(compiled)
        self.disallow = tuple(plain_disallow)

    def allowed(self, path: str) -> bool:
        if self.deny_all:
            return False
        best_len = -1
        best_allow = True
        for is_allow, plen, prefix, rx in self._rules:
            hit = path.startswith(prefix) if prefix is not None else bool(rx.match(path))
            if not hit or plen < best_len:
                continue
            if plen > best_len:
                best_len, best_allow = plen, is_allow
            elif is_allow:  # equal length: allow wins the tie
                best_allow = True
        return best_allow


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
