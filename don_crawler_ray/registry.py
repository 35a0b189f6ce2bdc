"""Scanner extension registry — the engine's formal plug-in surface.

The reference defines a three-method ``scanner.Scanner`` interface
(``scanner/scanner.go:13-17``) with one registered implementation per
platform, instantiated once at crawler startup
(``crawler/crawler.go:96-98``). The engine's analog: a ``Scanner`` is
the per-platform fetch/extract strategy used by the actor-pool fetch
stage — host dispatch (the ``ScanPublisher`` switch,
``crawler/crawler.go:204-254``) plus the batch extract kernel
(``ScanRepo`` analog). Implementations register by name; stages
resolve by name inside actor ``__init__`` so each worker constructs
its scanner exactly once.
"""

from __future__ import annotations

from typing import Callable, Protocol, runtime_checkable

import pyarrow as pa
import pyarrow.compute as pc


@runtime_checkable
class Scanner(Protocol):
    """What a platform plug-in must provide (scanner.Scanner analog)."""

    name: str

    def matches_host(self, host: str) -> bool:
        """Platform dispatch (M1): does this scanner own ``host``?"""
        ...

    def extract(self, batch: pa.Table) -> pa.Table:
        """ScanRepo analog: html batch in, extracted columns appended
        (``text``, ``description``, ``text_len``), ``html`` dropped."""
        ...


_REGISTRY: dict[str, Callable[[], Scanner]] = {}
_GENERATION: dict[str, int] = {}


def register_scanner(name: str, factory: Callable[[], Scanner]) -> None:
    """Register a scanner factory (overwrites an existing name — the
    latest registration wins, as a user plug-in replacing a default).
    Each (re)registration bumps the name's generation so per-process
    worker caches keyed on the name can never serve a worker built
    from a superseded factory — even one with the same qualname but
    different baked-in config."""
    _REGISTRY[name] = factory
    _GENERATION[name] = _GENERATION.get(name, 0) + 1


def scanner_generation(name: str) -> int:
    """Monotonic per-name registration counter (0 = never registered)."""
    return _GENERATION.get(name, 0)


def get_scanner(name: str) -> Scanner:
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise KeyError(
            f"no scanner named {name!r}; registered: {sorted(_REGISTRY)}"
        ) from None


def registered_scanners() -> list[str]:
    return sorted(_REGISTRY)


def scanner_for_host(host: str, default: str = "html") -> Scanner:
    """The ScanPublisher dispatch switch: first registered scanner (by
    name order, deterministic) claiming the host, else the default.
    The catch-all ``auto`` dispatcher and the default itself are not
    candidates — only platform scanners claim hosts."""
    for name in registered_scanners():
        if name in ("auto", default):
            continue
        s = get_scanner(name)
        if s.matches_host(host):
            return s
    return get_scanner(default)


def resolve_scanner(scanner) -> Scanner:
    """Resolve a stage's ``scanner=`` argument inside an actor's
    ``__init__`` (which runs in a Ray WORKER process).

    Accepts a registry name (builtin scanners self-register at module
    import, so every worker sees them), an already-built ``Scanner``
    instance, or a zero-arg factory. User plug-ins registered via
    ``register_scanner()`` on the DRIVER are invisible to a worker's
    freshly imported registry — pass the factory (or instance) itself
    through ``fn_constructor_kwargs`` instead of its name, or make the
    plug-in module self-register at import time on all workers.
    """
    import inspect

    if isinstance(scanner, str):
        return get_scanner(scanner)
    # classes satisfy the runtime_checkable Protocol isinstance check
    # (methods exist as attributes), so test class-ness first
    if inspect.isclass(scanner) or not isinstance(scanner, Scanner):
        if callable(scanner):
            return scanner()
        raise TypeError(
            f"scanner must be a name, Scanner, or factory; got {type(scanner)!r}"
        )
    return scanner


class HtmlScanner:
    """Default scanner: the synthetic-page HTML extractor (M12/M13
    kernels). Claims no hosts — it is the fallback."""

    name = "html"

    def __init__(self):
        # the seam where a real platform scanner builds API clients /
        # compiles models, once per actor (ST8)
        from don_crawler_ray.functions.extract import description_from_readme, extract_text

        self._extract_text = extract_text
        self._describe = description_from_readme

    def matches_host(self, host: str) -> bool:
        return False

    def extract(self, batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        texts = []
        descs = []
        for h in htmls:
            t = self._extract_text(h)
            texts.append(t)
            descs.append(self._describe(t))
        out = batch.drop_columns(["html"])
        out = out.append_column("text", pa.array(texts, pa.string()))
        out = out.append_column("description", pa.array(descs, pa.string()))
        out = out.append_column("text_len", pa.array([len(t) for t in texts], pa.int64()))
        return out


class GitHubScanner(HtmlScanner):
    """GitHub platform scanner (``scanner/github.go``): claims
    github.com hosts (the ``vcsurl.IsGitHub`` arm of the ScanPublisher
    switch, ``crawler/crawler.go:207, 233``), skips ``.github``
    repositories during extraction (``scanner/github.go:170-174``), and
    builds the contents-API download URL
    (``raw.githubusercontent.com/...``, ``scanner/github.go:230-233``).
    Text extraction itself is the shared HTML kernel — the byte-identity
    invariant vs the reference extraction fixtures is platform-neutral."""

    name = "github"
    _HOSTS = frozenset({"github.com", "www.github.com", "raw.githubusercontent.com"})

    def matches_host(self, host: str) -> bool:
        return host.lower().rsplit(":", 1)[0] in self._HOSTS

    def repo_path_column(self, batch: pa.Table):
        for col in ("canonical_url", "url"):
            if col in batch.column_names:
                return batch.column(col)
        return None

    def extract(self, batch: pa.Table) -> pa.Table:
        from don_crawler_ray.functions.urlnorm import is_dot_github_repo, split_full_name

        urls = self.repo_path_column(batch)
        if urls is not None and batch.num_rows:
            from urllib.parse import urlsplit

            keep = [
                not is_dot_github_repo(split_full_name(urlsplit(u).path.strip("/"))[1])
                for u in urls.to_pylist()
            ]
            batch = batch.filter(pa.array(keep))
        return super().extract(batch)

    def raw_url(self, repo_url: str, default_branch: str, filename: str = "publiccode.yml") -> str:
        from don_crawler_ray.functions.urlnorm import (
            github_raw_url,
            split_repo_owner_and_name,
        )

        owner, repo = split_repo_owner_and_name(repo_url)
        return github_raw_url(owner, repo, default_branch, filename)


class GitLabScanner(HtmlScanner):
    """GitLab platform scanner (``scanner/gitlab.go``): claims
    gitlab.com plus self-hosted ``gitlab.*`` instances (the public
    go-vcsurl heuristic without its network probe) and builds raw URLs
    with the Go ``path.Join`` semantics (``scanner/gitlab.go:313-324``).
    Supports nested group namespaces (``common/split_fullname.go``)."""

    name = "gitlab"

    def matches_host(self, host: str) -> bool:
        h = host.lower().rsplit(":", 1)[0]
        return h in ("gitlab.com", "www.gitlab.com") or h.startswith("gitlab.")

    def raw_url(self, repo_url: str, default_branch: str, filename: str = "publiccode.yml") -> str:
        from don_crawler_ray.functions.urlnorm import gitlab_raw_url

        return gitlab_raw_url(repo_url, default_branch, filename)


class BitbucketScanner(HtmlScanner):
    """Bitbucket platform scanner (``scanner/bitbucket.go``): claims
    bitbucket.org and builds the raw-URL format string
    (``scanner/bitbucket.go:87, 148``)."""

    name = "bitbucket"

    def matches_host(self, host: str) -> bool:
        return host.lower().rsplit(":", 1)[0] in ("bitbucket.org", "www.bitbucket.org")

    def raw_url(self, repo_url: str, default_branch: str, filename: str = "publiccode.yml") -> str:
        from urllib.parse import urlsplit

        from don_crawler_ray.functions.urlnorm import bitbucket_raw_url, split_full_name

        owner, slug = split_full_name(urlsplit(repo_url).path.strip("/"))
        return bitbucket_raw_url(owner, slug, default_branch, filename)


class AutoScanner:
    """Per-host dispatching scanner — the full ScanPublisher switch as a
    batch kernel (``crawler/crawler.go:204-254``). Routes each row of a
    batch to the registered scanner claiming its ``host``, runs each
    claimed sub-batch through that scanner's extract, and restores the
    original row order. Scanner instances and host->scanner decisions
    are memoized per actor (one ``matches_host`` sweep per DISTINCT
    host, never per row)."""

    name = "auto"

    def __init__(self, default: str = "html"):
        self._instances = {
            n: get_scanner(n) for n in registered_scanners() if n != self.name
        }
        self._default = default
        self._by_host: dict[str, str] = {}

    def matches_host(self, host: str) -> bool:
        return True

    def _name_for_host(self, host: str) -> str:
        if host is None:  # null host cell -> fallback extractor
            return self._default
        got = self._by_host.get(host)
        if got is None:
            got = self._default
            for n in sorted(self._instances):
                if n != self._default and self._instances[n].matches_host(host):
                    got = n
                    break
            self._by_host[host] = got
        return got

    def extract(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        if batch.num_rows == 0 or "host" not in batch.column_names:
            return self._instances[self._default].extract(batch)
        # one Arrow unique + index_in per batch: matches_host runs per
        # DISTINCT host, row assignment stays vectorized
        host_col = batch.column("host")
        uniq = pc.unique(
            host_col.combine_chunks() if isinstance(host_col, pa.ChunkedArray) else host_col
        )
        names = [self._name_for_host(h) for h in uniq.to_pylist()]
        groups = sorted(set(names))
        if len(groups) == 1:
            return self._instances[groups[0]].extract(batch)
        inv = pc.index_in(host_col, value_set=uniq).to_numpy(zero_copy_only=False)
        chosen = np.asarray(names, dtype=object)[inv]
        # stable original-order restore across sub-batches (a scanner
        # may also FILTER rows, e.g. github's .github skip, so carry the
        # row index through and sort on it rather than inverting a
        # permutation)
        ridx = pa.array(np.arange(batch.num_rows, dtype=np.int64))
        tagged = batch.append_column("_ridx", ridx)
        parts = []
        for g in groups:
            sel = np.flatnonzero(chosen == g)
            parts.append(self._instances[g].extract(tagged.take(pa.array(sel))))
        out = pa.concat_tables(parts)
        order = pc.sort_indices(out.column("_ridx"))
        return out.take(order).drop_columns(["_ridx"])


register_scanner("html", HtmlScanner)
register_scanner("github", GitHubScanner)
register_scanner("gitlab", GitLabScanner)
register_scanner("bitbucket", BitbucketScanner)
register_scanner("auto", AutoScanner)

# the factories every worker process re-registers at module import;
# anything else in _REGISTRY (new names OR overrides of these names)
# exists only in the process that registered it
BUILTIN_SCANNERS = frozenset(_REGISTRY)
_BUILTIN_FACTORIES = dict(_REGISTRY)


def portable_scanner(scanner):
    """Make a ``scanner=`` stage argument safe to ship to WORKERS.

    A name whose driver-side registration IS the import-time builtin
    passes through (workers self-register it identically). Anything
    else the driver registered — a new name, or a user plug-in
    REPLACING a builtin name (``register_scanner`` documents
    latest-wins) — would resolve differently (or KeyError) inside a
    fresh worker registry, so it is resolved HERE (driver side) to its
    registered factory, which Ray then serializes into the stage like
    any instance/factory argument (ADVICE r03 #1). Unregistered names
    fall through unchanged so ``resolve_scanner`` raises its usual
    KeyError with the registered-name list. Call at stage-construction
    time."""
    if (
        isinstance(scanner, str)
        and scanner in _REGISTRY
        and _REGISTRY[scanner] is not _BUILTIN_FACTORIES.get(scanner)
    ):
        return _REGISTRY[scanner]
    return scanner
