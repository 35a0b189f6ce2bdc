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


def register_scanner(name: str, factory: Callable[[], Scanner]) -> None:
    """Register a scanner factory (overwrites an existing name — the
    latest registration wins, as a user plug-in replacing a default)."""
    _REGISTRY[name] = factory


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
    name order, deterministic) claiming the host, else the default."""
    for name in registered_scanners():
        s = get_scanner(name)
        if s.matches_host(host):
            return s
    return get_scanner(default)


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


register_scanner("html", HtmlScanner)
