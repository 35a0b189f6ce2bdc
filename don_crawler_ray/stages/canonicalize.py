"""Canonicalize stage — stateless zero-copy Arrow map_batches kernels.

Adds ``canonical_url, host, host_key (reversed), url_hash, path`` to a
frontier batch. Reference semantics: URL parse-on-load
(``internal/url.go:10-32``) + the platform/org/repo splitters
(M1-M4, ``crawler/crawler.go:204-254``, ``common/split_fullname.go``)
collapse into one canonicalization kernel keyed for partitioning.
"""

from __future__ import annotations

import pyarrow as pa

from don_crawler_ray.functions.urlnorm import (
    canonicalize_parts,
    reverse_host,
    url_hash64,
)


def _canonicalize_columns(urls: list[str]):
    canon, hosts, rev, hashes, paths = [], [], [], [], []
    _c, _r, _h = canonicalize_parts, reverse_host, url_hash64
    for u in urls:
        c, host, path = _c(u)
        canon.append(c)
        hosts.append(host)
        rev.append(_r(host))
        paths.append(path)
        hashes.append(_h(c))
    return canon, hosts, rev, hashes, paths


def canonicalize_stage(batch: pa.Table) -> pa.Table:
    """Full canonicalize: keeps all input columns, appends derived ones."""
    canon, hosts, rev, hashes, paths = _canonicalize_columns(
        batch.column("url").to_pylist()
    )
    return (
        batch.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("host_key", pa.array(rev, pa.string()))
        .append_column("url_hash", pa.array(hashes, pa.uint64()))
        .append_column("path", pa.array(paths, pa.string()))
    )


def canonicalize_slim_stage(batch: pa.Table) -> pa.Table:
    """Slim variant for the schedule pass: input is (url, warc_ts) only;
    output drops the raw url and keeps just what scheduling needs, so
    the groupby(host) shuffle never moves page bytes (SURVEY.md §7).
    ``host`` and ``path`` are NOT carried — they are recomputed inside
    the group fn from ``host_key``/``canonical_url`` (string columns
    through a sort cost real shuffle bytes; recomputation is ~free)."""
    canon, hosts, rev, hashes, paths = _canonicalize_columns(
        batch.column("url").to_pylist()
    )
    return pa.table(
        {
            "canonical_url": pa.array(canon, pa.string()),
            "host_key": pa.array(rev, pa.string()),
            "url_hash": pa.array(hashes, pa.uint64()),
            "warc_ts": batch.column("warc_ts"),
        }
    )
