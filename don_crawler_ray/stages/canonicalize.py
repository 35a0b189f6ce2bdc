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
    canon, hosts, rev, hashes, raw_hashes, paths = [], [], [], [], [], []
    _c, _r, _h = canonicalize_parts, reverse_host, url_hash64
    for u in urls:
        c, host, path = _c(u)
        canon.append(c)
        hosts.append(host)
        rev.append(_r(host))
        paths.append(path)
        h = _h(c)
        hashes.append(h)
        raw_hashes.append(h if u == c else _h(u))
    return canon, hosts, rev, hashes, raw_hashes, paths


def canonicalize_stage(batch: pa.Table) -> pa.Table:
    """Full canonicalize: keeps all input columns, appends derived ones.

    ``raw_hash`` (hash of the RAW url) disambiguates distinct raw URLs
    that canonicalize to the same canonical URL with an identical
    ``warc_ts``: the schedule's membership key includes the winning
    row's raw hash, so exactly one page-store row matches (first-wins
    stays exact; ADVICE r01 item 4).
    """
    urls = batch.column("url").to_pylist()
    canon, hosts, rev, hashes, raw_hashes, paths = _canonicalize_columns(urls)
    return (
        batch.append_column("canonical_url", pa.array(canon, pa.string()))
        .append_column("host", pa.array(hosts, pa.string()))
        .append_column("host_key", pa.array(rev, pa.string()))
        .append_column("url_hash", pa.array(hashes, pa.uint64()))
        .append_column("raw_hash", pa.array(raw_hashes, pa.uint64()))
        .append_column("path", pa.array(paths, pa.string()))
    )


def canonicalize_slim_stage(batch: pa.Table) -> pa.Table:
    """Slim variant for the schedule pass: input is (url, warc_ts) only;
    output drops the raw url and keeps just what scheduling needs, so
    the groupby(host) shuffle never moves page bytes (SURVEY.md §7).
    ``host`` and ``path`` are NOT carried — they are recomputed inside
    the group fn from ``host_key``/``canonical_url`` (string columns
    through a sort cost real shuffle bytes; recomputation is ~free)."""
    urls = batch.column("url").to_pylist()
    canon, hosts, rev, hashes, raw_hashes, paths = _canonicalize_columns(urls)
    return pa.table(
        {
            "canonical_url": pa.array(canon, pa.string()),
            "host_key": pa.array(rev, pa.string()),
            "url_hash": pa.array(hashes, pa.uint64()),
            "raw_hash": pa.array(raw_hashes, pa.uint64()),
            "warc_ts": batch.column("warc_ts"),
        }
    )
