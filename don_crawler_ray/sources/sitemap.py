"""Sitemap XML source — the seed-discovery format of real crawls
(sitemaps.org protocol): ``<urlset>`` files of page URLs with
optional ``lastmod``/``priority``, and ``<sitemapindex>`` files
pointing at child sitemaps.

Pure stdlib ``xml.etree`` parsing inside a ``FileBasedDatasource`` —
one Ray read task per sitemap file, no driver-side XML work. Index
files surface their child locations as ``kind='sitemap'`` rows so the
caller (which owns fetching in this engine's no-network model) can
feed the next level back in; page entries are ``kind='url'`` rows.
``sitemap_to_frontier_rows`` projects a parsed urlset onto the crawl
frontier schema (``url, warc_ts, html, text, lang``), making a
sitemap a drop-in seed source for ``pipelines.crawl``.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Iterator

import pyarrow as pa

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"

SITEMAP_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lastmod", pa.string()),
        ("priority", pa.float64()),
        ("kind", pa.string()),  # 'url' (urlset entry) | 'sitemap' (index entry)
    ]
)


def _text(node, tag: str) -> str | None:
    child = node.find(_NS + tag)
    return None if child is None or child.text is None else child.text.strip()


def parse_sitemap_bytes(data: bytes) -> pa.Table:
    """Parse one sitemap document (urlset or sitemapindex) into the
    ``SITEMAP_SCHEMA`` table. Unknown root tags are a format error."""
    root = ET.fromstring(data)
    urls: list[str] = []
    lastmods: list[str | None] = []
    priorities: list[float | None] = []
    kinds: list[str] = []
    if root.tag == _NS + "urlset":
        for node in root.findall(_NS + "url"):
            loc = _text(node, "loc")
            if loc is None:
                continue
            urls.append(loc)
            lastmods.append(_text(node, "lastmod"))
            pr = _text(node, "priority")
            try:
                # malformed priorities are common in the wild — degrade
                # to None (like a missing element), don't fail the file
                priorities.append(None if pr is None else float(pr))
            except ValueError:
                priorities.append(None)
            kinds.append("url")
    elif root.tag == _NS + "sitemapindex":
        for node in root.findall(_NS + "sitemap"):
            loc = _text(node, "loc")
            if loc is None:
                continue
            urls.append(loc)
            lastmods.append(_text(node, "lastmod"))
            priorities.append(None)
            kinds.append("sitemap")
    else:
        raise ValueError(f"not a sitemap document (root tag {root.tag!r})")
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "lastmod": pa.array(lastmods, pa.string()),
            "priority": pa.array(priorities, pa.float64()),
            "kind": pa.array(kinds, pa.string()),
        }
    )


def read_sitemap(paths):
    """``ray.data`` Dataset over sitemap XML files (urlset and/or
    sitemapindex), one read task per file."""
    import ray
    from ray.data.datasource import FileBasedDatasource

    class SitemapDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["xml"]

        def _read_stream(self, f, path: str) -> Iterator[pa.Table]:
            yield parse_sitemap_bytes(f.readall())

    return ray.data.read_datasource(SitemapDatasource(paths))


def _w3c_to_naive_utc(lm: str | None, default_ts: str) -> str:
    """Normalize a W3C datetime (sitemaps.org lastmod) to a naive UTC
    ISO string. Handles every W3C form: YYYY, YYYY-MM, YYYY-MM-DD,
    and full datetimes with 'Z' or signed ``+/-hh:mm`` offsets (the
    offset is CONVERTED to UTC, not dropped). Malformed values fall
    back to ``default_ts`` instead of failing the read task."""
    from datetime import datetime, timezone

    if not lm:
        return default_ts
    s = lm.strip()
    try:
        if "T" not in s:
            # date-only forms: YYYY[-MM[-DD]]
            parts = s.split("-")
            if not (1 <= len(parts) <= 3) or not all(x.isdigit() for x in parts):
                return default_ts
            y = int(parts[0])
            mo = int(parts[1]) if len(parts) > 1 else 1
            d = int(parts[2]) if len(parts) > 2 else 1
            datetime(y, mo, d)  # range-validate; ValueError -> default
            return f"{y:04d}-{mo:02d}-{d:02d}T00:00:00"
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is not None:
            dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
        return dt.isoformat()
    except ValueError:
        return default_ts


def sitemap_to_frontier_rows(
    batch: pa.Table, default_ts: str = "2026-01-01T00:00:00"
) -> pa.Table:
    """Project urlset entries onto the crawl frontier schema. lastmod
    (any W3C datetime form; offsets converted to UTC) becomes
    ``warc_ts``; entries without one — or with malformed values — get
    ``default_ts``. Index rows are dropped — they point at sitemaps,
    not pages. Designed for
    ``read_sitemap(...).map_batches(sitemap_to_frontier_rows)``."""
    import pyarrow.compute as pc

    keep = pc.equal(batch.column("kind"), "url")
    t = batch.filter(keep)
    ts = pa.array(
        [_w3c_to_naive_utc(lm, default_ts) for lm in t.column("lastmod").to_pylist()]
    ).cast(pa.timestamp("us"))
    n = t.num_rows
    return pa.table(
        {
            "url": t.column("url"),
            "warc_ts": ts,
            "html": pa.array([b""] * n, pa.binary()),
            "text": pa.array([""] * n, pa.string()),
            "lang": pa.array([""] * n, pa.string()),
        }
    )
