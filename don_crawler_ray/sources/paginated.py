"""Paginated seed source as a custom Ray Data ``Datasource`` (S2).

The reference walks its seed API page by page
(``apiclient/apiclient.go:178-263``): request ``?page=N&perPage=100``,
then decide the next page from the response headers —

1. a ``Link: <...?page=M>; rel="next"`` header with ``M > N`` wins
   (``parseNextPage``, ``apiclient/apiclient.go:360-391``);
2. else a positive ``Total-Pages`` header short-circuits while
   ``N < Total-Pages`` (``headerInt``, ``:393-401``);
3. else stop.

No network exists in this sandbox, so the "API" is a local chunked
fixture directory of ``page_N.json`` files carrying the same headers
and org rows. The page WALK (headers only — the pagination state) runs
at plan time on the driver, exactly as a real deployment would probe
page links; the page BODIES are then read in parallel ``ReadTask``s,
one per page, each projecting orgs to publisher rows (M18,
``apiclient/apiclient.go:208-240``).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc


def parse_next_page(link_header: str | None) -> int:
    """Port of ``parseNextPage`` (``apiclient/apiclient.go:360-391``):
    the ``page`` query param of the first ``rel="next"`` link, else 0."""
    if not link_header:
        return 0
    from urllib.parse import parse_qs, urlsplit

    for part in link_header.split(","):
        if 'rel="next"' not in part:
            continue
        start, end = part.find("<"), part.find(">")
        if start == -1 or end == -1 or end <= start + 1:
            continue
        link = part[start + 1 : end].strip()
        try:
            qs = parse_qs(urlsplit(link).query)
        except ValueError:
            continue
        vals = qs.get("page")
        if not vals:
            continue
        try:
            return int(vals[0])
        except ValueError:
            continue
    return 0


def header_int(val: str | None) -> int:
    """Port of ``headerInt`` (``apiclient/apiclient.go:393-401``)."""
    if not val:
        return 0
    try:
        return int(val)
    except ValueError:
        return 0


PUBLISHER_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("org_url", pa.string()),
        ("organisation_url", pa.string()),
    ]
)


def org_uri(organisation_url: str, org_url: str) -> str:
    """M16 — org-URI coalesce: the publisher's organisation URL when
    set, else the organization's own URL string (``orgURI``,
    ``crawler/crawler.go:740-746``)."""
    return organisation_url if organisation_url else org_url


def publisher_org_uris(publishers: pa.Table) -> pa.Table:
    """Vectorized M16 over a publishers table: appends ``org_uri`` =
    coalesce(organisation_url, org_url) (empty string counts as
    missing, matching the Go ``!= ""`` check)."""
    ou = publishers.column("organisation_url")
    base = publishers.column("org_url")
    missing = pc.or_kleene(pc.is_null(ou), pc.equal(ou, ""))
    return publishers.append_column("org_uri", pc.if_else(missing, base, ou))


def orgs_to_publishers(orgs: list[dict]) -> pa.Table:
    """M18 org -> Publisher projection (``apiclient/apiclient.go:208-240``):
    id = organisation.uri ?? org.id; name = organisation.label ?? org.id;
    org_url = org.url; organisation_url = organisation.uri ?? ""."""
    ids, names, urls, org_uris = [], [], [], []
    for org in orgs:
        organisation = org.get("organisation") or {}
        uri = organisation.get("uri") or ""
        label = organisation.get("label") or ""
        ids.append(uri if uri else org.get("id", ""))
        names.append(label if label else org.get("id", ""))
        urls.append(org.get("url", "") or "")
        org_uris.append(uri)
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "org_url": pa.array(urls, pa.string()),
            "organisation_url": pa.array(org_uris, pa.string()),
        }
    )


def _page_path(fixture_dir: str, page: int) -> str:
    return os.path.join(fixture_dir, f"page_{page}.json")


def _read_page(fixture_dir: str, page: int) -> dict:
    with open(_page_path(fixture_dir, page)) as f:
        return json.load(f)


def walk_pages(fixture_dir: str, start_page: int = 1, max_pages: int = 100_000) -> list[int]:
    """The reference's pagination loop over the fixture's headers."""
    pages: list[int] = []
    page = start_page
    while len(pages) < max_pages:
        if not os.path.exists(_page_path(fixture_dir, page)):
            break
        pages.append(page)
        headers = _read_page(fixture_dir, page).get("headers", {})
        next_page = parse_next_page(headers.get("Link"))
        total_pages = header_int(headers.get("Total-Pages"))
        if next_page > page:
            page = next_page
        elif total_pages > 0 and page < total_pages:
            page += 1
        else:
            break
    return pages


class PaginatedSeedDatasource:
    """``ray.data.read_datasource`` source over the paginated fixture.

    Plan time walks the page chain (headers only); execution reads page
    bodies in parallel, one block per page.
    """

    def __init__(self, fixture_dir: str):
        self._dir = fixture_dir
        self._pages = walk_pages(fixture_dir)

    def get_name(self) -> str:
        return "PaginatedSeeds"

    def estimate_inmemory_data_size(self):
        return sum(os.path.getsize(_page_path(self._dir, p)) for p in self._pages)

    def get_read_tasks(self, parallelism: int):
        from ray.data.block import BlockMetadata
        from ray.data.datasource.datasource import ReadTask

        fixture_dir = self._dir
        tasks = []
        for page in self._pages:
            path = _page_path(fixture_dir, page)

            def _read(page=page):
                body = _read_page(fixture_dir, page)
                yield orgs_to_publishers(body.get("items", []))

            meta = BlockMetadata(
                num_rows=None,
                size_bytes=os.path.getsize(path),
                exec_stats=None,
                input_files=[path],
            )
            tasks.append(ReadTask(_read, meta))
        return tasks


# Ray's Datasource ABC is mixed in lazily so importing this module does
# not import ray.data (library modules must not own a Ray session).
def make_datasource(fixture_dir: str):
    from ray.data.datasource import Datasource

    cls = type("PaginatedSeedDatasourceImpl", (PaginatedSeedDatasource, Datasource), {})
    return cls(fixture_dir)


def read_paginated_seeds(fixture_dir: str):
    """``ray.data.Dataset`` of publisher rows from the chunked fixture."""
    import ray

    return ray.data.read_datasource(make_datasource(fixture_dir))


def generate_paginated_fixture(
    fixture_dir: str, n_orgs: int = 23, per_page: int = 5, seed: int = 42
) -> str:
    """Deterministic chunked fixture exercising all three stop rules:
    early pages advertise ``Link rel="next"``, middle pages only
    ``Total-Pages``, and the final page neither. A decoy page BEYOND
    Total-Pages exists on disk and must never be read."""
    os.makedirs(fixture_dir, exist_ok=True)
    n_pages = max(1, (n_orgs + per_page - 1) // per_page)
    for page in range(1, n_pages + 1):
        lo, hi = (page - 1) * per_page, min(page * per_page, n_orgs)
        items = []
        for i in range(lo, hi):
            org = {"id": f"org-{i}", "url": f"https://host{i % 7}.example.nl/org{i}"}
            if i % 3 == 0:
                org["organisation"] = {
                    "uri": f"https://registry.example.nl/orgs/{i}",
                    "label": f"Organisatie {i}",
                }
            items.append(org)
        headers: dict[str, str] = {}
        if page < n_pages and page % 2 == 1:
            headers["Link"] = (
                f'<https://api.example.nl/git-organisations?page={page + 1}&perPage={per_page}>; rel="next"'
            )
        elif page < n_pages:
            headers["Total-Pages"] = str(n_pages)
        with open(_page_path(fixture_dir, page), "w") as f:
            json.dump({"headers": headers, "items": items}, f, sort_keys=True)
    # decoy past the chain's end: following headers must stop before it
    with open(_page_path(fixture_dir, n_pages + 1), "w") as f:
        json.dump(
            {"headers": {}, "items": [{"id": "DECOY", "url": "https://decoy.example/x"}]},
            f,
        )
    return fixture_dir
