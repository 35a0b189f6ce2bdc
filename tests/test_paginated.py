"""Paginated seed Datasource (S2, apiclient/apiclient.go:178-263):
header-driven page walk + parallel page reads + M18 projection."""

import json
import os

from don_crawler_ray.sources.paginated import (
    generate_paginated_fixture,
    header_int,
    orgs_to_publishers,
    parse_next_page,
    read_paginated_seeds,
    walk_pages,
)


def test_parse_next_page_matrix():
    # mirrors apiclient.go parseNextPage behavior
    assert parse_next_page(None) == 0
    assert parse_next_page("") == 0
    assert parse_next_page('<https://x/a?page=3&perPage=5>; rel="next"') == 3
    # first rel="next" wins; rel="last" ignored
    assert (
        parse_next_page(
            '<https://x/a?page=9>; rel="last", <https://x/a?page=2>; rel="next"'
        )
        == 2
    )
    assert parse_next_page('<https://x/a?page=abc>; rel="next"') == 0
    assert parse_next_page('junk; rel="next"') == 0
    assert parse_next_page('<>; rel="next"') == 0


def test_header_int():
    assert header_int(None) == 0
    assert header_int("") == 0
    assert header_int("7") == 7
    assert header_int("x") == 0


def test_walk_follows_link_then_total_pages(tmp_path):
    d = str(tmp_path / "pages")
    generate_paginated_fixture(d, n_orgs=23, per_page=5)
    pages = walk_pages(d)
    assert pages == [1, 2, 3, 4, 5]  # 23 orgs / 5 per page
    # the decoy page exists but is never visited
    assert os.path.exists(os.path.join(d, "page_6.json"))
    assert 6 not in pages


def test_total_pages_short_circuit(tmp_path):
    d = str(tmp_path / "pages")
    os.makedirs(d)
    # page 1 advertises Total-Pages: 2; page 3 exists but is unreachable
    for page, headers in [(1, {"Total-Pages": "2"}), (2, {"Total-Pages": "2"}), (3, {})]:
        with open(os.path.join(d, f"page_{page}.json"), "w") as f:
            json.dump({"headers": headers, "items": [{"id": f"p{page}", "url": "https://x/y"}]}, f)
    assert walk_pages(d) == [1, 2]


def test_projection_m18():
    t = orgs_to_publishers(
        [
            {"id": "a", "url": "https://h/x"},
            {
                "id": "b",
                "url": "https://h/y",
                "organisation": {"uri": "https://reg/b", "label": "B Org"},
            },
        ]
    )
    assert t.column("id").to_pylist() == ["a", "https://reg/b"]
    assert t.column("name").to_pylist() == ["a", "B Org"]
    assert t.column("organisation_url").to_pylist() == ["", "https://reg/b"]


def test_read_datasource_end_to_end(ray_session, tmp_path):
    d = str(tmp_path / "pages")
    generate_paginated_fixture(d, n_orgs=23, per_page=5)
    ds = read_paginated_seeds(d)
    rows = ds.take_all()
    assert len(rows) == 23
    ids = {r["id"] for r in rows}
    assert "DECOY" not in ids
    # org 0 uses its organisation uri as id (M18 coalesce)
    assert "https://registry.example.nl/orgs/0" in ids
    assert "org-1" in ids
