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


def test_paginated_seeds_drive_frontier_expansion(ray_session, tmp_path):
    """Integration: publishers from the paginated Datasource feed the
    seed classifier and select frontier rows (the full S2 -> M1 ->
    ScanGroupOfRepos chain over local fixtures)."""
    import __ray_entry__ as entrymod

    import ray

    from don_crawler_ray.sources.seeds import classify_seeds, seed_filter_stage
    from don_crawler_ray.stages.canonicalize import canonicalize_stage

    d = str(tmp_path / "pages")
    # orgs pointing at the tiny frontier's hosts
    import json as _json
    import os as _os

    from don_crawler_ray.sources.frontier import host_name

    _os.makedirs(d)
    items = [{"id": f"org-{i}", "url": f"https://{host_name(i)}/"} for i in range(4)]
    with open(_os.path.join(d, "page_1.json"), "w") as f:
        _json.dump({"headers": {}, "items": items}, f)

    pubs = read_paginated_seeds(d).take_all()
    host_map, errors = classify_seeds(pubs)
    assert not errors and len(host_map) == 4

    ds = ray.data.read_parquet(entrymod._frontier_path("tiny"), columns=["url", "warc_ts"])
    ds = ds.map_batches(canonicalize_stage, batch_format="pyarrow")
    ds = ds.map_batches(seed_filter_stage(host_map), batch_format="pyarrow")
    rows = ds.take_all()
    assert len(rows) > 0
    assert {r["publisher_id"] for r in rows} <= {f"org-{i}" for i in range(4)}


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
