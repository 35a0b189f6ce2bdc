"""Seed loading / merging / expansion tests (S1, S4, J1, M1 analogs)."""

import pyarrow as pa

from don_crawler_ray.sources.seeds import (
    classify_seeds,
    load_publishers_yaml,
    merge_publishers,
    seed_filter_stage,
    write_publishers_yaml,
)

YAML_SAMPLE = """\
- id: org-1
  name: Org One
  organization: "https://host1.example.nl/"
  repositories:
    - "https://mirror.example.org/org1/repo"
- id: org-2
  name: Org Two
  org_url: "https://host2.example.com/"
"""


def test_load_publishers_yaml(tmp_path):
    p = tmp_path / "publishers.yml"
    p.write_text(YAML_SAMPLE)
    rows = load_publishers_yaml(str(p))
    assert rows[0]["id"] == "org-1"
    assert rows[0]["org_url"] == "https://host1.example.nl/"
    assert rows[0]["repo_urls"] == ["https://mirror.example.org/org1/repo"]
    assert rows[1]["org_url"] == "https://host2.example.com/"


def test_yaml_roundtrip(tmp_path):
    rows = [
        {"id": "a", "name": "A", "org_url": "https://a.example/", "repo_urls": [], "organisation_url": None},
    ]
    path = tmp_path / "out.yml"
    write_publishers_yaml(str(path), rows)
    import yaml

    assert yaml.safe_load(path.read_text())[0]["id"] == "a"


class TestMergePublishers:
    # cmd/download_publishers.go:63-84 semantics
    def test_update_if_matched(self):
        base = [{"id": "x", "name": "X", "org_url": "https://old/"}]
        upd = [{"id": "x", "name": "", "org_url": "https://new/"}]
        merged = merge_publishers(base, upd)
        assert len(merged) == 1
        assert merged[0]["org_url"] == "https://new/"
        assert merged[0]["name"] == "X"

    def test_append_if_absent(self):
        base = [{"id": "x", "name": "X", "org_url": "https://x/"}]
        upd = [{"id": "y", "name": "Y", "org_url": "https://y/"}]
        merged = merge_publishers(base, upd)
        assert [r["id"] for r in merged] == ["x", "y"]

    def test_empty_update_url_keeps_old(self):
        base = [{"id": "x", "name": "X", "org_url": "https://old/"}]
        merged = merge_publishers(base, [{"id": "x", "name": "", "org_url": ""}])
        assert merged[0]["org_url"] == "https://old/"


class TestClassifySeeds:
    def test_supported_and_error_rows(self):
        pubs = [
            {"id": "a", "org_url": "https://h1.example/", "repo_urls": []},
            {"id": "b", "org_url": "ftp://bad.example/", "repo_urls": []},
            {"id": "c", "org_url": "", "repo_urls": []},
        ]
        host_map, errors = classify_seeds(pubs)
        assert host_map == {"h1.example": "a"}
        assert {e["id"] for e in errors} == {"b", "c"}
        assert "unsupported scheme" in errors[0]["error"]

    def test_repo_urls_add_hosts(self):
        pubs = [{"id": "a", "org_url": "https://h1.example/", "repo_urls": ["https://h9.example/x"]}]
        host_map, _ = classify_seeds(pubs)
        assert host_map == {"h1.example": "a", "h9.example": "a"}


def test_seed_filter_stage():
    batch = pa.table(
        {
            "url": ["https://h1.example/a", "https://h2.example/b", "https://h3.example/c"],
            "host": ["h1.example", "h2.example", "h3.example"],
        }
    )
    out = seed_filter_stage({"h1.example": "a", "h3.example": "c"})(batch)
    assert out.column("host").to_pylist() == ["h1.example", "h3.example"]
    assert out.column("publisher_id").to_pylist() == ["a", "c"]
