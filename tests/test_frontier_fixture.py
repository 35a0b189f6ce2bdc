"""Generator determinism + fixture-property tests (FIXTURES.md F1-F3),
and the golden invariant: ``extract_text(html) == text`` for every row.
"""

import numpy as np
import pyarrow.parquet as pq

from don_crawler_ray.functions.extract import extract_text
from don_crawler_ray.functions.urlnorm import canonicalize_url, url_host
from don_crawler_ray.sources.frontier import (
    gen_rows,
    generate_politeness,
    generate_seeds,
)


def test_batch_independence():
    """Rows are pure functions of (seed, index): one big batch equals
    the concatenation of arbitrary sub-batches."""
    whole = gen_rows(42, 0, 300, 20)
    parts = [gen_rows(42, 0, 17, 20), gen_rows(42, 17, 150, 20), gen_rows(42, 150, 300, 20)]
    import pyarrow as pa

    joined = pa.concat_tables(parts)
    assert whole.equals(joined)


def test_seed_changes_output():
    assert not gen_rows(42, 0, 50, 20).equals(gen_rows(43, 0, 50, 20))


def test_schema(frontier_tiny):
    t = pq.read_table(frontier_tiny)
    assert [f.name for f in t.schema] == ["url", "warc_ts", "html", "text", "lang"]
    assert str(t.schema.field("warc_ts").type) == "timestamp[us]"
    assert str(t.schema.field("html").type) == "binary"
    assert t.num_rows == 1000


def test_golden_extraction_invariant(frontier_tiny):
    """The pipeline extractor must reproduce the generator's structural
    expectation byte-for-byte on every row — the per-url invariant."""
    t = pq.read_table(frontier_tiny)
    htmls = t.column("html").to_pylist()
    texts = t.column("text").to_pylist()
    for h, want in zip(htmls, texts):
        assert extract_text(h) == want


def test_duplicate_rate_and_collapse(frontier_tiny):
    t = pq.read_table(frontier_tiny)
    urls = t.column("url").to_pylist()
    canon = [canonicalize_url(u) for u in urls]
    n_unique = len(set(canon))
    dup_rate = 1 - n_unique / len(urls)
    assert 0.04 < dup_rate < 0.16  # ~10% duplicates under canonicalization
    # raw strings are (almost) all distinct — dups come from canonicalization
    assert len(set(urls)) > n_unique


def test_host_skew(frontier_tiny):
    t = pq.read_table(frontier_tiny)
    hosts = [url_host(u) for u in t.column("url").to_pylist()]
    top = max(set(hosts), key=hosts.count)
    frac = hosts.count(top) / len(hosts)
    assert top.startswith("host0.")
    assert 0.4 < frac < 0.6  # mega-host holds ~50%


def test_warc_ts_range(frontier_tiny):
    t = pq.read_table(frontier_tiny)
    ts = t.column("warc_ts").to_numpy()
    assert ts.min() >= np.datetime64("2024-01-01")
    assert ts.max() < np.datetime64("2026-01-01")


def test_seeds_table():
    s = generate_seeds(42, 20)
    ids = s.column("id").to_pylist()
    assert len(ids) == 22  # min(25, n_hosts)=20 publishers + bad-scheme + dup-id
    assert ids.count("org-0") == 2  # upsert pair
    assert "org-bad" in ids
    urls = s.column("org_url").to_pylist()
    assert any(u.startswith("ftp://") for u in urls)


def test_politeness_table():
    p = generate_politeness(42, 20)
    assert p.num_rows == 20
    robots = p.column("robots_txt").to_pylist()
    assert robots[1] is None  # 404 host
    assert robots[2] == "__503__"
    assert any(r and "Disallow: /b" in r for r in robots)
    assert (np.array(p.column("max_concurrent").to_pylist()) >= 1).all()
