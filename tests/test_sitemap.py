"""Sitemap source: parse, Ray read, frontier projection, crawl hand-off."""

import pyarrow as pa
import pyarrow.parquet as pq

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://site-a.example/page/1</loc>
       <lastmod>2026-03-04T05:06:07Z</lastmod><priority>0.8</priority></url>
  <url><loc>https://site-a.example/page/2</loc><lastmod>2026-03-05</lastmod></url>
  <url><loc>https://site-b.example/</loc></url>
</urlset>
"""

INDEX = b"""<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://site-a.example/sitemap-1.xml</loc>
           <lastmod>2026-03-01</lastmod></sitemap>
  <sitemap><loc>https://site-a.example/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


class TestParse:
    def test_urlset(self):
        from don_crawler_ray.sources.sitemap import parse_sitemap_bytes

        t = parse_sitemap_bytes(URLSET)
        assert t.column("url").to_pylist() == [
            "https://site-a.example/page/1",
            "https://site-a.example/page/2",
            "https://site-b.example/",
        ]
        assert t.column("lastmod").to_pylist() == [
            "2026-03-04T05:06:07Z", "2026-03-05", None,
        ]
        assert t.column("priority").to_pylist() == [0.8, None, None]
        assert set(t.column("kind").to_pylist()) == {"url"}

    def test_sitemapindex(self):
        from don_crawler_ray.sources.sitemap import parse_sitemap_bytes

        t = parse_sitemap_bytes(INDEX)
        assert t.num_rows == 2
        assert set(t.column("kind").to_pylist()) == {"sitemap"}

    def test_non_sitemap_raises(self):
        import pytest

        from don_crawler_ray.sources.sitemap import parse_sitemap_bytes

        with pytest.raises(ValueError, match="not a sitemap"):
            parse_sitemap_bytes(b"<html/>")


class TestRayRead:
    def test_read_and_frontier_projection(self, ray_session, tmp_path):
        from don_crawler_ray.sources.sitemap import (
            read_sitemap,
            sitemap_to_frontier_rows,
        )

        (tmp_path / "a.xml").write_bytes(URLSET)
        (tmp_path / "b.xml").write_bytes(INDEX)
        ds = read_sitemap([str(tmp_path / "a.xml"), str(tmp_path / "b.xml")])
        t = pa.Table.from_pylist(ds.take_all())
        assert t.num_rows == 5  # 3 urls + 2 child sitemaps

        frontier = ds.map_batches(sitemap_to_frontier_rows, batch_format="pyarrow")
        ft = pa.Table.from_pylist(frontier.take_all())
        assert ft.num_rows == 3  # index rows dropped
        by_url = {
            r["url"]: r for r in ft.to_pylist()
        }
        assert str(by_url["https://site-a.example/page/1"]["warc_ts"]).startswith(
            "2026-03-04 05:06:07"
        )
        assert str(by_url["https://site-a.example/page/2"]["warc_ts"]).startswith(
            "2026-03-05 00:00:00"
        )

    def test_sitemap_seeds_drive_the_crawl(self, ray_session, tmp_path):
        """End-to-end hand-off: sitemap -> frontier parquet -> the
        flagship crawl pipeline schedules and fetches every page."""
        from don_crawler_ray.pipelines.crawl import crawl_dataset
        from don_crawler_ray.sources.sitemap import (
            read_sitemap,
            sitemap_to_frontier_rows,
        )
        from don_crawler_ray.stages.schedule import PolitenessConfig

        (tmp_path / "a.xml").write_bytes(URLSET)
        ds = read_sitemap(str(tmp_path / "a.xml")).map_batches(
            sitemap_to_frontier_rows, batch_format="pyarrow"
        )
        fpath = str(tmp_path / "frontier.parquet")
        pq.write_table(pa.Table.from_pylist(ds.take_all()), fpath)
        out = crawl_dataset(fpath, PolitenessConfig())
        # rows as dicts: url_hash is uint64 (> 2^63), which
        # from_pylist would overflow into int64
        rows = out.take_all()
        assert len(rows) == 3
        assert {r["host"] for r in rows} == {"site-a.example", "site-b.example"}


class TestW3CDatetime:
    def test_forms(self):
        from don_crawler_ray.sources.sitemap import _w3c_to_naive_utc

        D = "2026-01-01T00:00:00"
        assert _w3c_to_naive_utc("2026-03-04T05:06:07Z", D) == "2026-03-04T05:06:07"
        # negative offset converts to UTC (crashed the cast before)
        assert _w3c_to_naive_utc("2026-03-04T05:06:07-05:00", D) == "2026-03-04T10:06:07"
        # positive offset converts (was silently dropped before)
        assert _w3c_to_naive_utc("2026-03-04T05:06:07+02:00", D) == "2026-03-04T03:06:07"
        assert _w3c_to_naive_utc("2026-03-05", D) == "2026-03-05T00:00:00"
        assert _w3c_to_naive_utc("2026-03", D) == "2026-03-01T00:00:00"
        assert _w3c_to_naive_utc("2026", D) == "2026-01-01T00:00:00"
        assert _w3c_to_naive_utc(None, D) == D
        assert _w3c_to_naive_utc("not-a-date", D) == D
        assert _w3c_to_naive_utc("2026-13-40", D) == D

    def test_offset_entries_read_end_to_end(self, ray_session, tmp_path):
        from don_crawler_ray.sources.sitemap import (
            read_sitemap,
            sitemap_to_frontier_rows,
        )

        xml = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://x.example/a</loc>
       <lastmod>2026-03-04T05:06:07-05:00</lastmod>
       <priority>high</priority></url>
</urlset>
"""
        (tmp_path / "s.xml").write_bytes(xml)
        ds = read_sitemap(str(tmp_path / "s.xml"))
        rows = ds.take_all()
        assert rows[0]["priority"] is None  # malformed -> None, no crash
        ft = ds.map_batches(sitemap_to_frontier_rows, batch_format="pyarrow")
        out = ft.take_all()
        assert str(out[0]["warc_ts"]).startswith("2026-03-04 10:06:07")


class TestCliIntegration:
    def test_sitemap_to_frontier_to_crawl_to_warc(self, ray_session, tmp_path):
        """The whole CLI chain in-process: gen-frontier --from-sitemap
        -> crawl --warc-out -> read the archive back."""
        from don_crawler_ray.__main__ import main
        from don_crawler_ray.sources.warc import read_warc

        (tmp_path / "s.xml").write_bytes(URLSET)
        frontier = str(tmp_path / "frontier.parquet")
        rc = main(["gen-frontier", "--out", frontier, "--from-sitemap", str(tmp_path / "s.xml")])
        assert rc == 0
        out = str(tmp_path / "crawl")
        warc = str(tmp_path / "warc")
        rc = main(["crawl", "--frontier", frontier, "--out", out, "--warc-out", warc])
        assert rc == 0
        rows = read_warc(warc).take_all()
        assert {r["target_uri"] for r in rows} == {
            "https://site-a.example/page/1",
            "https://site-a.example/page/2",
            "https://site-b.example/",
        }


class TestW3CProperty:
    def test_never_raises_and_always_castable(self):
        """Any unicode input yields a string pyarrow can cast to
        timestamp[us] — the read task can never die on a lastmod."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from don_crawler_ray.sources.sitemap import _w3c_to_naive_utc

        D = "2026-01-01T00:00:00"

        @settings(max_examples=200, deadline=None)
        @given(st.one_of(st.none(), st.text(max_size=40)))
        def check(lm):
            out = _w3c_to_naive_utc(lm, D)
            pa.array([out]).cast(pa.timestamp("us"))

        check()


class TestWarcExportErrors:
    def test_export_requires_round_partitions(self, ray_session, tmp_path):
        import pytest

        from don_crawler_ray.sources.warc import export_crawl_warc

        with pytest.raises(ValueError, match="no round= partitions"):
            export_crawl_warc(str(tmp_path), str(tmp_path / "w"))
