"""End-to-end crawl pipeline tests: correctness, determinism across
parallelism, checkpoint/resume, counters, seen-set equality.
"""

import os

import numpy as np
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from don_crawler_ray.functions.urlnorm import canonicalize_url, url_host
from don_crawler_ray.pipelines.crawl import (
    crawl_dataset,
    crawl_output_table,
    run_crawl,
    seen_set_hashes,
)
from don_crawler_ray.sources.frontier import generate_politeness
from don_crawler_ray.stages.schedule import PolitenessConfig


@pytest.fixture(scope="module")
def politeness_cfg():
    return PolitenessConfig.from_table(generate_politeness(42, 20))


def _expected_sets(frontier_path):
    t = pq.read_table(frontier_path)
    rows = list(
        zip(
            t.column("url").to_pylist(),
            t.column("warc_ts").to_pylist(),
            t.column("text").to_pylist(),
        )
    )
    by_canon = {}
    for url, ts, text in rows:
        c = canonicalize_url(url)
        key = (ts, c)
        if c not in by_canon or key < by_canon[c][0]:
            by_canon[c] = (key, text)
    return by_canon


class TestCrawlDataset:
    def test_end_to_end_text_bytes(self, ray_session, frontier_tiny, politeness_cfg):
        """Byte-identical extracted text per url vs the independent
        golden column, after dedup + robots filtering."""
        ds = crawl_dataset(frontier_tiny, politeness_cfg)
        out = {r["canonical_url"]: r["text"] for r in ds.take_all()}
        expected = _expected_sets(frontier_tiny)

        assert len(out) > 0
        # every output url is a known canonical url with exactly the golden text
        for url, text in out.items():
            assert text == expected[url][1], url
        # no duplicates possible: dict keys unique; verify robots-denied rows excluded
        for url in out:
            host = url_host(url)
            path = url.split(host, 1)[1]
            idx = int(host.split(".")[0].removeprefix("host"))
            if idx % 4 == 3:
                assert not (path.startswith("/b") or path.startswith("/c"))
            assert idx != 2  # 503-robots host -> deny all

    def test_round0_budget_respected(self, ray_session, frontier_tiny, politeness_cfg):
        ds = crawl_dataset(frontier_tiny, politeness_cfg)
        hosts = [r["host"] for r in ds.select_columns(["host"]).take_all()]
        budgets = {
            row["host"]: row["per_round_budget"]
            for row in generate_politeness(42, 20).to_pylist()
        }
        import collections

        for host, n in collections.Counter(hosts).items():
            assert n <= budgets[host], host


class TestRunCrawl:
    def test_full_run_counters_and_output(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        out_dir = str(tmp_path / "crawl_out")
        counters = run_crawl(
            frontier_tiny, out_dir, politeness_cfg, n_seen_shards=2, n_salts=4
        )
        assert counters["fetched"] == counters["scheduled"]
        assert counters["dedup_hit"] > 0
        assert counters["robots_denied"] > 0
        assert counters["seen_set_size"] == counters["scheduled"]
        assert counters["rounds"] >= 1

        table = crawl_output_table(out_dir)
        assert table.num_rows == counters["fetched"]
        expected = _expected_sets(frontier_tiny)
        for url, text in zip(
            table.column("canonical_url").to_pylist(), table.column("text").to_pylist()
        ):
            assert text == expected[url][1]

        # seen set == exactly the scheduled canonical hashes
        seen = seen_set_hashes(out_dir)
        sched_hashes = np.sort(
            np.unique(table.column("url_hash").to_numpy(zero_copy_only=False))
        )
        assert np.array_equal(seen, sched_hashes)

    def test_resume_after_partial_run(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        full_dir = str(tmp_path / "full")
        run_crawl(frontier_tiny, full_dir, politeness_cfg, n_seen_shards=2, n_salts=4)

        part_dir = str(tmp_path / "partial")
        run_crawl(
            frontier_tiny, part_dir, politeness_cfg, n_seen_shards=2, n_salts=4,
            max_rounds=1,
        )
        resumed = run_crawl(
            frontier_tiny, part_dir, politeness_cfg, n_seen_shards=2, n_salts=4,
            resume=True,
        )
        t_full = crawl_output_table(full_dir)
        t_resumed = crawl_output_table(part_dir)
        assert t_full.num_rows == t_resumed.num_rows
        assert t_full.column("canonical_url").equals(t_resumed.column("canonical_url"))
        assert t_full.column("text").equals(t_resumed.column("text"))
        assert np.array_equal(seen_set_hashes(full_dir), seen_set_hashes(part_dir))
        assert resumed["fetched"] == t_full.num_rows

    def test_resume_after_crash_between_snapshot_and_manifest(
        self, ray_session, frontier_tiny, politeness_cfg, tmp_path
    ):
        """The commit sequence per round is: round output lands -> seen
        shards ingest + snapshot -> manifest appended LAST. Simulate a
        crash in the window after the snapshot but before the manifest
        write (round dir AND seen snapshot on disk, manifest missing
        the round): resume must re-fetch the round idempotently —
        stale output replaced, seen re-ingest a set-semantics no-op —
        and converge to byte-identical output and seen set."""
        import json

        full_dir = str(tmp_path / "full")
        run_crawl(frontier_tiny, full_dir, politeness_cfg, n_seen_shards=2, n_salts=4)

        crash_dir = str(tmp_path / "crash")
        run_crawl(frontier_tiny, crash_dir, politeness_cfg, n_seen_shards=2, n_salts=4)
        mpath = os.path.join(crash_dir, "manifest.json")
        with open(mpath) as f:
            manifest = json.load(f)
        assert manifest["completed_rounds"], "fixture crawl produced no rounds"
        dropped = manifest["completed_rounds"].pop()  # crash: append never happened
        # the crashed process never wrote this round's counters either —
        # rewind fetched to what the previous round's manifest recorded
        drop_dir = os.path.join(crash_dir, f"round={dropped}")
        assert os.path.isdir(drop_dir)
        dropped_rows = sum(
            pq.ParquetFile(os.path.join(drop_dir, f)).metadata.num_rows
            for f in os.listdir(drop_dir)
            if f.endswith(".parquet")
        )
        manifest["counters"]["fetched"] -= dropped_rows
        with open(mpath, "w") as f:
            json.dump(manifest, f)

        resumed = run_crawl(
            frontier_tiny, crash_dir, politeness_cfg, n_seen_shards=2, n_salts=4,
            resume=True,
        )
        t_full = crawl_output_table(full_dir)
        t_crash = crawl_output_table(crash_dir)
        assert t_full.column("canonical_url").equals(t_crash.column("canonical_url"))
        assert t_full.column("text").equals(t_crash.column("text"))
        assert np.array_equal(seen_set_hashes(full_dir), seen_set_hashes(crash_dir))
        assert resumed["fetched"] == t_full.num_rows

    def test_schedule_order_deterministic(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        """Two independent runs produce identical (round, host, rank,
        url) crawl order — the reproducible-ordering criterion."""
        d1 = str(tmp_path / "a")
        d2 = str(tmp_path / "b")
        run_crawl(frontier_tiny, d1, politeness_cfg, n_seen_shards=2, n_salts=4)
        run_crawl(frontier_tiny, d2, politeness_cfg, n_seen_shards=2, n_salts=4)
        import pyarrow.dataset as pads

        def order(d):
            t = pads.dataset(os.path.join(d, "schedule")).to_table(
                columns=["round", "host", "rank", "canonical_url", "status"],
                filter=pads.field("status") == "scheduled",
            )
            return t.take(
                pc.sort_indices(
                    t,
                    sort_keys=[
                        ("host", "ascending"),
                        ("round", "ascending"),
                        ("rank", "ascending"),
                    ],
                )
            )

        o1, o2 = order(d1), order(d2)
        assert o1.column("canonical_url").equals(o2.column("canonical_url"))
        assert o1.column("rank").equals(o2.column("rank"))


class TestSingleUrlCrawl:
    """crawl-software single-URL mode (crawler/crawler.go:106-153)."""

    def test_fetch_one(self, ray_session, frontier_tiny, politeness_cfg):
        import pyarrow.parquet as pq

        from don_crawler_ray.pipelines.crawl import crawl_single_url

        t = pq.read_table(frontier_tiny)
        url = t.column("url")[0].as_py()
        want_text = t.column("text")[0].as_py()
        out = crawl_single_url(url + ".git", frontier_tiny, politeness_cfg)
        assert out.column("status").to_pylist() == ["fetched"]
        assert out.column("text").to_pylist() == [want_text]

    def test_not_found(self, ray_session, frontier_tiny, politeness_cfg):
        from don_crawler_ray.pipelines.crawl import crawl_single_url

        out = crawl_single_url("https://nowhere.example/xyz", frontier_tiny, politeness_cfg)
        assert out.column("status").to_pylist() == ["not_found"]

    def test_robots_denied(self, ray_session, frontier_tiny, politeness_cfg):
        from don_crawler_ray.pipelines.crawl import crawl_single_url
        from don_crawler_ray.sources.frontier import host_name

        # hosts with idx % 4 == 3 disallow /b*; host3 qualifies
        host = host_name(3)
        out = crawl_single_url(f"https://{host}/bad/path", frontier_tiny, politeness_cfg)
        assert out.column("status").to_pylist() == ["robots_denied"]


class TestIncrementalCrawl:
    """ST6 clone-once / fetch-on-revisit: a second crawl restoring the
    first run's seen set skips every already-fetched URL."""

    def test_revisit_skip(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        from don_crawler_ray.pipelines.crawl import run_crawl

        first = str(tmp_path / "first")
        c1 = run_crawl(frontier_tiny, first, politeness_cfg, n_seen_shards=2, n_salts=4)
        assert c1["revisit_skipped"] == 0

        second = str(tmp_path / "second")
        c2 = run_crawl(
            frontier_tiny, second, politeness_cfg, n_seen_shards=2, n_salts=4,
            seen_restore_dir=os.path.join(first, "seen"),
        )
        # every canonical URL was already seen: nothing scheduled,
        # everything skipped or non-schedulable
        assert c2["fetched"] == 0
        assert c2["scheduled"] == 0
        assert c2["revisit_skipped"] > 0
        # skipped rows = all rows whose canonical hash was committed
        assert c2["revisit_skipped"] + c2["robots_denied"] + c2["dedup_hit"] == c2["frontier_rows"]


class TestBucketKernelEquivalence:
    """The vectorized multi-host bucket kernel must reproduce the
    single-host reference kernel's schedule exactly, for any bucket
    count (bucketing only changes co-location, never content)."""

    @pytest.mark.parametrize("n_buckets", [1, 7, 64])
    def test_matches_single_host_kernel(self, ray_session, frontier_tiny, politeness_cfg, n_buckets):
        import pyarrow as pa
        import pyarrow.parquet as pq2

        from don_crawler_ray.stages.canonicalize import canonicalize_slim_stage
        from don_crawler_ray.stages.schedule import (
            add_salt_stage,
            make_schedule_bucket_fn,
            make_schedule_group_fn,
        )

        n_salts = 4
        hot = frozenset({"host0.example.nl"})
        raw = pq2.read_table(frontier_tiny, columns=["url", "warc_ts"])
        slim = canonicalize_slim_stage(raw)
        salted = add_salt_stage(n_salts, hot, n_buckets=n_buckets)(slim)

        bucket_fn = make_schedule_bucket_fn(politeness_cfg, n_salts, hot)
        group_fn = make_schedule_group_fn(politeness_cfg, n_salts, hot)

        parts = []
        for b in sorted(set(salted.column("bucket").to_pylist())):
            parts.append(bucket_fn(salted.filter(pc.equal(salted.column("bucket"), b))))
        got = pa.concat_tables(parts)

        want_parts = []
        keys = sorted(
            set(
                zip(
                    salted.column("host_key").to_pylist(),
                    salted.column("salt").to_pylist(),
                )
            )
        )
        for hk, s in keys:
            sel = pc.and_(
                pc.equal(salted.column("host_key"), hk),
                pc.equal(salted.column("salt"), s),
            )
            want_parts.append(group_fn(salted.filter(sel)))
        want = pa.concat_tables(want_parts)

        sort_keys = [("host_key", "ascending"), ("canonical_url", "ascending"), ("warc_ts", "ascending"), ("raw_hash", "ascending")]
        got = got.take(pc.sort_indices(got, sort_keys=sort_keys))
        want = want.take(pc.sort_indices(want, sort_keys=sort_keys))
        assert got.num_rows == want.num_rows
        for col in want.column_names:
            assert got.column(col).combine_chunks().equals(
                want.column(col).combine_chunks()
            ), col


class TestMembershipChunks:
    """Round membership is broadcast in byte-bounded chunks (the
    round-membership scale fix): an artificially tiny budget forces one
    chunk per round and must reproduce byte-identical output."""

    def test_tiny_budget_byte_identical(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        base = str(tmp_path / "base")
        chunked = str(tmp_path / "chunked")
        run_crawl(frontier_tiny, base, politeness_cfg, n_seen_shards=2, n_salts=4)
        c = run_crawl(
            frontier_tiny, chunked, politeness_cfg, n_seen_shards=2, n_salts=4,
            membership_byte_budget=64,  # a few keys per chunk
        )
        t_base = crawl_output_table(base)
        t_chunked = crawl_output_table(chunked)
        assert t_base.column("canonical_url").equals(t_chunked.column("canonical_url"))
        assert t_base.column("text").equals(t_chunked.column("text"))
        assert np.array_equal(seen_set_hashes(base), seen_set_hashes(chunked))
        assert c["fetched"] == t_base.num_rows

    def test_distributed_membership_matches_driver_build(
        self, ray_session, frontier_tiny, politeness_cfg, tmp_path, monkeypatch
    ):
        """The radix-parallel membership build must be byte-identical to
        the serial driver build (keys, aligned rounds, raw prefilter
        keys) — forced onto the distributed path by zeroing the
        small-schedule threshold."""
        import don_crawler_ray.pipelines.crawl as crawl_mod
        from don_crawler_ray.pipelines.crawl import (
            build_chunk_membership,
            load_rounds_table,
        )
        from don_crawler_ray.stages.fetch import (
            make_raw_prefilter_keys,
            make_rounds_membership,
        )

        out_dir = str(tmp_path / "sched_dist")
        run_crawl(frontier_tiny, out_dir, politeness_cfg, n_seen_shards=2, n_salts=4)
        schedule_dir = os.path.join(out_dir, "schedule")
        rt = load_rounds_table(schedule_dir, [0])
        keys_d, rounds_d = make_rounds_membership(rt)
        raw_d = make_raw_prefilter_keys(rt)

        monkeypatch.setattr(crawl_mod, "_SMALL_SCHEDULE_BYTES", 0)
        n, keys, rounds, raw = build_chunk_membership(
            schedule_dir, [0], n_buckets=4, fragments_per_task=1
        )
        assert n == rt.num_rows
        assert np.array_equal(keys, keys_d)
        assert np.array_equal(rounds, rounds_d)
        assert np.array_equal(raw, raw_d)

    def test_fragment_stats_match_serial(
        self, ray_session, frontier_tiny, politeness_cfg, tmp_path, monkeypatch
    ):
        """schedule_fragment_stats' distributed path must agree with its
        serial body (and with direct pushdown reads)."""
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        import don_crawler_ray.pipelines.crawl as crawl_mod
        from don_crawler_ray.pipelines.crawl import schedule_fragment_stats

        out_dir = str(tmp_path / "sched_stats")
        run_crawl(frontier_tiny, out_dir, politeness_cfg, n_seen_shards=2, n_salts=4)
        schedule_dir = os.path.join(out_dir, "schedule")
        serial = schedule_fragment_stats(schedule_dir)
        monkeypatch.setattr(crawl_mod, "_SMALL_SCHEDULE_BYTES", 0)
        dist = schedule_fragment_stats(schedule_dir)
        assert serial == dist
        t = pads.dataset(schedule_dir).to_table(columns=["status", "round"])
        assert serial[0] == pc.max(t.column("round")).as_py()
        assert sum(serial[1].values()) == t.num_rows

    def test_plan_round_chunks_budget(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        from don_crawler_ray.pipelines.crawl import plan_round_chunks

        out_dir = str(tmp_path / "sched")
        run_crawl(frontier_tiny, out_dir, politeness_cfg, n_seen_shards=2, n_salts=4)
        schedule_dir = os.path.join(out_dir, "schedule")
        import pyarrow.dataset as pads

        rounds = sorted(
            set(
                pads.dataset(schedule_dir)
                .to_table(columns=["round"], filter=pads.field("status") == "scheduled")
                .column("round")
                .to_pylist()
            )
        )
        one = plan_round_chunks(schedule_dir, rounds, 1 << 30)
        assert one == [rounds]  # everything fits one chunk
        tiny = plan_round_chunks(schedule_dir, rounds, 1)
        assert [r for chunk in tiny for r in chunk] == rounds  # order kept
        assert all(len(chunk) == 1 for chunk in tiny)


def test_task_fn_matches_actor_path(ray_session, frontier_tiny):
    """The fused task-pool extract fn must produce the same table as the
    stateful actor path for the same membership arrays (it shares the
    actor's __call__ body; this pins the per-process cache plumbing)."""
    import pyarrow as pa

    from don_crawler_ray.stages.canonicalize import canonicalize_stage
    from don_crawler_ray.stages.fetch import (
        FetchExtractActor,
        _schedule_keys,
        make_fetch_extract_fn,
    )

    batch = canonicalize_stage(
        pq.read_table(frontier_tiny, columns=["url", "warc_ts", "html"]).slice(0, 200)
    )
    # schedule half the rows across two fake rounds
    sched = batch.slice(0, 100).select(["url_hash", "raw_hash", "warc_ts"])
    keys = _schedule_keys(sched)
    order = np.argsort(keys, kind="stable")
    rounds = (np.arange(100) % 2).astype(np.int32)
    import ray

    members_ref = ray.put(keys[order])
    rounds_ref = ray.put(rounds[order])

    actor_out = FetchExtractActor(members_ref, rounds_ref, scanner="auto")(batch)
    fn_out = make_fetch_extract_fn(members_ref, rounds_ref, scanner="auto")(batch)
    assert actor_out.num_rows == 100
    assert actor_out.equals(fn_out)


class TestFetchTieBreak:
    """Two distinct raw URLs canonicalizing to the same canonical URL
    with an identical warc_ts must yield ONE output row (the raw-hash
    membership tie-break; ADVICE r01 item 4)."""

    def test_single_winner(self, ray_session, tmp_path):
        import pyarrow as pa

        ts = pa.array([1_000_000, 1_000_000, 2_000_000], pa.timestamp("us"))
        frontier = pa.table(
            {
                # first two canonicalize to http://h0.example/a
                "url": pa.array(
                    [
                        "http://h0.example/a",
                        "HTTP://H0.example:80/x/../a",
                        "http://h0.example/b",
                    ]
                ),
                "warc_ts": ts,
                "html": pa.array([b"<p>A</p>", b"<p>B</p>", b"<p>C</p>"], pa.binary()),
                "text": pa.array(["A", "B", "C"]),
                "lang": pa.array(["en", "en", "en"]),
            }
        )
        path = str(tmp_path / "tie.parquet")
        pq.write_table(frontier, path)
        out_dir = str(tmp_path / "out")
        counters = run_crawl(path, out_dir, PolitenessConfig(), n_seen_shards=2, n_salts=1)
        table = crawl_output_table(out_dir)
        urls = table.column("canonical_url").to_pylist()
        assert counters["fetched"] == 2
        assert sorted(urls) == ["http://h0.example/a", "http://h0.example/b"]
        assert len(urls) == len(set(urls))  # no duplicate despite the ts tie


class TestRepoMetaFilter:
    """M9 fork detector + M6 private/archived filter wired into the
    schedule pass (scanner/github.go:198-200, 373-375): flagged repos
    never reach the shuffle, the rest crawl unchanged."""

    def test_flagged_repos_skipped(self, ray_session, frontier_tiny, politeness_cfg, tmp_path):
        from don_crawler_ray.sources.frontier import generate_repo_meta, repo_meta_skip_hashes

        meta = generate_repo_meta(frontier_tiny)
        skip = repo_meta_skip_hashes(meta)
        assert len(skip) > 0  # fixture flags a real subset

        base = str(tmp_path / "base")
        run_crawl(frontier_tiny, base, politeness_cfg, n_seen_shards=2, n_salts=4)
        filtered = str(tmp_path / "filtered")
        c = run_crawl(
            frontier_tiny, filtered, politeness_cfg, n_seen_shards=2, n_salts=4,
            skip_hashes=skip,
        )
        t_base = crawl_output_table(base)
        t_filt = crawl_output_table(filtered)
        skip_set = set(skip.tolist())
        base_hashes = t_base.column("url_hash").to_numpy(zero_copy_only=False)
        filt_hashes = set(t_filt.column("url_hash").to_numpy(zero_copy_only=False).tolist())
        # no flagged repo in the filtered output
        assert not (filt_hashes & skip_set)
        # every unflagged base row survives untouched
        expected = {int(h) for h in base_hashes if int(h) not in skip_set}
        assert filt_hashes == expected
        assert c["fetched"] == len(expected)


def test_plugin_scanner_by_name_distributed(ray_session, frontier_tiny, politeness_cfg):
    """A user scanner registered BY NAME on the driver must work under
    real distributed map_batches (ADVICE/VERDICT r03: a fresh worker
    registry only self-registers builtins, so ``portable_scanner``
    resolves the name to its factory at stage construction). The class
    is defined locally so serialization must go by value — exactly the
    plug-in-from-a-user-script case."""
    from don_crawler_ray import registry

    import pyarrow as pa

    class UpperHtml(registry.HtmlScanner):
        name = "upper-html"

        def extract(self, batch: pa.Table) -> pa.Table:
            out = super().extract(batch)
            return out.set_column(
                out.column_names.index("text"),
                "text",
                pc.utf8_upper(out.column("text")),
            )

    registry.register_scanner("upper-html", UpperHtml)
    try:
        base = {
            r["canonical_url"]: r["text"]
            for r in crawl_dataset(frontier_tiny, politeness_cfg).take_all()
        }
        got = {
            r["canonical_url"]: r["text"]
            for r in crawl_dataset(
                frontier_tiny, politeness_cfg, scanner="upper-html", extract_concurrency=2
            ).take_all()
        }
        assert got and set(got) == set(base)
        for url, text in got.items():
            assert text == base[url].upper()
    finally:
        registry._REGISTRY.pop("upper-html", None)

    # a user plug-in REPLACING a builtin name (latest-wins contract)
    # must also reach workers — shipping the bare name would silently
    # run the builtin from the worker's fresh registry
    registry.register_scanner("html", UpperHtml)
    try:
        overridden = {
            r["canonical_url"]: r["text"]
            for r in crawl_dataset(
                frontier_tiny, politeness_cfg, scanner="html", extract_concurrency=2
            ).take_all()
        }
        assert set(overridden) == set(base)
        for url, text in overridden.items():
            assert text == base[url].upper()
    finally:
        registry._REGISTRY["html"] = registry._BUILTIN_FACTORIES["html"]


def test_crawl_dataset_size_gate(ray_session, frontier_tiny, politeness_cfg, monkeypatch):
    """crawl_dataset materializes the schedule on the driver; a frontier
    above the gate must be rejected with a pointer to run_crawl."""
    from don_crawler_ray.pipelines import crawl as crawl_mod

    monkeypatch.setattr(crawl_mod, "CRAWL_DATASET_MAX_ROWS", 10)
    with pytest.raises(ValueError, match="run_crawl"):
        crawl_dataset(frontier_tiny, politeness_cfg)


def test_crawl_output_table_size_gate(ray_session, frontier_tiny, politeness_cfg, tmp_path):
    """crawl_output_table concatenates every round on the driver; the
    same cap as crawl_dataset must reject a large output (checked via
    parquet metadata before any data is read) — explicit max_rows
    overrides for tests."""
    out_dir = str(tmp_path / "gate_out")
    run_crawl(frontier_tiny, out_dir, politeness_cfg, n_seen_shards=2, n_salts=4)
    with pytest.raises(ValueError, match="Dataset instead"):
        crawl_output_table(out_dir, max_rows=10)
    t = crawl_output_table(out_dir)  # default cap admits the tiny run
    assert t.num_rows > 10


def test_restore_shard_count_mismatch(ray_session, frontier_tiny, politeness_cfg, tmp_path):
    first = str(tmp_path / "first")
    run_crawl(frontier_tiny, first, politeness_cfg, n_seen_shards=2, n_salts=4)
    with pytest.raises(ValueError, match="shards"):
        run_crawl(
            frontier_tiny, str(tmp_path / "second"), politeness_cfg,
            n_seen_shards=4, n_salts=4,
            seen_restore_dir=os.path.join(first, "seen"),
        )


def test_suggest_salts():
    from don_crawler_ray.stages.schedule import suggest_salts

    assert suggest_salts(1_000, 0.5) == 1
    assert suggest_salts(10**10, 0.5, max_group_rows=5_000_000) >= 1000
    assert suggest_salts(10**7, 0.5) == 2
    # power of two
    assert suggest_salts(10**9, 0.5) & (suggest_salts(10**9, 0.5) - 1) == 0


class TestStratifiedHotHosts:
    """VERDICT r02 item 5: a mega-host concentrated in the LAST input
    shard must be detected (a row-prefix sample misses it and the
    schedule then aborts on MAX_SEGMENT_ROWS at real scale)."""

    @pytest.fixture()
    def skewed_frontier_dir(self, tmp_path):
        import pyarrow as pa

        d = tmp_path / "frontier"
        d.mkdir()
        ts = np.datetime64("2024-01-01T00:00:00", "us")
        # shard 0: 3000 rows over 30 balanced hosts
        urls0 = [
            f"https://host{i % 30}.example.nl/page{i}" for i in range(3000)
        ]
        # shard 1 (later file): 90% one mega-host
        urls1 = [
            (
                f"https://mega.example.nl/page{i}"
                if i % 10 != 0
                else f"https://host{i % 30}.example.nl/late{i}"
            )
            for i in range(3000)
        ]
        for name, urls in (("part-000.parquet", urls0), ("part-001.parquet", urls1)):
            t = pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us")),
                    "html": pa.array(
                        [b"<html><body>x</body></html>"] * len(urls), pa.binary()
                    ),
                    "text": pa.array(["x"] * len(urls), pa.string()),
                    "lang": pa.array(["nl"] * len(urls), pa.string()),
                }
            )
            pq.write_table(t, str(d / name), row_group_size=500)
        return str(d)

    def test_mega_host_in_last_shard_detected(self, ray_session, skewed_frontier_dir):
        from don_crawler_ray.stages.schedule import detect_hot_hosts_stratified

        # budget smaller than the first shard: a prefix sample would
        # never reach the mega-host's file
        hot = detect_hot_hosts_stratified(
            skewed_frontier_dir, threshold_fraction=0.05, sample_limit=2000
        )
        assert "mega.example.nl" in hot
        # metadata-only row-group selection -> byte-deterministic
        assert hot == detect_hot_hosts_stratified(
            skewed_frontier_dir, threshold_fraction=0.05, sample_limit=2000
        )

    def test_schedule_salts_and_completes(self, ray_session, skewed_frontier_dir, politeness_cfg):
        from don_crawler_ray.pipelines.crawl import build_schedule

        grouped, hot = build_schedule(
            skewed_frontier_dir, politeness=politeness_cfg, n_salts=4
        )
        assert "mega.example.nl" in hot
        tbl = grouped.take_all()
        assert len(tbl) == 6000


def test_resume_pre_raw_hash_schedule_fails_loudly(tmp_path):
    """ADVICE r02: a schedule written before the raw_hash fetch key must
    produce an explicit regenerate-the-schedule error, not an opaque
    pushdown-read crash."""
    import pyarrow as pa

    from don_crawler_ray.pipelines.crawl import load_round_table, load_rounds_table

    old = pa.table(
        {
            "canonical_url": ["https://a.example.nl/x"],
            "host": ["a.example.nl"],
            "url_hash": pa.array([1], pa.uint64()),
            "warc_ts": pa.array([np.datetime64("2024-01-01", "us")], pa.timestamp("us")),
            "rank": pa.array([0], pa.int64()),
            "status": ["scheduled"],
            "round": pa.array([0], pa.int32()),
        }
    )
    sched = tmp_path / "schedule"
    sched.mkdir()
    pq.write_table(old, str(sched / "part-0.parquet"))
    with pytest.raises(ValueError, match="regenerate the schedule"):
        load_round_table(str(sched), 0)
    with pytest.raises(ValueError, match="regenerate the schedule"):
        load_rounds_table(str(sched), [0])


def test_resume_detects_mutated_input(ray_session, frontier_tiny, politeness_cfg, tmp_path):
    """North rule lineage: resuming after the frontier changed must fail
    loudly instead of fetching a different page set under the old
    schedule."""
    import shutil

    from don_crawler_ray.pipelines.crawl import run_crawl

    frontier_dir = tmp_path / "frontier"
    frontier_dir.mkdir()
    shutil.copy(frontier_tiny, frontier_dir / "part-000.parquet")
    out = tmp_path / "crawl"
    run_crawl(str(frontier_dir), str(out), politeness_cfg, n_seen_shards=2, n_salts=4)
    # mutate the input: add a fragment
    shutil.copy(frontier_tiny, frontier_dir / "part-001.parquet")
    with pytest.raises(ValueError, match="input changed"):
        run_crawl(
            str(frontier_dir), str(out), politeness_cfg,
            n_seen_shards=2, n_salts=4, resume=True,
        )
    # unchanged input resumes fine (idempotent completed run)
    (frontier_dir / "part-001.parquet").unlink()
    counters = run_crawl(
        str(frontier_dir), str(out), politeness_cfg,
        n_seen_shards=2, n_salts=4, resume=True,
    )
    assert counters["fetched"] > 0


def test_rfc9309_rules_flow_through_schedule(ray_session, tmp_path):
    """Allow-precedence and wildcard rules (RFC 9309) are honored by the
    vectorized schedule kernel's exact fallback path, end to end."""
    import pyarrow as pa

    from don_crawler_ray.pipelines.crawl import build_schedule
    from don_crawler_ray.stages.schedule import PolitenessConfig

    host = "rfc.example.nl"
    urls = [
        f"https://{host}/docs/public/a",   # allowed back by Allow
        f"https://{host}/docs/secret/b",   # disallowed by /docs
        f"https://{host}/data/x.json",     # disallowed by wildcard$
        f"https://{host}/data/x.json.bak", # $ anchor -> allowed
        f"https://{host}/plain",           # allowed (no rule)
    ]
    ts = np.datetime64("2024-01-01T00:00:00", "us")
    import pyarrow.parquet as pqt

    frontier = tmp_path / "f.parquet"
    pqt.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([ts] * len(urls), pa.timestamp("us")),
                "html": pa.array([b"<html><body>t</body></html>"] * len(urls), pa.binary()),
                "text": pa.array(["t"] * len(urls), pa.string()),
                "lang": pa.array(["nl"] * len(urls), pa.string()),
            }
        ),
        str(frontier),
    )
    robots = "User-agent: *\nDisallow: /docs\nAllow: /docs/public\nDisallow: /*.json$\n"
    cfg = PolitenessConfig(robots_by_host={host: robots})
    grouped, _hot = build_schedule(str(frontier), cfg, n_salts=1)
    out = grouped.take_all()
    status = {r["canonical_url"].split(host)[1]: r["status"] for r in out}
    assert status["/docs/public/a"] == "scheduled"
    assert status["/docs/secret/b"] == "robots_denied"
    assert status["/data/x.json"] == "robots_denied"
    assert status["/data/x.json.bak"] == "scheduled"
    assert status["/plain"] == "scheduled"
