"""Cuckoo filter + seen-shard tests (membership, determinism, snapshots)."""

import numpy as np

from don_crawler_ray.state.cuckoo import CuckooFilter, SeenShard
from don_crawler_ray.state.robots import HostBudget, RobotsRules


def _keys(n, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63, size=n).astype(np.uint64)


class TestCuckooFilter:
    def test_insert_and_contains(self):
        f = CuckooFilter(capacity=10_000)
        keys = _keys(5_000)
        for k in keys.tolist():
            assert f.insert(k)
        assert f.contains_many(keys).all()

    def test_false_positive_rate(self):
        f = CuckooFilter(capacity=20_000)
        ins = _keys(10_000, seed=2)
        for k in ins.tolist():
            f.insert(k)
        probe = _keys(20_000, seed=3)
        fresh = probe[~np.isin(probe, ins)]
        fp_rate = f.contains_many(fresh).mean()
        assert fp_rate < 0.01  # 16-bit fingerprints, 2x4 buckets

    def test_deterministic_state(self):
        a, b = CuckooFilter(4096), CuckooFilter(4096)
        keys = _keys(3_500, seed=4)
        for k in keys.tolist():
            a.insert(k)
            b.insert(k)
        assert np.array_equal(a.table, b.table)
        assert a._evict_cursor == b._evict_cursor

    def test_insert_many_membership_and_count(self):
        f = CuckooFilter(capacity=40_000)
        keys = np.unique(_keys(15_000, seed=7))
        keys.sort()
        failed = f.insert_many(keys)
        for k in keys[failed].tolist():
            assert f.insert(k)
        assert f.contains_many(keys).all()
        assert f.count == len(keys)
        # low load -> the vectorized path places essentially everything
        assert failed.mean() < 0.02

    def test_insert_many_deterministic(self):
        a, b = CuckooFilter(16_384), CuckooFilter(16_384)
        keys = np.unique(_keys(9_000, seed=8))
        keys.sort()
        fa, fb = a.insert_many(keys), b.insert_many(keys)
        assert np.array_equal(fa, fb)
        assert np.array_equal(a.table, b.table)

    def test_add_many_order_insensitive_snapshot(self, tmp_path):
        keys = np.unique(_keys(20_000, seed=9))
        rng = np.random.RandomState(10)
        perm = rng.permutation(len(keys))
        s1, s2 = SeenShard(shard_id=0, capacity=1 << 12), SeenShard(shard_id=0, capacity=1 << 12)
        s1.add_many(keys[: len(keys) // 2])
        s1.add_many(keys[len(keys) // 2 :])
        s2.add_many(keys[perm][: len(keys) // 3])
        s2.add_many(keys[perm][len(keys) // 3 :])
        assert s1.contains(keys).all() and s2.contains(keys).all()
        assert np.array_equal(s1.sorted_hashes(), s2.sorted_hashes())

    def test_state_roundtrip(self):
        f = CuckooFilter(1024)
        keys = _keys(500, seed=5)
        for k in keys.tolist():
            f.insert(k)
        g = CuckooFilter.from_state(f.state())
        assert g.contains_many(keys).all()
        assert g.count == f.count


class TestSeenShard:
    def test_check_and_add_semantics(self):
        s = SeenShard(0, capacity=4096)
        keys = _keys(100, seed=6)
        first = s.check_and_add(keys)
        assert first.all()
        again = s.check_and_add(keys)
        assert not again.any()
        assert s.dedup_hits == 100

    def test_within_batch_duplicates(self):
        s = SeenShard(0, capacity=1024)
        k = np.array([7, 7, 8, 7], dtype=np.uint64)
        mask = s.check_and_add(k)
        assert mask.tolist() == [True, False, True, False]

    def test_exact_no_false_positives(self):
        s = SeenShard(0, capacity=4096)
        s.check_and_add(_keys(2000, seed=7))
        fresh = _keys(2000, seed=8)
        fresh = fresh[~np.isin(fresh, _keys(2000, seed=7))]
        assert not s.contains(fresh).any()  # exact verification kills FPs

    def test_snapshot_restore(self, tmp_path):
        s = SeenShard(3, capacity=2048)
        keys = _keys(900, seed=9)
        s.check_and_add(keys)
        s.snapshot(str(tmp_path))
        r = SeenShard(3, capacity=16)
        assert r.restore(str(tmp_path))
        assert r.contains(keys).all()
        assert np.array_equal(r.sorted_hashes(), s.sorted_hashes())
        assert not SeenShard(9).restore(str(tmp_path))  # missing shard file


class TestRobotsRules:
    def test_prefix_rules(self):
        r = RobotsRules("User-agent: *\nDisallow: /b\nDisallow: /priv/x\n")
        assert not r.allowed("/bad/path")
        assert not r.allowed("/priv/xyz")
        assert r.allowed("/a/ok")
        assert r.allowed("/priv/other")

    def test_allow_all_variants(self):
        assert RobotsRules(None).allowed("/x")  # 404
        assert RobotsRules("User-agent: *\nDisallow:\n").allowed("/x")
        assert RobotsRules("").allowed("/x")

    def test_deny_all_sentinel(self):
        assert not RobotsRules("__503__").allowed("/")

    def test_other_agent_groups_ignored(self):
        r = RobotsRules("User-agent: botX\nDisallow: /\nUser-agent: *\nDisallow: /q\n")
        assert r.allowed("/anything")
        assert not r.allowed("/q/1")

    def test_comments_and_blanks(self):
        r = RobotsRules("# hi\n\nUser-agent: *\nDisallow: /z # trailing\n")
        assert not r.allowed("/z/1")


class TestHostBudget:
    def test_min_delay_single_slot(self):
        b = HostBudget(min_delay_ms=100, max_concurrent=1)
        assert b.assign(4) == [0, 100, 200, 300]

    def test_concurrency_slots(self):
        b = HostBudget(min_delay_ms=100, max_concurrent=2)
        assert b.assign(5) == [0, 0, 100, 100, 200]

    def test_zero_delay_monotone(self):
        b = HostBudget(0, 1)
        out = b.assign(3)
        assert out == sorted(out) and len(set(out)) == 3


class TestRobotsRfc9309:
    """RFC 9309 semantics: Allow precedence, wildcards, $ anchor,
    agent-specific groups, crawl-delay parse."""

    def test_allow_longest_match_wins(self):
        r = RobotsRules("User-agent: *\nDisallow: /docs\nAllow: /docs/public\n")
        assert not r.allowed("/docs/private")
        assert r.allowed("/docs/public/page")

    def test_tie_resolves_to_allow(self):
        r = RobotsRules("User-agent: *\nDisallow: /page\nAllow: /page\n")
        assert r.allowed("/page")

    def test_wildcard_and_anchor(self):
        r = RobotsRules("User-agent: *\nDisallow: /*.json$\nDisallow: /tmp*/x\n")
        assert not r.allowed("/data/file.json")
        assert r.allowed("/data/file.json.bak")  # $ anchor
        assert not r.allowed("/tmp123/x")
        assert r.allowed("/tmp123/y")

    def test_specific_agent_group_beats_star(self):
        txt = "User-agent: donbot\nDisallow: /only-don\nUser-agent: *\nDisallow: /all\n"
        assert not RobotsRules(txt, agent="DonBot").allowed("/only-don/x")
        assert RobotsRules(txt, agent="donbot").allowed("/all/x")
        assert not RobotsRules(txt).allowed("/all/x")

    def test_shared_group_multiple_agents(self):
        txt = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        assert not RobotsRules(txt, agent="b").allowed("/x/1")
        assert RobotsRules(txt).allowed("/x/1")  # '*' has no group -> allow

    def test_crawl_delay_parsed_not_enforced(self):
        r = RobotsRules("User-agent: *\nCrawl-delay: 2.5\nDisallow: /q\n")
        assert r.crawl_delay_ms == 2500
        assert not r.allowed("/q")
        assert r.allowed("/ok")
