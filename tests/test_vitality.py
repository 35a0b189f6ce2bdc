"""Vitality rollup tests vs hand-computed expectations.

Semantics source: ``git/repo_activity.go:38-108, 135-234, 260-274``,
ranges from ``vitality-ranges.yml:1-89`` ([min,max) buckets).
"""

import numpy as np

from don_crawler_ray.functions.vitality import (
    DEFAULT_RANGES,
    RangeTable,
    vitality_for_repo,
)

NOW = np.datetime64("2026-08-17T12:00:00", "us")


def mk(ts_list, emails=None, parents=None, tags=None):
    ts = np.array(ts_list, dtype="datetime64[us]")
    n = len(ts_list)
    emails = np.array(emails if emails is not None else ["a@x"] * n, dtype=object)
    parents = np.array(parents if parents is not None else [1] * n)
    tags = np.array(tags if tags is not None else [False] * n)
    return ts, emails, parents, tags


class TestRangeTable:
    def test_basic_buckets(self):
        rt = RangeTable()
        # codeActivity: [0,4)->2, [4,6)->8 ... [35,10000)->60
        assert rt.points_scalar("codeActivity", 0) == 2
        assert rt.points_scalar("codeActivity", 3.999) == 2
        assert rt.points_scalar("codeActivity", 4) == 8
        assert rt.points_scalar("codeActivity", 35) == 60
        assert rt.points_scalar("codeActivity", 10000) == 0  # out of range
        assert rt.points_scalar("codeActivity", -1) == 0
        # longevity
        assert rt.points_scalar("longevity", 364.9) == 20
        assert rt.points_scalar("longevity", 365) == 30
        assert rt.points_scalar("longevity", 730) == 35
        assert rt.points_scalar("longevity", -1) == 0
        # unknown name
        assert rt.points_scalar("nope", 1) == 0

    def test_vectorized_matches_scalar(self):
        rt = RangeTable()
        vals = np.array([-5, 0, 1.5, 2, 4, 27.9, 28, 9999, 10000, 12345.0])
        for name in DEFAULT_RANGES:
            vec = rt.points(name, vals)
            ref = np.array([rt.points_scalar(name, v) for v in vals])
            assert (vec == ref).all()


class TestVitality:
    def test_empty_log(self):
        ts, em, pa, tg = mk([])
        vit, per_day, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        # no commits: activity 0 -> codePts 2; users 0 -> 4; tags 0 -> 20;
        # longevity 0 (error path) -> 20 pts. per-day = 46 everywhere.
        assert (per_day == 46.0).all()
        assert vit == 46.0
        assert not detail["has_commits"]

    def test_single_recent_commit(self):
        ts, em, pa, tg = mk(["2026-08-17T10:00:00"])
        vit, per_day, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        # day 0: activity=1 -> 2pts; author first-commit 10:00 < cutoff
        # 12:00 -> users=1 -> 4pts; tags 0 -> 20; longevity ~0.08d -> 20.
        assert per_day[0] == 2 + 4 + 20 + 20
        # other days: cutoff before the commit -> users=0 -> 4pts; act 0.
        assert per_day[1] == 2 + 4 + 20 + 20
        assert detail["daily_activity"][0] == 1
        assert detail["user_community"][0] == 1
        assert detail["user_community"][1] == 0

    def test_merge_counts_double(self):
        ts, em, pa, tg = mk(
            ["2026-08-17T01:00:00", "2026-08-16T01:00:00"],
            parents=[2, 1],
        )
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        assert detail["daily_activity"][0] == 2  # merge
        assert detail["daily_activity"][1] == 1

    def test_tags_counted_separately(self):
        ts, em, pa, tg = mk(
            ["2026-08-17T01:00:00", "2026-08-17T02:00:00"],
            tags=[False, True],
        )
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        assert detail["daily_activity"][0] == 1
        assert detail["daily_tags"][0] == 1

    def test_distinct_authors_min_first_commit(self):
        ts, em, pa, tg = mk(
            [
                "2026-08-10T00:00:00",
                "2026-08-12T00:00:00",
                "2026-08-15T00:00:00",
            ],
            emails=["a@x", "a@x", "b@x"],
        )
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        # day 0 cutoff 2026-08-17T12:00: both authors' first commits before it.
        assert detail["user_community"][0] == 2
        # day 3 cutoff 2026-08-14T12:00: only a@x (first 08-10).
        assert detail["user_community"][3] == 1
        # day 10 cutoff 2026-08-07T12:00: none.
        assert detail["user_community"][10] == 0

    def test_empty_email_ignored_for_community(self):
        ts, em, pa, tg = mk(["2026-08-17T01:00:00"], emails=[""])
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        assert detail["user_community"][0] == 0
        assert detail["has_commits"]

    def test_pre2005_longevity_rejected(self):
        ts, em, pa, tg = mk(["2004-06-01T00:00:00", "2026-08-17T01:00:00"])
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        assert detail["longevity"] == -1.0  # repo_activity.go:228-231

    def test_longevity_age(self):
        ts, em, pa, tg = mk(["2024-08-17T12:00:00"])
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        assert abs(detail["longevity"] - 730.0) < 1e-9

    def test_cap_and_truncation(self):
        # Busy repo: many authors + heavy daily activity + daily tags,
        # old repo -> hits the 100 cap.
        days = 5
        ts_list, emails = [], []
        for d in range(days):
            for k in range(40):
                ts_list.append(f"2026-08-{13 + d:02d}T01:00:00")
                emails.append(f"u{k}@x")
        ts, em, pa, tg = mk(ts_list, emails=emails)
        # add tag rows (several per day)
        tag_ts = np.array(ts_list[:20], dtype="datetime64[us]")
        ts = np.concatenate([ts, tag_ts])
        em = np.concatenate([em, np.array(["t@x"] * 20, dtype=object)])
        pa = np.concatenate([pa, np.ones(20, dtype=int)])
        tg = np.concatenate([tg, np.ones(20, dtype=bool)])
        vit, per_day, _ = vitality_for_repo(ts, em, pa, tg, NOW, days=days)
        assert (per_day <= 100).all()
        assert vit == float(int(per_day.mean()))

    def test_out_of_window_commits_only_affect_users_and_longevity(self):
        ts, em, pa, tg = mk(["2025-01-01T00:00:00"], emails=["old@x"])
        _, _, detail = vitality_for_repo(ts, em, pa, tg, NOW, days=60)
        assert detail["daily_activity"].sum() == 0
        assert detail["user_community"][59] == 1  # first commit before all cutoffs
        assert detail["longevity"] > 220
