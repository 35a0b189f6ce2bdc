"""Vitality / activity aggregation — numpy port of the reference rollup.

Semantics from ``git/repo_activity.go:38-108`` and
``models/activity.go:11-19``:

- A1 daily code activity: commits counted per calendar day over the last
  ``days`` days (default 60); merge commits (>1 parent) count double
  (``addCommitToActivity`` ``git/repo_activity.go:172-196``).
- A2 daily tag/release counts (``collectTagStats`` ``:135-152``,
  ``addTagCommitToActivity`` ``:198-206``).
- A3 user community: first commit per non-empty author email (min ts);
  per day *i*, the count of authors whose first commit is strictly
  before cutoff[i] (``userCommunityBefore`` ``:208-219``).
- A4 longevity: age in days of the oldest commit; first commits before
  2005-01-01T01:00Z are rejected -> -1 -> 0 points
  (``activityLongevity`` ``:221-234``).
- A5 vitality index: per day
  ``min(100, userPts + codePts + releasePts + longevityPts)`` with
  points from the ``[min, max)`` ranges table (``rangePoints``
  ``:260-274``); final index = ``float(int(mean(per_day)))`` capped at
  100 (``:95-107``).

Differences by design (SURVEY.md §2.5): ``now`` is an explicit pinned
parameter (the reference reads wall clock at ``repo_activity.go:61``),
the ranges table is loaded once and broadcast (the reference re-reads
the YAML per repo, ``:79, 246-258`` — ST7), and everything here is
vectorized numpy intended for ``groupby("repo").map_groups``.
"""

from __future__ import annotations

import numpy as np

# vitality-ranges.yml:1-89 flattened (public config of the reference;
# [min, max) semantics per git/repo_activity.go:266-270).
DEFAULT_RANGES: dict[str, list[tuple[float, float, float]]] = {
    "userCommunity": [
        (0, 2, 4), (2, 4, 8), (4, 8, 12), (8, 12, 16), (12, 16, 20),
        (16, 20, 24), (20, 24, 28), (24, 28, 32), (28, 10000, 36),
    ],
    "codeActivity": [
        (0, 4, 2), (4, 6, 8), (6, 9, 14), (9, 12, 20), (12, 15, 26),
        (15, 18, 32), (18, 25, 38), (25, 30, 44), (30, 35, 50),
        (35, 10000, 60),
    ],
    "releaseHistory": [(0, 1, 20), (1, 2, 30), (2, 4, 40), (4, 100, 50)],
    "longevity": [(0, 365, 20), (365, 730, 30), (730, 10000, 35)],
}

# time.Date(2005, 1, 1, 1, 0, 0, 0, UTC) — git epoch guard
# (git/repo_activity.go:228).
GIT_EPOCH_US = np.datetime64("2005-01-01T01:00:00", "us")

US_PER_DAY = 86_400_000_000


class RangeTable:
    """Vectorized ``rangePoints`` lookup (``git/repo_activity.go:260-274``).

    Built once (actor ``__init__`` / closure broadcast — fixes the
    reference's per-repo YAML re-read, ST7 in SURVEY.md §2.3).
    """

    def __init__(self, ranges: dict[str, list[tuple[float, float, float]]] | None = None):
        self._tables = {}
        for name, rows in (ranges or DEFAULT_RANGES).items():
            mins = np.array([r[0] for r in rows], dtype=np.float64)
            maxs = np.array([r[1] for r in rows], dtype=np.float64)
            pts = np.array([r[2] for r in rows], dtype=np.float64)
            order = np.argsort(mins, kind="stable")
            self._tables[name] = (mins[order], maxs[order], pts[order])

    def points(self, name: str, values: np.ndarray) -> np.ndarray:
        """points[i] for each value: first range with min <= v < max, else 0."""
        tab = self._tables.get(name)
        values = np.asarray(values, dtype=np.float64)
        if tab is None:
            return np.zeros_like(values)
        mins, maxs, pts = tab
        idx = np.searchsorted(mins, values, side="right") - 1
        idx_clipped = np.clip(idx, 0, len(mins) - 1)
        ok = (idx >= 0) & (values < maxs[idx_clipped]) & (values >= mins[idx_clipped])
        return np.where(ok, pts[idx_clipped], 0.0)

    def points_scalar(self, name: str, value: float) -> float:
        return float(self.points(name, np.array([value]))[0])


def vitality_for_repo(
    ts: np.ndarray,
    author_email: np.ndarray,
    n_parents: np.ndarray,
    is_tag: np.ndarray,
    now: np.datetime64,
    days: int = 60,
    ranges: RangeTable | None = None,
) -> tuple[float, np.ndarray, dict]:
    """Compute one repo's vitality from its commit log.

    Arrays are parallel per commit; ``ts`` is ``datetime64[us]`` (UTC).
    Returns ``(vitality_index, per_day_points[days], detail)`` where
    ``detail`` carries the intermediate aggregates (daily activity/tags,
    distinct-author counts, longevity) for testing and reporting.
    """
    if days < 1:
        raise ValueError("activity days must be at least 1")
    ranges = ranges or _DEFAULT_RANGE_TABLE
    ts = np.asarray(ts).astype("datetime64[us]")
    n_parents = np.asarray(n_parents).astype(np.int64)
    is_tag = np.asarray(is_tag).astype(bool)
    author_email = np.asarray(author_email, dtype=object)

    now = np.datetime64(now, "us")
    now_day = now.astype("datetime64[D]")
    commit_mask = ~is_tag

    # Day slot: i = now_day - commit_day, valid when 0 <= i < days.
    # Matches DayIndex built from now.AddDate(0,0,-i)
    # (git/repo_activity.go:162-168) — UTC, no DST.
    day_idx_all = (now_day - ts.astype("datetime64[D]")) // np.timedelta64(1, "D")
    day_idx_all = day_idx_all.astype(np.int64)
    in_window = (day_idx_all >= 0) & (day_idx_all < days)

    # A1: daily activity, merges double (commit rows only).
    csel = commit_mask & in_window
    weights = np.where(n_parents > 1, 2.0, 1.0)
    daily_activity = np.bincount(
        day_idx_all[csel], weights=weights[csel], minlength=days
    )[:days].astype(np.float64)

    # A2: daily tags.
    tsel = is_tag & in_window
    daily_tags = np.bincount(day_idx_all[tsel], minlength=days)[:days].astype(np.float64)

    # A4: oldest commit over ALL commit rows (tags handled separately in
    # the reference and do not feed OldestCommit).
    has_commits = bool(commit_mask.any())
    if has_commits:
        oldest = ts[commit_mask].min()
        age_days = float((now - oldest) / np.timedelta64(1, "us")) / US_PER_DAY
        max_age = float((now - GIT_EPOCH_US) / np.timedelta64(1, "us")) / US_PER_DAY
        longevity = -1.0 if age_days > max_age else float(age_days)
    else:
        longevity = 0.0  # activityLongevity error path -> 0 (repo_activity.go:82-85)

    # A3: first commit per non-empty email, then per-cutoff strict-< counts.
    esel = commit_mask & np.array(
        [e is not None and e != "" for e in author_email], dtype=bool
    )
    if esel.any():
        emails = author_email[esel]
        ets = ts[esel].astype("int64")
        order = np.lexsort((ets, emails.astype(str)))
        s_emails = emails[order].astype(str)
        s_ts = ets[order]
        first_mask = np.ones(len(s_emails), dtype=bool)
        first_mask[1:] = s_emails[1:] != s_emails[:-1]
        first_ts = np.sort(s_ts[first_mask])
    else:
        first_ts = np.empty(0, dtype=np.int64)

    cutoffs = now - (np.arange(days) * np.timedelta64(1, "D")).astype("timedelta64[us]")
    cutoffs_us = cutoffs.astype("datetime64[us]").astype("int64")
    # count of first commits strictly before cutoff[i]
    user_community = np.searchsorted(first_ts, cutoffs_us, side="left").astype(np.float64)

    # A5: per-day points, capped at 100.
    pts = (
        ranges.points("userCommunity", user_community)
        + ranges.points("codeActivity", daily_activity)
        + ranges.points("releaseHistory", daily_tags)
        + ranges.points_scalar("longevity", longevity)
    )
    per_day = np.minimum(pts, 100.0)

    total = float(per_day.mean()) if days else 0.0
    total = min(total, 100.0)
    vitality_index = float(int(total))  # float(int(mean)) truncation (:102-107)

    detail = {
        "daily_activity": daily_activity,
        "daily_tags": daily_tags,
        "user_community": user_community,
        "longevity": longevity,
        "has_commits": has_commits,
    }
    return vitality_index, per_day, detail


_DEFAULT_RANGE_TABLE = RangeTable()
