"""Frontier scheduling — salted groupby(host) -> dedup + robots + budget.

This is the engine's single wide shuffle (SURVEY.md §7 step 4): the
slim canonicalized frontier is grouped by ``(host_key, salt)`` and each
group deterministically:

1. exact-dedups by canonical URL (first-wins by ``(warc_ts, url)`` —
   the deterministic restatement of the reference's clone-cache +
   per-repo lock exactly-once guarantee, ST5/ST6,
   ``crawler/crawler.go:55-80``, ``git/clone_repository.go:38``);
2. applies robots.txt rules (broadcast map, allow/deny by path prefix);
3. sorts survivors by ``(warc_ts, canonical_url)`` and assigns
   ``rank`` / ``round = rank // per_round_budget`` plus a virtual
   politeness fetch time from the host token bucket
   (``state.robots.HostBudget`` — replaces blocking sleeps, SURVEY §4);
4. emits counter columns (status: scheduled / robots_denied / dup).

Skew: hosts in ``hot_hosts`` are salted into ``n_salts`` subgroups by
``url_hash % n_salts`` (same canonical URL -> same salt, so dedup stays
exact) and each salt gets ``budget / n_salts``; global rank interleaves
``local_rank * n_salts + salt``. Salting config is part of the job
config, so N- and 4N-parallelism runs produce identical order.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from don_crawler_ray.state.robots import HostBudget, RobotsRules

STATUS_SCHEDULED = "scheduled"
STATUS_ROBOTS_DENIED = "robots_denied"
STATUS_DUP = "dedup_hit"

SCHEDULE_SCHEMA = pa.schema(
    [
        ("canonical_url", pa.string()),
        ("host", pa.string()),
        ("host_key", pa.string()),
        ("url_hash", pa.uint64()),
        ("raw_hash", pa.uint64()),
        ("warc_ts", pa.timestamp("us")),
        ("status", pa.string()),
        ("round", pa.int32()),
        ("rank", pa.int64()),
        ("virtual_ms", pa.int64()),
    ]
)


DEFAULT_N_BUCKETS = 256

# One map_groups call materializes one bucket; a single (host, salt)
# segment beyond this means salting is misconfigured for the input.
MAX_SEGMENT_ROWS = 20_000_000


def add_salt_stage(n_salts: int, hot_hosts: frozenset[str], n_buckets: int = DEFAULT_N_BUCKETS):
    """map_batches kernel adding the shuffle ``salt`` and ``bucket``
    columns. The schedule shuffle exchanges on ``bucket`` — a FIXED
    number of int32 hash partitions — instead of the raw
    ``(host_key, salt)`` string key: sorting a few hundred int keys is
    far cheaper than sorting millions of strings into one group per
    host, and every (host, salt) pair still lands wholly inside one
    bucket, so downstream semantics are unchanged. ``n_buckets`` is job
    config (size it ~4x cluster cores at scale), not cluster-derived:
    output content is identical for any value."""
    from don_crawler_ray.functions.urlnorm import reverse_host, url_hash64

    hot_keys = frozenset(reverse_host(h) for h in hot_hosts)

    def _salt(batch: pa.Table) -> pa.Table:
        enc = pc.dictionary_encode(batch.column("host_key").combine_chunks())
        host_dict = enc.dictionary.to_pylist()
        codes = enc.indices.to_numpy(zero_copy_only=False)
        # per-DISTINCT-host work only: hash + hot membership
        hh = np.fromiter((url_hash64(k) for k in host_dict), np.uint64, len(host_dict))
        if n_salts <= 1 or not hot_keys:
            salt = np.zeros(batch.num_rows, dtype=np.int32)
        else:
            hot = np.fromiter((k in hot_keys for k in host_dict), bool, len(host_dict))
            hashes = batch.column("url_hash").to_numpy(zero_copy_only=False)
            salt = np.where(hot[codes], (hashes % np.uint64(n_salts)).astype(np.int32), 0)
        with np.errstate(over="ignore"):
            mixed = hh[codes] + salt.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        bucket = (mixed % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("salt", pa.array(salt, pa.int32())).append_column(
            "bucket", pa.array(bucket, pa.int32())
        )

    return _salt


class PolitenessConfig:
    """Broadcast small-side: per-host robots rules + budgets.

    Built once on the driver from the politeness table (F3) and shipped
    to schedule tasks via closure capture of the plain-dict state (Ray
    serializes it once per task, and it is tiny: one entry per host).
    The reference re-read its config per repo (ST7) — we do not.
    """

    def __init__(
        self,
        robots_by_host: dict[str, str | None] | None = None,
        budget_by_host: dict[str, tuple[int, int, int]] | None = None,
        default_budget: tuple[int, int, int] = (0, 1, 1 << 60),
    ):
        # default: no min delay, 1 slot, effectively-unbounded budget
        self.robots_raw = robots_by_host or {}
        self.budget_by_host = budget_by_host or {}
        self.default_budget = default_budget
        self._rules_cache: dict[str, RobotsRules] = {}

    @classmethod
    def from_table(cls, politeness: pa.Table, default_budget=(0, 1, 1 << 60)) -> "PolitenessConfig":
        robots = {}
        budgets = {}
        for row in politeness.to_pylist():
            robots[row["host"]] = row["robots_txt"]
            budgets[row["host"]] = (
                int(row.get("min_delay_ms", 0) or 0),
                int(row.get("max_concurrent", 1) or 1),
                int(row.get("per_round_budget", 1 << 60) or (1 << 60)),
            )
        return cls(robots, budgets, default_budget)

    _RULES_CACHE_MAX = 100_000

    def rules(self, host: str) -> RobotsRules:
        r = self._rules_cache.get(host)
        if r is None:
            # hosts absent from the table -> allow-all (no robots known)
            r = RobotsRules(self.robots_raw.get(host))
            if len(self._rules_cache) >= self._RULES_CACHE_MAX:
                # bound per-worker memory at web scale; parses are cheap
                self._rules_cache.clear()
            self._rules_cache[host] = r
        return r

    def budget(self, host: str) -> tuple[int, int, int]:
        return self.budget_by_host.get(host, self.default_budget)


# Per-process cache for broadcast PolitenessConfig objects: each worker
# process deserializes the config ONCE per run, not once per task
# (closure capture of the raw config would re-ship it inside every
# serialized task at 10^9-host scale).
_CONFIG_CACHE: dict = {}


def resolve_config(config_or_ref) -> PolitenessConfig:
    if isinstance(config_or_ref, PolitenessConfig):
        return config_or_ref
    key = config_or_ref.hex() if hasattr(config_or_ref, "hex") else id(config_or_ref)
    cached = _CONFIG_CACHE.get(key)
    if cached is None:
        import ray

        cached = ray.get(config_or_ref)
        # bounded: keep the last few configs so a run alternating
        # between two broadcast configs never re-fetches per batch
        while len(_CONFIG_CACHE) >= 4:
            _CONFIG_CACHE.pop(next(iter(_CONFIG_CACHE)))
        _CONFIG_CACHE[key] = cached
    return cached


def make_schedule_bucket_fn(config_or_ref, n_salts: int, hot_hosts: frozenset[str]):
    """Build the map_groups callable for ``groupby(bucket)``.

    ``config_or_ref``: a ``PolitenessConfig`` or a ``ray.ObjectRef`` to
    one — pass the ref from pipelines so the (potentially huge) per-host
    config ships through the object store once and is cached per worker
    process, instead of riding inside every task closure.

    One call processes EVERY (host, salt) group hashed into the bucket,
    fully vectorized: a single Arrow sort puts each group's rows
    contiguous in the deterministic (warc_ts, canonical_url, raw_hash)
    order, segment boundaries come from run-length detection, and
    dedup / robots / rank / round / virtual-time are computed with
    numpy gathers over per-segment parameters. Per-host Python work is
    proportional to the number of DISTINCT hosts in the bucket, never
    to rows."""
    from don_crawler_ray.functions.urlnorm import reverse_host

    def schedule_bucket(group: pa.Table) -> pa.Table:
        config = resolve_config(config_or_ref)
        n = group.num_rows
        if n == 0:
            return pa.Table.from_pylist([], schema=SCHEDULE_SCHEMA)
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("host_key", "ascending"),
                ("salt", "ascending"),
                ("warc_ts", "ascending"),
                ("canonical_url", "ascending"),
                ("raw_hash", "ascending"),
            ],
        )
        g = group.take(order)
        urls = g.column("canonical_url")

        enc = pc.dictionary_encode(g.column("host_key").combine_chunks())
        host_dict = enc.dictionary.to_pylist()
        hk_codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        salt_np = g.column("salt").to_numpy(zero_copy_only=False).astype(np.int64)

        # (host, salt) segments are contiguous after the sort
        change = np.ones(n, dtype=bool)
        change[1:] = (hk_codes[1:] != hk_codes[:-1]) | (salt_np[1:] != salt_np[:-1])
        seg_starts = np.flatnonzero(change)
        seg_id = np.cumsum(change) - 1
        seg_len = np.diff(np.append(seg_starts, n))

        # Skew guard: a segment this size means a hot host escaped
        # detection/salting — fail loudly (deterministically) instead of
        # letting one group swallow a worker's heap at scale.
        if seg_len.max(initial=0) > MAX_SEGMENT_ROWS:
            worst = host_dict[int(hk_codes[seg_starts[int(np.argmax(seg_len))]])]
            raise ValueError(
                f"(host, salt) group for {worst!r} has {int(seg_len.max())} rows "
                f"(> {MAX_SEGMENT_ROWS}); add the host to hot_hosts or raise "
                f"n_salts (see suggest_salts)"
            )

        # per-distinct-host params (python work O(distinct hosts))
        hosts = [reverse_host(k) for k in host_dict]
        budgets = [config.budget(h) for h in hosts]
        host_is_hot = np.fromiter(
            ((h in hot_hosts) and n_salts > 1 for h in hosts), bool, len(hosts)
        )
        h_delay = np.fromiter((b[0] for b in budgets), np.int64, len(hosts))
        h_conc = np.fromiter((max(1, b[1]) for b in budgets), np.int64, len(hosts))
        h_budget = np.fromiter((b[2] for b in budgets), np.int64, len(hosts))

        # 1. first-wins dedup within (segment, canonical_url)
        url_codes = (
            pc.dictionary_encode(urls.combine_chunks())
            .indices.to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        combined = (seg_id << np.int64(32)) | url_codes
        _, first_idx = np.unique(combined, return_index=True)
        dup_mask = np.ones(n, dtype=bool)
        dup_mask[first_idx] = False

        # 2. robots: hosts are contiguous, so each rule-bearing host is
        # one slice — prefix checks run on the slice only (lazy paths).
        allowed = np.ones(n, dtype=bool)
        paths = None
        for code, host in enumerate(hosts):
            rules = config.rules(host)
            if not rules.deny_all and rules.simple and not rules.disallow:
                continue
            lo = int(np.searchsorted(hk_codes, code, side="left"))
            hi = int(np.searchsorted(hk_codes, code, side="right"))
            if rules.deny_all:
                allowed[lo:hi] = False
                continue
            if paths is None:
                paths = pc.replace_substring_regex(
                    urls, pattern=r"^[a-z][a-z0-9+.\-]*://[^/]*", replacement=""
                )
                paths = pc.replace_substring_regex(paths, pattern=r"\?.*$", replacement="")
                paths = pc.if_else(pc.equal(paths, ""), pa.scalar("/"), paths).combine_chunks()
            sub = paths.slice(lo, hi - lo)
            if rules.simple:
                denied = pc.starts_with(sub, pattern=rules.disallow[0])
                for p in rules.disallow[1:]:
                    denied = pc.or_(denied, pc.starts_with(sub, pattern=p))
                allowed[lo:hi] = ~denied.to_numpy(zero_copy_only=False)
            else:
                # Allow / wildcard / anchored rules (RFC 9309): exact
                # per-path evaluation on this host's slice only
                allow_fn = rules.allowed
                allowed[lo:hi] = np.fromiter(
                    (allow_fn(p) for p in sub.to_pylist()), bool, hi - lo
                )

        sched_mask = ~dup_mask & allowed
        status_pa = pc.if_else(
            pa.array(dup_mask),
            pa.scalar(STATUS_DUP),
            pc.if_else(
                pa.array(allowed), pa.scalar(STATUS_SCHEDULED), pa.scalar(STATUS_ROBOTS_DENIED)
            ),
        )

        # 3. local rank within segment over scheduled rows
        csum = np.cumsum(sched_mask.astype(np.int64))
        seg_base = np.repeat(csum[seg_starts] - sched_mask[seg_starts], seg_len)
        local = csum - seg_base - 1  # valid where sched_mask

        # per-row parameters via code gathers
        row_hot = host_is_hot[hk_codes]
        row_stride = np.where(row_hot, np.int64(n_salts), np.int64(1))
        row_budget = h_budget[hk_codes]
        row_salt_budget = np.where(
            row_budget < (1 << 59), np.maximum(1, row_budget // row_stride), row_budget
        )
        row_delay = h_delay[hk_codes]
        row_delta = np.where(row_delay > 0, row_delay, 1)
        row_conc = h_conc[hk_codes]

        rank = np.full(n, -1, dtype=np.int64)
        rank[sched_mask] = np.where(
            row_hot, local * row_stride + salt_np, local
        )[sched_mask]
        rnd = np.full(n, -1, dtype=np.int32)
        rnd[sched_mask] = (local // row_salt_budget)[sched_mask].astype(np.int32)
        vms = np.full(n, -1, dtype=np.int64)
        vms[sched_mask] = ((local // row_conc) * row_delta)[sched_mask]

        host_col = pc.cast(
            pa.DictionaryArray.from_arrays(
                pa.array(hk_codes.astype(np.int32)), pa.array(hosts, pa.string())
            ),
            pa.string(),
        )

        return pa.table(
            {
                "canonical_url": urls,
                "host": host_col,
                "host_key": g.column("host_key"),
                "url_hash": g.column("url_hash"),
                "raw_hash": g.column("raw_hash"),
                "warc_ts": g.column("warc_ts"),
                "status": status_pa,
                "round": pa.array(rnd, pa.int32()),
                "rank": pa.array(rank, pa.int64()),
                "virtual_ms": pa.array(vms, pa.int64()),
            }
        )

    return schedule_bucket


def make_schedule_group_fn(config: PolitenessConfig, n_salts: int, hot_hosts: frozenset[str]):
    """Build the map_groups callable for groupby(host_key, salt).

    Single-host variant kept as the semantic reference for
    ``make_schedule_bucket_fn`` (pytest asserts both produce identical
    schedules); the pipeline runs the bucketed version."""

    def schedule_group(group: pa.Table) -> pa.Table:
        from don_crawler_ray.functions.urlnorm import reverse_host

        host_key = group.column("host_key")[0].as_py()
        host = reverse_host(host_key)  # reversal is an involution
        salt = group.column("salt")[0].as_py() if "salt" in group.column_names else 0
        is_hot = host in hot_hosts and n_salts > 1
        stride = n_salts if is_hot else 1

        # Deterministic order: (warc_ts, canonical_url); raw_hash breaks
        # the tie between distinct raw URLs that canonicalize to the same
        # (canonical, warc_ts), so the dedup winner is a single
        # identifiable page-store row (ADVICE r01 item 4).
        order = pc.sort_indices(
            group,
            sort_keys=[
                ("warc_ts", "ascending"),
                ("canonical_url", "ascending"),
                ("raw_hash", "ascending"),
            ],
        )
        g = group.take(order)
        n = g.num_rows
        urls = g.column("canonical_url")

        # 1. first-wins exact dedup by canonical url, vectorized: the
        # dictionary codes identify equal URLs; np.unique's return_index
        # gives each code's first occurrence in g order (= the sorted
        # first-wins winner).
        codes = pc.dictionary_encode(urls.combine_chunks()).indices.to_numpy(
            zero_copy_only=False
        )
        _, first_idx = np.unique(codes, return_index=True)
        dup_mask = np.ones(n, dtype=bool)
        dup_mask[first_idx] = False

        # 2. robots, vectorized: path = canonical minus scheme+authority
        # minus query (Arrow RE2 kernels), then one starts_with per
        # disallow prefix (the prefix list is small by construction).
        rules = config.rules(host)
        if rules.deny_all:
            allowed = np.zeros(n, dtype=bool)
        elif rules.simple and not rules.disallow:
            allowed = np.ones(n, dtype=bool)
        else:
            paths = pc.replace_substring_regex(
                urls, pattern=r"^[a-z][a-z0-9+.\-]*://[^/]*", replacement=""
            )
            paths = pc.replace_substring_regex(paths, pattern=r"\?.*$", replacement="")
            paths = pc.if_else(pc.equal(paths, ""), pa.scalar("/"), paths)
            if rules.simple:
                denied_arr = pc.starts_with(paths, pattern=rules.disallow[0])
                for p in rules.disallow[1:]:
                    denied_arr = pc.or_(denied_arr, pc.starts_with(paths, pattern=p))
                allowed = ~denied_arr.to_numpy(zero_copy_only=False)
            else:
                allow_fn = rules.allowed
                allowed = np.fromiter(
                    (allow_fn(p) for p in paths.to_pylist()), bool, n
                )

        sched_mask = ~dup_mask & allowed
        status_pa = pc.if_else(
            pa.array(dup_mask),
            pa.scalar(STATUS_DUP),
            pc.if_else(
                pa.array(allowed), pa.scalar(STATUS_SCHEDULED), pa.scalar(STATUS_ROBOTS_DENIED)
            ),
        )

        # 3. rank + round + virtual politeness time for scheduled rows.
        min_delay, max_conc, budget = config.budget(host)
        per_salt_budget = max(1, budget // stride) if budget < (1 << 59) else budget
        n_sched = int(sched_mask.sum())
        local_rank = np.arange(n_sched, dtype=np.int64)
        rank = np.full(n, -1, dtype=np.int64)
        rank[sched_mask] = local_rank * stride + salt if is_hot else local_rank
        rnd = np.full(n, -1, dtype=np.int32)
        rnd[sched_mask] = (local_rank // per_salt_budget).astype(np.int32)

        bucket = HostBudget(min_delay, max_conc)
        vms = np.full(n, -1, dtype=np.int64)
        vms[sched_mask] = bucket.assign_array(n_sched)

        # constant host column without a Python list: one dictionary
        # entry fanned out over n int32 indices, cast back to string.
        host_col = pc.cast(
            pa.DictionaryArray.from_arrays(
                pa.array(np.zeros(n, dtype=np.int32)), pa.array([host], pa.string())
            ),
            pa.string(),
        )

        return pa.table(
            {
                "canonical_url": urls,
                "host": host_col,
                "host_key": g.column("host_key"),
                "url_hash": g.column("url_hash"),
                "raw_hash": g.column("raw_hash"),
                "warc_ts": g.column("warc_ts"),
                "status": status_pa,
                "round": pa.array(rnd, pa.int32()),
                "rank": pa.array(rank, pa.int64()),
                "virtual_ms": pa.array(vms, pa.int64()),
            }
        )

    return schedule_group


def detect_hot_hosts_stratified(
    frontier_path: str,
    threshold_fraction: float = 0.05,
    sample_limit: int = 200_000,
) -> frozenset[str]:
    """Stratified hot-host detection over the WHOLE frontier file set.

    A row-PREFIX sample (``ds.limit``, the removed first-cut detector)
    misses a mega-host concentrated in later input files, so it escapes
    salting and the ``MAX_SEGMENT_ROWS`` guard aborts the crawl
    (VERDICT r02 item 5). This detector selects row groups EVENLY
    SPACED across the global
    (file, row_group) list — a metadata-only decision, so the selection
    (and therefore the detected set) is byte-deterministic at any
    parallelism — and counts every row of each selected group with one
    column-pruned read fanned out as Ray tasks (one per file; the
    driver merges per-file host counters, bounded by distinct hosts in
    the sample)."""
    import collections
    import os

    import pyarrow.parquet as pq

    paths = []
    if os.path.isdir(frontier_path):
        for root, _dirs, files in os.walk(frontier_path):
            paths.extend(os.path.join(root, f) for f in files if f.endswith(".parquet"))
        paths.sort()
    else:
        paths = [frontier_path]

    # metadata pass: the global row-group list
    units: list[tuple[str, int, int]] = []  # (path, rg_index, rg_rows)
    total = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        for rg in range(md.num_row_groups):
            n = md.row_group(rg).num_rows
            units.append((p, rg, n))
            total += n
    if total == 0:
        return frozenset()

    if total <= sample_limit:
        chosen = units
    else:
        # evenly spaced row groups until the sampled-row budget is met —
        # late shards are always represented
        need = max(1, round(len(units) * sample_limit / total))
        stride = max(1, len(units) // need)
        chosen = units[::stride]

    import ray

    from don_crawler_ray.functions.urlnorm import url_host

    def _count_file(path: str, rgs: list[int]) -> dict[str, int]:
        f = pq.ParquetFile(path)
        c: collections.Counter = collections.Counter()
        for rg in rgs:
            for u in f.read_row_group(rg, columns=["url"]).column("url").to_pylist():
                c[url_host(u)] += 1
        return dict(c)

    by_path: dict[str, list[int]] = {}
    for p, rg, _n in chosen:
        by_path.setdefault(p, []).append(rg)

    if ray.is_initialized() and len(by_path) > 1:
        count_remote = ray.remote(num_cpus=1)(_count_file)
        results = ray.get(
            [count_remote.remote(p, rgs) for p, rgs in sorted(by_path.items())]
        )
    else:
        results = [_count_file(p, rgs) for p, rgs in sorted(by_path.items())]

    totals: collections.Counter = collections.Counter()
    for r in results:
        totals.update(r)
    grand = sum(totals.values()) or 1
    return frozenset(h for h, n in totals.items() if n / grand >= threshold_fraction)


def suggest_salts(frontier_rows: int, hot_fraction: float, max_group_rows: int = 5_000_000) -> int:
    """Size the salt count so a hot host's largest (host, salt) group
    stays under ``max_group_rows`` — a ``map_groups`` call materializes
    one group, so group size (not dataset size) is the memory bound at
    10^10-URL scale. Returns a power of two >= 1.

    Example: a mega-host holding 50% of a 10^10-row frontier needs
    n_salts >= 1000 to keep groups at ~5M rows; the budget split and
    rank interleave stay deterministic for any fixed value.
    """
    need = max(1, int(frontier_rows * hot_fraction) // max_group_rows + 1)
    n = 1
    while n < need:
        n *= 2
    return n
