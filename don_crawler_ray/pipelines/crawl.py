"""The crawl pipeline — schedule pass + per-round fetch/extract pass.

Ray-Data restatement of the reference's ``crawl`` lifecycle
(``crawler/crawler.go:156-347``; SURVEY.md §3.1/§3.4):

    read_parquet(frontier, columns=slim)            # prune at the read
      -> map_batches(canonicalize_slim)             # M17/M1-M4 kernels
      -> map_batches(SeenFilterActor)               # cross-run anti-join
      -> map_batches(add_salt)                      # skew: salt hot hosts
      -> groupby(host_key, salt).map_groups(...)    # THE shuffle: dedup +
                                                    # robots + budget + rank
      -> write_parquet(schedule/)                   # slim decisions
    per round chunk:
      membership = radix-parallel sorted keys       # built IN Ray tasks
      read_parquet(frontier, columns=url,ts,html)   # page store
        -> map_batches(canonicalize)                # recompute keys
        -> map_batches(fetch_extract fn)            # broadcast semi-join +
                                                    # extract; fuses with
                                                    # read and write into
                                                    # ONE task per block
        -> write_parquet(out/round=N/)              # partitioned output
      commit: seen shards += round hashes; snapshot; manifest update

Checkpoint/resume (north rule): the manifest is written LAST after each
round's output + seen snapshots land; resume skips the schedule pass
and completed rounds, restores seen shards, and reproduces byte-
identical remaining output (deterministic sort keys everywhere —
no arrival-order dependence, unlike the reference's goroutine
interleaving, SURVEY §2.9).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from don_crawler_ray.registry import portable_scanner
from don_crawler_ray.stages.canonicalize import (
    canonicalize_slim_stage,
    canonicalize_stage,
)
from don_crawler_ray.stages.fetch import (
    ExtractActor,
    FetchExtractActor,
    SeenFilterActor,
    make_hash_skip_filter,
    make_membership_filter,
    make_round_membership,
    make_rounds_membership,
)
from don_crawler_ray.stages.schedule import (
    DEFAULT_N_BUCKETS,
    PolitenessConfig,
    add_salt_stage,
    detect_hot_hosts_stratified,
    make_schedule_bucket_fn,
)

SLIM_COLUMNS = ["url", "warc_ts"]
FETCH_COLUMNS = ["url", "warc_ts", "html"]


def _read_frontier(frontier_path: str, columns, **read_kwargs):
    import ray

    return ray.data.read_parquet(frontier_path, columns=columns, **read_kwargs)


def tune_data_context() -> None:
    """Executor tuning for this engine's stage mix (measured on the
    2M-row bench frontier, 8 and 32 cpus):

    - ``op_resource_reservation_enabled=False``: the default 50%
      reservation for the sort AllToAll starves the canonicalize map
      stage (61.6s -> 33.9s at 8 cpus on the schedule pass);
    - push-based sort shuffle: 16.4s -> 13.7s at 32 cpus;
    - ``read_op_min_num_blocks = 2x cluster CPUs`` (default 200): the
      default splits a small input into hundreds of tiny blocks and the
      shuffle pays per-block task/transfer overhead — the 400k-row
      schedule sort dropped 4.6s -> 1.3s at 64 blocks instead of 224.
      At real scale the 128 MiB target block size dominates and this
      floor is inert.

    Block sizing: the default ``target_max_block_size`` (128 MiB) keeps
    html-carrying blocks at ~85k rows for ~1.5 KiB pages; for heavier
    payloads (multimodal binaries) pass a smaller ``batch_size`` to the
    decode stage instead of shrinking blocks globally.
    """
    import ray
    from ray.data.context import DataContext, ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.op_resource_reservation_enabled = False
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        n_cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        n_cpus = 16
    ctx.read_op_min_num_blocks = max(16, 2 * n_cpus)


def default_extract_concurrency() -> tuple[int, int]:
    """Autoscaling actor-pool bounds sized to the cluster: min 1, max =
    cluster CPUs (extract is CPU-bound at ~1 task per core)."""
    import ray

    n = int(ray.cluster_resources().get("CPU", 4))
    # start at half the pool to skip the slow autoscale ramp; cap at CPUs
    return (max(1, n // 2), max(2, n))


def build_schedule(
    frontier_path: str,
    politeness: PolitenessConfig | None = None,
    n_salts: int = 8,
    hot_hosts: frozenset[str] | None = None,
    hot_threshold: float = 0.05,
    seen_shards=None,
    skip_hashes=None,
    n_buckets: int = DEFAULT_N_BUCKETS,
):
    """Schedule pass -> slim decisions Dataset (lazy).

    ``skip_hashes``: optional sorted uint64 canonical-hash skip set (the
    repo-metadata pre-filter — forks / private / archived repos,
    M9/M6); flagged rows are dropped before the shuffle and counted in
    ``revisit_skipped`` together with seen-set revisits.
    """
    politeness = politeness or PolitenessConfig()
    ds = _read_frontier(frontier_path, SLIM_COLUMNS)
    ds = ds.map_batches(canonicalize_slim_stage, batch_format="pyarrow")
    if hot_hosts is None:
        # stratified over the whole file set (row groups evenly spaced
        # from parquet metadata) — a mega-host in the LAST shard is
        # detected, unlike a row-prefix sample (VERDICT r02 item 5)
        hot_hosts = detect_hot_hosts_stratified(frontier_path, hot_threshold)
    if skip_hashes is not None and len(skip_hashes):
        ds = ds.map_batches(make_hash_skip_filter(skip_hashes), batch_format="pyarrow")
    if seen_shards:
        ds = ds.map_batches(
            SeenFilterActor,
            fn_constructor_kwargs={"shard_handles": seen_shards},
            batch_format="pyarrow",
            concurrency=2,
        )
    # THE shuffle: exchange on a fixed int32 hash-bucket key (cheap int
    # sort, few groups) rather than per-host string keys; the bucket
    # kernel handles every (host, salt) group in its bucket vectorized.
    # The politeness config is ray.put ONCE and resolved per worker
    # process — closure capture would re-ship the per-host map inside
    # every serialized task.
    import ray

    config_ref = ray.put(politeness) if ray.is_initialized() else politeness
    ds = ds.map_batches(
        add_salt_stage(n_salts, hot_hosts, n_buckets=n_buckets), batch_format="pyarrow"
    )
    grouped = ds.groupby("bucket").map_groups(
        make_schedule_bucket_fn(config_ref, n_salts, hot_hosts),
        batch_format="pyarrow",
    )
    return grouped, hot_hosts


def _require_raw_hash(dataset: pads.Dataset, schedule_dir: str) -> None:
    """A schedule written before the three-part fetch key gained
    ``raw_hash`` cannot drive a resume — fail with the remedy instead
    of an opaque pushdown-read crash (ADVICE r02)."""
    if "raw_hash" not in dataset.schema.names:
        raise ValueError(
            f"schedule at {schedule_dir} predates the raw_hash fetch key "
            "(no raw_hash column); regenerate the schedule with a fresh "
            "run (resume=False) before resuming"
        )


def load_round_table(schedule_dir: str, rnd: int) -> pa.Table:
    """One round's scheduled rows (slim), pushdown-filtered at the read."""
    dataset = pads.dataset(schedule_dir)
    _require_raw_hash(dataset, schedule_dir)
    return dataset.to_table(
        columns=["canonical_url", "host", "url_hash", "raw_hash", "warc_ts", "rank"],
        filter=(pads.field("status") == "scheduled") & (pads.field("round") == rnd),
    )


def load_rounds_table(schedule_dir: str, rounds: list[int]) -> pa.Table:
    """The given rounds' scheduled rows in one pushdown-filtered read."""
    dataset = pads.dataset(schedule_dir)
    _require_raw_hash(dataset, schedule_dir)
    return dataset.to_table(
        columns=["url_hash", "raw_hash", "warc_ts", "round"],
        filter=(pads.field("status") == "scheduled") & (pads.field("round").isin(rounds)),
    )


_MEMBERSHIP_BYTES_PER_KEY = 12  # uint64 combined key + int32 round

# below this compressed schedule size the parallel task fan-out costs
# more than doing the work on the driver (both paths are byte-identical)
_SMALL_SCHEDULE_BYTES = 64 << 20


def _schedule_fragment_paths(schedule_dir: str) -> list[str]:
    return sorted(
        os.path.join(schedule_dir, f)
        for f in os.listdir(schedule_dir)
        if f.endswith(".parquet")
    )


def build_chunk_membership(
    schedule_dir: str,
    rounds: list[int],
    n_buckets: int = 32,
    fragments_per_task: int = 8,
):
    """Distributed replacement for ``load_rounds_table`` +
    ``make_rounds_membership`` + ``make_raw_prefilter_keys``: the
    schedule's fragments are read, keyed and RADIX-BUCKETED by the top
    bits of the (well-mixed) combined key inside Ray tasks; one task per
    bucket then sorts its bucket. Because the radix respects key order,
    concatenating the sorted buckets in bucket order yields the globally
    sorted array — the driver's work is a memcpy of the chunk's output
    (budget-bounded), never an O(rows log rows) sort. The serial build
    cost ~3-5 s per 4.4M-row chunk on the bench box and scales linearly
    with the 1 GiB membership budget; at a 10^10-row schedule it is the
    fetch phase's Amdahl ceiling, so it runs in the cluster instead.

    Deterministic at any parallelism: fragment paths are sorted, each
    bucket concatenates its pieces in fragment order, and the per-bucket
    argsort is stable — byte-identical to the driver-side build.

    Returns ``(n_rows, member_keys, member_rounds, raw_keys)`` with
    ``member_keys``/``raw_keys`` sorted and ``member_rounds`` aligned to
    ``member_keys``.
    """
    import ray

    from don_crawler_ray.stages.fetch import _schedule_keys, combine_key

    assert n_buckets >= 2 and (n_buckets & (n_buckets - 1)) == 0
    _require_raw_hash(pads.dataset(schedule_dir), schedule_dir)
    paths = _schedule_fragment_paths(schedule_dir)
    if sum(os.path.getsize(p) for p in paths) < _SMALL_SCHEDULE_BYTES:
        # tiny schedule: task fan-out costs more than the serial build
        # (the arrays are verified identical between the two paths)
        from don_crawler_ray.stages.fetch import make_raw_prefilter_keys

        rt = load_rounds_table(schedule_dir, rounds)
        keys, rnds = make_rounds_membership(rt)
        return rt.num_rows, keys, rnds, make_raw_prefilter_keys(rt)
    shift = np.uint64(64 - int(np.log2(n_buckets)))

    @ray.remote(num_returns=n_buckets)
    def _read_bucketed(frag_paths: list[str], wanted: list[int]):
        t = pads.dataset(frag_paths).to_table(
            columns=["url_hash", "raw_hash", "warc_ts", "round"],
            filter=(pads.field("status") == "scheduled")
            & (pads.field("round").isin(wanted)),
        )
        rnds = t.column("round").to_numpy(zero_copy_only=False).astype(np.int32)
        keys = _schedule_keys(t)
        rh = t.column("raw_hash").to_numpy(zero_copy_only=False)
        ts = (
            t.column("warc_ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        raw = combine_key(rh, ts)
        kb = (keys >> shift).astype(np.int64)
        rb = (raw >> shift).astype(np.int64)
        return tuple(
            (keys[kb == b], rnds[kb == b], raw[rb == b]) for b in range(n_buckets)
        )

    @ray.remote
    def _sort_bucket(*pieces):
        keys = np.concatenate([p[0] for p in pieces])
        rnds = np.concatenate([p[1] for p in pieces])
        raw = np.concatenate([p[2] for p in pieces])
        order = np.argsort(keys, kind="stable")
        return keys[order], rnds[order], np.sort(raw)

    piece_refs: list[list] = []  # [task][bucket]
    for i in range(0, len(paths), fragments_per_task):
        refs = _read_bucketed.remote(paths[i : i + fragments_per_task], rounds)
        piece_refs.append(list(refs) if n_buckets > 1 else [refs])
    sorted_refs = [
        _sort_bucket.remote(*[task_refs[b] for task_refs in piece_refs])
        for b in range(n_buckets)
    ]
    buckets = ray.get(sorted_refs)
    member_keys = np.concatenate([b[0] for b in buckets])
    member_rounds = np.concatenate([b[1] for b in buckets])
    raw_keys = np.concatenate([b[2] for b in buckets])
    return len(member_keys), member_keys, member_rounds, raw_keys


def schedule_fragment_stats(schedule_dir: str) -> tuple[int | None, dict, dict]:
    """One parallel metadata pass over the schedule: returns
    ``(max_round, status_counts, scheduled_round_counts)``;
    ``max_round`` is None when no fragment holds a scheduled row
    (callers default it, e.g. ``max_round_present or 0``).

    These three aggregates each used to be a driver-side column read —
    at a 10^10-row schedule the ``round`` column alone is 40 GB of
    driver heap. Ray tasks now scan fragment groups and return tiny
    count dicts; the driver merges dictionaries."""
    import ray

    paths = _schedule_fragment_paths(schedule_dir)

    def _frag_stats_local(frag_paths: list[str]):
        t = pads.dataset(frag_paths).to_table(columns=["status", "round"])
        status_counts = {
            r["values"]: r["counts"]
            for r in pc.value_counts(t.column("status")).to_pylist()
        }
        sched = t.filter(pc.equal(t.column("status"), "scheduled"))
        round_counts = {
            r["values"]: r["counts"]
            for r in pc.value_counts(sched.column("round")).to_pylist()
        }
        mx = pc.max(t.column("round")).as_py() if t.num_rows else None
        return mx, status_counts, round_counts

    if sum(os.path.getsize(p) for p in paths) < _SMALL_SCHEDULE_BYTES:
        return _frag_stats_local(paths)

    @ray.remote
    def _frag_stats(frag_paths: list[str]):
        t = pads.dataset(frag_paths).to_table(columns=["status", "round"])
        status_counts = {
            r["values"]: r["counts"]
            for r in pc.value_counts(t.column("status")).to_pylist()
        }
        sched = t.filter(pc.equal(t.column("status"), "scheduled"))
        round_counts = {
            r["values"]: r["counts"]
            for r in pc.value_counts(sched.column("round")).to_pylist()
        }
        mx = pc.max(t.column("round")).as_py() if t.num_rows else None
        return mx, status_counts, round_counts

    group = 8
    parts = ray.get(
        [_frag_stats.remote(paths[i : i + group]) for i in range(0, len(paths), group)]
    )
    max_round = max((p[0] for p in parts if p[0] is not None), default=None)
    status_counts: dict = {}
    round_counts: dict = {}
    for _, sc, rc in parts:
        for k, v in sc.items():
            status_counts[k] = status_counts.get(k, 0) + v
        for k, v in rc.items():
            round_counts[k] = round_counts.get(k, 0) + v
    return max_round, status_counts, round_counts


def plan_round_chunks(
    schedule_dir: str,
    pending: list[int],
    membership_byte_budget: int,
    round_counts: dict | None = None,
) -> list[list[int]]:
    """Group pending rounds into chunks whose broadcast key arrays stay
    under ``membership_byte_budget`` — the driver and each fetch actor
    hold one chunk's keys at a time, never the whole pending set (the
    round-membership scale fix, VERDICT r01 item 3). Rounds are budget-
    bounded by construction, so chunk count ~= total_keys x 12B /
    budget; each chunk costs one page-store scan — the budget trades
    scans against broadcast size explicitly. Pass ``round_counts`` from
    ``schedule_fragment_stats`` to reuse its parallel pass; without it
    the counts come from a driver-side pushdown read."""
    if round_counts is not None:
        counts = {k: v for k, v in round_counts.items() if k in set(pending)}
    else:
        counts = {}
        t = pads.dataset(schedule_dir).to_table(
            columns=["round"],
            filter=(pads.field("status") == "scheduled")
            & (pads.field("round").isin(pending)),
        )
        for row in pc.value_counts(t.column("round")).to_pylist():
            counts[row["values"]] = row["counts"]
    chunks: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for rnd in pending:
        b = counts.get(rnd, 0) * _MEMBERSHIP_BYTES_PER_KEY
        if cur and cur_bytes + b > membership_byte_budget:
            chunks.append(cur)
            cur, cur_bytes = [], 0
        cur.append(rnd)
        cur_bytes += b
    if cur:
        chunks.append(cur)
    return chunks


def run_fetch_rounds(
    frontier_path: str,
    rounds_table: pa.Table | None,
    out_dir: str,
    extract_concurrency: int | tuple | None = None,
    batch_size: int = 2048,
    scanner="auto",
    membership: tuple | None = None,
) -> None:
    """Fetch+extract EVERY pending round in ONE page-store scan; output
    lands hive-partitioned as ``out_dir/round=<N>/``. The per-round
    loop used to rescan the whole frontier once per round — O(rounds x
    full scan); this is O(1 scan) with the round looked up from the
    broadcast key array.

    ``membership``: optional precomputed ``(n_rows, member_keys,
    member_rounds, raw_keys)`` from ``build_chunk_membership`` (the
    distributed build); when absent the arrays are built driver-side
    from ``rounds_table``."""
    import ray

    from don_crawler_ray.stages.fetch import (
        make_fetch_extract_fn,
        make_raw_prefilter,
        make_raw_prefilter_keys,
    )

    if membership is not None:
        n_scheduled, keys, rounds, raw_keys = membership
    else:
        n_scheduled = rounds_table.num_rows
        keys, rounds = make_rounds_membership(rounds_table)
        raw_keys = None
    members_ref = ray.put(keys)
    rounds_ref = ray.put(rounds)
    # Read-task sizing: at real scale a 128 MiB in-memory block target
    # dominates, derived from the parquet footers' uncompressed sizes of
    # the columns this pass actually reads (a page store with 100 KiB
    # html rows gets ~1300 rows/task, a 1.5 KiB one ~90k — a fixed
    # divisor would under-parallelize the former). On small inputs that
    # quantizes to ~2 task-waves per core, idling most of the pool on
    # the last wave — floor the task count at 4x cluster CPUs so the
    # tail wave is short.
    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    frontier_rows, frontier_bytes = _frontier_read_stats(frontier_path, FETCH_COLUMNS)
    row_bytes = max(1, frontier_bytes // max(1, frontier_rows))
    rows_per_block = max(1024, (128 << 20) // row_bytes)
    n_blocks = max(4 * n_cpus, -(-frontier_rows // rows_per_block))
    ds = _read_frontier(frontier_path, FETCH_COLUMNS, override_num_blocks=n_blocks)
    # When the scheduled set covers a minority of the page store
    # (budgeted rounds / incremental crawls), drop non-members with one
    # raw-url FNV per row BEFORE the RFC 3986 canonicalize; above the
    # threshold the extra hash pass costs more than it saves.
    if n_scheduled < 0.5 * frontier_rows:
        if raw_keys is None:
            raw_keys = make_raw_prefilter_keys(rounds_table)
        raw_ref = ray.put(raw_keys)
        ds = ds.map_batches(make_raw_prefilter(raw_ref), batch_format="pyarrow")
    ds = ds.map_batches(canonicalize_stage, batch_format="pyarrow")
    if extract_concurrency is not None:
        # explicit pool sizing: keep the stateful actor-pool stage
        ds = ds.map_batches(
            FetchExtractActor,
            fn_constructor_kwargs={
                "members_ref": members_ref,
                "rounds_ref": rounds_ref,
                # driver-registered plug-in names resolve to their
                # factory here so fresh worker registries can build them
                "scanner": portable_scanner(scanner),
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=extract_concurrency,
        )
    else:
        # default: task-pool extract so read -> canonicalize -> extract
        # -> write FUSE into one task per block (no inter-stage object
        # store hops, no actor cold start); broadcast state resolves
        # zero-copy per process (make_fetch_extract_fn)
        ds = ds.map_batches(
            make_fetch_extract_fn(members_ref, rounds_ref, scanner=scanner),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    os.makedirs(out_dir, exist_ok=True)
    # zstd, not the parquet default snappy: extracted web text compresses
    # ~3.6x better at the same encode cost, and the saved IO is the
    # scaling bottleneck of the fetch pass (compression work is
    # per-block parallel, disk bandwidth is not)
    ds.write_parquet(out_dir, partition_cols=["round"], compression="zstd")


def _hash_col_local(path: str) -> np.ndarray:
    return (
        pq.read_table(path, columns=["url_hash"])
        .column("url_hash")
        .to_numpy(zero_copy_only=False)
        .astype(np.uint64)
    )


_REMOTE_CACHE: dict = {}


def _lazy_remote(fn):
    """``ray.remote(fn)`` wrapped once per process (lazily, matching
    the module's in-function ray imports) — an in-function
    ``ray.remote()`` would re-register a new remote function on every
    call (e.g. once per committed round)."""
    got = _REMOTE_CACHE.get(fn)
    if got is None:
        import ray

        got = _REMOTE_CACHE[fn] = ray.remote(fn)
    return got


def _round_dir_hashes(out_dir: str, rnd: int) -> np.ndarray:
    """url_hashes actually WRITTEN for a round (column-pruned read of
    the round's output). The seen set commits these — not the scheduled
    set — matching the reference's cache-only-after-successful-clone
    semantics (git/clone_repository.go:37-58; ADVICE r01 item 3): a URL
    scheduled but absent from the page store stays unseen and is
    retried on the next incremental crawl.

    Files are read in parallel Ray tasks (one per output file) — the
    serial per-file loop was a driver-side Amdahl term in the commit
    phase that grew with output file count. Concat order is sorted file
    order either way, so the seen set is byte-identical."""
    round_dir = os.path.join(out_dir, f"round={rnd}")
    if not os.path.isdir(round_dir):
        return np.empty(0, dtype=np.uint64)
    paths = [
        os.path.join(round_dir, name)
        for name in sorted(os.listdir(round_dir))
        if name.endswith(".parquet")
    ]
    if not paths:
        return np.empty(0, dtype=np.uint64)

    if sum(os.path.getsize(p) for p in paths) < _SMALL_SCHEDULE_BYTES:
        return np.concatenate([_hash_col_local(p) for p in paths])
    import ray

    return np.concatenate(
        ray.get([_lazy_remote(_hash_col_local).remote(p) for p in paths])
    )


def run_crawl(
    frontier_path: str,
    out_dir: str,
    politeness: PolitenessConfig | None = None,
    n_salts: int = 8,
    hot_hosts: frozenset[str] | None = None,
    n_seen_shards: int = 8,
    max_rounds: int | None = None,
    extract_concurrency=None,
    batch_size: int = 2048,
    resume: bool = False,
    seen_restore_dir: str | None = None,
    membership_byte_budget: int = 1 << 30,
    skip_hashes=None,
    scanner="auto",
) -> dict:
    """Full checkpointed crawl. Returns the run's counter dict
    (including per-phase wall times under ``phase_*`` keys)."""
    import time

    import ray

    tune_data_context()
    phases: dict[str, float] = {}
    _t = time.perf_counter
    t_start = _t()
    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    schedule_dir = os.path.join(out_dir, "schedule")
    seen_dir = os.path.join(out_dir, "seen")

    manifest = {
        "schedule_done": False,
        "completed_rounds": [],
        "counters": {},
        "n_seen_shards": n_seen_shards,
        # input lineage: the frontier's per-file identity at schedule
        # time. A resume against a mutated input would silently fetch a
        # DIFFERENT page set for the remaining rounds while keeping the
        # old schedule — fail loudly instead (north rule: per-partition
        # lineage).
        "input_lineage": _frontier_lineage(frontier_path),
    }
    if resume and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            manifest = json.load(f)
        prev = manifest.get("n_seen_shards", n_seen_shards)
        if prev != n_seen_shards:
            raise ValueError(
                f"resume requires the original n_seen_shards={prev} "
                f"(got {n_seen_shards}): shard routing is hash % n"
            )
        recorded = manifest.get("input_lineage")
        if recorded is not None:
            current = _frontier_lineage(frontier_path)
            if current != recorded:
                changed = sorted(
                    set(map(tuple, recorded)) ^ set(map(tuple, current))
                )[:5]
                raise ValueError(
                    "frontier input changed since the schedule was built "
                    f"(first differing fragments: {changed}); rerun with "
                    "resume=False to rebuild the schedule"
                )

    # --- seen shards (restored from snapshots if present) ------------------
    # seen_restore_dir enables INCREMENTAL crawls: restore a previous
    # run's committed seen set so its URLs are skipped as revisits (the
    # reference's clone-once / fetch-on-revisit cache, ST6,
    # git/clone_repository.go:37-58).
    SeenShardActor = ray.remote(num_cpus=0.1)(_seen_shard_cls())
    shards = [SeenShardActor.remote(shard_id=s) for s in range(n_seen_shards)]
    restore_from = seen_dir if resume else seen_restore_dir
    use_seen_filter = False
    if restore_from and os.path.isdir(restore_from):
        n_snapshot_files = sum(
            1
            for f in os.listdir(restore_from)
            if f.startswith("seen_shard_") and f.endswith(".npz")
        )
        if n_snapshot_files and n_snapshot_files != n_seen_shards:
            # shard routing is hash % n: loading a different shard count
            # would silently make revisit skipping partial (ADVICE r01)
            raise ValueError(
                f"seen snapshots in {restore_from} were written with "
                f"{n_snapshot_files} shards; this run uses {n_seen_shards}"
            )
        restored = ray.get([s.restore.remote(restore_from) for s in shards])
        use_seen_filter = any(restored)

    # --- schedule pass -----------------------------------------------------
    if not (manifest["schedule_done"] and os.path.isdir(schedule_dir)):
        sched_ds, hot = build_schedule(
            frontier_path,
            politeness,
            n_salts=n_salts,
            hot_hosts=hot_hosts,
            seen_shards=shards if use_seen_filter else None,
            skip_hashes=skip_hashes,
        )
        if os.path.isdir(schedule_dir):
            import shutil

            shutil.rmtree(schedule_dir)
        sched_ds.write_parquet(schedule_dir, compression="zstd")
        manifest["schedule_done"] = True
        manifest["hot_hosts"] = sorted(hot)
        _write_manifest(manifest_path, manifest)
        phases["schedule"] = round(_t() - t_start, 2)

    counters = dict(manifest.get("counters") or {})
    # ONE parallel metadata pass serves the status counters, the max
    # round, and the per-round chunk planning (each was a driver-side
    # column read before — 40+ GB of driver heap at a 10^10-row
    # schedule).
    max_round_present, sc, round_counts = schedule_fragment_stats(schedule_dir)
    counters["scheduled"] = sc.get("scheduled", 0)
    counters["robots_denied"] = sc.get("robots_denied", 0)
    counters["dedup_hit"] = sc.get("dedup_hit", 0)
    # revisit skips (cross-run seen-set anti-join): frontier rows that
    # never reached the shuffle. Frontier size from parquet metadata.
    counters["frontier_rows"] = _frontier_row_count(frontier_path)
    counters["revisit_skipped"] = max(
        0,
        counters["frontier_rows"]
        - counters["scheduled"]
        - counters["robots_denied"]
        - counters["dedup_hit"],
    )

    # --- rounds ------------------------------------------------------------
    n_rounds = (max_round_present or 0) + 1
    if max_rounds is not None:
        n_rounds = min(n_rounds, max_rounds)

    fetched_total = counters.get("fetched", 0)
    pending = [r for r in range(n_rounds) if r not in manifest["completed_rounds"]]
    if pending:
        # wipe any uncommitted round output from a killed run
        import shutil

        for rnd in pending:
            round_dir = os.path.join(out_dir, f"round={rnd}")
            if os.path.isdir(round_dir):
                shutil.rmtree(round_dir)

        # Fetch pending rounds in membership-bounded CHUNKS: each chunk
        # broadcasts only its own key array (<= membership_byte_budget)
        # and costs one page-store scan; commits land per chunk so a
        # kill mid-run loses at most one chunk of fetch work.
        for chunk in plan_round_chunks(
            schedule_dir, pending, membership_byte_budget, round_counts=round_counts
        ):
            t_round = _t()
            membership = build_chunk_membership(schedule_dir, chunk)
            if membership[0]:
                run_fetch_rounds(
                    frontier_path,
                    None,
                    out_dir,
                    extract_concurrency=extract_concurrency,
                    batch_size=batch_size,
                    scanner=scanner,
                    membership=membership,
                )
            phases["fetch"] = phases.get("fetch", 0.0) + round(_t() - t_round, 2)

            # commit the chunk's rounds IN ORDER: seen set += the round's
            # WRITTEN hashes, snapshot, manifest last.
            t_commit = _t()
            for rnd in chunk:
                hashes = _round_dir_hashes(out_dir, rnd)
                fetched_total += len(hashes)
                futures = []
                for s in range(n_seen_shards):
                    sel = hashes % np.uint64(n_seen_shards) == s
                    if sel.any():
                        futures.append(shards[s].add_many.remote(hashes[sel]))
                ray.get(futures)  # all shards ingest in parallel
                ray.get([s.snapshot.remote(seen_dir) for s in shards])
                manifest["completed_rounds"].append(rnd)
                counters["fetched"] = fetched_total
                manifest["counters"] = counters
                _write_manifest(manifest_path, manifest)
            phases["commit"] = phases.get("commit", 0.0) + round(_t() - t_commit, 2)

    counters["fetched"] = fetched_total
    for k, v in phases.items():
        counters[f"phase_{k}"] = round(v, 2)
    counters["rounds"] = len(manifest["completed_rounds"])
    seen_sizes = ray.get([s.stats.remote() for s in shards])
    counters["seen_set_size"] = int(sum(st["size"] for st in seen_sizes))
    manifest["counters"] = counters
    _write_manifest(manifest_path, manifest)
    with open(os.path.join(out_dir, "counters.json"), "w") as f:
        json.dump(counters, f, indent=1, sort_keys=True)
    for s in shards:
        ray.kill(s)
    return counters


def _frontier_lineage(frontier_path: str) -> list:
    """Per-fragment identity of the input: sorted (relative path,
    parquet row count) pairs from footers only — cheap, and row counts
    catch both replaced files and appended rows. JSON-roundtrip-stable
    (lists, not tuples)."""
    if os.path.isfile(frontier_path):
        return [[os.path.basename(frontier_path), pq.ParquetFile(frontier_path).metadata.num_rows]]
    out = []
    for name in sorted(os.listdir(frontier_path)):
        if name.endswith(".parquet"):
            p = os.path.join(frontier_path, name)
            out.append([name, pq.ParquetFile(p).metadata.num_rows])
    return out


def _frontier_row_count(frontier_path: str) -> int:
    """Row count from parquet footers only (no data read)."""
    if os.path.isfile(frontier_path):
        return pq.ParquetFile(frontier_path).metadata.num_rows
    total = 0
    for name in os.listdir(frontier_path):
        if name.endswith(".parquet"):
            total += pq.ParquetFile(os.path.join(frontier_path, name)).metadata.num_rows
    return total


def _frontier_read_stats(frontier_path: str, columns: list[str]) -> tuple[int, int]:
    """(rows, uncompressed bytes of ``columns``) from parquet footers
    only — the in-memory size basis for read-task sizing. Counting just
    the columns the fetch pass reads matters: the page store's html
    column dominates the file, so whole-file numbers would be right
    here but wrong for any slim-column reader reusing this."""
    paths = (
        [frontier_path]
        if os.path.isfile(frontier_path)
        else [
            os.path.join(frontier_path, n)
            for n in os.listdir(frontier_path)
            if n.endswith(".parquet")
        ]
    )
    want = set(columns)
    rows = 0
    nbytes = 0
    for p in paths:
        md = pq.ParquetFile(p).metadata
        rows += md.num_rows
        for g in range(md.num_row_groups):
            rg = md.row_group(g)
            for c in range(rg.num_columns):
                col = rg.column(c)
                if col.path_in_schema.split(".")[0] in want:
                    nbytes += col.total_uncompressed_size
    return rows, nbytes


def seen_set_hashes(out_dir: str) -> np.ndarray:
    """Sorted uint64 seen-set from the committed snapshots (the byte-
    comparable artifact for the north rule's seen-set equality check)."""
    seen_dir = os.path.join(out_dir, "seen")
    out = []
    for name in sorted(os.listdir(seen_dir)):
        if name.startswith("seen_shard_") and name.endswith(".npz"):
            out.append(np.load(os.path.join(seen_dir, name))["exact"])
    return np.sort(np.concatenate(out)) if out else np.empty(0, np.uint64)


def _file_text_digest(path: str) -> tuple[int, int]:
    """(wrap-around digest sum, rows) for ONE output parquet file —
    per-row blake2b(url|text) summed mod 2^128. The sum is commutative,
    so per-file partials reduce to the same value in any order."""
    import hashlib

    acc = 0
    rows = 0
    scanner = pads.dataset(path).scanner(
        columns=["canonical_url", "text"], batch_size=8192
    )
    for batch in scanner.to_batches():
        for u, txt in zip(
            batch.column("canonical_url").to_pylist(),
            batch.column("text").to_pylist(),
        ):
            d = hashlib.blake2b((u + "\x00" + txt).encode(), digest_size=16).digest()
            acc = (acc + int.from_bytes(d, "little")) % (1 << 128)
            rows += 1
    return acc, rows


def crawl_digests(out_dir: str) -> dict:
    """Determinism artifacts: sorted seen-set hash + an ORDER-INSENSITIVE
    per-row text digest (wrap-around sum of per-row blake2b(url|text)
    words). Per-FILE partials fan out as Ray tasks (the blake2b row loop
    was a serial driver tail that grew with output size; the commutative
    sum makes the parallel reduce byte-identical) and never concatenate
    the output (a single-chunk string column overflows arrow's 2 GiB
    offset limit at multi-million-row rounds). Equal digests at any
    parallelism are the north-rule evidence of identical crawl output;
    surfaced per run by ``bench.py`` and the ``crawl_counters`` query."""
    import hashlib

    seen = seen_set_hashes(out_dir)
    h = hashlib.blake2b(digest_size=16)
    h.update(np.ascontiguousarray(seen).tobytes())
    seen_digest = h.hexdigest()

    paths = []
    for name in sorted(os.listdir(out_dir)):
        if not name.startswith("round="):
            continue
        round_dir = os.path.join(out_dir, name)
        paths.extend(
            os.path.join(round_dir, f)
            for f in sorted(os.listdir(round_dir))
            if f.endswith(".parquet")
        )

    import ray

    if len(paths) > 1 and ray.is_initialized():
        partials = ray.get([_lazy_remote(_file_text_digest).remote(p) for p in paths])
    else:
        partials = [_file_text_digest(p) for p in paths]
    acc = sum(a for a, _ in partials) % (1 << 128)
    rows = sum(r for _, r in partials)
    return {"seen_digest": seen_digest, "text_digest": f"{acc:032x}", "rows": rows}


def crawl_output_table(out_dir: str, columns=None, max_rows: int | None = None) -> pa.Table:
    """Read the crawl output (all rounds) sorted deterministically.

    DRIVER-SIDE materialization — tests / small verification reads
    only. Guarded by the same cap as ``crawl_dataset`` (the row count
    comes from parquet metadata, before any data is read) so a large
    run can't OOM the driver by accident; large outputs should be
    consumed as a Dataset (``ray.data.read_parquet(out_dir/round=*)``)."""
    cap = CRAWL_DATASET_MAX_ROWS if max_rows is None else max_rows
    dsets = []
    for name in sorted(os.listdir(out_dir)):
        if name.startswith("round="):
            dsets.append(pads.dataset(os.path.join(out_dir, name)))
    if not dsets:
        return pa.table({})
    n_rows = sum(d.count_rows() for d in dsets)
    if n_rows > cap:
        raise ValueError(
            f"crawl_output_table would materialize {n_rows} rows on the "
            f"driver (> {cap}); read {out_dir}/round=* as a Dataset instead"
        )
    t = pa.concat_tables(d.to_table(columns=columns) for d in dsets)
    # large_string offsets: a sorted take on a multi-GiB text column
    # overflows 32-bit string offsets otherwise
    schema = pa.schema(
        [
            (f.name, pa.large_string() if f.type == pa.string() else f.type)
            for f in t.schema
        ]
    )
    t = t.cast(schema)
    return t.take(
        pc.sort_indices(t, sort_keys=[("host_key", "ascending"), ("canonical_url", "ascending")])
    )


def _seen_shard_cls():
    from don_crawler_ray.state.cuckoo import SeenShard

    return SeenShard


def _write_manifest(path: str, manifest: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


# --- flagship single-shot variant (entry()/tests) --------------------------

CRAWL_DATASET_MAX_ROWS = 2_000_000

def crawl_dataset(
    frontier_path: str,
    politeness: PolitenessConfig | None = None,
    n_salts: int = 4,
    extract_concurrency=None,
    batch_size: int = 512,
    scanner="auto",
):
    """One-shot streaming crawl (no checkpointing): schedule in memory,
    fetch+extract round 0, return the lazy extracted Dataset.

    The schedule is materialized on the DRIVER here — acceptable only
    for small inputs (the flagship ``entry()`` / tests); large
    frontiers must use ``run_crawl``, whose schedule stays on disk and
    whose membership broadcasts are byte-budgeted. Gated explicitly so
    the driver cannot be OOMed by accident."""
    import ray

    n_rows = _frontier_row_count(frontier_path)
    if n_rows > CRAWL_DATASET_MAX_ROWS:
        raise ValueError(
            f"crawl_dataset materializes the schedule driver-side; the frontier has "
            f"{n_rows} rows (> {CRAWL_DATASET_MAX_ROWS}). Use run_crawl() instead."
        )
    sched_ds, _hot = build_schedule(frontier_path, politeness, n_salts=n_salts)
    sched_tbl = pa.concat_tables(
        ray.get(sched_ds.to_arrow_refs()), promote_options="default"
    )
    mask = pc.and_(
        pc.equal(sched_tbl.column("status"), "scheduled"),
        pc.equal(sched_tbl.column("round"), 0),
    )
    round0 = sched_tbl.filter(mask)
    members = make_round_membership(round0)

    ds = ray.data.read_parquet(frontier_path, columns=FETCH_COLUMNS)
    ds = ds.map_batches(canonicalize_stage, batch_format="pyarrow")
    ds = ds.map_batches(make_membership_filter(members), batch_format="pyarrow")
    ds = ds.map_batches(
        ExtractActor,
        fn_constructor_kwargs={"scanner": portable_scanner(scanner)},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=extract_concurrency or default_extract_concurrency(),
    )
    return ds.select_columns(
        ["canonical_url", "host", "host_key", "url_hash", "warc_ts", "text", "description", "text_len"]
    )


def crawl_single_url(
    url: str,
    frontier_path: str,
    politeness: PolitenessConfig | None = None,
    transport: str = "store",
    timeout_s: float = 10.0,
):
    """Single-URL crawl mode — the ``crawl-software`` entry point
    (``cmd/crawl-software.go:28-42`` -> ``CrawlSoftwareByID``,
    ``crawler/crawler.go:106-153``): one row through the same pipeline.

    The URL is canonicalized (``.git`` suffix stripped per
    ``crawler/crawler.go:121`` intent), robots-checked, fetched, and
    extracted. Returns a pyarrow Table with 0 or 1 rows.

    ``transport="store"`` (default) matches against the frontier page
    store; ``transport="http"`` performs a LIVE GET with the
    reference's rate-limit retry loop (``stages/http_fetch.py``,
    ``publiccodeGetStatusWithRetry`` parity) — ``frontier_path`` is
    ignored on that path.
    """
    import ray

    from don_crawler_ray.functions.urlnorm import canonicalize_url, strip_git_suffix, url_hash64, url_host

    politeness = politeness or PolitenessConfig()
    canon = canonicalize_url(strip_git_suffix(url))
    host = url_host(canon)
    path = canon.split(host, 1)[1] if host and host in canon else "/"
    if not politeness.rules(host).allowed(path.split("?")[0]):
        return pa.table(
            {
                "canonical_url": pa.array([canon]),
                "status": pa.array(["robots_denied"]),
                "text": pa.array([None], pa.string()),
            }
        )
    if transport == "http":
        return _crawl_single_url_http(canon, timeout_s)
    if transport != "store":
        raise ValueError(f"unknown transport {transport!r} (expected 'store' or 'http')")
    target = url_hash64(canon)

    ds = _read_frontier(frontier_path, FETCH_COLUMNS)
    ds = ds.map_batches(canonicalize_stage, batch_format="pyarrow")

    def pick(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("url_hash"), pa.scalar(target, pa.uint64()))
        return batch.filter(mask)

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    if not rows:
        return pa.table(
            {
                "canonical_url": pa.array([canon]),
                "status": pa.array(["not_found"]),
                "text": pa.array([None], pa.string()),
            }
        )
    # first-wins dedup: min (warc_ts, url)
    rows.sort(key=lambda r: (r["warc_ts"], r["url"]))
    row = rows[0]
    from don_crawler_ray.functions.extract import description_from_readme, extract_text

    text = extract_text(row["html"])
    return pa.table(
        {
            "canonical_url": pa.array([canon]),
            "status": pa.array(["fetched"]),
            "text": pa.array([text]),
            "description": pa.array([description_from_readme(text)]),
        }
    )


def _crawl_single_url_http(canon: str, timeout_s: float) -> pa.Table:
    """Live-transport single-URL path: GET with the reference retry
    loop, then the standard extract kernel. Failure classes map to the
    same status strings the store path uses (plus the live-only
    ``rate_limit_exhausted`` / ``fetch_failed``)."""
    import urllib.error

    from don_crawler_ray.functions.extract import description_from_readme, extract_text
    from don_crawler_ray.stages.http_fetch import (
        FetchContext,
        FetchDeadlineExceeded,
        RateLimitExhausted,
        get_with_retry,
    )

    def _row(status: str, text=None, description=None):
        return pa.table(
            {
                "canonical_url": pa.array([canon]),
                "status": pa.array([status]),
                "text": pa.array([text], pa.string()),
                "description": pa.array([description], pa.string()),
            }
        )

    try:
        code, _hdrs, body = get_with_retry(canon, ctx=FetchContext(timeout_s=timeout_s))
    except RateLimitExhausted:
        return _row("rate_limit_exhausted")
    except (FetchDeadlineExceeded, urllib.error.URLError, OSError):
        return _row("fetch_failed")
    if code != 200:
        return _row("not_found" if code == 404 else "fetch_failed")
    text = extract_text(body.decode("utf-8", errors="replace"))
    return _row("fetched", text, description_from_readme(text))
