"""Fetch + extract stages — broadcast round membership, actor-pool extract.

Scale design (SURVEY.md §3.4/§7): the schedule pass decides WHAT to
fetch; the fetch pass is then embarrassingly parallel — read the page
store with column pruning, keep only rows whose ``(url_hash, warc_ts)``
was scheduled for this round (a broadcast semi-join: the small side is
``ray.put`` once per round, ``np.searchsorted`` membership per batch —
no shuffle of page bytes), then extract text in a stateful actor pool.

In this sandbox "fetch" is the lookup of ``html`` from the input table
(BASELINE.md protocol); on a real crawl the membership filter instead
feeds an async-HTTP actor pool with the same signature. Reference
analog: the publiccode probe + clone stage
(``crawler/crawler.go:268-347``, ``git/clone_repository.go:20-71``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_TS_MIX = np.uint64(0x9E3779B97F4A7C15)


def combine_key(
    url_hash: np.ndarray, warc_ts_us: np.ndarray, raw_hash: np.ndarray | None = None
) -> np.ndarray:
    """uint64 key combining (url_hash, warc_ts[, raw_hash]) for
    membership checks.

    The schedule's first-wins dedup picks one (url, warc_ts, raw url)
    per canonical URL; matching on the combined key re-identifies
    exactly that row in the page store without a shuffle join. The raw
    hash distinguishes distinct raw URLs sharing (canonical, warc_ts)
    — without it both would pass the semi-join and duplicate output.
    """
    with np.errstate(over="ignore"):
        z = url_hash.astype(np.uint64) + _TS_MIX * warc_ts_us.astype(np.uint64)
        if raw_hash is not None:
            z += np.uint64(0x94D049BB133111EB) * raw_hash.astype(np.uint64)
        z ^= z >> np.uint64(29)
        z *= np.uint64(0xBF58476D1CE4E5B9)
        z ^= z >> np.uint64(32)
    return z


def _schedule_keys(schedule_table: pa.Table) -> np.ndarray:
    h = schedule_table.column("url_hash").to_numpy(zero_copy_only=False)
    ts = (
        schedule_table.column("warc_ts")
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
    raw = (
        schedule_table.column("raw_hash").to_numpy(zero_copy_only=False)
        if "raw_hash" in schedule_table.column_names
        else None
    )
    return combine_key(h, ts, raw)


def _batch_keys(batch: pa.Table) -> np.ndarray:
    h = batch.column("url_hash").to_numpy(zero_copy_only=False)
    ts = (
        batch.column("warc_ts")
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
    raw = (
        batch.column("raw_hash").to_numpy(zero_copy_only=False)
        if "raw_hash" in batch.column_names
        else None
    )
    return combine_key(h, ts, raw)


def make_round_membership(schedule_round: pa.Table) -> np.ndarray:
    """Sorted combined-key array for one round's scheduled rows (the
    broadcast small side)."""
    return np.sort(_schedule_keys(schedule_round))


def make_raw_prefilter_keys(schedule_table: pa.Table) -> np.ndarray:
    """Sorted (raw_hash, warc_ts) combined keys — the cheap PRE-filter
    side. A page-store row can be tested against these with one FNV of
    its raw url (no RFC 3986 parse), so when the scheduled set is a
    small fraction of the store (budgeted rounds, incremental crawls)
    most rows are dropped before the expensive canonicalize. False
    positives pass through and are removed by the exact three-part
    membership key afterwards — output is identical either way."""
    rh = schedule_table.column("raw_hash").to_numpy(zero_copy_only=False)
    ts = (
        schedule_table.column("warc_ts")
        .to_numpy(zero_copy_only=False)
        .astype("datetime64[us]")
        .astype(np.int64)
    )
    return np.sort(combine_key(rh, ts))


_ARRAY_CACHE: dict = {}


def _resolve_array(ref_or_arr) -> np.ndarray:
    """Per-process cache for ray.put numpy arrays referenced from
    stateless fused kernels (closure-captured raw arrays would re-ship
    with every task)."""
    if isinstance(ref_or_arr, np.ndarray):
        return ref_or_arr
    key = ref_or_arr.hex() if hasattr(ref_or_arr, "hex") else id(ref_or_arr)
    arr = _ARRAY_CACHE.get(key)
    if arr is None:
        import ray

        arr = ray.get(ref_or_arr)
        # bounded LRU-ish cache: a worker alternating between a few
        # broadcast arrays in one run must not re-fetch per batch
        while len(_ARRAY_CACHE) >= 4:
            _ARRAY_CACHE.pop(next(iter(_ARRAY_CACHE)))
        _ARRAY_CACHE[key] = arr
    return arr


def make_raw_prefilter(raw_keys_ref):
    """map_batches kernel: FNV the raw url (no parse), drop rows whose
    (raw_hash, warc_ts) is not scheduled. Fuses ahead of canonicalize."""
    from don_crawler_ray.functions.urlnorm import url_hash64

    def _pre(batch: pa.Table) -> pa.Table:
        raw_keys = _resolve_array(raw_keys_ref)
        urls = batch.column("url").to_pylist()
        rh = np.fromiter((url_hash64(u) for u in urls), np.uint64, len(urls))
        ts = (
            batch.column("warc_ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        keys = combine_key(rh, ts)
        if not len(raw_keys):
            return batch.filter(pa.array(np.zeros(len(keys), bool)))
        idx = np.clip(np.searchsorted(raw_keys, keys), 0, len(raw_keys) - 1)
        return batch.filter(pa.array(raw_keys[idx] == keys))

    return _pre


def make_rounds_membership(schedule_rounds: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Multi-round broadcast side: sorted combined keys + the round each
    key belongs to (aligned). One page-store scan then serves EVERY
    pending round — the output is partitioned by the looked-up round."""
    rounds = schedule_rounds.column("round").to_numpy(zero_copy_only=False).astype(np.int32)
    keys = _schedule_keys(schedule_rounds)
    order = np.argsort(keys, kind="stable")
    return keys[order], rounds[order]


def make_membership_filter(member_keys: np.ndarray):
    """map_batches kernel: keep rows whose combined key is scheduled.

    ``member_keys`` is closure-captured; Ray serializes it once per task
    (for very large rounds pass a ``ray.ObjectRef`` via
    ``fn_constructor_kwargs`` on an actor class instead).
    """

    def _filter(batch: pa.Table) -> pa.Table:
        keys = _batch_keys(batch)
        idx = np.searchsorted(member_keys, keys)
        idx = np.clip(idx, 0, len(member_keys) - 1)
        mask = member_keys[idx] == keys if len(member_keys) else np.zeros(len(keys), bool)
        return batch.filter(pa.array(mask))

    return _filter


class ExtractActor:
    """Stateful extract stage for ``map_batches(ExtractActor, concurrency=N)``.

    The extract strategy is resolved from the scanner REGISTRY by name
    in ``__init__`` (once per actor — the ST8 held-client seam and the
    ``scanner.Scanner`` plug-in surface, ``scanner/scanner.go:13-17``);
    per-batch work delegates to the scanner's vectorizable kernel
    (M12/M20 analog). Drops ``html`` from the output immediately: page
    bytes never travel past extraction (SURVEY §7 hard part e).
    """

    def __init__(self, keep_html: bool = False, scanner="html"):
        # resolve_scanner accepts a registry name, a Scanner instance,
        # or a factory — pass non-builtin plug-ins as factory/instance
        # through fn_constructor_kwargs, since a worker's freshly
        # imported registry only holds self-registered builtins
        from don_crawler_ray.registry import resolve_scanner

        self.keep_html = keep_html
        self.scanner = resolve_scanner(scanner)
        self.pages = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self.pages += batch.num_rows
        out = self.scanner.extract(batch)
        if self.keep_html:
            out = out.append_column("html", batch.column("html"))
        return out


class FetchExtractActor:
    """Fused membership-filter + extract actor: the round's scheduled-key
    array is ``ray.put`` ONCE and fetched per ACTOR in ``__init__`` (a
    closure-captured array would be re-serialized into every task —
    gigabytes at 10^10-URL rounds). Output drops ``html``."""

    def __init__(self, members_ref, rounds_ref=None, scanner="html"):
        import ray

        self.members = (
            ray.get(members_ref) if not isinstance(members_ref, np.ndarray) else members_ref
        )
        self.rounds = None
        if rounds_ref is not None:
            self.rounds = (
                ray.get(rounds_ref) if not isinstance(rounds_ref, np.ndarray) else rounds_ref
            )
        self.extract = ExtractActor(scanner=scanner)

    def __call__(self, batch: pa.Table) -> pa.Table:
        members = self.members
        keys = _batch_keys(batch)
        if len(members):
            idx = np.clip(np.searchsorted(members, keys), 0, len(members) - 1)
            mask = members[idx] == keys
        else:
            mask = np.zeros(len(keys), bool)
        kept = batch.filter(pa.array(mask))
        out = self.extract(kept) if kept.num_rows else _empty_extract_table(kept)
        # project here: a separate Project op would re-ship every text
        # block through the object store once more
        out = out.select(_OUTPUT_COLUMNS)
        if self.rounds is not None:
            if kept.num_rows:
                kept_idx = idx[mask]
                out = out.append_column(
                    "round", pa.array(self.rounds[kept_idx], pa.int32())
                )
            else:
                out = out.append_column("round", pa.array([], pa.int32()))
        return out


_OUTPUT_COLUMNS = [
    "canonical_url", "host", "host_key", "url_hash", "warc_ts",
    "text", "description", "text_len",
]

_EXTRACT_CACHE: dict = {}


def make_fetch_extract_fn(members_ref, rounds_ref=None, scanner="html", scanner_key=None):
    """Task-pool variant of ``FetchExtractActor``: a plain function so
    the streaming executor FUSES read -> canonicalize -> extract ->
    write into one task per block — page bytes never touch the object
    store between stages, and there is no actor-pool cold start or
    autoscale ramp. The broadcast membership arrays resolve through the
    per-process ``_resolve_array`` cache as zero-copy read-only views of
    the object store (same sharing as the actor's ``__init__`` fetch).
    Output is identical to the actor path (shared ``__call__`` body).

    Worker construction is cached per process ONLY under a stable key:
    for string scanners, the PRE-resolution registry name plus the
    resolved factory's qualname (so plug-in names keep their per-process
    cache, and re-registering a name with a different factory class
    misses instead of aliasing a stale worker); or a caller-supplied
    ``scanner_key`` for instance/factory scanners. A non-string scanner
    WITHOUT a key is rebuilt per batch — each task deserializes a fresh
    scanner object, so an ``id()``-based key would never hit and (worse)
    a recycled id could alias a stale worker built with a different
    scanner (ADVICE r03)."""
    from don_crawler_ray.registry import portable_scanner, scanner_generation

    name = scanner if isinstance(scanner, str) else None
    scanner = portable_scanner(scanner)  # driver side: ship plug-ins as factories
    if name is not None:
        # module + qualname + the name's registration GENERATION: two
        # distinct plug-in factories can share a bare qualname (classes
        # produced by one factory function, or a re-registration of the
        # same class with different config baked in) — the generation
        # bump on every register_scanner() guarantees a cache miss for
        # superseded factories (ADVICE r04)
        resolved = (
            ""
            if scanner is name
            else f"{getattr(scanner, '__module__', '')}:{getattr(scanner, '__qualname__', '')}"
        )
        cache_key = ("name", name, resolved, scanner_generation(name))
    elif scanner_key is not None:
        cache_key = ("user", scanner_key)
    else:
        cache_key = None

    def _fn(batch: pa.Table) -> pa.Table:
        worker = _EXTRACT_CACHE.get(cache_key) if cache_key is not None else None
        if worker is None:
            worker = FetchExtractActor(
                np.empty(0, np.uint64), rounds_ref=None, scanner=scanner
            )
            if cache_key is not None:
                _EXTRACT_CACHE[cache_key] = worker
        worker.members = _resolve_array(members_ref)
        worker.rounds = None if rounds_ref is None else _resolve_array(rounds_ref)
        return worker(batch)

    return _fn


def _empty_extract_table(batch: pa.Table) -> pa.Table:
    out = batch.drop_columns(["html"])
    return (
        out.append_column("text", pa.array([], pa.string()))
        .append_column("description", pa.array([], pa.string()))
        .append_column("text_len", pa.array([], pa.int64()))
    )


def make_hash_skip_filter(skip_hashes: np.ndarray):
    """map_batches kernel dropping rows whose canonical ``url_hash`` is
    in the broadcast skip set (sorted uint64). The repo-metadata
    pre-filter: the reference skips forks and private/archived repos at
    discovery time (``scanner/github.go:198-200`` private/archived,
    ``:373-375`` forks, ``scanner/bitbucket.go:57-61``) — here the skip
    set is the metadata table's flagged repos, broadcast once, applied
    before the schedule shuffle so flagged rows never shuffle."""
    skip = np.sort(np.asarray(skip_hashes, dtype=np.uint64))

    def _filter(batch: pa.Table) -> pa.Table:
        if not len(skip):
            return batch
        h = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        idx = np.clip(np.searchsorted(skip, h), 0, len(skip) - 1)
        return batch.filter(pa.array(skip[idx] != h))

    return _filter


class SeenFilterActor:
    """Cross-run revisit filter: drops rows whose canonical hash is in
    the committed seen set (read-only ``contains`` against the seen
    shards — updates are committed only after a round lands, so
    within-run dedup determinism is untouched; SURVEY §7 step 3)."""

    def __init__(self, shard_handles):
        self.shards = shard_handles
        self.n = len(shard_handles)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import ray

        h = batch.column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
        shard_ids = (h % np.uint64(self.n)).astype(np.int64)
        mask = np.zeros(len(h), dtype=bool)
        futures = {}
        for s in range(self.n):
            sel = shard_ids == s
            if sel.any():
                futures[s] = (sel, self.shards[s].contains.remote(h[sel]))
        for s, (sel, fut) in futures.items():
            mask[sel] = ray.get(fut)
        return batch.filter(pa.array(~mask))
