"""Cuckoo-filter URL-seen set — sharded actor state with snapshots.

Scale analog of the reference's clone-cache "have I seen this repo"
check (``git/clone_repository.go:30, 37-58`` — ST6 in SURVEY.md §2.3):
the disk-existence test becomes an approximate-membership filter
sharded by canonical-URL hash, one shard actor per hash range, so a
10^10-URL seen set spreads across the cluster instead of living on one
node's disk.

Design (SURVEY.md §2.5/§7):
- ``CuckooFilter``: standard (2,4)-cuckoo filter — 2 candidate buckets
  per item, 4 slots per bucket, 16-bit fingerprints, partial-key
  eviction (Fan et al., CoNEXT'14 — public algorithm). numpy-backed.
- ``SeenShard``: a Ray actor owning one hash range. The filter is the
  fast membership pre-pass; an exact uint64 hash set alongside it makes
  the seen set byte-reproducible (false positives are verified against
  the exact set) — verification mode required by the north rule's
  "matching URL-seen set" criterion.
- ``snapshot()/restore()``: per-shard persistence for checkpoint/resume
  (ST6's "clone once, fetch on revisit" becomes "skip URL on revisit").

Shard routing: ``shard_id = url_hash % n_shards`` — the same uint64
key the dedup shuffle uses, so one partitioning scheme serves both.
"""

from __future__ import annotations

import os

import numpy as np

_EMPTY = np.uint16(0)


class CuckooFilter:
    """(2,4)-cuckoo filter over uint64 keys, 16-bit fingerprints."""

    MAX_KICKS = 500

    def __init__(self, capacity: int):
        # ~95% load factor headroom: buckets = next pow2 of capacity/4.
        n_buckets = 1
        while n_buckets * 4 < capacity * 1.05:
            n_buckets *= 2
        self.n_buckets = n_buckets
        self._mask = np.uint64(n_buckets - 1)
        self.table = np.zeros((n_buckets, 4), dtype=np.uint16)
        self.count = 0
        # deterministic eviction cursor (NO random choice: inserts must
        # be reproducible across runs for snapshot byte-equality)
        self._evict_cursor = 0

    def _fingerprint(self, h: np.ndarray | int):
        # fp in [1, 65535]: 0 is the empty marker.
        fp = (np.uint64(h) >> np.uint64(48)).astype(np.uint16) if isinstance(h, np.ndarray) else np.uint16((int(h) >> 48) & 0xFFFF)
        return np.where(fp == 0, np.uint16(1), fp) if isinstance(h, np.ndarray) else (fp if fp != 0 else np.uint16(1))

    def _i1(self, h):
        return np.uint64(h) & self._mask

    def _alt_index(self, i, fp):
        # i2 = i1 XOR hash(fp); splitmix-style odd-multiplier scramble.
        with np.errstate(over="ignore"):
            scram = (np.uint64(fp) * np.uint64(0x5BD1E9955BD1E995)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        return (np.uint64(i) ^ scram) & self._mask

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for a uint64 array."""
        h = hashes.astype(np.uint64)
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (h & self._mask).astype(np.int64)
        i2 = self._alt_index(i1.astype(np.uint64), fp).astype(np.int64)
        rows1 = self.table[i1]  # (n, 4)
        rows2 = self.table[i2]
        fpc = fp[:, None]
        return ((rows1 == fpc) | (rows2 == fpc)).any(axis=1)

    def insert(self, h: int) -> bool:
        """Insert one key; False if the filter is full (kick limit).

        Pure-int hot path (numpy scalar ops cost ~1us each; python int
        arithmetic is ~20x cheaper — this runs once per NEW url)."""
        mask = self.n_buckets - 1
        h = int(h)
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        i1 = h & mask
        i2 = (i1 ^ ((fp * 0x5BD1E9955BD1E995) & 0xFFFFFFFFFFFFFFFF)) & mask
        table = self.table
        for i in (i1, i2):
            row = table[i]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    self.count += 1
                    return True
        # evict deterministically
        i = i1 if (self._evict_cursor & 1) == 0 else i2
        for kick in range(self.MAX_KICKS):
            slot = (self._evict_cursor + kick) % 4
            self._evict_cursor = (self._evict_cursor + 1) & 0x7FFFFFFF
            old = int(table[i, slot])
            table[i, slot] = fp
            fp = old
            i = (i ^ ((fp * 0x5BD1E9955BD1E995) & 0xFFFFFFFFFFFFFFFF)) & mask
            row = table[i]
            for s in range(4):
                if row[s] == 0:
                    row[s] = fp
                    self.count += 1
                    return True
        return False

    def insert_many(self, keys_sorted: np.ndarray) -> np.ndarray:
        """Vectorized bulk insert of unique uint64 keys (caller sorts —
        a deterministic order makes the table bytes reproducible).

        Rows are left-packed invariantly (sequential inserts fill the
        first empty slot; evictions overwrite in place), so a bucket's
        free slots are exactly ``occ[b]..3`` and placement is a pure
        scatter: group keys by candidate bucket, give the first
        ``4 - occ`` of each group slots ``occ + rank``. Two passes
        (i1 then i2) place everything that needs no eviction; the
        returned mask marks leftovers for the per-key eviction path
        (rare below ~50% load — the shard grows at 90%)."""
        h = keys_sorted.astype(np.uint64)
        n = len(h)
        unplaced = np.ones(n, dtype=bool)
        if n == 0:
            return unplaced
        fp = (h >> np.uint64(48)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (h & self._mask).astype(np.int64)
        i2 = self._alt_index(i1.astype(np.uint64), fp).astype(np.int64)
        for cand in (i1, i2):
            idx = np.flatnonzero(unplaced)
            if not len(idx):
                break
            b = cand[idx]
            order = np.argsort(b, kind="stable")
            bs = b[order]
            # occupancy read per candidate bucket AFTER the previous
            # pass's scatter (rows are left-packed, so occupancy is the
            # first free slot); constant within a group since groups
            # scatter only below
            occ_b = (self.table[bs] != _EMPTY).sum(axis=1)
            starts = np.flatnonzero(np.concatenate([[True], bs[1:] != bs[:-1]]))
            seg_len = np.diff(np.append(starts, len(bs)))
            seg = np.repeat(np.arange(len(starts)), seg_len)
            cumcount = np.arange(len(bs)) - starts[seg]
            place = cumcount < (4 - occ_b)
            rows = bs[place]
            slots = occ_b[place] + cumcount[place]
            placed_keys = idx[order[place]]
            self.table[rows, slots] = fp[placed_keys]
            self.count += int(place.sum())
            unplaced[placed_keys] = False
        return unplaced

    def state(self) -> dict:
        return {"table": self.table, "count": self.count, "cursor": self._evict_cursor}

    @classmethod
    def from_state(cls, st: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.table = st["table"]
        f.n_buckets = f.table.shape[0]
        f._mask = np.uint64(f.n_buckets - 1)
        f.count = int(st["count"])
        f._evict_cursor = int(st["cursor"])
        return f


class SeenShard:
    """One hash-range shard of the URL-seen set (deployed as a Ray actor).

    ``check_and_add`` is the anti-join primitive: given a batch of
    uint64 url hashes it returns a boolean mask of which were NEW, and
    adds them. The cuckoo filter answers the common case in one
    vectorized probe; exact verification removes false positives so the
    final seen set is byte-reproducible.
    """

    DELTA_LIMIT = 1 << 18

    def __init__(self, shard_id: int = 0, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.filter = CuckooFilter(capacity)
        # exact store, LSM-style: a sorted uint64 BASE array (8 B/key —
        # a Python int set costs ~60 B/key, which at a 10^9-key shard is
        # the difference between 8 GB and 60 GB of actor heap) plus a
        # small DELTA set absorbing per-batch inserts so check_and_add
        # isn't O(base) per call; the delta folds into the base when it
        # passes DELTA_LIMIT or a read needs the merged view.
        self.base = np.empty(0, dtype=np.uint64)
        self.delta: set[int] = set()
        self.dedup_hits = 0

    def _size(self) -> int:
        return len(self.base) + len(self.delta)

    def _in_base(self, h: np.ndarray) -> np.ndarray:
        if not len(self.base):
            return np.zeros(len(h), dtype=bool)
        idx = np.clip(np.searchsorted(self.base, h), 0, len(self.base) - 1)
        return self.base[idx] == h

    def _fold_delta(self) -> None:
        if self.delta:
            d = np.fromiter(self.delta, dtype=np.uint64, count=len(self.delta))
            self.base = np.union1d(self.base, d)
            self.delta.clear()

    def _maybe_grow(self, incoming: int) -> None:
        """Rebuild the filter at 2x when load would exceed ~90% — an
        overfull cuckoo filter degrades to 500-kick eviction storms
        (250us per failed insert)."""
        need = self._size() + incoming
        while need > int(self.filter.n_buckets * 4 * 0.90):
            bigger = CuckooFilter(max(need * 2, self.filter.n_buckets * 8))
            arr = self.sorted_hashes()
            failed = bigger.insert_many(arr)
            for hv in arr[failed].tolist():
                bigger.insert(hv)
            self.filter = bigger

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        h = np.asarray(hashes, dtype=np.uint64)
        self._maybe_grow(len(h))
        new_mask = ~self._in_base(h)
        delta = self.delta
        insert = self.filter.insert
        # per-key work only for keys NOT in the sorted base (first sight
        # or recent): delta membership + within-batch duplicate order
        for j in np.flatnonzero(new_mask).tolist():
            hv = int(h[j])
            if hv in delta:
                new_mask[j] = False
            else:
                delta.add(hv)
                insert(hv)
        self.dedup_hits += int((~new_mask).sum())
        if len(delta) > self.DELTA_LIMIT:
            self._fold_delta()
        return new_mask

    def add_many(self, hashes: np.ndarray) -> int:
        """Bulk commit path (round ingest): sorted-unique the batch,
        drop already-seen keys vectorized, merge the rest into the base
        (one C-speed union — no Python-object churn). Returns new-key
        count. Unlike ``check_and_add`` no per-key mask is produced —
        the crawl commit doesn't need one."""
        h = np.unique(np.asarray(hashes, dtype=np.uint64))
        self._fold_delta()
        new = h[~self._in_base(h)]
        self._maybe_grow(len(new))
        self.base = np.union1d(self.base, new)
        failed = self.filter.insert_many(new)
        for hv in new[failed].tolist():  # eviction path, rare
            self.filter.insert(hv)
        self.dedup_hits += len(h) - len(new)
        return len(new)

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership: cuckoo pre-pass, then false-positive
        verification of the maybe-hits by searchsorted against the
        merged sorted exact array."""
        h = np.asarray(hashes, dtype=np.uint64)
        maybe = self.filter.contains_many(h)
        out = np.zeros(len(h), dtype=bool)
        if maybe.any() and self._size():
            se = self.sorted_hashes()
            cand = h[maybe]
            idx = np.clip(np.searchsorted(se, cand), 0, len(se) - 1)
            out[maybe] = se[idx] == cand
        return out

    def stats(self) -> dict:
        return {
            "shard_id": self.shard_id,
            "size": self._size(),
            "filter_count": self.filter.count,
            "dedup_hits": self.dedup_hits,
        }

    def sorted_hashes(self) -> np.ndarray:
        self._fold_delta()
        return self.base

    # --- checkpointing (ST6 analog) ---------------------------------------

    def snapshot(self, directory: str) -> str:
        os.makedirs(directory, exist_ok=True)
        path = os.path.join(directory, f"seen_shard_{self.shard_id:04d}.npz")
        tmp = path + ".tmp.npz"
        st = self.filter.state()
        # uncompressed: snapshot speed beats size for checkpoint cadence
        np.savez(
            tmp,
            table=st["table"],
            count=np.int64(st["count"]),
            cursor=np.int64(st["cursor"]),
            exact=self.sorted_hashes(),
            dedup_hits=np.int64(self.dedup_hits),
        )
        os.replace(tmp, path)
        return path

    def restore(self, directory: str) -> bool:
        path = os.path.join(directory, f"seen_shard_{self.shard_id:04d}.npz")
        if not os.path.exists(path):
            return False
        data = np.load(path)
        self.filter = CuckooFilter.from_state(
            {"table": data["table"], "count": data["count"], "cursor": data["cursor"]}
        )
        self.base = np.asarray(data["exact"], dtype=np.uint64)  # stored sorted
        self.delta = set()
        self.dedup_hits = int(data["dedup_hits"])
        return True
