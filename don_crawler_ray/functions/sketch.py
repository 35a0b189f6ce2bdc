"""Cardinality sketches: HyperLogLog registers and estimation.

The register derivation is INTEGER-ONLY (FNV-1a hash, top-p-bit bucket,
trailing-zero rank computed by 54 exact modulo tests) so the DuckDB
oracle re-derives every register bit-for-bit — the same
rederive-the-hash-in-SQL contract the MinHash/SimHash oracles use.
Flajolet et al. 2007 for the estimator; the small-range correction is
linear counting (Whang et al. 1990).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_FNV_OFFSET = 1469598103934665603
_FNV_PRIME = 1099511628211

HLL_P = 10  # 2^10 = 1024 registers


def fnv1a64_int(value: int) -> int:
    """FNV-1a of the DECIMAL-STRING utf-8 bytes of ``value`` — the SQL
    side hashes ``CAST(x AS VARCHAR)`` characters, so both engines hash
    identical byte sequences (ASCII digits)."""
    h = _FNV_OFFSET
    for c in str(value).encode("utf-8"):
        h = ((h ^ c) * _FNV_PRIME) & _M64
    return h


def hll_bucket_rho(values: np.ndarray, p: int = HLL_P) -> tuple[np.ndarray, np.ndarray]:
    """(bucket, rho) per input value: bucket = top ``p`` hash bits,
    rho = trailing zeros of the remaining 64-p bits + 1 (capped at
    64-p+1 when they are all zero). The trailing-zero count is
    ``sum_{k=1..64-p} [h' mod 2^k == 0]`` — 54 vectorized exact integer
    tests, literally the oracle's ``list_filter(range(1, 55), ...)``.

    The raw FNV hash is finalized with one splitmix64 mix: FNV-1a of
    short decimal strings leaves the HIGH bits nearly constant (150
    small ids landed in 4 of 1024 top-bit buckets), which destroys both
    the bucket spread and the rho geometry; the mix restores avalanche
    and the oracle re-derives it with the same 32-bit-limb multiplies
    the MinHash band SQL uses."""
    from don_crawler_ray.functions.dedup import _mix64

    h = _mix64(
        np.array([fnv1a64_int(int(v)) for v in values], dtype=np.uint64)
    )
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    hp = h & np.uint64((1 << (64 - p)) - 1)  # the low 64-p bits
    t = np.zeros(len(h), np.int64)
    for k in range(1, 64 - p + 1):
        t += (hp % (np.uint64(1) << np.uint64(k)) == 0).astype(np.int64)
    return bucket, t + 1


CMS_DEPTH = 4
CMS_WIDTH = 512
_SALT = 0x9E3779B97F4A7C15


def cms_buckets(hashes: np.ndarray, depth: int = CMS_DEPTH, width: int = CMS_WIDTH) -> np.ndarray:
    """(depth, n) bucket matrix for pre-hashed items: row r's bucket is
    ``splitmix64_mix(h + (r+1)*SALT) mod width`` — integer-only, so the
    oracle re-derives every counter cell (Cormode & Muthukrishnan 2005
    for the sketch; the mix is the same splitmix64 finalizer the HLL
    and MinHash oracles re-derive)."""
    from don_crawler_ray.functions.dedup import _mix64

    h = hashes.astype(np.uint64)
    out = np.empty((depth, len(h)), np.int64)
    with np.errstate(over="ignore"):
        for r in range(depth):
            out[r] = (_mix64(h + np.uint64((r + 1) * _SALT & _M64)) % np.uint64(width)).astype(np.int64)
    return out


def cms_point_query(counters: np.ndarray, token_hash: int) -> int:
    """Point frequency estimate: min over rows of the token's cell.
    ``counters`` is the (depth, width) int64 matrix."""
    b = cms_buckets(np.array([token_hash], np.uint64))
    return int(min(counters[r, b[r, 0]] for r in range(counters.shape[0])))


def hll_estimate(buckets: np.ndarray, rhos: np.ndarray, p: int = HLL_P) -> float:
    """Distinct-count estimate from max-rho registers. Raw HLL with the
    standard alpha_m constant; linear counting below the 2.5*m
    small-range threshold (the regime of the test fixtures)."""
    m = 1 << p
    reg = np.zeros(m, np.int64)
    reg[buckets] = rhos
    alpha = 0.7213 / (1 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -reg.astype(np.float64)))
    zeros = int(np.sum(reg == 0))
    if raw <= 2.5 * m and zeros:
        return float(m * np.log(m / zeros))
    return float(raw)
