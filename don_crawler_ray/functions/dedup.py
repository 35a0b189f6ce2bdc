"""Near-duplicate detection kernels: MinHash+LSH, SimHash, n-gram
Jaccard, embedding cosine.

Scale shapes (each implemented as a Dataset pipeline in
``pipelines.queries`` / tested against numpy oracles):

- exact:   hash-partition by content hash -> per-group first-wins
           (one shuffle of slim columns).
- minhash: shingle -> k-permutation signatures (vectorized) -> band
           buckets -> ``groupby(band_hash)`` emits candidate pairs —
           only bucket collisions shuffle, never all pairs.
- simhash: 64-bit signatures; near-dup = hamming distance <= t via
           bucketed XOR popcount.
- embedding: cosine vs a broadcast query/centroid matrix (numpy
           matmul per batch).

All hashing is splitmix/blake-based — never Python ``hash`` (salted
per process, would break cross-run determinism).
"""

from __future__ import annotations

import numpy as np

_M64 = (1 << 64) - 1
_MERSENNE61 = (1 << 61) - 1


def _mix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _gram_fnv(toks: list[str], i: int, k: int) -> int:
    """FNV-1a of the k-token gram at ``toks[i:i+k]`` — token bytes
    with an ``^ 0x20`` space mix after each token (the bit-exact
    contract the SQL oracles reduce over ``tok || ' '`` strings)."""
    h = 1469598103934665603  # FNV offset
    for t in toks[i : i + k]:
        for c in t.encode("utf-8"):
            h = ((h ^ c) * 1099511628211) & _M64
        h = ((h ^ 0x20) * 1099511628211) & _M64
    return h


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-word shingles of ``text`` (lowercased,
    whitespace-tokenized). Returns unique hashes (a set)."""
    toks = text.lower().split()
    if len(toks) < k:
        toks = toks + [""] * (k - len(toks))
    n = max(1, len(toks) - k + 1)
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        out[i] = _gram_fnv(toks, i, k)
    return np.unique(out)


# k independent permutations h_i(x) = (a_i * x + b_i) mod p  (p = 2^61-1)
def _perm_params(n_perm: int, seed: int = 0x5EED) -> tuple[np.ndarray, np.ndarray]:
    idx = np.arange(1, n_perm + 1, dtype=np.uint64)
    a = _mix64(idx * np.uint64(seed * 2 + 1)) % np.uint64(_MERSENNE61 - 1) + np.uint64(1)
    b = _mix64(idx * np.uint64(seed * 4 + 3)) % np.uint64(_MERSENNE61)
    return a, b


def minhash_signature(shingles: np.ndarray, n_perm: int = 64, seed: int = 0x5EED) -> np.ndarray:
    """MinHash signature (uint64[n_perm]) of a shingle-hash set."""
    if len(shingles) == 0:
        return np.full(n_perm, np.uint64(_MERSENNE61), dtype=np.uint64)
    a, b = _perm_params(n_perm, seed)
    x = shingles.astype(np.uint64) % np.uint64(_MERSENNE61)
    # (n_perm, n_shingles) — use object->uint64 safe modmul via float? No:
    # do it in python-int free numpy: split multiply to avoid overflow bias.
    # 61-bit modulus keeps a*x within 122 bits -> use np.uint64 pairwise with
    # modmul decomposition.
    hv = _modmul_add(a[:, None], x[None, :], b[:, None])
    return hv.min(axis=1).astype(np.uint64)


def _modmul_add(a: np.ndarray, x: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*x + b) mod 2^61-1 without 128-bit ints: split x into hi/lo 31 bits."""
    M = np.uint64(_MERSENNE61)
    lo = x & np.uint64((1 << 31) - 1)
    hi = x >> np.uint64(31)
    with np.errstate(over="ignore"):
        # a < 2^61, lo < 2^31 -> a*lo < 2^92 overflows; reduce a first: a<M.
        # Use modular halving: a*x = a*hi*2^31 + a*lo (all mod M).
        t1 = _mulmod61(a, hi)
        t1 = _mulmod61(t1, np.uint64(1 << 31) % M)
        t2 = _mulmod61(a, lo)
        return (t1 + t2 + b) % M


def _mulmod61(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a*b) mod 2^61-1 via 30/31-bit limb decomposition (uint64-safe)."""
    M = np.uint64(_MERSENNE61)
    a = a % M
    b = b % M
    a_hi = a >> np.uint64(30)
    a_lo = a & np.uint64((1 << 30) - 1)
    with np.errstate(over="ignore"):
        # a_hi < 2^31, b < 2^61 -> a_hi*b can overflow; reduce b into limbs too.
        b_hi = b >> np.uint64(31)
        b_lo = b & np.uint64((1 << 31) - 1)
        # a*b = (a_hi*2^30 + a_lo)(b_hi*2^31 + b_lo)
        #     = a_hi*b_hi*2^61 + a_hi*b_lo*2^30 + a_lo*b_hi*2^31 + a_lo*b_lo
        # mod M: 2^61 ≡ 1
        p1 = (a_hi * b_hi) % M  # < 2^62 pre-mod: a_hi<2^31,b_hi<2^30 -> <2^61 OK
        p2 = _shift_mod(a_hi * b_lo, 30)  # a_hi*b_lo < 2^62 -> overflow-safe? <2^31*2^31=2^62
        p3 = _shift_mod(a_lo * b_hi, 31)  # < 2^30*2^30=2^60
        p4 = (a_lo * b_lo) % M  # < 2^61
        return (p1 + p2 + p3 + p4) % M


def _shift_mod(v: np.ndarray, s: int) -> np.ndarray:
    """(v << s) mod 2^61-1 for v < 2^62: rotate within 61 bits."""
    M = np.uint64(_MERSENNE61)
    v = v % M
    with np.errstate(over="ignore"):
        return ((v << np.uint64(s)) & M) + (v >> np.uint64(61 - s))


def lsh_band_keys(signature: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """Fold a signature into ``n_bands`` band-bucket keys: documents
    sharing any band key are LSH candidates (groupby key downstream)."""
    rows = len(signature) // n_bands
    sig = signature[: rows * n_bands].reshape(n_bands, rows)
    acc = np.zeros(n_bands, dtype=np.uint64)
    for r in range(rows):
        acc = _mix64(acc ^ sig[:, r])
    # include band index so band i buckets never collide with band j
    return _mix64(acc ^ (np.arange(n_bands, dtype=np.uint64) << np.uint64(56)))


def minhash_jaccard_estimate(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())


def jaccard_exact(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact n-gram Jaccard (the verifier for LSH candidates)."""
    sa, sb = set(shingle_hashes(text_a, k).tolist()), set(shingle_hashes(text_b, k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def shingle_hash_positions(text: str, k: int = 8) -> np.ndarray:
    """uint64 FNV hashes of ALL k-word shingles of ``text`` in document
    order (index == 0-based start-token position). Unlike
    ``shingle_hashes`` this keeps duplicates and does NOT pad short
    documents — a doc with fewer than ``k`` tokens yields an empty
    array. Same per-shingle hash contract as ``shingle_hashes`` (token
    bytes, ``^ 0x20`` space mix after each token), so the existing
    bit-exact SQL FNV reduction applies unchanged."""
    toks = text.lower().split()
    n = len(toks) - k + 1
    if n <= 0:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(n, dtype=np.uint64)
    for i in range(n):
        out[i] = _gram_fnv(toks, i, k)
    return out


def fnv1a64(s: str) -> int:
    """FNV-1a 64-bit of the utf-8 bytes of ``s``. Used as the global
    shingle total-order for prefix filtering — any fixed total order is
    correct (Xiao et al., PPJoin); a hash order needs no global
    document-frequency pass, so candidate generation stays one-shot."""
    h = 1469598103934665603
    for c in s.encode("utf-8"):
        h = ((h ^ c) * 1099511628211) & _M64
    return h


def word_ngrams(text: str, n: int = 2) -> list[str]:
    """Distinct space-joined word n-grams, first-seen order — the exact
    Python mirror of the SQL shingle contract
    ``list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' ||
    t[i+1]))`` over ``regexp_split_to_array(text, '\\s+')`` with empty
    tokens filtered. Empty when the text has fewer than ``n`` tokens."""
    toks = text.split()
    if len(toks) < n:
        return []
    return list(dict.fromkeys(" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)))


def prefix_length(set_size: int, tau: float) -> int:
    """PPJoin prefix length for Jaccard threshold ``tau``: a pair with
    J >= tau must share a token within each side's
    ``s - ceil(tau*s) + 1`` smallest tokens (global order)."""
    import math

    return set_size - int(math.ceil(tau * set_size)) + 1


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (FNV token hashes)."""
    toks = text.lower().split()
    if not toks:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = 1469598103934665603
        for c in t.encode("utf-8"):
            h = ((h ^ c) * 1099511628211) & _M64
        bits = (np.uint64(h) >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        acc += np.where(bits.astype(bool), 1, -1)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin((int(a) ^ int(b)) & _M64).count("1")


def cosine_topk(query: np.ndarray, matrix: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k of ``query`` (d,) against ``matrix``
    (n, d). Returns (indices, scores) sorted by (-score, index) —
    deterministic tiebreak. The per-batch kernel of the ANN baseline."""
    qn = query / (np.linalg.norm(query) or 1.0)
    mn = matrix / np.maximum(np.linalg.norm(matrix, axis=1, keepdims=True), 1e-12)
    scores = mn @ qn
    order = np.lexsort((np.arange(len(scores)), -scores))[:k]
    return order, scores[order]
