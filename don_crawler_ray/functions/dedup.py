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


_FNV_OFFSET = 1469598103934665603  # pinned engine-wide (SQL oracles use it)
_FNV_PRIME = 1099511628211


def _gram_fnv(toks: list[str], i: int, k: int) -> int:
    """FNV-1a of the k-token gram at ``toks[i:i+k]`` — token bytes
    with an ``^ 0x20`` space mix after each token (the bit-exact
    contract the SQL oracles reduce over ``tok || ' '`` strings).

    Scalar reference implementation; the hot path is the vectorized
    ``_fnv_segments`` kernel below (bit-identical, pinned by tests)."""
    h = _FNV_OFFSET
    for t in toks[i : i + k]:
        for c in t.encode("utf-8"):
            h = ((h ^ c) * _FNV_PRIME) & _M64
        h = ((h ^ 0x20) * _FNV_PRIME) & _M64
    return h


def _fnv_segments(stream: np.ndarray, starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """FNV-1a 64 of ``n`` byte segments ``stream[starts[i] :
    starts[i]+lens[i]]`` in one vectorized pass.

    FNV is sequential per segment (h = (h ^ c) * p), so we vectorize
    ACROSS segments: one numpy step per byte *position*, over all
    segments still alive at that position. Segments are processed in
    descending-length order so the alive set is always a prefix —
    total element work is ``sum(lens)`` with no masking, i.e. the same
    byte count as the scalar loop but at numpy speed (~100x). uint64
    multiply wraps mod 2^64 natively, so results are bit-identical to
    the Python-int reference (``_gram_fnv`` / ``fnv1a64``)."""
    n = len(starts)
    out = np.full(n, np.uint64(_FNV_OFFSET), dtype=np.uint64)
    if n == 0 or len(lens) == 0:
        return out
    maxlen = int(lens.max())
    if maxlen <= 0:
        return out
    order = np.argsort(lens)[::-1]
    s_sorted = starts[order].astype(np.int64, copy=False)
    lens_asc = np.sort(lens)
    h = np.full(n, np.uint64(_FNV_OFFSET), dtype=np.uint64)
    prime = np.uint64(_FNV_PRIME)
    padded = np.concatenate([stream, np.zeros(maxlen, dtype=np.uint8)])
    # One window gather (n, maxlen uint8) beats per-column fancy
    # indexing; fall back to per-column gathers (O(n) memory) when a
    # pathological long segment would blow the matrix up.
    win = None
    if n * maxlen <= 64 << 20:
        win = np.lib.stride_tricks.sliding_window_view(padded, maxlen)[s_sorted]
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            m = n - int(np.searchsorted(lens_asc, j, side="right"))
            if m == 0:
                break
            c = win[:m, j] if win is not None else padded[s_sorted[:m] + j]
            h[:m] = (h[:m] ^ c) * prime
    out[order] = h
    return out


def _ranges(counts: np.ndarray) -> np.ndarray:
    """concat(arange(c) for c in counts) without a Python loop."""
    counts = counts.astype(np.int64, copy=False)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.cumsum(counts) - counts
    return np.arange(total, dtype=np.int64) - np.repeat(starts, counts)


def _token_stream(
    texts, k: int, *, lower: bool = True, pad: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize a batch of texts into one shared byte stream.

    Returns ``(stream, tok_off, ntoks)``: ``stream`` is the uint8
    bytes of every token joined with single spaces plus a trailing
    space (exactly the ``tok + ' '`` FNV contract); ``tok_off[j]`` is
    the byte start of global token ``j`` (``len(ntoks)+1`` entries,
    last == len(stream)); ``ntoks[d]`` is doc ``d``'s token count.
    With ``pad=True`` docs shorter than ``k`` tokens are padded with
    ``""`` (the ``shingle_hashes`` contract). Token offsets come from
    a vectorized 0x20 scan — valid because whitespace-split tokens
    never contain byte 0x20 (UTF-8 continuation bytes are >= 0x80)."""
    all_toks: list[str] = []
    ntoks = np.empty(len(texts), dtype=np.int64)
    for d, t in enumerate(texts):
        toks = t.lower().split() if lower else t.split()
        if pad and len(toks) < k:
            toks = toks + [""] * (k - len(toks))
        ntoks[d] = len(toks)
        all_toks.extend(toks)
    if not all_toks:
        return np.empty(0, dtype=np.uint8), np.zeros(1, dtype=np.int64), ntoks
    raw = (" ".join(all_toks) + " ").encode("utf-8")
    stream = np.frombuffer(raw, dtype=np.uint8)
    sp = np.flatnonzero(stream == 0x20)
    tok_off = np.empty(len(sp) + 1, dtype=np.int64)
    tok_off[0] = 0
    tok_off[1:] = sp + 1
    return stream, tok_off, ntoks


def _gram_segments(
    tok_off: np.ndarray, ntoks: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(doc_idx, rel_pos, byte_start, byte_len) of every k-token gram,
    doc-major / position order. Grams never cross doc boundaries."""
    n_d = np.maximum(ntoks - k + 1, 0)
    doc_tok_start = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(ntoks)])
    rel = _ranges(n_d)
    gram_tok = np.repeat(doc_tok_start[:-1], n_d) + rel
    starts = tok_off[gram_tok]
    lens = tok_off[gram_tok + k] - starts
    doc_idx = np.repeat(np.arange(len(ntoks), dtype=np.int64), n_d)
    return doc_idx, rel, starts, lens


def shingle_hashes_flat(texts, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """Batch form of ``shingle_hashes``: per-doc UNIQUE k-gram FNV
    hashes for every text, as flat ``(doc_idx int64, hash uint64)``
    arrays. The (doc, hash) SET is exactly the union of
    ``shingle_hashes(t, k)`` per doc; row order is unspecified
    (hash-major) — callers feed groupbys / per-doc reductions.

    Dedup uses ONE stable argsort on hash: the input is doc-major, so
    within an equal-hash run docs stay nondecreasing and duplicate
    (hash, doc) pairs are adjacent."""
    stream, tok_off, ntoks = _token_stream(texts, k, pad=True)
    doc_idx, _rel, starts, lens = _gram_segments(tok_off, ntoks, k)
    hashes = _fnv_segments(stream, starts, lens)
    if len(hashes) == 0:
        return doc_idx, hashes
    order = np.argsort(hashes, kind="stable")
    d_s, h_s = doc_idx[order], hashes[order]
    keep = np.empty(len(h_s), dtype=bool)
    keep[0] = True
    keep[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
    return d_s[keep], h_s[keep]


def shingle_positions_flat(
    texts, k: int = 8, pad: bool = False
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch form of ``shingle_hash_positions``: ALL k-gram hashes in
    document order (duplicates kept) as flat ``(doc_idx, pos, hash)``
    arrays. ``pad=True`` pads short docs with ``""`` tokens to ``k``
    (the ``shingle_hashes`` / winnowing contract — every doc then has
    at least one gram); default drops docs shorter than ``k``."""
    stream, tok_off, ntoks = _token_stream(texts, k, pad=pad)
    doc_idx, rel, starts, lens = _gram_segments(tok_off, ntoks, k)
    return doc_idx, rel, _fnv_segments(stream, starts, lens)


def shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-word shingles of ``text`` (lowercased,
    whitespace-tokenized). Returns unique hashes (a set)."""
    return shingle_hashes_flat([text], k)[1]


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


def minhash_signatures_batch(texts, n_perm: int = 64, seed: int = 0x5EED, k: int = 3) -> np.ndarray:
    """MinHash signatures (ndocs, n_perm uint64) of a batch of texts,
    bit-identical to ``minhash_signature(shingle_hashes(t, k), n_perm,
    seed)`` per doc. One FNV pass over every gram of the batch, then a
    per-perm ``minimum.reduceat`` over doc segments — duplicates need
    no dedup (min over a multiset == min over its set). Perms are
    processed in chunks of 8 so the modmul temp stays ~O(8 * grams)."""
    stream, tok_off, ntoks = _token_stream(texts, k, pad=True)
    doc_idx, _rel, starts, lens = _gram_segments(tok_off, ntoks, k)
    a, b = _perm_params(n_perm, seed)
    ndocs = len(ntoks)
    out = np.full((ndocs, n_perm), np.uint64(_MERSENNE61), dtype=np.uint64)
    if len(starts) == 0:
        return out
    x = _fnv_segments(stream, starts, lens) % np.uint64(_MERSENNE61)
    # padded docs always have >= 1 gram, so doc segments are contiguous
    # and non-empty: reduceat boundaries are exact per-doc. Chunk over
    # DOC ranges (~8k grams) so the (n_perm, grams) modmul temps stay
    # cache-resident instead of streaming 25MB arrays through RAM.
    n_d = np.maximum(ntoks - k + 1, 1)
    seg_starts = np.cumsum(n_d) - n_d
    total = int(n_d.sum())
    M = np.uint64(_MERSENNE61)
    # Precompute per-perm limb constants once: a*x+b mod M with
    # x = xh*2^31 + xl becomes c1*xh + a*xl + b where c1 = a*2^31 mod M,
    # and every cross product fits uint64 (see limb bounds inline) —
    # ~18 matrix ops vs ~45 for the generic chained _mulmod61 path.
    # Bit-exact vs _modmul_add (pinned by tests/SQL oracles).
    c1 = _mulmod61(a, np.full_like(a, np.uint64(1 << 31) % M))
    c1h, c1l = (c1 >> np.uint64(31))[:, None], (c1 & np.uint64((1 << 31) - 1))[:, None]
    ah, al = (a >> np.uint64(31))[:, None], (a & np.uint64((1 << 31) - 1))[:, None]
    b2 = b[:, None]
    xh_all = x >> np.uint64(31)  # < 2^30
    xl_all = x & np.uint64((1 << 31) - 1)
    d_lo = 0
    with np.errstate(over="ignore"):
        while d_lo < ndocs:
            d_hi = min(int(np.searchsorted(seg_starts, seg_starts[d_lo] + 8192)) + 1, ndocs)
            g_lo = int(seg_starts[d_lo])
            g_hi = int(seg_starts[d_hi]) if d_hi < ndocs else total
            xh, xl = xh_all[None, g_lo:g_hi], xl_all[None, g_lo:g_hi]
            # c1h<2^30 * xh<2^30 -> <2^60; c1l<2^31 * xh<2^30 -> <2^61
            # ah<2^30 * xl<2^31 -> <2^61; al<2^31 * xl<2^31 -> <2^62
            hv = (
                _shift_mod(c1h * xh, 31)
                + (c1l * xh) % M
                + _shift_mod(ah * xl, 31)
                + (al * xl) % M
                + b2
            ) % M
            out[d_lo:d_hi, :] = np.minimum.reduceat(hv, seg_starts[d_lo:d_hi] - g_lo, axis=1).T
            d_lo = d_hi
    return out


def lsh_band_keys_batch(signatures: np.ndarray, n_bands: int = 16) -> np.ndarray:
    """Batched ``lsh_band_keys``: (ndocs, n_perm) -> (ndocs, n_bands)
    uint64 band-bucket keys, bit-identical per row."""
    ndocs, n_perm = signatures.shape
    rows = n_perm // n_bands
    sig = signatures[:, : rows * n_bands].reshape(ndocs, n_bands, rows)
    acc = np.zeros((ndocs, n_bands), dtype=np.uint64)
    for r in range(rows):
        acc = _mix64(acc ^ sig[:, :, r])
    return _mix64(acc ^ (np.arange(n_bands, dtype=np.uint64) << np.uint64(56)))


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
    return shingle_positions_flat([text], k)[2]


def fnv1a64(s: str) -> int:
    """FNV-1a 64-bit of the utf-8 bytes of ``s``. Used as the global
    shingle total-order for prefix filtering — any fixed total order is
    correct (Xiao et al., PPJoin); a hash order needs no global
    document-frequency pass, so candidate generation stays one-shot."""
    h = _FNV_OFFSET
    for c in s.encode("utf-8"):
        h = ((h ^ c) * _FNV_PRIME) & _M64
    return h


def fnv1a64_batch(strings) -> np.ndarray:
    """Vectorized ``fnv1a64`` over a sequence (or pyarrow string
    array) of strings -> uint64[n]. Encodes once through an Arrow
    buffer (no per-string Python byte loop) and runs the shared
    column-parallel FNV kernel."""
    import pyarrow as pa

    if isinstance(strings, pa.ChunkedArray):
        strings = strings.combine_chunks()
    if isinstance(strings, pa.Array):
        # zero-copy widen (string -> large_string shares the data
        # buffer); the offset-aware slice below handles sliced inputs
        arr = (
            strings
            if pa.types.is_large_string(strings.type)
            else strings.cast(pa.large_string())
        )
    else:
        strings = list(strings)
        if not strings:
            return np.empty(0, dtype=np.uint64)
        arr = pa.array(strings, type=pa.large_string())
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
        arr.offset : arr.offset + len(arr) + 1
    ]
    data_buf = arr.buffers()[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    return _fnv_segments(data, offs[:-1], np.diff(offs))


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


def simhash64_batch(texts) -> np.ndarray:
    """64-bit SimHash of each text (FNV token hashes, ±1 bit votes,
    bit ``i`` set iff the vote sum is strictly positive; empty text ->
    0), vectorized over the whole batch: one FNV kernel pass over all
    tokens, then 64 per-doc ``add.reduceat`` vote folds."""
    stream, tok_off, ntoks = _token_stream(texts, 1, pad=False)
    out = np.zeros(len(ntoks), dtype=np.uint64)
    ntok_total = len(tok_off) - 1
    if ntok_total == 0:
        return out
    # token j's bytes are stream[tok_off[j] : tok_off[j+1]-1] (strip
    # the trailing space — simhash hashes raw token bytes, no mix)
    h_tok = _fnv_segments(stream, tok_off[:-1], np.diff(tok_off) - 1)
    nonempty = ntoks > 0
    doc_tok_start = np.concatenate([np.zeros(1, dtype=np.int64), np.cumsum(ntoks)])
    starts = doc_tok_start[:-1][nonempty]
    sig = np.zeros(int(nonempty.sum()), dtype=np.uint64)
    one = np.uint64(1)
    for j in range(64):
        votes = (((h_tok >> np.uint64(j)) & one).astype(np.int64) << 1) - 1
        sums = np.add.reduceat(votes, starts)
        sig |= (sums > 0).astype(np.uint64) << np.uint64(j)
    out[nonempty] = sig
    return out


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (FNV token hashes)."""
    return int(simhash64_batch([text])[0])


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
