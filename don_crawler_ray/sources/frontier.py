"""Deterministic synthetic frontier generator (FIXTURES.md F1-F3).

Every cell is a pure function of ``(seed, row_index)`` via a
counter-based splitmix64 hash — NOT a sequential RNG — so any two runs,
any batching, and any parallelism level produce identical bytes. This
is what makes the N-vs-4N determinism checks meaningful.

Schema (F1, per BASELINE.json ``input_hint``):
``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string`` where ``text`` is the golden expected extraction computed
*structurally* at generation time (the generator knows which lines are
content), independent of the regex extractor in
``don_crawler_ray.functions.extract``.

Fixture properties (FIXTURES.md):
- hosts drawn Zipf-ish; host rank 0 holds ~50% of rows (skew fixture);
- ~10% duplicate rows under RFC 3986 canonicalization (case/port/
  escape/dot-segment variants of an earlier row, same page content);
- raw URLs carry canonicalization noise (uppercase scheme/host,
  default ports, decodable %XX escapes, ``/./`` segments);
- HTML exercises the extractor's skip rules: markdown-heading lines,
  badge lines, entity-escaped ``<img``/``<a`` prefixes, script/style
  blocks, CRLF mixing.

Scales: tiny=1k rows/20 hosts, small=100k/500, bench=5M/5000
(overridable). Large scales generate in parallel via Ray when a Ray
session exists; output is partitioned parquet (one file per shard) —
the resumable layout the sinks also use.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SCALES = {
    "tiny": (1_000, 20),
    "small": (100_000, 500),
    "bench": (5_000_000, 5_000),
}

_TLDS = ("nl", "org", "com")
_LANGS = ("nl", "en", "de", "fr")

# --- counter-based hashing -------------------------------------------------

_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _mix(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer over uint64 arrays (vectorized, wrap-around)."""
    with np.errstate(over="ignore"):
        z = (x + _SM_GAMMA).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * _SM_M1
        z = (z ^ (z >> np.uint64(27))) * _SM_M2
        z = z ^ (z >> np.uint64(31))
    return z


def _rand_u64(seed: int, idx: np.ndarray, field: int) -> np.ndarray:
    base = np.uint64(seed & 0xFFFFFFFFFFFFFFFF) ^ np.uint64((field * _I_M2) & _M64)
    with np.errstate(over="ignore"):
        return _mix(idx.astype(np.uint64) * _SM_M1 ^ base)


def _rand_u01(seed: int, idx: np.ndarray, field: int) -> np.ndarray:
    return _rand_u64(seed, idx, field).astype(np.float64) / 2**64


_M64 = (1 << 64) - 1
_I_GAMMA = 0x9E3779B97F4A7C15
_I_M1 = 0xBF58476D1CE4E5B9
_I_M2 = 0x94D049BB133111EB


def _mix_int(x: int) -> int:
    """Scalar splitmix64 (python ints; exact same output as _mix)."""
    z = (x + _I_GAMMA) & _M64
    z = ((z ^ (z >> 30)) * _I_M1) & _M64
    z = ((z ^ (z >> 27)) * _I_M2) & _M64
    return z ^ (z >> 31)


def _rand_int(seed: int, i: int, field: int) -> int:
    """Scalar twin of _rand_u64 — identical value for the same inputs."""
    base = (seed & _M64) ^ ((field * _I_M2) & _M64)
    return _mix_int(((i * _I_M1) & _M64) ^ base)


# field ids
F_DUP, F_DUPOFF, F_VARIANT, F_HOST, F_SCHEME, F_NSEG, F_SEG, F_QUERY = range(8)
F_TS, F_LANG, F_NPARA, F_PARA, F_TITLE, F_NOISE, F_PORTNOISE, F_CASE = range(8, 16)
F_ESCNOISE, F_DOTNOISE = 16, 17

# --- vocabulary (fixed, index-addressed) -----------------------------------

_CONS = "bcdfghjklmnpqrstvwz"
_VOWS = "aeiou"


def _word(k: int) -> str:
    """Deterministic pseudo-word for index k (2-4 syllables)."""
    h = int(_mix(np.uint64((k * 2654435761) & 0xFFFFFFFFFFFFFFFF)))
    n_syll = 2 + (h % 3)
    out = []
    for s in range(n_syll):
        hh = h >> (s * 10)
        out.append(_CONS[hh % len(_CONS)])
        out.append(_VOWS[(hh // 19) % len(_VOWS)])
    return "".join(out)


WORDS = [_word(i) for i in range(4096)]
_N_PARA_POOL = 256


def _paragraph(p: int) -> str:
    h = int(_mix(np.uint64((p * 7919 + 13) & 0xFFFFFFFFFFFFFFFF)))
    n_words = 8 + (h % 23)
    ws = [WORDS[(h >> (i % 48)) * (i + 3) % 4096] for i in range(n_words)]
    sentence = " ".join(ws)
    return sentence[0].upper() + sentence[1:] + "."


PARAGRAPHS = [_paragraph(p) for p in range(_N_PARA_POOL)]


# --- host model ------------------------------------------------------------

def _host_cdf(n_hosts: int) -> np.ndarray:
    """CDF over host ranks 1..n_hosts-1 with Zipf(1.2) weights (rank 0,
    the mega host, is handled by the 50% skew branch)."""
    ranks = np.arange(1, max(n_hosts, 2))
    w = ranks ** -1.2
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


def host_name(host_idx: int) -> str:
    tld = _TLDS[int(_mix(np.uint64(host_idx + 101))) % len(_TLDS)]
    return f"host{host_idx}.example.{tld}"


# --- URL model -------------------------------------------------------------

def _base_index(seed: int, idx: np.ndarray) -> np.ndarray:
    """Map each row to its content base row: ~10% of rows (i>=100) point
    to an earlier row and become canonical-duplicates of it."""
    is_dup = (_rand_u01(seed, idx, F_DUP) < 0.10) & (idx >= 100)
    off = (_rand_u64(seed, idx, F_DUPOFF) % np.uint64(99)) + np.uint64(1)
    base = np.where(is_dup, idx.astype(np.uint64) - off, idx.astype(np.uint64))
    return base.astype(np.int64), is_dup


def _host_indices(seed: int, base: np.ndarray, n_hosts: int, cdf: np.ndarray) -> np.ndarray:
    u_skew = _rand_u01(seed, base, F_HOST)
    u_rank = _rand_u01(seed, base, F_HOST + 100)
    ranked = 1 + np.searchsorted(cdf, u_rank)
    ranked = np.minimum(ranked, n_hosts - 1)
    return np.where(u_skew < 0.5, 0, ranked).astype(np.int64)


def _canonical_path(seed: int, b: int) -> str:
    h = _rand_int(seed, b, F_NSEG)
    n_seg = 1 + (h % 4)
    segs = []
    for k in range(n_seg):
        sh = _rand_int(seed, b, F_SEG + 17 * k)
        segs.append(WORDS[sh % 4096])
    path = "/" + "/".join(segs)
    q = _rand_int(seed, b, F_QUERY)
    if q % 5 == 0:  # ~20% query strings
        path += f"?{WORDS[q % 997]}={q % 100}"
    return path


def make_canonical_url(seed: int, b: int, host_idx: int) -> str:
    scheme = "http" if _rand_int(seed, b, F_SCHEME) % 2 else "https"
    return f"{scheme}://{host_name(host_idx)}{_canonical_path(seed, b)}"


def _apply_noise(seed: int, i: int, url: str) -> str:
    """Reversible (under canonicalization) noise decided by the ROW index
    (so a duplicate and its base get different raw spellings)."""
    h = _rand_int(seed, i, F_NOISE)
    scheme, rest = url.split("://", 1)
    host, _, pathq = rest.partition("/")
    pathq = "/" + pathq
    if h & 1:  # uppercase host
        host = host.upper()
    if h & 2:  # uppercase scheme
        scheme = scheme.upper()
    if h & 4:  # explicit default port
        host += ":443" if scheme.lower() == "https" else ":80"
    if h & 8:  # %-escape the first unreserved char of the path
        body = pathq[1:]
        if body:
            pathq = "/%" + format(ord(body[0]), "02x") + body[1:]
    if h & 16:  # insert a dot segment
        pathq = "/." + pathq
    return f"{scheme}://{host}{pathq}"


# --- HTML model ------------------------------------------------------------

_STYLE_NOISE = "<style>\r\nbody { margin: 0; }\r\n.badge { display: none }\r\n</style>"
_SCRIPT_NOISE = (
    "<script type='text/javascript'>\r\nvar q = 1;\r\n"
    "function f() { return '<p>not text</p>'; }\r\n</script>"
)


def make_html(seed: int, b: int) -> tuple[bytes, str]:
    """Assemble one page; returns (html_bytes, expected_extracted_text).

    The expectation is assembled structurally from the same components
    (content lines joined by blank-line paragraph breaks; skippable
    lines excluded) — an oracle independent of the regex extractor.
    """
    h = _rand_int(seed, b, F_NPARA)
    th = _rand_int(seed, b, F_TITLE)
    title = f"{WORDS[th % 4096].capitalize()} {WORDS[(th >> 13) % 4096]}"
    n_para = 2 + (h % 5)

    parts = [f"<html><head><title>{title}</title>", _STYLE_NOISE, "</head><body>"]
    content: list[str] = [title]  # <title> emits a text line
    parts.append(f"<h1>{title}</h1>")
    content.append(title)
    # badge / skippable noise
    parts.append("<p>![build](https://img.shields.io/badge.svg)</p>")
    if h % 3 == 0:
        parts.append("<p>&lt;img src=\"badge.png\"&gt;</p>")  # decodes to <img... -> skipped
    if h % 4 == 0:
        parts.append(f"<p># {WORDS[h % 911]} heading</p>")  # markdown heading -> skipped
    parts.append(_SCRIPT_NOISE)
    for k in range(n_para):
        ph = _rand_int(seed, b, F_PARA + 29 * k)
        para = PARAGRAPHS[ph % _N_PARA_POOL]
        sep = "\r\n" if ph & 1 else "\n"
        parts.append(f"<p>{para}</p>{sep}")
        content.append(para)
    parts.append("</body></html>")
    html = "\n".join(parts).encode("utf-8")
    expected = "\n\n".join(content)
    return html, expected


# --- batch + table assembly ------------------------------------------------

TS_LO = np.datetime64("2024-01-01T00:00:00", "us").astype(np.int64)
TS_HI = np.datetime64("2026-01-01T00:00:00", "us").astype(np.int64)


def gen_rows(seed: int, start: int, end: int, n_hosts: int, cdf: np.ndarray | None = None) -> pa.Table:
    """Generate frontier rows [start, end) as one Arrow table."""
    if cdf is None:
        cdf = _host_cdf(n_hosts)
    idx = np.arange(start, end, dtype=np.int64)
    base, _ = _base_index(seed, idx)
    host_idx = _host_indices(seed, base, n_hosts, cdf)

    ts = (TS_LO + (_rand_u64(seed, idx, F_TS) % np.uint64(TS_HI - TS_LO)).astype(np.int64))
    lang_idx = (_rand_u64(seed, base, F_LANG) % np.uint64(len(_LANGS))).astype(np.int64)

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    for i, b, hx in zip(idx.tolist(), base.tolist(), host_idx.tolist()):
        cu = make_canonical_url(seed, b, hx)
        urls.append(_apply_noise(seed, i, cu))
        html, text = make_html(seed, b)
        htmls.append(html)
        texts.append(text)

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([_LANGS[j] for j in lang_idx], type=pa.string()),
        }
    )


def generate_frontier_parquet(
    path: str,
    scale: str | None = "tiny",
    seed: int = 42,
    n_rows: int | None = None,
    n_hosts: int | None = None,
    rows_per_file: int = 100_000,
) -> str:
    """Write the frontier table to ``path``.

    Small outputs (single shard) are written as one parquet file at
    ``path``; larger ones become a directory of shard files (the
    resumable partitioned layout). Generation of large scales fans out
    over Ray tasks when Ray is up (never calls ``ray.init`` itself).
    """
    if n_rows is None or n_hosts is None:
        sr, sh = SCALES[scale or "tiny"]
        n_rows = n_rows or sr
        n_hosts = n_hosts or sh
    cdf = _host_cdf(n_hosts)

    if n_rows <= rows_per_file:
        pq.write_table(gen_rows(seed, 0, n_rows, n_hosts, cdf), path, compression="zstd")
        return path

    os.makedirs(path, exist_ok=True)
    bounds = list(range(0, n_rows, rows_per_file)) + [n_rows]
    shards = list(zip(bounds[:-1], bounds[1:]))

    import ray

    if ray.is_initialized():
        @ray.remote
        def _gen_shard(k: int, lo: int, hi: int) -> str:
            out = os.path.join(path, f"part-{k:05d}.parquet")
            if not os.path.exists(out):
                tmp = out + ".tmp"
                pq.write_table(gen_rows(seed, lo, hi, n_hosts, cdf), tmp, compression="zstd")
                os.rename(tmp, out)
            return out

        ray.get([_gen_shard.remote(k, lo, hi) for k, (lo, hi) in enumerate(shards)])
    else:
        for k, (lo, hi) in enumerate(shards):
            out = os.path.join(path, f"part-{k:05d}.parquet")
            if not os.path.exists(out):
                tmp = out + ".tmp"
                pq.write_table(gen_rows(seed, lo, hi, n_hosts, cdf), tmp, compression="zstd")
                os.rename(tmp, out)
    return path


# --- F2 seeds + F3 politeness ---------------------------------------------

def generate_seeds(seed: int = 42, n_hosts: int = 20) -> pa.Table:
    """Seed list (F2): one publisher per covered host-prefix, mirroring
    ``common/publisher.go:13-19``. Includes one unsupported-scheme seed
    (error-row path, ``crawler/crawler.go:213-219``) and one
    duplicate-id pair (upsert semantics,
    ``cmd/download_publishers.go:63-84``)."""
    n = min(25, n_hosts)
    rows = {
        "id": [f"org-{i}" for i in range(n)],
        "name": [f"Org {i}" for i in range(n)],
        "org_url": [f"https://{host_name(i)}/" for i in range(n)],
        "repo_urls": [[] for _ in range(n)],
        "organisation_url": [f"https://{host_name(i)}/about" if i % 3 == 0 else None for i in range(n)],
    }
    rows["id"].append("org-bad")
    rows["name"].append("Bad scheme org")
    rows["org_url"].append("ftp://unsupported.example.xx/")
    rows["repo_urls"].append([])
    rows["organisation_url"].append(None)
    # duplicate id with a different org_url (upsert pair)
    rows["id"].append("org-0")
    rows["name"].append("Org 0 updated")
    rows["org_url"].append(f"https://{host_name(0)}/updated")
    rows["repo_urls"].append([f"https://{host_name(0)}/extra/repo"])
    rows["organisation_url"].append(None)
    return pa.table(
        {
            "id": pa.array(rows["id"]),
            "name": pa.array(rows["name"]),
            "org_url": pa.array(rows["org_url"]),
            "repo_urls": pa.array(rows["repo_urls"], type=pa.list_(pa.string())),
            "organisation_url": pa.array(rows["organisation_url"]),
        }
    )


def generate_repo_meta(frontier_path: str) -> pa.Table:
    """Repo metadata table (F7): per canonical URL, the scanner-style
    flags the reference filters on during discovery — ``is_fork``
    (``scanner/github.go:373-375``), ``is_private`` / ``is_archived``
    (``scanner/github.go:198-200``, ``scanner/bitbucket.go:57-61``).
    Flags are a deterministic function of the canonical hash (residue
    classes), so any two generations agree byte-for-byte."""
    import pyarrow.dataset as pads

    from don_crawler_ray.functions.urlnorm import canonicalize_url, url_hash64

    urls = pads.dataset(frontier_path).to_table(columns=["url"]).column("url").to_pylist()
    seen: set[int] = set()
    canon_out, hash_out, fork, priv, arch = [], [], [], [], []
    for u in urls:
        c = canonicalize_url(u)
        h = url_hash64(c)
        if h in seen:
            continue
        seen.add(h)
        canon_out.append(c)
        hash_out.append(h)
        fork.append(h % 11 == 3)
        priv.append(h % 13 == 5)
        arch.append(h % 17 == 7)
    return pa.table(
        {
            "canonical_url": pa.array(canon_out, pa.string()),
            "url_hash": pa.array(hash_out, pa.uint64()),
            "is_fork": pa.array(fork, pa.bool_()),
            "is_private": pa.array(priv, pa.bool_()),
            "is_archived": pa.array(arch, pa.bool_()),
        }
    )


def repo_meta_skip_hashes(meta: pa.Table) -> np.ndarray:
    """The sorted canonical-hash skip set: repos flagged fork OR private
    OR archived (the reference's discovery-time skip predicate)."""
    import pyarrow.compute as pc

    flagged = pc.or_(
        pc.or_(meta.column("is_fork"), meta.column("is_private")),
        meta.column("is_archived"),
    )
    return np.sort(
        meta.filter(flagged).column("url_hash").to_numpy(zero_copy_only=False).astype(np.uint64)
    )


def generate_politeness(seed: int = 42, n_hosts: int = 20) -> pa.Table:
    """Politeness config (F3): per-host budgets and robots.txt.

    Budget semantics mirror the reference's caps (GitLab semaphore=4,
    ``scanner/gitlab.go:22``); a quarter of hosts disallow the path
    prefix ``/{WORDS[0]}`` (rows exist with that prefix -> robots-denied
    counter); one host 404s (empty robots -> allow all); one 503s.
    """
    hosts = [host_name(i) for i in range(n_hosts)]
    robots = []
    for i in range(n_hosts):
        if i == 1:
            robots.append(None)  # robots 404 -> allow all
        elif i == 2:
            robots.append("__503__")  # robots error sentinel
        elif i % 4 == 3:
            # single-letter path prefixes -> ~10% of that host's paths denied
            robots.append("User-agent: *\nDisallow: /b\nDisallow: /c\n")
        else:
            robots.append("User-agent: *\nDisallow:\n")
    mix = _rand_u64(seed, np.arange(n_hosts), 999)
    return pa.table(
        {
            "host": pa.array(hosts),
            "max_concurrent": pa.array((1 + mix % np.uint64(4)).astype(np.int32)),
            "min_delay_ms": pa.array(((mix >> np.uint64(8)) % np.uint64(50)).astype(np.int64)),
            "per_round_budget": pa.array((20 + (mix >> np.uint64(16)) % np.uint64(200)).astype(np.int64)),
            "robots_txt": pa.array(robots, type=pa.string()),
        }
    )


def generate_rl_script(seed: int = 42, n_hosts: int = 20) -> dict[str, list[tuple[int, int, dict]]]:
    """Scripted rate-limit episodes (F3 ``rl_script``): per host, a list
    of ``(after_n_requests, status, headers)``. Covers the reference's
    header edge cases (``common/rate_limit_headers_test.go:10-164``):
    multi-value resets (latest wins), comma lists, negative and
    over-24h Retry-After (ignored -> fallback), HTTP-date form, plain
    403 (not rate limited), 403 + X-RateLimit-Remaining: 0."""
    now = 1_700_000_000
    script: dict[str, list[tuple[int, int, dict]]] = {
        host_name(0): [
            (3, 429, {"Retry-After": "30"}),
            (10, 429, {"RateLimit-Reset": f"{now + 60}, {now + 120}"}),  # comma list
        ],
        host_name(4): [
            (0, 429, {}),  # no headers -> 15s fallback
            (5, 403, {"X-RateLimit-Remaining": "0"}),
        ],
        host_name(5): [
            (1, 429, {"Retry-After": "-5"}),  # ignored -> fallback
            (2, 429, {"Retry-After": str(25 * 3600)}),  # >24h ignored -> fallback
            (4, 403, {}),  # plain 403: NOT rate limited
        ],
        host_name(6): [
            (0, 429, {"X-RateLimit-Reset": [str(now + 10), str(now + 40)]}),  # latest wins
        ],
    }
    return script
