"""RFC 3986 URL canonicalization, host-reversal partition keys, stable hashes.

Reference parity: the Go reference treats URLs as first-class parsed
scalars (``internal/url.go:10-32``) and normalizes repo names with
``.git``-suffix stripping (``scanner/commit_helpers.go:39``,
``scanner/github.go:368``) and path splitting
(``common/split_fullname.go:12-24``). This module generalizes those to a
full RFC 3986 canonicalizer, which is what the frontier engine keys
every downstream stage on (dedup, scheduling, output partitioning).

Everything here is pure and deterministic: no wall clock, no Python
``hash()`` (which is salted per process). Batch helpers operate on
lists of strings and are used inside ``map_batches`` kernels.
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

# Unreserved characters per RFC 3986 §2.3: percent-escapes of these are
# decoded during normalization; all other escapes are uppercased.
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)
_UNRESERVED_BY_HEX = {f"{ord(c):02X}": c for c in _UNRESERVED}

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}

_HEX_DIGITS = set("0123456789abcdefABCDEF")


def _normalize_escapes(component: str) -> str:
    """Uppercase %XX escapes; decode escapes of unreserved characters.

    Malformed escapes (e.g. ``%zz`` or a trailing ``%``) are left
    verbatim, mirroring lenient crawler behavior.
    """
    if "%" not in component:
        return component
    out = []
    i = 0
    n = len(component)
    while i < n:
        ch = component[i]
        if (
            ch == "%"
            and i + 2 < n
            and component[i + 1] in _HEX_DIGITS
            and component[i + 2] in _HEX_DIGITS
        ):
            hx = component[i + 1 : i + 3].upper()
            decoded = _UNRESERVED_BY_HEX.get(hx)
            out.append(decoded if decoded is not None else "%" + hx)
            i += 3
            continue
        out.append(ch)
        i += 1
    return "".join(out)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments."""
    if not path:
        return path
    output: list[str] = []
    # Work on segments; keep track of leading slash.
    leading = path.startswith("/")
    segments = path.split("/")
    for seg in segments:
        if seg == ".":
            continue
        if seg == "..":
            if output and output[-1] != "":
                output.pop()
            continue
        output.append(seg)
    # Trailing "." or ".." imply a trailing slash.
    if segments and segments[-1] in (".", ".."):
        if not output or output[-1] != "":
            output.append("")
    result = "/".join(output)
    if leading and not result.startswith("/"):
        result = "/" + result
    return result


import re as _re

_SCHEME_NETLOC_RE = _re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*://")
_DELEGATE_CHARS = ("[", "]", "\t", "\n", "\r")


def canonicalize_parts(url: str) -> tuple[str, str, str]:
    """Single-parse canonicalization returning
    ``(canonical_url, host, path)``.

    Hand-rolled hot path (urlsplit plus its hostname/port properties
    re-scan the netloc several times — ~40% of the kernel); IPv6
    brackets and control characters delegate to the urllib-based
    reference implementation, and a hypothesis test pins the two
    byte-equal over the URL fuzz space."""
    url = url.strip()
    m = _SCHEME_NETLOC_RE.match(url)
    if not m:
        return url, "", "/"
    rest = url[m.end() :]
    if any(c in url for c in _DELEGATE_CHARS):
        return _canonicalize_parts_reference(url)
    end = len(rest)
    for j, ch in enumerate(rest):
        if ch in "/?#":
            end = j
            break
    netloc = rest[:end]
    if not netloc:
        return url, "", "/"
    scheme = url[: m.end() - 3].lower()
    tail = rest[end:]
    frag = tail.find("#")
    if frag >= 0:
        tail = tail[:frag]
    qpos = tail.find("?")
    if qpos >= 0:
        raw_path, raw_query = tail[:qpos], tail[qpos + 1 :]
    else:
        raw_path, raw_query = tail, ""

    userinfo, _, hostport = netloc.rpartition("@")
    host, colon, port_s = hostport.partition(":")
    host = host.lower().rstrip(".")
    if colon and port_s:
        try:
            port = int(port_s, 10)
            if not 0 <= port <= 65535:
                raise ValueError
        except ValueError:
            out_netloc = netloc.lower()
        else:
            out_netloc = host if str(port) == _DEFAULT_PORTS.get(scheme, "") else f"{host}:{port}"
            if userinfo:
                out_netloc = f"{userinfo}@{out_netloc}"
    else:
        # no port, or an empty ":" (urlsplit treats empty as absent)
        out_netloc = f"{userinfo}@{host}" if userinfo else host

    path = _normalize_escapes(raw_path)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    query = _normalize_escapes(raw_query)

    out = f"{scheme}://{out_netloc}{path}"
    if query:
        out += f"?{query}"
    return out, host, path


def _canonicalize_parts_reference(url: str) -> tuple[str, str, str]:
    """urllib-based reference canonicalizer: the semantic ground truth
    for the hand-rolled hot path (hypothesis-pinned equal) and the
    delegate for IPv6 / control-character forms."""
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url, "", "/"
    scheme = parts.scheme.lower()
    if not scheme or not parts.netloc:
        return url, "", "/"

    host = (parts.hostname or "").lower().rstrip(".")
    try:
        port = parts.port
    except ValueError:
        netloc = parts.netloc.lower()
    else:
        netloc = host
        if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
            netloc = f"{host}:{port}"
        if parts.username:
            userinfo = parts.username
            if parts.password is not None:
                userinfo += f":{parts.password}"
            netloc = f"{userinfo}@{netloc}"

    path = _normalize_escapes(parts.path)
    path = _remove_dot_segments(path)
    if not path:
        path = "/"
    query = _normalize_escapes(parts.query)

    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out, host, path


def canonicalize_url(url: str) -> str:
    """Canonicalize one URL per RFC 3986 §6.2.2/.2.3 (syntax-based +
    scheme-based normalization).

    - scheme and host lowercased
    - default port stripped (http:80, https:443, ...)
    - %XX escapes uppercased; escapes of unreserved chars decoded
    - dot-segments removed from the path
    - empty path -> "/" (for http(s) and other authority-based schemes)
    - fragment dropped (crawl identity ignores fragments)
    - query preserved (order significant per RFC), escapes normalized

    Unparseable inputs are returned stripped but otherwise verbatim so
    they surface as error rows downstream rather than crashing a batch
    (reference emits error rows for unsupported URLs,
    ``crawler/crawler.go:213-219``).
    """
    return canonicalize_parts(url)[0]


def url_host(url: str) -> str:
    """Lowercased host of a URL ('' if unparseable)."""
    try:
        return (urlsplit(url).hostname or "").lower().rstrip(".")
    except ValueError:
        return ""


def reverse_host(host: str) -> str:
    """Host-reversal partition key: ``sub.example.com`` -> ``com.example.sub``.

    Groups URLs of one registrable domain (and its subdomains) into
    adjacent key ranges so range-partitioned frontier shards have
    per-site locality — the scale analog of the reference's per-repo
    lock key ``<host>/<org>/<repo>`` (``crawler/crawler.go:620-632``).
    IP addresses are left as-is.
    """
    if not host:
        return ""
    # Don't reverse IPv4/IPv6 literals.
    if host[0] == "[" or host.replace(".", "").isdigit():
        return host
    return ".".join(reversed(host.split(".")))


def url_hash64(canonical_url: str) -> int:
    """Stable unsigned 64-bit hash of a canonical URL.

    blake2b(digest_size=8) little-endian — identical across processes,
    machines, and parallelism levels (unlike builtin ``hash``). This is
    the key for the seen-set shards and the exact-dedup shuffle.
    """
    return int.from_bytes(
        hashlib.blake2b(canonical_url.encode("utf-8"), digest_size=8).digest(),
        "little",
    )


def strip_git_suffix(name: str) -> str:
    """Reference parity: ``strings.TrimSuffix(name, ".git")``
    (``scanner/commit_helpers.go:39``, ``scanner/github.go:368``)."""
    return name[: -len(".git")] if name.endswith(".git") else name


def split_full_name(full_name: str) -> tuple[str, str]:
    """Reference parity: ``common.SplitFullName``
    (``common/split_fullname.go:12-24``) — vendor is everything but the
    last segment, repo is the last; supports nested namespaces."""
    full_name = full_name.strip("/")
    if not full_name:
        return "", ""
    parts = full_name.split("/")
    if len(parts) == 1:
        return "", parts[0]
    return "/".join(parts[:-1]), parts[-1]


def split_org_path(url_or_path: str) -> str:
    """M2 — org-URL path splitter: the trimmed path must be exactly ONE
    segment (the org name), else ``ValueError`` ("doesn't look like a
    GitHub org", ``scanner/github.go:66-71``; bitbucket workspace form
    ``scanner/bitbucket.go:39-45``)."""
    path = urlsplit(url_or_path).path if "//" in url_or_path else url_or_path
    parts = path.strip("/").split("/")
    if len(parts) != 1 or not parts[0]:
        raise ValueError(f"doesn't look like an org path: {path!r}")
    return parts[0]


def split_repo_owner_and_name(url_or_path: str) -> tuple[str, str]:
    """M3 — repo-URL path splitter: ``(owner, repo)`` with the ``.git``
    suffix stripped from the repo; fewer than two segments is an error
    (``splitRepoOwnerAndName``, ``scanner/commit_helpers.go:32-42``)."""
    path = urlsplit(url_or_path).path if "//" in url_or_path else url_or_path
    parts = path.strip("/").split("/")
    if len(parts) < 2 or not parts[0]:
        raise ValueError(f"repository path {path!r} does not contain owner and name")
    return parts[0], strip_git_suffix(parts[1])


def is_dot_github_repo(name: str) -> bool:
    """Reference parity: ``isDotGitHubRepoName``
    (``scanner/github.go:367-371``) — case-insensitive ``.github``
    after stripping a ``.git`` suffix."""
    return strip_git_suffix(name).lower() == ".github"


# --- raw-file URL generators (M10) -----------------------------------------

def gitlab_raw_url(base_url: str, default_branch: str, filename: str = "publiccode.yml") -> str:
    """Port of ``generateGitlabRawURL`` (``scanner/gitlab.go:313-324``):
    join ``raw/<branch>/<filename>`` onto the project URL's path with
    Go ``path.Join`` cleaning semantics."""
    import posixpath

    parts = urlsplit(base_url)
    joined = posixpath.normpath(
        posixpath.join(parts.path or "/", "raw", default_branch, filename)
    )
    netloc = parts.netloc
    return f"{parts.scheme}://{netloc}{joined}" if parts.scheme else f"{netloc}{joined}"


def bitbucket_raw_url(owner: str, slug: str, main_branch: str, filename: str = "publiccode.yml") -> str:
    """Port of the Bitbucket raw-URL format string
    (``scanner/bitbucket.go:87, 148``)."""
    return f"https://bitbucket.org/{owner}/{slug}/raw/{main_branch}/{filename}"


def github_raw_url(owner: str, repo: str, default_branch: str, filename: str = "publiccode.yml") -> str:
    """GitHub content download-URL shape: the reference takes
    ``file.DownloadURL`` from the contents API (``scanner/github.go:230,
    233``), which for a regular file is the public
    ``raw.githubusercontent.com/<owner>/<repo>/<branch>/<path>`` form."""
    return f"https://raw.githubusercontent.com/{owner}/{repo}/{default_branch}/{filename}"


def raw_file_url(repo_url: str, default_branch: str = "main", filename: str = "publiccode.yml") -> str:
    """Platform-dispatched raw-file URL (the ``FileRawURL`` column,
    ``common/repository.go:16``): bitbucket.org uses the format string,
    everything else the GitLab-style path join (the engine's generic
    fetch-URL builder)."""
    host = url_host(repo_url)
    if host == "bitbucket.org":
        owner, slug = split_full_name(urlsplit(repo_url).path.strip("/"))
        return bitbucket_raw_url(owner, slug, default_branch, filename)
    if host in ("github.com", "www.github.com"):
        owner, repo = split_full_name(urlsplit(repo_url).path.strip("/"))
        return github_raw_url(owner, strip_git_suffix(repo), default_branch, filename)
    return gitlab_raw_url(repo_url, default_branch, filename)
