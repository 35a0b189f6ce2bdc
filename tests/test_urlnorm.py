"""RFC 3986 canonicalizer + key/hash tests.

Mirrors the reference's pure-function test style
(``common/split_fullname_test.go:5-46``) and adds RFC 3986 §6.2.2
vectors for the canonicalizer the reference lacks.
"""

import pytest

from don_crawler_ray.functions.urlnorm import (
    canonicalize_url,
    is_dot_github_repo,
    reverse_host,
    split_full_name,
    strip_git_suffix,
    url_hash64,
    url_host,
)


@pytest.mark.parametrize(
    "raw,want",
    [
        # case normalization (RFC 3986 §6.2.2.1)
        ("HTTP://WWW.Example.COM/", "http://www.example.com/"),
        ("https://Example.com/Path/Stays", "https://example.com/Path/Stays"),
        # default port stripping (§6.2.3)
        ("http://example.com:80/a", "http://example.com/a"),
        ("https://example.com:443/a", "https://example.com/a"),
        ("https://example.com:8443/a", "https://example.com:8443/a"),
        # empty path -> "/"
        ("http://example.com", "http://example.com/"),
        ("http://example.com?q=1", "http://example.com/?q=1"),
        # percent-encoding normalization (§6.2.2.2)
        ("http://example.com/%7euser", "http://example.com/~user"),
        ("http://example.com/%7Euser", "http://example.com/~user"),
        ("http://example.com/a%2fb", "http://example.com/a%2Fb"),
        ("http://example.com/%41%42c", "http://example.com/ABc"),
        # dot-segment removal (§6.2.2.3 / §5.2.4)
        ("http://example.com/a/b/../c", "http://example.com/a/c"),
        ("http://example.com/a/./b", "http://example.com/a/b"),
        ("http://example.com/../a", "http://example.com/a"),
        ("http://example.com/a/b/..", "http://example.com/a/"),
        ("http://example.com/a/.", "http://example.com/a/"),
        # fragment dropped, query preserved in order
        ("http://example.com/a?b=2&a=1#frag", "http://example.com/a?b=2&a=1"),
        # trailing dot on host
        ("http://example.com./x", "http://example.com/x"),
        # malformed escape left verbatim
        ("http://example.com/a%zz", "http://example.com/a%zz"),
        ("http://example.com/a%2", "http://example.com/a%2"),
    ],
)
def test_canonicalize_url(raw, want):
    assert canonicalize_url(raw) == want


def test_canonicalize_idempotent():
    urls = [
        "HTTP://a.B.c:80/%7e/../x?Q=%41#f",
        "https://example.com",
        "http://h.nl/a/b/../c/./d",
    ]
    for u in urls:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once


def test_canonicalize_unparseable_passthrough():
    assert canonicalize_url("not a url") == "not a url"
    assert canonicalize_url("   spaced   ") == "spaced"


def test_duplicate_variants_collapse():
    variants = [
        "http://Host1.example.nl:80/a/b",
        "http://host1.example.nl/a/b",
        "http://host1.example.nl/a/x/../b",
        "http://host1.example.nl/a/%62",
    ]
    canon = {canonicalize_url(v) for v in variants}
    assert canon == {"http://host1.example.nl/a/b"}


def test_reverse_host():
    assert reverse_host("sub.example.com") == "com.example.sub"
    assert reverse_host("example.nl") == "nl.example"
    assert reverse_host("localhost") == "localhost"
    assert reverse_host("192.168.0.1") == "192.168.0.1"
    assert reverse_host("") == ""


def test_url_host():
    assert url_host("https://A.B.C/x") == "a.b.c"
    assert url_host(":::") == ""


def test_url_hash64_stable():
    # Pinned digests: blake2b-64 is stable across processes and machines.
    h = url_hash64("http://example.com/")
    assert h == url_hash64("http://example.com/")
    assert 0 <= h < 2**64
    assert url_hash64("http://example.com/a") != url_hash64("http://example.com/b")


@pytest.mark.parametrize(
    "full,vendor,repo",
    [
        # table from common/split_fullname_test.go:5-46
        ("owner/repo", "owner", "repo"),
        ("group/subgroup/repo", "group/subgroup", "repo"),
        ("repo", "", "repo"),
        ("", "", ""),
    ],
)
def test_split_full_name(full, vendor, repo):
    assert split_full_name(full) == (vendor, repo)


def test_git_suffix_and_dot_github():
    assert strip_git_suffix("repo.git") == "repo"
    assert strip_git_suffix("repo") == "repo"
    # scanner/github.go:367-371 semantics
    assert is_dot_github_repo(".github")
    assert is_dot_github_repo(".GitHub.git")
    assert not is_dot_github_repo("x.github")


def test_raw_file_urls():
    from don_crawler_ray.functions.urlnorm import (
        bitbucket_raw_url,
        gitlab_raw_url,
        raw_file_url,
    )

    # generateGitlabRawURL (scanner/gitlab.go:313-324)
    assert (
        gitlab_raw_url("https://gitlab.com/group/project", "main")
        == "https://gitlab.com/group/project/raw/main/publiccode.yml"
    )
    # trailing slash cleaned like Go path.Join
    assert (
        gitlab_raw_url("https://gitlab.example.nl/g/sub/p/", "develop")
        == "https://gitlab.example.nl/g/sub/p/raw/develop/publiccode.yml"
    )
    # bitbucket format string (scanner/bitbucket.go:87, 148)
    assert (
        bitbucket_raw_url("owner", "slug", "master")
        == "https://bitbucket.org/owner/slug/raw/master/publiccode.yml"
    )
    # dispatch (FileRawURL, common/repository.go:16)
    assert (
        raw_file_url("https://bitbucket.org/team/repo", "master")
        == "https://bitbucket.org/team/repo/raw/master/publiccode.yml"
    )
    assert (
        raw_file_url("https://gitlab.com/a/b", "main")
        == "https://gitlab.com/a/b/raw/main/publiccode.yml"
    )


def test_canonicalize_stage_kernel():
    import pyarrow as pa

    from don_crawler_ray.stages.canonicalize import canonicalize_slim_stage

    urls = ["HTTP://A.example.COM:80/x/../y", "https://b.example.nl/"]
    batch = pa.table(
        {"url": pa.array(urls), "warc_ts": pa.array([0, 1], pa.timestamp("us"))}
    )
    out = canonicalize_slim_stage(batch)
    assert out.column("canonical_url").to_pylist() == [
        "http://a.example.com/y",
        "https://b.example.nl/",
    ]
    assert out.column("host_key").to_pylist() == ["com.example.a", "nl.example.b"]
    assert out.column("url_hash").to_pylist() == [
        url_hash64(c) for c in out.column("canonical_url").to_pylist()
    ]
    # raw_hash differs from url_hash exactly when canonicalization
    # changed the url (the fetch tie-break key)
    assert out.column("raw_hash").to_pylist() == [url_hash64(u) for u in urls]


def test_split_org_and_repo_paths():
    """M2/M3 path splitters (scanner/github.go:66-71, 164-169;
    scanner/commit_helpers.go:32-42)."""
    import pytest

    from don_crawler_ray.functions.urlnorm import (
        split_org_path,
        split_repo_owner_and_name,
    )

    assert split_org_path("https://github.com/developer-overheid-nl/") == "developer-overheid-nl"
    assert split_org_path("/some-org") == "some-org"
    with pytest.raises(ValueError, match="org path"):
        split_org_path("https://github.com/org/repo")
    with pytest.raises(ValueError, match="org path"):
        split_org_path("https://github.com/")

    assert split_repo_owner_and_name("https://github.com/org/repo.git") == ("org", "repo")
    # generic helper tolerates extra segments (commit_helpers.go:32-42)
    assert split_repo_owner_and_name("/owner/name/extra") == ("owner", "name")
    with pytest.raises(ValueError, match="owner and name"):
        split_repo_owner_and_name("https://github.com/justorg")


def test_org_uri_coalesce():
    """M16 orgURI coalesce (crawler/crawler.go:740-746)."""
    import pyarrow as pa

    from don_crawler_ray.sources.paginated import org_uri, publisher_org_uris

    assert org_uri("https://uri.example.nl", "https://org.example.nl") == "https://uri.example.nl"
    assert org_uri("", "https://org.example.nl") == "https://org.example.nl"
    t = pa.table(
        {
            "organisation_url": pa.array(["https://u1", "", None], pa.string()),
            "org_url": pa.array(["https://o1", "https://o2", "https://o3"], pa.string()),
        }
    )
    out = publisher_org_uris(t)
    assert out.column("org_uri").to_pylist() == ["https://u1", "https://o2", "https://o3"]
