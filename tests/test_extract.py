"""Extraction kernel tests — byte-faithful reference parity.

``description_from_readme`` must reproduce the Go
``descriptionFromReadme`` (``crawler/crawler.go:671-696``) byte for
byte, including its pre-sized-slice quirks; ``extract_text`` must be
deterministic over bytes regardless of batching.
"""

from don_crawler_ray.functions.extract import (
    description_from_readme,
    ensure_description,
    extract_batch,
    extract_text,
    html_to_lines,
    is_skippable_line,
    pick_readme_name,
    title_from_repository_name,
)


class TestDescriptionFromReadme:
    # The Go implementation pre-sizes `paragraph` to len(lines); the
    # skippable-line branch never fires and the loop breaks at the
    # first blank trimmed line; join covers all slots (trailing spaces).

    def test_single_line(self):
        assert description_from_readme("hello world") == "hello world"

    def test_breaks_at_first_blank_line(self):
        # lines: ["first", "", "second"] -> slots ["first", "", ""]
        assert description_from_readme("first\n\nsecond") == "first  "

    def test_heading_kept_not_skipped(self):
        # Go quirk: isReadmeSkippableLine is gated on len(paragraph)==0
        # which is never true.
        assert description_from_readme("# Title\nbody") == "# Title body"

    def test_crlf_normalized(self):
        assert description_from_readme("a\r\nb") == "a b"

    def test_trimming(self):
        assert description_from_readme("  a  \n\tb\t") == "a b"

    def test_blank_first_line_breaks_immediately(self):
        # ["", "x"] -> break at i=0 -> join ["", ""] = " "
        assert description_from_readme("\nx") == " "

    def test_empty(self):
        assert description_from_readme("") == ""


def test_is_skippable_line():
    # crawler/crawler.go:698-714
    assert is_skippable_line("# Heading")
    assert is_skippable_line("<img src=x>")
    assert is_skippable_line("<IMG src=x>")
    assert is_skippable_line("<a href=x>link</a>")
    assert is_skippable_line("![badge](x)")
    assert is_skippable_line("[![build](x)](y)")
    assert not is_skippable_line("regular text")
    assert not is_skippable_line("x # not heading")


def test_html_to_lines_basic():
    html = b"<html><head><title>T</title><style>p{}</style></head>" \
           b"<body><h1>H</h1><p>one two</p>\r\n<p>three</p>" \
           b"<script>var x=1;</script></body></html>"
    lines = [ln for ln in html_to_lines(html) if ln]
    assert lines == ["T", "H", "one two", "three"]


def test_extract_text_skips_noise():
    html = (
        b"<html><body>"
        b"<h1>Heading stays out via #? no - tags stripped, line kept</h1>"
        b"<p># markdown heading line</p>"
        b"<p><img src='badge'></p>"
        b"<p>real content line</p>"
        b"<p>![badge](url)</p>"
        b"<p>second real line</p>"
        b"</body></html>"
    )
    text = extract_text(html)
    assert "real content line" in text
    assert "second real line" in text
    assert "# markdown heading line" not in text
    assert "![badge](url)" not in text


def test_extract_text_entities_and_crlf():
    html = b"<p>a &amp; b &lt;c&gt; &#65;&#x42;</p>\r\n<p>next</p>"
    assert extract_text(html) == "a & b <c> AB\n\nnext"


def test_extract_text_deterministic_bytes():
    html = "<p>café ☃</p>".encode("utf-8")
    t1 = extract_text(html)
    t2 = extract_text(bytes(html))
    assert t1 == t2 == "café ☃"


def test_extract_batch_matches_scalar():
    htmls = [b"<p>a</p>", b"<h1>x</h1><p>b</p>\n\n<p>c</p>", b""]
    texts, descs, lens = extract_batch(htmls)
    assert texts == [extract_text(h) for h in htmls]
    assert descs == [description_from_readme(t) for t in texts]
    assert lens == [len(t) for t in texts]


def test_pick_readme_name():
    # git/readme.go:49-82 priority order
    assert pick_readme_name(["readme.txt", "README.md"]) == "README.md"
    assert pick_readme_name(["Readme.rst", "readme.TXT"]) == "Readme.rst"
    assert pick_readme_name(["README"]) == "README"
    assert pick_readme_name(["ReadMe.adoc"]) == "ReadMe.adoc"
    assert pick_readme_name(["other.md"]) is None
    # Go map semantics: the LAST duplicate-lowercased name wins
    assert pick_readme_name(["readme.md", "README.md"]) == "README.md"
    # names are trimmed before matching
    assert pick_readme_name(["  README.md  "]) == "README.md"
    assert pick_readme_name(["   ", "\treadme.adoc "]) == "readme.adoc"


def test_title_and_description_fallbacks():
    # crawler/crawler.go:484-490, 716-730
    assert title_from_repository_name("group/sub/repo") == "repo"
    assert title_from_repository_name("repo") == "repo"
    assert ensure_description("d", "t", "n") == "d"
    assert ensure_description("", "t", "n") == "t"
    assert ensure_description("", "", "n") == "n"
    assert ensure_description("", "", "") == "No description provided"
