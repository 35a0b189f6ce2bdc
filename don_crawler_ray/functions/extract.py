"""HTML -> text extraction kernel + reference-faithful description logic.

This is the engine's per-row invariant surface: extracted text must be
byte-identical for a given ``html`` payload regardless of parallelism,
batch boundaries, or execution order. Two layers:

1. ``extract_text(html)`` — the general HTML-to-text extractor used on
   frontier pages (the scale analog of the reference's README reader,
   ``git/readme.go:19-47`` + ``pickReadmeName`` ``git/readme.go:49-82``).
   Deterministic, regex-based, no external parser libraries.

2. ``description_from_readme(text)`` — a byte-faithful port of the
   reference's ``descriptionFromReadme`` (``crawler/crawler.go:671-696``)
   including its exact quirks (see docstring), so the description column
   matches the Go engine for the same input text.

Plus ``pick_readme_name`` (``git/readme.go:49-82``),
``ensure_description`` (``crawler/crawler.go:716-730``) and
``title_from_repository_name`` (``crawler/crawler.go:484-490``).

All functions are pure; the batch entry point ``extract_batch`` is what
the map_batches stage calls.
"""

from __future__ import annotations

import posixpath
import re

# --- HTML cleaning ---------------------------------------------------------

# Script/style/noscript blocks are dropped wholesale (case-insensitive,
# dotall so multi-line blocks go in one match).
_BLOCK_DROP_RE = re.compile(
    r"<(script|style|noscript)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# Tags that imply a line break when converted to text.
_LINEBREAK_TAG_RE = re.compile(
    r"</?(?:p|div|br|h[1-6]|li|ul|ol|tr|table|title|header|footer|section|"
    r"article|blockquote|pre)\b[^>]*/?>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_ENTITY_RE = re.compile("|".join(re.escape(k) for k in _ENTITIES))
_NUMERIC_ENTITY_RE = re.compile(r"&#(\d+);|&#x([0-9a-fA-F]+);")
# Collapse runs of spaces/tabs inside a line (newlines handled separately).
_INTRALINE_WS_RE = re.compile(r"[ \t\f\v]+")


def _decode_entity(m: re.Match) -> str:
    dec, hexa = m.group(1), m.group(2)
    try:
        cp = int(dec) if dec is not None else int(hexa, 16)
        if 0 < cp < 0x110000:
            return chr(cp)
    except (ValueError, OverflowError):
        pass
    return m.group(0)


def html_to_lines(html: bytes | str) -> list[str]:
    """Decode + strip an HTML payload to trimmed text lines.

    Deterministic, library-free. CRLF is normalized to LF first
    (reference parity: ``strings.ReplaceAll(contents, "\\r\\n", "\\n")``
    at ``crawler/crawler.go:672``).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        text = bytes(html).decode("utf-8", errors="replace")
    else:
        text = html
    text = text.replace("\r\n", "\n")
    text = _COMMENT_RE.sub("", text)
    text = _BLOCK_DROP_RE.sub("\n", text)
    text = _LINEBREAK_TAG_RE.sub("\n", text)
    text = _ANY_TAG_RE.sub("", text)
    text = _ENTITY_RE.sub(lambda m: _ENTITIES[m.group(0)], text)
    text = _NUMERIC_ENTITY_RE.sub(_decode_entity, text)
    # one whole-text collapse == per-line collapse: the class excludes \n
    text = _INTRALINE_WS_RE.sub(" ", text)
    return [ln.strip() for ln in text.split("\n")]


def is_skippable_line(line: str) -> bool:
    """Byte-faithful port of ``isReadmeSkippableLine``
    (``crawler/crawler.go:698-714``): headings, leading ``<img``/``<a``
    (case-insensitive), badge lines ``![`` / ``[!``. The ``lower()`` is
    taken lazily — only lines starting with ``<`` can match the tag
    prefixes, and lowercasing every line dominated the profile."""
    c0 = line[0] if line else ""
    if c0 == "#":
        return True
    if c0 == "<":
        lower = line[:4].lower()
        if lower.startswith("<img") or lower.startswith("<a"):
            return True
    if c0 == "!" and line.startswith("!["):
        return True
    if c0 == "[" and line.startswith("[!"):
        return True
    return False


def extract_text(html: bytes | str) -> str:
    """Full-page extraction: cleaned text lines, skippable lines removed,
    blank runs collapsed, joined with single ``\\n``.

    This generalizes the reference's README extraction intent (readable
    prose only — drop headings/badges/markup noise,
    ``crawler/crawler.go:671-714``) to whole pages: every content line
    survives, not just the first paragraph.
    """
    out: list[str] = []
    prev_blank = True
    for ln in html_to_lines(html):
        if not ln:
            prev_blank = True
            continue
        if is_skippable_line(ln):
            continue
        if prev_blank and out:
            out.append("")
        out.append(ln)
        prev_blank = False
    # Collapse the paragraph markers: paragraphs separated by one blank line.
    return "\n".join(out)


def description_from_readme(contents: str) -> str:
    """Byte-faithful port of ``descriptionFromReadme``
    (``crawler/crawler.go:671-696``), quirks included:

    - ``paragraph`` is pre-sized to ``len(lines)``, so the
      ``len(paragraph) == 0`` guard on the skippable-line branch is
      never true (``strings.Split`` always yields >= 1 element) — i.e.
      skippable lines are RETAINED, not skipped;
    - the loop breaks at the FIRST blank (after-trim) line for the same
      reason (``len(paragraph) > 0`` is always true);
    - the join covers all pre-sized slots, so untouched slots contribute
      empty strings -> trailing/extra single spaces in the output.

    We reproduce these exactly: the per-url invariant is byte
    equality with the Go engine.
    """
    contents = contents.replace("\r\n", "\n")
    lines = contents.split("\n")
    paragraph = [""] * len(lines)
    for i, line in enumerate(lines):
        trimmed = line.strip()
        if trimmed == "":
            # Go: `if len(paragraph) > 0 { break }` — always true here.
            break
        # Go: `if len(paragraph) == 0 && isReadmeSkippableLine(...)` —
        # never true; line is kept.
        paragraph[i] = trimmed
    return " ".join(paragraph)


_README_PRIORITY = ("readme.md", "readme.rst", "readme.txt", "readme")


def pick_readme_name(names: list[str]) -> str | None:
    """Port of ``pickReadmeName`` (``git/readme.go:49-82``): a
    lowercase -> trimmed-name map built in input order (LATER duplicates
    overwrite, matching Go's map fill), scanned in README.md/.rst/.txt/
    README priority; else the first trimmed name starting with
    ``readme`` (case-insensitive)."""
    by_lower: dict[str, str] = {}
    for n in names:
        trimmed = n.strip()
        if trimmed:
            by_lower[trimmed.lower()] = trimmed
    for want in _README_PRIORITY:
        if want in by_lower:
            return by_lower[want]
    for n in names:
        trimmed = n.strip()
        if trimmed and trimmed.lower().startswith("readme"):
            return trimmed
    return None


def title_from_repository_name(name: str) -> str:
    """Port of ``titleFromRepositoryName`` (``crawler/crawler.go:484-490``):
    ``path.Base`` of the repo name."""
    if not name:
        return ""
    return posixpath.basename(name.rstrip("/")) or name


def ensure_description(description: str, title: str, name: str) -> str:
    """Port of ``ensureDescription`` (``crawler/crawler.go:716-730``):
    ``Description ?? Title ?? Name ?? "No description provided"``."""
    if description:
        return description
    if title:
        return title
    if name:
        return name
    return "No description provided"


# --- batch kernel ----------------------------------------------------------

def extract_batch(htmls) -> tuple[list[str], list[str], list[int]]:
    """Per-batch extraction: returns (text, description, text_len) lists.

    ``description`` is the reference-faithful first-paragraph rollup of
    the extracted text; ``text_len`` feeds cheap downstream stats
    without re-touching strings.
    """
    texts: list[str] = []
    descs: list[str] = []
    lens: list[int] = []
    _extract = extract_text
    _desc = description_from_readme
    for h in htmls:
        t = _extract(h)
        texts.append(t)
        descs.append(_desc(t))
        lens.append(len(t))
    return texts, descs, lens
