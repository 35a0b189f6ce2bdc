"""Text-analysis kernels: tokens, quality, language-ID, fingerprints.

Training-data-pipeline operators layered on the extraction output
(SURVEY.md scope extension). All vectorized-per-batch (compiled
regexes, numpy) and deterministic; designed for
``map_batches(batch_format="pyarrow")``. Where a DuckDB-oracle needs
the same semantics, the rule is chosen to be SQL-expressible
(documented per function).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

# BPE-ish token regex: letter runs, digit runs, single other non-space.
_TOKEN_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")
_WS_RE = re.compile(r"\S+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_UPPER_RE = re.compile(r"[A-Z]")

# Tiny per-language stopword profiles for the n-gram/common-word
# heuristic language-ID (public common-words lists).
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the of and to in a is that it for on with as are this be".split()),
    "nl": frozenset("de het een en van in is dat op te zijn met voor niet aan".split()),
    "de": frozenset("der die das und ist nicht ein zu mit von den im für auf".split()),
    "fr": frozenset("le la les de des et un une est dans que pour sur avec ne".split()),
}

_STOPWORDS_ALL = frozenset().union(*_LANG_PROFILES.values())


def whitespace_token_count(text: str) -> int:
    """Whitespace token count (SQL oracle:
    ``length(regexp_replace(trim(text),'\\S+','x','g'))`` equivalent —
    we use the count of non-space runs)."""
    return len(_WS_RE.findall(text))


def bpe_token_count(text: str) -> int:
    """BPE-ish token count: letter runs + digit runs + single symbols."""
    return len(_TOKEN_RE.findall(text))


def quality_score(text: str) -> float:
    """Composite quality score in [0,1]:

    ``0.4*length_score + 0.3*(1-punct_ratio) + 0.3*stopword_ratio``
    with length_score = min(1, n_chars/500), punct_ratio = punctuation
    chars / chars, stopword_ratio = stopword tokens / tokens. Matches
    the SQL oracle in pipelines.queries (same three terms).
    """
    n = len(text)
    if n == 0:
        return 0.0
    length_score = min(1.0, n / 500.0)
    punct_ratio = len(_PUNCT_RE.findall(text)) / n
    toks = text.lower().split()
    stop_ratio = (sum(1 for t in toks if t in _STOPWORDS_ALL) / len(toks)) if toks else 0.0
    return 0.4 * length_score + 0.3 * (1.0 - punct_ratio) + 0.3 * stop_ratio


def detect_language(text: str) -> str:
    """Common-word-profile language ID; returns the language whose
    stopword profile has the most hits (ties broken by language code
    order), or ``und`` when nothing matches."""
    toks = text.lower().split()
    if not toks:
        return "und"
    best_lang, best_score = "und", 0
    for lang in sorted(_LANG_PROFILES):
        prof = _LANG_PROFILES[lang]
        score = sum(1 for t in toks if t in prof)
        if score > best_score:
            best_lang, best_score = lang, score
    return best_lang


def doc_fingerprint_md5(text: str) -> str:
    """Whitespace-normalized lowercase md5 fingerprint. SQL oracle:
    ``md5(lower(regexp_replace(text, '\\s+', ' ', 'g')))``."""
    normalized = re.sub(r"\s+", " ", text).lower()
    return hashlib.md5(normalized.encode("utf-8")).hexdigest()


_ROLL_BASE = 1000003
_ROLL_MOD = (1 << 61) - 1


def rolling_fingerprints(text: str, window: int = 8) -> list[int]:
    """Rabin-Karp rolling hashes over byte windows (winnowing-style doc
    fingerprinting base; deterministic, no Python ``hash``)."""
    data = text.encode("utf-8")
    n = len(data)
    if n < window:
        h = 0
        for b in data:
            h = (h * _ROLL_BASE + b) % _ROLL_MOD
        return [h] if n else []
    out = []
    h = 0
    top = pow(_ROLL_BASE, window - 1, _ROLL_MOD)
    for i, b in enumerate(data):
        if i >= window:
            h = (h - data[i - window] * top) % _ROLL_MOD
        h = (h * _ROLL_BASE + b) % _ROLL_MOD
        if i >= window - 1:
            out.append(h)
    return out


def winnow_fingerprint(text: str, window: int = 8, band: int = 4) -> int:
    """Single winnowed fingerprint: min rolling hash per band, XOR-folded.
    Cheap near-identity document signature."""
    hs = rolling_fingerprints(text, window)
    if not hs:
        return 0
    arr = np.array(hs, dtype=np.uint64)
    n_bands = max(1, len(arr) // max(1, len(arr) // band))
    acc = np.uint64(0)
    for chunk in np.array_split(arr, min(band, len(arr))):
        acc ^= chunk.min()
    return int(acc)


# --- batch kernel ----------------------------------------------------------

def text_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append token counts, quality, language, fingerprint columns."""
    texts = batch.column(text_col).to_pylist()
    ws = np.fromiter((whitespace_token_count(t) for t in texts), np.int64, len(texts))
    bpe = np.fromiter((bpe_token_count(t) for t in texts), np.int64, len(texts))
    qual = np.fromiter((quality_score(t) for t in texts), np.float64, len(texts))
    langs = [detect_language(t) for t in texts]
    fps = [doc_fingerprint_md5(t) for t in texts]
    return (
        batch.append_column("ws_tokens", pa.array(ws))
        .append_column("bpe_tokens", pa.array(bpe))
        .append_column("quality", pa.array(qual))
        .append_column("lang_detected", pa.array(langs, pa.string()))
        .append_column("fingerprint", pa.array(fps, pa.string()))
    )
