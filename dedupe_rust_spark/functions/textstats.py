"""Text-analysis cores for training-data pipelines: language-ID, quality
scoring, token counting, rolling-hash fingerprinting.

These back the `queries()` entries over the driver's `documents` table and
are expressed as built-in Spark SQL where possible (see operators/textops.py)
— the pure-Python versions here exist for unit tests and for the few parts
SQL can't express (langid profile matching).
"""

from __future__ import annotations

import hashlib
import re

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# BPE-ish token regex: words, numbers, or single non-space symbols —
# a public approximation of GPT-2-style pre-tokenization.
_BPE_RE = re.compile(r"[A-Za-z]+|\d{1,3}|[^\sA-Za-z\d]", re.UNICODE)

# Tiny character-trigram profiles per language, built from each language's
# most frequent function words (public knowledge). Deterministic, no model.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "zu", "den"),
    "fr": ("le", "la", "les", "de", "et", "est", "que", "pour", "dans", "une"),
    "es": ("el", "la", "los", "de", "que", "y", "es", "en", "por", "una"),
}

_STOPWORDS = frozenset(
    w for words in _LANG_MARKERS.values() for w in words
)


def detect_lang(text: str) -> str:
    """Heuristic language-ID by function-word hit count; 'zz' = unknown."""
    toks = set(_WORD_RE.findall(text.lower())[:400])
    best, best_hits = "zz", 0
    for lang in sorted(_LANG_MARKERS):  # sorted => deterministic tie-break
        hits = sum(1 for w in _LANG_MARKERS[lang] if w in toks)
        if hits > best_hits:
            best, best_hits = lang, hits
    return best if best_hits >= 2 else "zz"


def token_count_ws(text: str) -> int:
    return len(text.split())


def token_count_bpe(text: str) -> int:
    return len(_BPE_RE.findall(text))


def quality_score(text: str) -> float:
    """[0,1] heuristic quality: length band, alpha ratio, stopword ratio,
    mean word length band. Mirrors public web-corpus filtering heuristics
    (C4/Gopher-style rules)."""
    n = len(text)
    if n == 0:
        return 0.0
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return 0.0
    alpha = sum(c.isalpha() or c.isspace() for c in text) / n
    stop = sum(1 for w in words if w.lower().strip(".,!?;:") in _STOPWORDS)
    stop_ratio = stop / n_words
    mean_wl = sum(len(w) for w in words) / n_words
    s_len = min(n / 200.0, 1.0)
    s_alpha = alpha
    s_stop = min(stop_ratio / 0.2, 1.0)
    s_wl = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
    return round((s_len + s_alpha + s_stop + s_wl) / 4.0, 6)


def fingerprint(text: str, window: int = 64) -> str:
    """Winnowing-style document fingerprint: min md5 hash over each
    `window`-char rolling block (step window/2). Stable under small appends.

    md5 (not blake2b) since fingerprint family v2: the production operator
    is the all-builtin Spark expression in operators/textops.fingerprints —
    md5 is the rolling hash BOTH Spark and DuckDB evaluate natively, which
    moves the hot path from a per-row Python loop to whole-stage codegen
    AND gives the catalog query a hard value oracle. This Python twin
    exists for unit-test parity only."""
    if len(text) <= window:
        return hashlib.md5(text.encode("utf-8")).hexdigest()
    step = max(window // 2, 1)
    best: str | None = None
    for i in range(0, len(text) - window + 1, step):
        h = hashlib.md5(text[i : i + window].encode("utf-8")).hexdigest()
        if best is None or h < best:
            best = h
    return best or ""
