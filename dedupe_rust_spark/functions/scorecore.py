"""Pairwise similarity scorers: Jaro-Winkler, Levenshtein ratio, Jaccard.

Reference analog: the deep verification tier (`hash_image` equality,
/root/reference/src/main.rs:593-624) — the reference only ever tests
*equality*; these scorers are the fuzzy generalization required by the
north rule. numpy-vectorized inner loops (no per-char Python in the DP),
batched over candidate pairs from an Arrow pandas UDF.
"""

from __future__ import annotations

import numpy as np

from .sigcore import shingle_set

SCORE_VERSION = "1"

# Texts longer than this score Levenshtein at token level (words) instead of
# char level: the DP is O(len_a) numpy row-ops, so cap the row count.
LEV_CHAR_CAP = 256

# Jaro-Winkler is a prefix-weighted name-similarity metric; on documents we
# compute it over the head only. O(len^2) matrix + O(len) loop per pair, so
# this cap bounds the dominant scoring cost (engine semantics, versioned).
JW_CHAR_CAP = 160


def jaro(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    aa = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    bb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    # match matrix restricted to the Jaro window, greedy left-to-right
    eq = aa[:, None] == bb[None, :]
    idx_a = np.arange(la)[:, None]
    idx_b = np.arange(lb)[None, :]
    eq &= np.abs(idx_a - idx_b) <= window
    b_taken = np.zeros(lb, dtype=bool)
    a_match: list[int] = []
    b_match: list[int] = []
    for i in range(la):
        row = eq[i] & ~b_taken
        j = int(np.argmax(row))
        if row[j]:
            b_taken[j] = True
            a_match.append(i)
            b_match.append(j)
    m = len(a_match)
    if m == 0:
        return 0.0
    t = int(np.sum(aa[a_match] != bb[np.sort(np.asarray(b_match))])) / 2
    return (m / la + m / lb + (m - t) / m) / 3


def jaro_winkler(a: str, b: str, p: float = 0.1, max_prefix: int = 4) -> float:
    j = jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * p * (1 - j)


def _lev_dp(a_codes: np.ndarray, b_codes: np.ndarray) -> int:
    """Levenshtein distance with numpy-vectorized rows (O(la) row ops)."""
    la, lb = len(a_codes), len(b_codes)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = np.arange(lb + 1, dtype=np.int64)
    cur = np.empty(lb + 1, dtype=np.int64)
    ramp = np.arange(lb + 1, dtype=np.int64)
    for i in range(la):
        cur[0] = i + 1
        sub = prev[:-1] + (b_codes != a_codes[i])
        np.minimum(sub, prev[1:] + 1, out=cur[1:])
        # insertions propagate left-to-right: min over j'<=j of cur[j']+(j-j')
        # == ramp + cummin(cur - ramp); includes cur[0] as a source.
        cur -= ramp
        np.minimum.accumulate(cur, out=cur)
        cur += ramp
        prev, cur = cur, prev
    return int(prev[lb])


def _codes(s: str) -> np.ndarray:
    return np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32)


def _token_codes(s: str) -> np.ndarray:
    """Map whitespace tokens to stable int codes (per-call interning)."""
    toks = s.split()
    table: dict[str, int] = {}
    return np.fromiter(
        (table.setdefault(t, len(table)) for t in toks), dtype=np.uint32,
        count=len(toks),
    )


def levenshtein(a: str, b: str) -> int:
    """Exact char-level Levenshtein distance."""
    return _lev_dp(_codes(a), _codes(b))


def lev_sim(a: str, b: str) -> float:
    """Normalized Levenshtein similarity in [0,1]; token-level beyond
    LEV_CHAR_CAP chars (documented engine semantics, not an approximation
    toggle — long web texts compare by word edits)."""
    if a == b:
        return 1.0
    if max(len(a), len(b)) <= LEV_CHAR_CAP:
        ca, cb = _codes(a), _codes(b)
    else:
        ca, cb = _token_codes(a), _token_codes(b)
    denom = max(len(ca), len(cb))
    if denom == 0:
        return 1.0
    return 1.0 - _lev_dp(ca, cb) / denom


def jaccard_shingles(a: str, b: str) -> float:
    """Exact Jaccard over word-3-shingle sets."""
    sa, sb = shingle_set(a), shingle_set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    inter = len(sa & sb)
    return inter / (len(sa) + len(sb) - inter)


def score_pair(a: str, b: str) -> tuple[float, float, float]:
    return (
        jaro_winkler(a[:JW_CHAR_CAP], b[:JW_CHAR_CAP]),
        lev_sim(a, b),
        jaccard_shingles(a, b),
    )
