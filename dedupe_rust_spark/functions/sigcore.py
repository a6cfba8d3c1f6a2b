"""Deterministic signature cores: shingles, SimHash-64, MinHash-k, LSH bands.

Generalizes the reference's two-tier signature cascade:
  * cheap 3,000-byte prefix checksum  (/root/reference/src/main.rs:520-572)
  * deep full-content hash            (/root/reference/src/main.rs:593-603)
into web-text signatures. All hashing goes through blake2b (stdlib,
process/seed independent) — never Python's builtin hash() (PYTHONHASHSEED).

numpy-vectorized per document; called from Arrow pandas UDFs in batches.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

SIG_VERSION = "1"

SHINGLE_N = 3          # word 3-grams, SURVEY.md §2 H1 mapping
MINHASH_K = 128        # signature length
LSH_BANDS = 32         # 32 bands x 4 rows: catches jaccard >= ~0.7 w.h.p.
                       # (empirical under the mixing family — see minhash())
LSH_ROWS = MINHASH_K // LSH_BANDS

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\w+", re.UNICODE)

# Fixed random permutation parameters (seed pinned => deterministic).
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=MINHASH_K, dtype=np.uint64)
_PERM_B = _rng.randint(0, _MERSENNE, size=MINHASH_K, dtype=np.uint64)
_EMPTY_SENTINEL = np.uint64(_MERSENNE)


def tokenize(text: str) -> list[str]:
    return _TOKEN_RE.findall(text.lower())


def hash64(s: str) -> int:
    """Stable 64-bit hash of a string (blake2b, 8-byte digest)."""
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "little"
    )


def shingle_set(text: str, n: int = SHINGLE_N) -> set[str]:
    toks = tokenize(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def shingle_hashes(text: str, n: int = SHINGLE_N) -> np.ndarray:
    """uint64 array of distinct shingle hashes (sorted for determinism)."""
    hs = {hash64(s) for s in shingle_set(text, n)}
    return np.fromiter(sorted(hs), dtype=np.uint64, count=len(hs))


def simhash64(text: str) -> int:
    """64-bit SimHash over word-3-shingles; near-dup texts differ in few bits."""
    hs = shingle_hashes(text)
    if hs.size == 0:
        return 0
    bits = np.unpackbits(hs.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    votes = bits.sum(axis=0, dtype=np.int64) * 2 - hs.size  # +1 set, -1 clear
    out = np.packbits((votes > 0).astype(np.uint8), bitorder="little")
    return int(out.view(np.uint64)[0])


def minhash(text: str, k: int = MINHASH_K) -> np.ndarray:
    """k-length uint64 MinHash signature.

    Hash family note: `_PERM_A * hs` wraps mod 2^64 BEFORE the `% _MERSENNE`
    fold, so each map is `((a*h mod 2^64) + b) mod (2^61-1)` — an ad-hoc
    deterministic mixing family, NOT the exact Carter-Wegman (a*h+b) mod p
    universal hash. It is seed-pinned and process-independent; the empirical
    collision behavior backs the LSH banding (tests/test_cores.py asserts
    the Jaccard-estimate accuracy, and BENCH/BASELINE.md's F1 table holds
    across scales). Exact 128-bit modular arithmetic would cost a split
    multiply per element for no measured recall gain."""
    hs = shingle_hashes(text)
    if hs.size == 0:
        return np.full(k, _EMPTY_SENTINEL, dtype=np.uint64)
    perm = (_PERM_A[:k, None] * hs[None, :] + _PERM_B[:k, None]) % _MERSENNE
    return perm.min(axis=1)


def band_keys(sig: np.ndarray, bands: int = LSH_BANDS) -> list[int]:
    """LSH band bucket keys: one stable 64-bit key per band.

    Two docs share a band key iff their signatures agree on all rows of that
    band -> candidate pair (SURVEY.md §2 B1 generalization).
    """
    rows = len(sig) // bands
    out: list[int] = []
    for b in range(bands):
        chunk = sig[b * rows : (b + 1) * rows]
        digest = hashlib.blake2b(
            b"%d|" % b + chunk.tobytes(), digest_size=8
        ).digest()
        out.append(int.from_bytes(digest, "little"))
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def minhash_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    """Unbiased Jaccard estimate from two equal-k MinHash signatures."""
    if len(sig_a) == 0 or len(sig_a) != len(sig_b):
        return 0.0
    return float(np.mean(sig_a == sig_b))


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()
