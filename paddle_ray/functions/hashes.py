"""Dedup sketches: shingling, MinHash, LSH banding, SimHash, n-gram Jaccard.

Standard public techniques (Broder 1997 MinHash; Charikar 2002 SimHash;
MMDS ch.3 LSH banding). All deterministic: fixed seeds, stable 64-bit
mixing (splitmix64), no Python `hash`.
"""

from __future__ import annotations

import numpy as np

_MASK = (1 << 64) - 1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 arrays."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(_MASK)
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & np.uint64(_MASK)
    return z ^ (z >> np.uint64(31))


def shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Hashes of word k-shingles (uint64, unique, sorted)."""
    import zlib

    words = text.split()
    if len(words) < k:
        # short doc: ONE shingle over the whole text — hashing only the
        # first 8 bytes made all short docs sharing a prefix exact dups
        s = " ".join(words).encode("utf-8")
        h = np.array([(zlib.crc32(s) << 32) | zlib.crc32(s[::-1])], dtype=np.uint64)
        return splitmix64(h)
    # hash each shingle via Python's stable zlib.crc32 pairs -> 64-bit mix

    hs = np.empty(len(words) - k + 1, dtype=np.uint64)
    for i in range(len(words) - k + 1):
        s = " ".join(words[i : i + k]).encode("utf-8")
        hs[i] = (zlib.crc32(s) << 32) | zlib.crc32(s[::-1])
    return np.unique(splitmix64(hs))


def char_ngram_set(text: str, n: int = 3) -> set[str]:
    """Character n-gram set (for n-gram Jaccard)."""
    if len(text) < n:
        return {text} if text else set()
    return {text[i : i + n] for i in range(len(text) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def char_set_jaccard(a: str, b: str) -> float:
    """Jaccard over single-character sets — EXACTLY DuckDB's `jaccard()`
    semantics, so results are oracle-checkable."""
    return jaccard(set(a), set(b))


# --- MinHash ---------------------------------------------------------------

def minhash_signature(shingles: np.ndarray, num_perm: int = 128, seed: int = 1) -> np.ndarray:
    """num_perm minima of seeded splitmix64 permutations (uint64 vector)."""
    if len(shingles) == 0:
        return np.full(num_perm, np.uint64(_MASK), dtype=np.uint64)
    seeds = splitmix64(np.arange(seed, seed + num_perm, dtype=np.uint64))
    # (num_perm, n) xor-mix then min per row — vectorized
    mixed = splitmix64(shingles[None, :] ^ seeds[:, None])
    return mixed.min(axis=1)


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list[tuple[int, int]]:
    """Split the signature into `bands` rows-per-band chunks; key = (band_id,
    mixed band hash). Docs sharing any band key are candidates.

    The per-band sequential mix runs vectorized ACROSS bands (rows ~8
    vector ops instead of bands*rows scalar ops)."""
    if bands > len(sig) or len(sig) % bands != 0:
        # rows=0 would key EVERY doc into the same constant bucket (the
        # whole corpus becomes one O(n^2) candidate set, silently); a
        # non-dividing band count silently ignores tail signature rows
        raise ValueError(f"bands={bands} must divide signature length {len(sig)}")
    rows = len(sig) // bands
    chunks = sig[: bands * rows].reshape(bands, rows)
    h = np.full(bands, np.uint64(1469598103934665603), dtype=np.uint64)
    for r in range(rows):
        h = splitmix64(h ^ chunks[:, r])
    return [(b, int(v)) for b, v in enumerate(h)]


def minhash_jaccard_est(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float(np.mean(sig_a == sig_b))


# --- SimHash ---------------------------------------------------------------

def simhash(text: str, k_shingle: int = 3) -> int:
    """64-bit SimHash over word shingle hashes."""
    hs = shingle_hashes(text, k=k_shingle)
    if len(hs) == 0:
        return 0
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    v = (2 * bits - 1).sum(axis=0)
    return int(((v > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & _MASK).count("1")
