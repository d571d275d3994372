"""Distributed sketch aggregates: HyperLogLog approximate distinct count.

The reference has no sketch aggregates (SURVEY.md §2.5 "No
distinct/sketch... exist"); at 10^12-document scale an exact
COUNT(DISTINCT) shuffles every distinct key, so the engine provides the
standard mergeable sketch: per-batch partial registers (one fixed-size
vector per block), merged by elementwise max — the shuffle carries
O(#blocks × 2^p) bytes regardless of cardinality.

Hash: splitmix64 (same generator as functions/hashes.py) over the
element's UTF-8 bytes via a stable 64-bit FNV-1a pre-fold, fully
vectorized in numpy. Standard HLL bias correction (Flajolet et al. 2007
constants + small/large-range corrections).
"""

from __future__ import annotations

import numpy as np

HLL_P = 12  # 2^12 = 4096 registers -> ~1.6% standard error
HLL_M = 1 << HLL_P

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)

# the ONE splitmix64 owner is functions/hashes.py — a bit-identical local
# copy lived here and could silently diverge the hash streams the module
# claims are shared (verified equal over random inputs before removal)
from .hashes import splitmix64 as _splitmix64  # noqa: E402


def hash64_ints(vals: np.ndarray) -> np.ndarray:
    return _splitmix64(vals.astype(np.uint64))


def hash64_strings(vals: list[str]) -> np.ndarray:
    """Stable 64-bit hash of UTF-8 strings: FNV-1a fold (python ints, but
    only over distinct-ish short keys; for bulk numeric keys use
    hash64_ints) finished with splitmix64 avalanche."""
    out = np.empty(len(vals), dtype=np.uint64)
    prime = int(_FNV_PRIME)
    mask = (1 << 64) - 1
    for i, s in enumerate(vals):
        h = int(_FNV_OFFSET)
        for b in s.encode("utf-8"):
            h = ((h ^ b) * prime) & mask
        out[i] = h
    return _splitmix64(out)


def hll_partial(hashes: np.ndarray) -> np.ndarray:
    """One batch -> one register vector (uint8[HLL_M])."""
    idx = (hashes >> np.uint64(64 - HLL_P)).astype(np.int64)
    rest = hashes << np.uint64(HLL_P)
    # rank = position of leftmost 1-bit in the remaining 64-P bits, 1-based;
    # all-zero rest -> max rank
    nbits = 64 - HLL_P
    rank = np.full(len(hashes), nbits + 1, dtype=np.uint8)
    found = np.zeros(len(hashes), dtype=bool)
    probe = rest.copy()
    for r in range(1, nbits + 1):
        top = (probe >> np.uint64(63)).astype(bool)
        newly = top & ~found
        rank[newly] = r
        found |= top
        if found.all():
            break
        probe = probe << np.uint64(1)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(partials: np.ndarray) -> np.ndarray:
    """Elementwise max over a stack of register vectors."""
    return partials.max(axis=0)


def hll_estimate(regs: np.ndarray) -> float:
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range (linear counting)
    elif est > (1 << 64) / 30.0:
        est = -(1 << 64) * np.log1p(-est / (1 << 64))
    return float(est)


# --- log-histogram quantile sketch -----------------------------------------
# Mergeable approximate quantiles for positive integer measures (doc
# lengths, payload bytes): fixed log-spaced bin edges, one int64 count
# vector per partial (elementwise-add merge, like the HLL registers).
# Relative error is bounded by the bin ratio (~7% at 240 bins over
# [1, 1e7]); intra-bin linear interpolation does better in practice.

HIST_BINS = 240
HIST_LO, HIST_HI = 1.0, 1e7
_HIST_EDGES = np.logspace(np.log10(HIST_LO), np.log10(HIST_HI), HIST_BINS + 1)


def hist_partial(values: np.ndarray) -> np.ndarray:
    """int64 count vector (HIST_BINS+2: underflow bin 0, overflow last)."""
    idx = np.searchsorted(_HIST_EDGES, np.asarray(values, dtype=np.float64), side="right")
    return np.bincount(idx, minlength=HIST_BINS + 2).astype(np.int64)


def hist_quantile(counts: np.ndarray, q: float) -> float:
    """Quantile estimate: locate the target rank's bin, interpolate
    linearly within it (geometric edges). Under/overflow clamp to edges."""
    total = int(counts.sum())
    if total == 0:
        return 0.0
    target = q * (total - 1)
    cum = np.cumsum(counts)
    b = int(np.searchsorted(cum, target, side="right"))
    if b == 0:
        return float(HIST_LO)
    if b >= HIST_BINS + 1:
        return float(HIST_HI)
    prev = cum[b - 1]
    within = (target - prev) / max(counts[b], 1)
    lo, hi = _HIST_EDGES[b - 1], _HIST_EDGES[b]
    return float(lo + (hi - lo) * within)


# --- Misra-Gries heavy hitters ---------------------------------------------
# Mergeable frequent-items summary: capacity C bounds the summary size;
# merged estimates undercount true counts by at most N/(C+1) (N = total
# stream length), so any item with true count > N/(C+1) survives.

def mg_partial(values, capacity: int) -> dict:
    """Misra-Gries summary of one batch: at most `capacity` items."""
    from collections import Counter

    counts = Counter(values)
    if len(counts) <= capacity:
        return dict(counts)
    # decrement-by-threshold: subtract the (C+1)-th largest count
    thr = sorted(counts.values(), reverse=True)[capacity]
    return {k: v - thr for k, v in counts.items() if v > thr}


def mg_merge(summaries: list[dict], capacity: int) -> dict:
    """Merge MG summaries (sum counts, re-trim to capacity). Error bounds
    add across merges — still <= N/(C+1) overall (Agarwal et al., public
    mergeable-summaries result)."""
    total: dict = {}
    for s in summaries:
        for k, v in s.items():
            total[k] = total.get(k, 0) + v
    if len(total) <= capacity:
        return total
    thr = sorted(total.values(), reverse=True)[capacity]
    return {k: v - thr for k, v in total.items() if v > thr}


# --- Bloom filter (mergeable, for join prefilters) --------------------------
# Fixed m-bit array, k hashes derived from ONE splitmix64 via double
# hashing (Kirsch-Mitzenmacher): partials OR-merge like HLL registers.
# With m bits / n keys / k hashes the false-positive rate is
# (1 - e^(-kn/m))^k; callers size m for ~1% (m ~ 10 bits per key).

BLOOM_K = 7


def _bloom_positions(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """(n, BLOOM_K) bit positions via double hashing of splitmix64(key)."""
    h = _splitmix64(keys.astype(np.uint64))
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd -> full-period stride
    i = np.arange(BLOOM_K, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def bloom_partial(keys: np.ndarray, m_bits: int) -> np.ndarray:
    """One batch of int keys -> packed uint8 bit array (m_bits/8 bytes)."""
    bits = np.zeros(m_bits, dtype=bool)
    if len(keys):
        bits[_bloom_positions(np.asarray(keys), m_bits).ravel()] = True
    return np.packbits(bits)


def bloom_merge(partials: np.ndarray) -> np.ndarray:
    """Elementwise OR over stacked packed partials."""
    return np.bitwise_or.reduce(partials, axis=0)


def bloom_contains(packed: np.ndarray, keys: np.ndarray) -> np.ndarray:
    """Vectorized membership test (True may be a false positive, False is
    exact) — callers use it as a PREFILTER, never as the join itself.
    Indexes the packed bytes directly (np.packbits bit order: MSB first)
    — unpacking the whole filter per call allocated 8x its size per
    probe batch, ruinous exactly in the big-filter regime this exists
    for."""
    if len(keys) == 0:
        return np.zeros(0, dtype=bool)
    m_bits = len(packed) * 8
    pos = _bloom_positions(np.asarray(keys), m_bits)
    bits = (packed[pos >> 3] >> (7 - (pos & 7))) & 1
    return bits.all(axis=1)
