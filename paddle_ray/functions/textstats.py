"""Text analysis kernels: tokenization, quality scoring, language ID,
fingerprinting. All vectorized or per-doc-linear; used by
pipelines/analysis.py map_batches stages.

These extend the reference's scope (it has no corpus analytics) with the
operations a large-scale training-data pipeline needs; semantics are kept
SQL-expressible where possible so DuckDB oracles can verify them.
"""

from __future__ import annotations

import re

import numpy as np

TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: words, numbers, punctuation runs (public GPT-2
# pre-tokenizer style, simplified to stdlib `re`)
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")

STOPWORDS = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)

_PUNCT_RE = re.compile(r"[^\w\s]")


def token_count(text: str) -> int:
    """Whitespace token count (oracle: array_length(regexp_split_to_array))."""
    return len(TOKEN_RE.findall(text))


def bpe_token_count(text: str) -> int:
    """Sub-word-ish token count via the BPE-style regex."""
    return len(BPE_RE.findall(text))


def quality_features(text: str) -> dict:
    """Length/punctuation/stopword quality signals (deterministic floats,
    rounded to 6 dp so value-hash comparison is stable)."""
    toks = TOKEN_RE.findall(text)
    n = len(toks)
    n_chars = len(text)
    n_stop = sum(1 for t in toks if t.lower() in STOPWORDS)
    n_punct = len(_PUNCT_RE.findall(text))
    mean_wl = (sum(len(t) for t in toks) / n) if n else 0.0
    return {
        "n_chars": n_chars,
        "n_tokens": n,
        "stop_ratio": round(n_stop / n, 6) if n else 0.0,
        "punct_ratio": round(n_punct / n_chars, 6) if n_chars else 0.0,
        "mean_word_len": round(mean_wl, 6),
    }


# --- language ID -----------------------------------------------------------
# tiny character-n-gram profiles (hand-rolled, public-knowledge frequency
# heuristics). Good enough to separate scripts + common European function
# words; deterministic.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the ", " and ", " of ", " is ", " to ", "ing "),
    "de": (" der ", " die ", " und ", " das ", " ist ", "sch"),
    "fr": (" le ", " la ", " les ", " et ", " est ", " une "),
    "es": (" el ", " los ", " de la ", " es ", " una ", "ción"),
    "zh": tuple(),  # handled by script detection
    "hi": tuple(),
}


def detect_lang(text: str) -> str:
    """n-gram/script language heuristic -> best-guess lang code."""
    if not text:
        return "und"
    # script detection first
    n_cjk = sum(1 for c in text[:2000] if "一" <= c <= "鿿")
    n_deva = sum(1 for c in text[:2000] if "ऀ" <= c <= "ॿ")
    probe = text[:2000].lower()
    if n_cjk > len(probe) * 0.05:
        return "zh"
    if n_deva > len(probe) * 0.05:
        return "hi"
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        if markers:
            scores[lang] = sum(probe.count(m) for m in markers)
    best = max(sorted(scores), key=lambda k: scores[k])
    return best if scores[best] > 0 else "und"


# --- fingerprinting --------------------------------------------------------

_B = 1_000_003
_MOD = (1 << 61) - 1


def rolling_hashes(text: str, k: int = 8) -> np.ndarray:
    """All k-gram Rabin-Karp rolling hashes of text (uint64)."""
    n = len(text)
    if n < k:
        return np.array([hash_text(text)], dtype=np.uint64)
    cs = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)[: n].astype(np.uint64)
    # linear polynomial rolling hash (per-char Python loop; docs are small
    # relative to batch, and the windows reuse the running value)
    out = np.zeros(n - k + 1, dtype=np.uint64)
    h = 0
    powk = pow(_B, k - 1, _MOD)
    for i in range(n):
        h = (h * _B + int(cs[i])) % _MOD
        if i >= k - 1:
            out[i - k + 1] = h
            h = (h - int(cs[i - k + 1]) * powk) % _MOD
    return out


def hash_text(text: str) -> int:
    h = 0
    for c in text:
        h = (h * _B + ord(c)) % _MOD
    return h


def winnow_fingerprint(text: str, k: int = 8, window: int = 16) -> list[int]:
    """Winnowing (Schleimer et al. 2003, public): min rolling hash per
    window -> sparse, position-robust document fingerprint."""
    hs = rolling_hashes(text, k)
    if len(hs) <= window:
        return [int(hs.min())] if len(hs) else []
    mins = np.lib.stride_tricks.sliding_window_view(hs, window).min(axis=1)
    # dedupe consecutive repeats, preserve order
    out: list[int] = []
    prev = None
    for v in mins:
        iv = int(v)
        if iv != prev:
            out.append(iv)
            prev = iv
    return out
