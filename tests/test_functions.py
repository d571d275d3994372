"""Unit tests: hashing/sketches + text stats (pure functions, no Ray)."""

import numpy as np

from paddle_ray.functions.hashes import (
    char_ngram_set,
    char_set_jaccard,
    hamming64,
    jaccard,
    lsh_band_keys,
    minhash_jaccard_est,
    minhash_signature,
    shingle_hashes,
    simhash,
    splitmix64,
)
from paddle_ray.functions.textstats import (
    bpe_token_count,
    detect_lang,
    quality_features,
    rolling_hashes,
    token_count,
    winnow_fingerprint,
)


def test_splitmix64_deterministic():
    a = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    b = splitmix64(np.array([1, 2, 3], dtype=np.uint64))
    assert (a == b).all()
    assert len(set(a.tolist())) == 3


def test_shingles_and_minhash_similarity():
    base = " ".join(f"word{i}" for i in range(200))
    near = base.replace("word100", "other", 1)
    far = " ".join(f"tok{i}" for i in range(200))
    s1, s2, s3 = (minhash_signature(shingle_hashes(t)) for t in (base, near, far))
    assert minhash_jaccard_est(s1, s2) > 0.7
    assert minhash_jaccard_est(s1, s3) < 0.2
    # determinism
    assert (s1 == minhash_signature(shingle_hashes(base))).all()


def test_lsh_band_keys_match_for_identical():
    sig = minhash_signature(shingle_hashes("a b c d e f g h i j " * 10))
    assert lsh_band_keys(sig) == lsh_band_keys(sig.copy())
    assert len(lsh_band_keys(sig, bands=16)) == 16


def test_simhash_hamming():
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = a.replace("dog", "cat")
    c = "totally other text about unrelated ideas and completely new words " * 10
    assert hamming64(simhash(a), simhash(a)) == 0
    assert hamming64(simhash(a), simhash(b)) < hamming64(simhash(a), simhash(c))


def test_char_jaccard_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    # (duckdb's jaccard rejects empty strings; ours returns 0/1 — only
    # non-empty inputs are oracle-compared)
    for s1, s2 in [("abc", "abd"), ("hello world", "help word"), ("aa", "aab")]:
        expected = con.sql(f"select jaccard('{s1}','{s2}')").fetchone()[0]
        assert abs(char_set_jaccard(s1, s2) - expected) < 1e-12


def test_ngram_set_and_jaccard():
    assert char_ngram_set("abcd", 3) == {"abc", "bcd"}
    assert jaccard({1, 2}, {2, 3}) == 1 / 3
    assert jaccard(set(), set()) == 1.0


def test_token_counts():
    assert token_count("a b  c") == 3
    assert token_count("") == 0
    assert bpe_token_count("hello, world42") == 4  # hello | , | world | 42


def test_quality_features():
    q = quality_features("The cat and the dog.")
    assert q["n_tokens"] == 5
    assert 0 < q["stop_ratio"] < 1
    assert q["punct_ratio"] > 0
    assert quality_features("")["n_tokens"] == 0


def test_detect_lang_scripts():
    assert detect_lang("the cat and the dog is on the mat to the end") == "en"
    assert detect_lang("der hund und die katze ist das") == "de"
    assert detect_lang("这是一个中文文档的测试文本内容非常清楚") == "zh"
    assert detect_lang("") == "und"


def test_rolling_and_winnow_deterministic():
    t = "abcdefghijklmnopqrstuvwxyz" * 4
    h1, h2 = rolling_hashes(t), rolling_hashes(t)
    assert (h1 == h2).all()
    assert len(h1) == len(t) - 8 + 1
    fp = winnow_fingerprint(t)
    assert fp == winnow_fingerprint(t)
    assert len(fp) >= 1
    # position-shift robustness: shared k-grams -> shared fingerprint values
    fp2 = winnow_fingerprint("XXXX" + t)
    assert set(fp) & set(fp2)


def test_simhash_int64_storage_roundtrip_exact():
    """Regression: int64 + (1 << 63) promoted to float64 and rounded away
    the low ~11 bits; the view+wrapping-add recovery must be exact."""
    import numpy as np

    h = 0x5271D2D3DE600F9F
    stored = np.array([h - (1 << 63)], dtype=np.int64)  # as staged for Arrow
    rec = stored.astype(np.int64).view(np.uint64) + np.uint64(1 << 63)
    assert int(rec[0]) == h


def test_to_cents_matches_duckdb_round():
    """The cents contract: common.to_cents must equal DuckDB's
    CAST(ROUND(v * 100) AS BIGINT) (half away from zero) for positive,
    negative, and exact-half-cent values — numpy/arrow round() is
    half-to-even and silently diverges on the halves."""
    import duckdb
    import numpy as np

    from paddle_ray.pipelines.common import to_cents

    vals = [0.125, -0.125, 0.115, -0.115, 1.005, -1.005, 2.675, 0.0,
            123.455, -123.455, 1e7 + 0.005, -(1e7 + 0.005)]
    rng = np.random.default_rng(9)
    vals += list(np.round(rng.uniform(-1e6, 1e6, 500), 3))
    con = duckdb.connect()
    expect = [
        con.execute("SELECT CAST(ROUND(? * 100.0) AS BIGINT)", [float(v)]).fetchone()[0]
        for v in vals
    ]
    got = to_cents(np.array(vals)).tolist()
    assert got == expect, [
        (v, g, e) for v, g, e in zip(vals, got, expect) if g != e
    ][:5]


def test_events_latest_per_user_vs_bruteforce(ray_session):
    """CDC compaction: winner per user = max (ts, event_id); the two-level
    argmax must agree with a pandas groupby-tail reference."""
    import duckdb
    import pandas as pd

    from paddle_ray.pipelines.events import events_latest_per_user

    sf = "/root/testdata/sf0.001"
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type, value FROM read_parquet('{sf}/events.parquet')"
    ).df()
    expect = (
        ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        .drop_duplicates("user_id", keep="last")
        .rename(columns={"ts": "last_ts", "event_id": "last_event_id",
                         "event_type": "last_event_type", "value": "last_value"})
        [["user_id", "last_ts", "last_event_id", "last_event_type", "last_value"]]
        .reset_index(drop=True)
        .astype({"user_id": "int64", "last_event_id": "int64"})
    )
    got = events_latest_per_user(sf)
    pd.testing.assert_frame_equal(got, expect)
    # snapshot-sized: exactly one row per distinct user
    assert got.user_id.is_unique and len(got) == ev.user_id.nunique()


def test_table_checksum_order_independent_and_field_sensitive(ray_session):
    """Anti-entropy contract: the checksum must not depend on row order or
    partitioning (two different block layouts agree), and must flip when
    any serialized field flips."""
    import hashlib

    import duckdb

    from paddle_ray.pipelines.analysis import CHECKSUM_MOD, table_checksum

    sf = "/root/testdata/sf0.001"
    out = table_checksum(sf)
    # brute-force reference in a different (sorted-by-text) order
    docs = duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM read_parquet('{sf}/documents.parquet') ORDER BY text"
    ).df()
    sums = {}
    for r in docs.itertuples():
        row = f"{r.doc_id}\x1f{r.text}\x1f{r.lang}\x1f{r.source}\x1f{r.n_chars}"
        h = int(hashlib.md5(row.encode()).hexdigest()[:15], 16) % CHECKSUM_MOD
        sums[r.lang] = (sums.get(r.lang, 0) + h) % CHECKSUM_MOD
    got = dict(zip(out.lang, out.checksum))
    assert got == sums
    # field sensitivity: perturbing one n_chars changes that lang's sum
    r0 = docs.iloc[0]
    row = f"{r0.doc_id}\x1f{r0.text}\x1f{r0.lang}\x1f{r0.source}\x1f{r0.n_chars + 1}"
    h2 = int(hashlib.md5(row.encode()).hexdigest()[:15], 16) % CHECKSUM_MOD
    h1 = int(
        hashlib.md5(
            f"{r0.doc_id}\x1f{r0.text}\x1f{r0.lang}\x1f{r0.source}\x1f{r0.n_chars}".encode()
        ).hexdigest()[:15],
        16,
    ) % CHECKSUM_MOD
    assert h1 != h2


def test_word_entropy_bounds_and_extremes(ray_session):
    """Entropy is bounded by [0, ln(n_distinct)]; a constant-word doc
    scores exactly 0 and a all-distinct doc scores exactly ln(n)."""
    import math
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.analysis import word_entropy

    d = tempfile.mkdtemp(prefix="entropy_")
    try:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(
                        ["spam spam spam spam", "a b c d e f g h", "a a b b"], pa.string()
                    ),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        out = word_entropy(d)
        got = dict(zip(out.doc_id, out.entropy))
        assert got[0] == 0.0
        assert got[1] == round(math.log(8), 6)
        assert got[2] == round(math.log(2), 6)
    finally:
        shutil.rmtree(d, ignore_errors=True)

    sf = word_entropy("/root/testdata/sf0.001")
    # tolerance = the round-6 granularity: an all-distinct doc's exact
    # ln(n) can round UP past the bound by <= 5e-7
    assert ((sf.entropy >= 0) & (sf.entropy <= sf.n_words.map(math.log) + 5e-7)).all()
