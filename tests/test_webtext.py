"""Tests for webtext curation ops (repetition metrics, quality filter,
unigram-LM scoring, decontamination) at sf0.001, including planted-input
properties the SQL oracle gate can't express."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from paddle_ray.pipelines import webtext

SF = "/root/testdata/sf0.001"


def _write_docs(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir()
    df = pd.DataFrame(rows)
    if "lang" not in df.columns:
        df["lang"] = "en"
    df["source"] = "s"
    df["n_chars"] = df.text.str.len()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "documents.parquet")
    return str(d)


# --- repetition metrics ----------------------------------------------------

def test_repetition_known_values(tmp_path):
    d = _write_docs(
        tmp_path,
        [
            {"doc_id": 1, "text": "a a a a"},  # 1 word repeated
            {"doc_id": 2, "text": "a b c d"},  # all distinct
            {"doc_id": 3, "text": "a b a b a"},  # 2gram dup
        ],
    )
    out = webtext.repetition_metrics(d).set_index("doc_id")
    assert out.loc[1, "dup_word_frac"] == 0.75
    assert out.loc[1, "top_word_frac"] == 1.0
    assert out.loc[1, "dup_2gram_frac"] == pytest.approx(2 / 3, abs=1e-6)
    assert out.loc[2, "dup_word_frac"] == 0.0
    assert out.loc[2, "top_word_frac"] == 0.25
    assert out.loc[2, "dup_2gram_frac"] == 0.0
    # doc 3: 4 bigrams (ab, ba, ab, ba) -> 2 distinct -> dup frac 0.5
    assert out.loc[3, "dup_2gram_frac"] == 0.5


def test_repetition_full_corpus_bounds():
    out = webtext.repetition_metrics(SF)
    assert len(out) == 500
    for c in ("dup_word_frac", "top_word_frac", "dup_2gram_frac"):
        assert out[c].between(0, 1).all()
    # word-soup corpus: repetition is present but not total
    assert 0.2 < out.dup_word_frac.mean() < 0.8


# --- quality filter --------------------------------------------------------

def test_quality_filter_nondegenerate_and_consistent():
    out = webtext.quality_filter(SF)
    assert 0 < len(out) < 500  # filter actually separates
    assert (out.n_words >= webtext.QF_MIN_WORDS).all()
    assert (out.dup_word_frac <= webtext.QF_MAX_DUP_FRAC).all()
    assert (out.stop_ratio >= webtext.QF_MIN_STOP_RATIO).all()
    assert out.mean_word_len.between(webtext.QF_MIN_MEAN_WL, webtext.QF_MAX_MEAN_WL).all()


def test_quality_filter_rejects_planted_junk(tmp_path):
    d = _write_docs(
        tmp_path,
        [
            # passes every gate: 28 distinct words incl. stopwords
            {
                "doc_id": 1,
                "text": "the quick brown fox jumps over a lazy dog and every cat "
                "runs far to chase it in this park with many trees by old walls from dawn",
            },
            {"doc_id": 2, "text": "spam " * 50},  # dup_frac ~ 1
            {"doc_id": 3, "text": "too short"},  # n_words < min
            {"doc_id": 4, "text": "xx " * 30},  # mean word len 2 < 3
        ],
    )
    out = webtext.quality_filter(d)
    assert list(out.doc_id) == [1]


# --- unigram LM ------------------------------------------------------------

def test_lm_perplexity_orders_rare_docs_higher(tmp_path):
    common = "alpha beta gamma delta " * 10
    d = _write_docs(
        tmp_path,
        [
            {"doc_id": i, "text": common} for i in range(10)
        ]
        + [{"doc_id": 99, "text": "zeta eta theta iota kappa " * 8}],
    )
    out = webtext.lm_perplexity(d).set_index("doc_id")
    # the lone doc made of rare words must score strictly higher xent
    assert out.loc[99, "xent"] > out.loc[0, "xent"] + 0.5
    # identical docs score identically
    assert out.loc[0, "xent"] == out.loc[5, "xent"]


def test_lm_perplexity_matches_closed_form(tmp_path):
    # corpus = one doc "a a b": N=3, V=2; p(a)=(2+1)/6, p(b)=(1+1)/6
    d = _write_docs(tmp_path, [{"doc_id": 1, "text": "a a b"}])
    out = webtext.lm_perplexity(d)
    expect = -(2 * np.log(3 / 6) + 1 * np.log(2 / 6)) / 3
    assert out.xent.iloc[0] == pytest.approx(expect, abs=1e-6)


# --- stratified sampling ---------------------------------------------------

def test_stratified_sample_quota_and_determinism():
    a = webtext.stratified_sample(SF, k=10)
    b = webtext.stratified_sample(SF, k=10)
    pd.testing.assert_frame_equal(a, b)  # no RNG: reruns identical
    assert (a.groupby("lang").size() <= 10).all()
    # the sf0.001 corpus has >10 docs per lang, so every quota is filled
    assert (a.groupby("lang").size() == 10).all()


def test_stratified_sample_small_group_kept_whole(tmp_path):
    rows = [{"doc_id": i, "text": "x y z"} for i in range(3)]
    d = _write_docs(tmp_path, rows)  # 3 docs, single lang "en"
    out = webtext.stratified_sample(d, k=10)
    assert len(out) == 3  # quota larger than group -> group kept whole


# --- curation v2 composition ----------------------------------------------

def test_curate_v2_composition_properties():
    from paddle_ray.pipelines import curate

    out = curate.curate_corpus_v2(SF, k=8)
    assert len(out) >= 1
    assert (out.n_docs <= 8).all()  # quota enforced
    assert (out.n_docs >= 1).all()
    # sampled docs must be a subset of the standalone quality_filter
    # survivors minus the decontaminated/benchmark docs
    qf = set(webtext.quality_filter(SF).doc_id)
    contaminated = set(webtext.decontaminate(SF).doc_id)
    allowed = {
        d for d in qf if d % webtext.DECON_BENCH_MOD != 0 and d not in contaminated
    }
    assert out.n_docs.sum() <= len(allowed)


# --- decontamination -------------------------------------------------------

def test_decontaminate_flags_planted_overlap(tmp_path):
    bench_text = "one two three four five six"
    rows = [
        {"doc_id": 0, "text": bench_text},  # benchmark doc (0 % 97 == 0)
        {"doc_id": 1, "text": "zz one two three yy"},  # shares 3-gram
        {"doc_id": 2, "text": "totally clean words here now"},  # no overlap
        {"doc_id": 97 * 2, "text": "one two three"},  # benchmark, never output
    ]
    d = _write_docs(tmp_path, rows)
    out = webtext.decontaminate(d).set_index("doc_id")
    assert list(out.index) == [1]
    assert out.loc[1, "n_hits"] == 1


def test_decontaminate_hit_count_distinct(tmp_path):
    rows = [
        {"doc_id": 0, "text": "p q r s t"},  # bench 3-grams: pqr qrs rst
        # contains pqr twice (distinct count = 1) and qrs once -> 2 hits
        {"doc_id": 5, "text": "p q r x p q r s"},
    ]
    d = _write_docs(tmp_path, rows)
    out = webtext.decontaminate(d)
    assert out.n_hits.iloc[0] == 2


# --- property-based kernel invariants (hypothesis) -------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_WORD = st.text(alphabet="abcdefg", min_size=1, max_size=6)
_SOUP = st.lists(_WORD, min_size=0, max_size=80).map(" ".join)


@given(_SOUP)
@settings(max_examples=100, deadline=None)
def test_quality_gate_matches_components(text):
    from collections import Counter

    from paddle_ray.functions.textstats import STOPWORDS

    ws = webtext._words(text)
    ok, dup, stop, mwl = webtext.quality_gate(ws)
    n = len(ws)
    if n < webtext.QF_MIN_WORDS:
        assert not ok
        return
    c = Counter(ws)
    assert dup == 1.0 - len(c) / n
    assert stop == sum(v for w, v in c.items() if w.lower() in STOPWORDS) / n
    assert mwl == sum(len(w) for w in ws) / n
    assert ok == (
        dup <= webtext.QF_MAX_DUP_FRAC
        and stop >= webtext.QF_MIN_STOP_RATIO
        and webtext.QF_MIN_MEAN_WL <= mwl <= webtext.QF_MAX_MEAN_WL
    )


@given(_SOUP)
@settings(max_examples=100, deadline=None)
def test_repetition_invariants_bruteforce(text):
    """Slow-reference recomputation of the three repetition fractions."""
    ws = webtext._words(text)
    n = len(ws)
    if n == 0:
        return
    dup = round(1.0 - len(set(ws)) / n, 6)
    top = round(max(ws.count(w) for w in set(ws)) / n, 6)
    grams = list(zip(ws, ws[1:]))
    dup2 = round(1.0 - len(set(grams)) / len(grams), 6) if grams else 0.0
    # same math the batch kernel runs, via the Counter path it uses
    from collections import Counter

    c = Counter(ws)
    assert round(1.0 - len(c) / n, 6) == dup
    assert round(max(c.values()) / n, 6) == top
    if len(ws) >= 2:
        g2 = {(ws[i], ws[i + 1]) for i in range(len(ws) - 1)}
        assert round(1.0 - len(g2) / (n - 1), 6) == dup2


# --- tf-idf ----------------------------------------------------------------

def test_tfidf_rare_term_outranks_common(tmp_path):
    """A term concentrated in one lang with low corpus df must outscore a
    ubiquitous term (idf ln(N/df) = 0 when df == N)."""
    rows = []
    for i in range(10):
        lang = "en" if i < 5 else "fr"
        special = " zebra zebra zebra" if i == 0 else ""
        rows.append({"doc_id": i, "text": "common words here" + special, "lang": lang})
    d = _write_docs(tmp_path, rows)
    out = webtext.tfidf_top_terms(d, k=2)
    en = out[out.lang == "en"]
    assert "zebra" in set(en.term)
    # ubiquitous terms score 0 and never beat zebra
    zebra = float(en[en.term == "zebra"].tfidf.iloc[0])
    assert zebra > 0


def test_perplexity_buckets_ntile_semantics(ray_session):
    """NTILE(3) parity: bucket sizes differ by at most one, earlier
    buckets get the extra rows, and buckets order by cross-entropy
    (head = lowest xent = most fluent, CCNet's keep bucket)."""
    from paddle_ray.pipelines.webtext import perplexity_buckets

    out = perplexity_buckets("/root/testdata/sf0.001")
    for lang, g in out.groupby("lang"):
        sizes = g.sort_values("bucket").n_docs.tolist()
        assert max(sizes) - min(sizes) <= 1
        assert sizes == sorted(sizes, reverse=True)  # extras go to the front
        x = g.sort_values("bucket").avg_xent.tolist()
        assert x == sorted(x)  # bucket 1 = lowest mean cross-entropy
    assert set(out.bucket) == {1, 2, 3}


def test_ntile_assignment_matches_duckdb_for_all_group_sizes():
    """The divmod/np.repeat NTILE replica must equal DuckDB NTILE(3) for
    every group size 1..40 (first n%3 buckets take the extra row)."""
    import duckdb
    import numpy as np

    from paddle_ray.pipelines.webtext import PPL_N_BUCKETS

    for n in range(1, 41):
        base, rem = divmod(n, PPL_N_BUCKETS)
        sizes = [base + 1] * rem + [base] * (PPL_N_BUCKETS - rem)
        mine = np.repeat(np.arange(1, PPL_N_BUCKETS + 1), sizes).tolist()
        ora = [
            r[0]
            for r in duckdb.sql(
                f"SELECT ntile({PPL_N_BUCKETS}) OVER (ORDER BY i) FROM range({n}) t(i)"
            ).fetchall()
        ]
        assert mine == ora, n


# --- r4 decontamination scale contract (Bloom + join; external bench) -------

def test_decontaminate_external_bench_table(tmp_path, ray_session):
    """bench_dir mode (the real deployment contract): the benchmark is a
    SEPARATE table; every corpus doc — including doc_id % 97 == 0 — is a
    candidate, and hits count against the external shingles only."""
    bench_dir = tmp_path / "bench"
    bench_dir.mkdir()
    bdf = pd.DataFrame({"doc_id": [0], "text": ["held out eval question text"]})
    pq.write_table(pa.Table.from_pandas(bdf, preserve_index=False),
                   bench_dir / "documents.parquet")
    rows = [
        # doc 0 would be the derived-mode bench slice; in bench_dir mode
        # it is a regular candidate and shares 'held out eval'
        {"doc_id": 0, "text": "zz held out eval yy"},
        {"doc_id": 1, "text": "shares eval question text twice eval question text"},
        {"doc_id": 2, "text": "totally clean words here now"},
    ]
    d = _write_docs(tmp_path, rows)
    out = webtext.decontaminate(d, bench_dir=str(bench_dir)).set_index("doc_id")
    assert list(out.index) == [0, 1]
    assert out.loc[0, "n_hits"] == 1  # 'held out eval'
    # doc 1: 'eval question text' (distinct, appears twice -> counts once)
    assert out.loc[1, "n_hits"] == 1


def test_decontaminate_bloom_fp_never_changes_output(tmp_path, ray_session, monkeypatch):
    """Shrink the Bloom to 256 bits so nearly every gram is a false
    positive: the exact verify join must still produce the identical
    result (fp costs shuffle bytes, never wrong rows)."""
    rows = [
        {"doc_id": 0, "text": "one two three four five six"},
        {"doc_id": 1, "text": "zz one two three yy"},
        {"doc_id": 2, "text": "totally clean words here now"},
    ]
    d = _write_docs(tmp_path, rows)
    base = webtext.decontaminate(d)
    monkeypatch.setattr(webtext, "DECON_BLOOM_BITS", 256)
    tiny = webtext.decontaminate(d)
    pd.testing.assert_frame_equal(base, tiny)


def test_bench_set_broadcast_cap_fails_loudly(tmp_path, ray_session, monkeypatch):
    """build_bench_shingles (the v2 composition's in-process set) must
    refuse a corpus-scale 'benchmark' instead of silently broadcasting
    it, and must name the scale path."""
    rows = [{"doc_id": 0, "text": "a benchmark slice with quite a few words"}]
    d = _write_docs(tmp_path, rows)
    monkeypatch.setattr(webtext, "BENCH_SET_MAX_BYTES", 4)
    with pytest.raises(RuntimeError, match="Bloom"):
        webtext.build_bench_shingles(d)


def test_quality_tiers_invariants_and_bruteforce():
    """Lock the distributed tier split against a single-process replica
    built from the SAME shared primitives (_words/quality_gate/md5
    threshold) — catches partial-aggregation or keep-rate drift."""
    import hashlib

    import pyarrow.parquet as pq

    from paddle_ray.pipelines.common import w_threshold_hex

    sf = "/root/testdata/sf0.001"
    out = webtext.quality_tiers(sf)
    assert set(out.tier) == {"head", "mid", "tail"}  # all tiers populated
    assert (out.n_kept <= out.n_docs).all()
    assert (out.kept_tokens <= out.n_tokens).all()
    # head keeps everything (TIER_KEEP['head'] == 1.0)
    head = out.set_index("tier").loc["head"]
    assert head.n_kept == head.n_docs and head.kept_tokens == head.n_tokens

    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    th = {t: w_threshold_hex(w) for t, w in webtext.TIER_KEEP.items() if w < 1.0}
    agg = {t: [0, 0, 0, 0] for t in ("head", "mid", "tail")}
    for did, text in zip(docs.doc_id, docs.text):
        ws = webtext._words(text)
        ok, dup, stop, _ = webtext.quality_gate(ws)
        if ok and stop >= webtext.TIER_HEAD_MIN_STOP and dup <= webtext.TIER_HEAD_MAX_DUP:
            tier = "head"
        elif ok:
            tier = "mid"
        else:
            tier = "tail"
        kp = tier not in th or hashlib.md5(str(did).encode()).hexdigest() < th[tier]
        a = agg[tier]
        a[0] += 1
        a[1] += 1 if kp else 0
        a[2] += len(ws)
        a[3] += len(ws) if kp else 0
    for _, row in out.iterrows():
        assert agg[row.tier] == [row.n_docs, row.n_kept, row.n_tokens, row.kept_tokens]


def test_domain_cap_bruteforce_and_hot_domain(tmp_path):
    """domain_cap == per-source first-k by doc_id, and the per-block
    prune never loses a winner even when one domain dominates every
    block (planted 400-doc hot domain across many blocks)."""
    out = webtext.domain_cap("/root/testdata/sf0.001")
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    exp = (
        docs.sort_values("doc_id").groupby("source").head(webtext.DOMCAP_K)
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert out.doc_id.tolist() == exp.doc_id.tolist()

    hot = pd.DataFrame(
        {
            "doc_id": range(1000, 1400),
            "text": ["x"] * 400,
            "lang": ["en"] * 400,
            "source": ["hot"] * 400,
        }
    )
    cold = pd.DataFrame(
        {"doc_id": [7, 3], "text": ["y", "z"], "lang": ["en", "en"], "source": ["cold", "cold"]}
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.Table.from_pandas(pd.concat([hot, cold], ignore_index=True), preserve_index=False),
        d / "documents.parquet",
    )
    capped = webtext.domain_cap(str(d), k=3)
    assert capped[capped.source == "hot"].doc_id.tolist() == [1000, 1001, 1002]
    assert capped[capped.source == "cold"].doc_id.tolist() == [3, 7]


def test_build_training_mix_consistency(ray_session):
    """build_training_mix == single-process composition of its three
    stages, is consistent with quality_tiers on the tier-kept masses,
    sums quotas exactly to the budget, and only ever shrinks cells
    relative to the tier-kept set (stage 2 is keep-only)."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    from paddle_ray.pipelines.common import w_threshold_hex
    from paddle_ray.pipelines.curate import MIX_BUDGET_TOKENS, build_training_mix
    from paddle_ray.pipelines.webtext import TIER_KEEP, _words, tier_of

    SF = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    tier_th = {t: w_threshold_hex(w) for t, w in TIER_KEEP.items() if w < 1.0}
    kept = []
    for did, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        ws = _words(text)
        tier = tier_of(ws)
        th = tier_th.get(tier)
        if th is None or hashlib.md5(str(did).encode()).hexdigest() < th:
            kept.append((did, tier, lang, len(ws)))
    n_l: dict[str, int] = {}
    for _, _, lang, n in kept:
        n_l[lang] = n_l.get(lang, 0) + n
    n_min = min(n_l.values())
    mix_th = {
        lang: None if v == n_min else w_threshold_hex(math.sqrt(n_min / v))
        for lang, v in n_l.items()
    }
    cells: dict[tuple[str, str], list[int]] = {}
    for did, tier, lang, n in kept:
        mh = mix_th[lang]
        if mh is not None and not hashlib.md5(f"mix:{did}".encode()).hexdigest() < mh:
            continue
        a = cells.setdefault((tier, lang), [0, 0])
        a[0] += 1
        a[1] += n
    keys = sorted(cells)
    T = sum(v[1] for v in cells.values())
    base = {k: MIX_BUDGET_TOKENS * cells[k][1] // T for k in keys}
    rem = {k: MIX_BUDGET_TOKENS * cells[k][1] % T for k in keys}
    leftover = MIX_BUDGET_TOKENS - sum(base.values())
    extra = set(sorted(keys, key=lambda k: (-rem[k], k[0], k[1]))[:leftover])
    expect = {
        k: (cells[k][0], cells[k][1], base[k] + (1 if k in extra else 0))
        for k in keys
    }

    out = build_training_mix(SF)
    got = {(r.tier, r.lang): (r.n_docs, r.n_tok, r.quota) for r in out.itertuples()}
    assert got == expect
    assert int(out.quota.sum()) == MIX_BUDGET_TOKENS
    # stage 2 only shrinks: final cell masses <= tier-kept cell masses
    kept_cells: dict[tuple[str, str], int] = {}
    for _, tier, lang, n in kept:
        kept_cells[(tier, lang)] = kept_cells.get((tier, lang), 0) + n
    assert all(got[k][1] <= kept_cells[k] for k in got)
    # the mixture really dropped something (non-vacuous second stage)
    assert sum(v[1] for v in got.values()) < sum(kept_cells.values())
    with pytest.raises(ValueError):
        build_training_mix(SF, budget=-1)


def test_doremi_weights_matches_bruteforce(ray_session):
    """doremi_weights == single-process multiplicative-weights reference
    over the same rounded-6 per-doc xents; weights sum ~1, high-loss
    domains strictly outweigh low-loss ones, and the update is
    non-vacuous (weights left uniform)."""
    import math

    from paddle_ray.pipelines.webtext import (
        DOREMI_ETA,
        DOREMI_ROUNDS,
        doremi_weights,
        lm_perplexity,
    )

    SF = "/root/testdata/sf0.001"
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet").to_pandas()[["doc_id", "source"]]
    xent = lm_perplexity(SF).merge(docs, on="doc_id")
    agg = xent.groupby("source").xent.agg(["sum", "size"]).sort_index()
    L = [round(s / n, 6) for s, n in zip(agg["sum"], agg["size"])]
    D = len(L)
    w = [round(1.0 / D, 6)] * D
    for _ in range(DOREMI_ROUNDS):
        m = round(sum(wi * li for wi, li in zip(w, L)), 6)
        raw = [wi * math.exp(DOREMI_ETA * (li - m)) for wi, li in zip(w, L)]
        z = sum(raw)
        w = [round(r / z, 6) for r in raw]
    expect = {s: (l, wi) for s, l, wi in zip(agg.index, L, w)}

    out = doremi_weights(SF)
    got = {r.source: (r.loss, r.weight) for r in out.itertuples()}
    assert got == expect
    assert abs(out.weight.sum() - 1.0) < 1e-4
    assert out.weight.max() > 2 * out.weight.min()  # non-vacuous spread
    hi = out.loc[out.loss.idxmax()]
    lo = out.loc[out.loss.idxmin()]
    assert hi.weight > lo.weight  # high-loss domain upweighted
    import pytest

    with pytest.raises(ValueError):
        doremi_weights(SF, rounds=0)


def test_weighted_sample_ares_reference_and_bias(ray_session):
    """A-Res == single-process reference; exactly k selected; PPS bias is
    real: the selected docs' mean size exceeds the corpus mean (a fixed,
    deterministic fact of this corpus + seed, not a flaky draw)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from paddle_ray.pipelines import webtext as wt

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars"]).to_pandas()
    u = np.array(
        [
            int(hashlib.md5(f"ws:{d}".encode()).hexdigest()[:12], 16) / float(1 << 48)
            for d in t.doc_id
        ]
    )
    key = u ** (1.0 / (t.n_chars.to_numpy() + 1))
    t = t.assign(key=key).sort_values(["key", "doc_id"], ascending=[False, True])
    ref = t.head(wt.WS_K).sort_values("doc_id").reset_index(drop=True)

    out = wt.weighted_sample_ares(sf)
    assert len(out) == wt.WS_K
    assert out.doc_id.tolist() == ref.doc_id.tolist()
    assert out.n_chars.tolist() == ref.n_chars.tolist()
    assert out.n_chars.mean() > t.n_chars.mean()


def test_ks_two_sample_matches_scipy_style_reference(ray_session):
    """ks_two_sample == the textbook sup|F_a - F_b| computed directly
    over the raw samples (scipy-equivalent formula, exact rationals),
    and the reported at_value actually achieves the max."""
    from fractions import Fraction

    import numpy as np
    import pyarrow.parquet as pq

    from paddle_ray.pipelines import webtext as wt

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["source", "text"]).to_pandas()
    side = t.source.str[3:].astype(int) % 2
    nt = t.text.map(lambda x: len(x.split()))
    a = np.sort(nt[side == 0].to_numpy())
    b = np.sort(nt[side == 1].to_numpy())
    vals = np.unique(np.concatenate([a, b]))
    best = Fraction(0)
    best_v = None
    for v in vals:
        d = abs(
            Fraction(int((a <= v).sum()), len(a)) - Fraction(int((b <= v).sum()), len(b))
        )
        if d > best:
            best, best_v = d, int(v)
    out = wt.ks_two_sample(sf)
    assert int(out.n_a.iloc[0]) == len(a) and int(out.n_b.iloc[0]) == len(b)
    assert int(out.ks_e6.iloc[0]) == int(best * 1_000_000)  # exact floor
    assert int(out.at_value.iloc[0]) == best_v
    assert 0 < int(out.ks_e6.iloc[0]) < 1_000_000


def test_welch_ttest_matches_fraction_exact_reference(ray_session):
    """Engine == a Fraction-exact single-process Welch reference (t and df
    recomputed from exact rational moments, floated once at the end) to
    ~1e-12, far inside the round-6 contract; df obeys the Welch bounds
    min(na,nb)-1 <= df <= na+nb-2."""
    from fractions import Fraction

    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "n_chars"]).to_pandas()
    side = t["source"].str[3:].astype(int) % 2
    a = t.loc[side == 0, "n_chars"].to_numpy()
    b = t.loc[side == 1, "n_chars"].to_numpy()
    na, nb = len(a), len(b)
    sxa, sxxa = int(a.sum()), int((a.astype(object) ** 2).sum())
    sxb, sxxb = int(b.sum()), int((b.astype(object) ** 2).sum())
    ma, mb = Fraction(sxa, na), Fraction(sxb, nb)
    va = Fraction(na * sxxa - sxa * sxa, na * na * (na - 1))
    vb = Fraction(nb * sxxb - sxb * sxb, nb * nb * (nb - 1))
    t_ref = float(ma - mb) / float(va + vb) ** 0.5
    df_ref = float((va + vb) ** 2 / (va * va / (na - 1) + vb * vb / (nb - 1)))

    out = webtext.welch_ttest(SF)
    assert out.loc[0, "n_a"] == na and out.loc[0, "n_b"] == nb
    assert abs(out.loc[0, "t_stat"] - round(t_ref, 6)) <= 2e-6
    assert abs(out.loc[0, "df"] - round(df_ref, 6)) <= 2e-5 * max(1.0, df_ref)
    assert min(na, nb) - 1 <= out.loc[0, "df"] <= na + nb - 2
    assert abs(out.loc[0, "mean_a"] - float(ma)) < 1e-5


def test_chi2_independence_matches_reference(ray_session):
    """Engine == single-process contingency reference; marginals
    reconcile; contributions sum to the ALL row."""
    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "lang"]).to_pandas()
    t["side"] = t["source"].str[3:].astype(int) % 2
    piv = t.pivot_table(index="lang", columns="side", values="source",
                        aggfunc="size", fill_value=0).reindex(columns=[0, 1], fill_value=0)
    n = piv.to_numpy().sum()
    exp = np.outer(piv.sum(axis=1), piv.sum(axis=0)) / n
    chi2 = float((((piv.to_numpy() - exp) ** 2) / exp).sum())

    out = webtext.chi2_independence(SF)
    all_row = out[out["lang"] == "ALL"].iloc[0]
    assert abs(all_row["chi2_contrib"] - chi2) < 1e-4
    assert all_row["dof"] == len(piv) - 1
    assert all_row["n_even"] + all_row["n_odd"] == n
    per = out[out["lang"] != "ALL"]
    assert abs(per["chi2_contrib"].sum() - all_row["chi2_contrib"]) < 1e-4
    assert set(per["lang"]) == set(piv.index)
    # marginal reconciliation per lang
    for _, r in per.iterrows():
        assert r["n_even"] == piv.loc[r["lang"], 0] and r["n_odd"] == piv.loc[r["lang"], 1]


def test_mannwhitney_u_matches_rank_definition(ray_session):
    """u2 must equal 2x the DEFINITIONAL U (pairwise count with half
    ties) on the real cohorts, and z must match scipy-free tie-corrected
    normal approx from exact Fractions."""
    from fractions import Fraction

    t = pq.read_table(f"{SF}/documents.parquet", columns=["source", "n_chars"]).to_pandas()
    side = t["source"].str[3:].astype(int) % 2
    a = np.sort(t.loc[side == 0, "n_chars"].to_numpy())
    b = np.sort(t.loc[side == 1, "n_chars"].to_numpy())
    # definitional U via searchsorted (pairwise gt + 0.5*eq), exact x2
    lt = np.searchsorted(b, a, side="left")     # #b strictly less than each a
    le = np.searchsorted(b, a, side="right")    # #b <= each a
    u2_ref = int(2 * lt.sum() + (le - lt).sum())

    out = webtext.mannwhitney_u(SF)
    assert out.loc[0, "u2"] == u2_ref
    na, nb = len(a), len(b)
    assert (out.loc[0, "n_a"], out.loc[0, "n_b"]) == (na, nb)

    from collections import Counter

    ties = Counter(np.concatenate([a, b]).tolist())
    N = na + nb
    tie_term = sum(c**3 - c for c in ties.values())
    s2 = Fraction(na * nb * ((N**3 - N) - tie_term), 12 * N * (N - 1))
    z_ref = (u2_ref / 2.0 - na * nb / 2.0) / float(s2) ** 0.5
    assert abs(out.loc[0, "z_stat"] - z_ref) < 1e-4
