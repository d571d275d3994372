"""Training-data prep semantics (pipelines/traindata.py) locked against
brute-force references; the driver oracle handles full value checks."""

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest

from paddle_ray.pipelines import traindata as td

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, n_chars FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).df()


def test_duplicate_ngram_spans_vs_bruteforce(ray_session):
    docs = _docs()
    from collections import Counter

    counts: Counter = Counter()
    per_doc = {}
    for r in docs.itertuples():
        gs = td._grams(r.text, td.NGRAM_K)
        per_doc[r.doc_id] = gs
        counts.update(gs)
    expect = {
        d: (len(gs), sum(1 for g in gs if counts[g] > 1))
        for d, gs in per_doc.items()
        if gs
    }
    out = td.duplicate_ngram_spans(SF)
    got = {int(r.doc_id): (int(r.n_grams), int(r.n_dup_spans)) for r in out.itertuples()}
    assert got == expect
    # non-vacuity both ways: some spans duplicated, some not
    fracs = out.dup_frac
    assert (fracs > 0).any() and (fracs < 1).any()
    # planted exact-duplicate docs surface as fully-duplicated text
    assert (fracs == 1.0).any()


def test_importance_resample_deterministic_and_weighted(ray_session):
    docs = _docs()
    th = {l: td._w_threshold_hex(w) for l, w in td.RESAMPLE_WEIGHTS.items()}
    default = td._w_threshold_hex(td.RESAMPLE_DEFAULT_W)
    kept = docs[
        [
            hashlib.md5(str(d).encode()).hexdigest() < th.get(lang, default)
            for d, lang in zip(docs.doc_id, docs.lang)
        ]
    ]
    expect = (
        kept.groupby("lang")
        .agg(n_docs=("doc_id", "size"), n_chars=("n_chars", "sum"))
        .reset_index()
        .sort_values("lang")
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "n_chars": "int64"})
    )
    got = td.importance_resample(SF)
    pd.testing.assert_frame_equal(got, expect)
    # the keep rate tracks the configured weight (binomial 3-sigma)
    en = docs[docs.lang == "en"]
    en_kept = int(got[got.lang == "en"].n_docs.iloc[0])
    w = td.RESAMPLE_WEIGHTS["en"]
    sigma = (len(en) * w * (1 - w)) ** 0.5
    assert abs(en_kept - w * len(en)) < 4 * sigma
    # and a second run returns the identical frame (determinism)
    pd.testing.assert_frame_equal(td.importance_resample(SF), got)


def test_pack_sequences_vs_cumsum_reference(ray_session):
    docs = _docs()
    toks = docs.text.map(lambda t: len(t.split())).to_numpy(dtype=np.int64)
    end = toks.cumsum()
    start = end - toks
    expect = pd.DataFrame(
        {
            "doc_id": docs.doc_id.to_numpy(),
            "n_tokens": toks,
            "seq_first": start // td.PACK_BUDGET,
            "seq_last": (end - 1) // td.PACK_BUDGET,
        }
    ).astype({"doc_id": "int64", "n_tokens": "int64", "seq_first": "int64", "seq_last": "int64"})
    got = td.pack_sequences(SF)
    pd.testing.assert_frame_equal(got, expect)
    # sequences tile the corpus: windows are contiguous and monotone
    assert (got.seq_first <= got.seq_last).all()
    assert (got.seq_first.to_numpy()[1:] - got.seq_last.to_numpy()[:-1] <= 1).all()
    # boundary-straddling docs exist at a 512-token budget on this corpus
    assert (got.seq_last > got.seq_first).any()


def test_duplicate_ngram_spans_hashed_path_identical(ray_session):
    """The hashed-shuffle default (100 TB path) must produce the exact
    string-shuffle path's output bit-for-bit (blake2b-128 collisions are
    ~1e-20 here). hashed=True is the default since r4 (VERDICT r3 #4),
    so compare the explicit debug path against it."""
    exact = td.duplicate_ngram_spans(SF, hashed=False)
    hashed = td.duplicate_ngram_spans(SF, hashed=True)
    pd.testing.assert_frame_equal(hashed, exact)


def test_bpe_pair_counts_matches_local(ray_session):
    """Distributed pair election equals a single-process Counter over the
    same corpus, including the (cnt desc, pair asc) tie order at the k
    boundary."""
    from collections import Counter

    import pyarrow.parquet as pq

    got = td.bpe_pair_counts(SF, k=30)
    texts = pq.read_table(f"{SF}/documents.parquet", columns=["text"]).column("text").to_pylist()
    c = Counter()
    for t in texts:
        for w in t.split():
            c.update(w[i : i + 2] for i in range(len(w) - 1))
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    assert list(zip(got.pair, got.cnt)) == expect


def test_token_budget_select_bruteforce():
    """The coarse-histogram + boundary-resolve cut must equal the
    straightforward per-lang (stop DESC, doc_id) cumsum <= budget."""
    import pyarrow.parquet as pq

    from paddle_ray.functions.textstats import STOPWORDS

    sf = "/root/testdata/sf0.001"
    out = td.token_budget_select(sf)
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    rows = []
    for did, lang, text in zip(docs.doc_id, docs.lang, docs.text):
        ws = text.split()
        if not ws:
            continue
        stop = sum(1 for w in ws if w.lower() in STOPWORDS) / len(ws)
        rows.append((did, lang, len(ws), stop))
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "n_tok", "stop"])
    keep = []
    for lang, g in df.groupby("lang"):
        g = g.sort_values(["stop", "doc_id"], ascending=[False, True])
        keep.append(g[g.n_tok.cumsum() <= td.TB_BUDGET])
    exp = pd.concat(keep).sort_values("doc_id").reset_index(drop=True)
    assert out.doc_id.tolist() == exp.doc_id.tolist()
    assert out.n_tok.tolist() == exp.n_tok.tolist()
    # per-lang budget respected, and maximal (next-best doc would overflow)
    for lang, g in out.groupby("lang"):
        used = g.n_tok.sum()
        assert used <= td.TB_BUDGET
        rest = df[(df.lang == lang) & ~df.doc_id.isin(g.doc_id)]
        if len(rest):
            nxt = rest.sort_values(["stop", "doc_id"], ascending=[False, True]).iloc[0]
            assert used + nxt.n_tok > td.TB_BUDGET


def test_token_budget_refinement_single_bucket_pileup(tmp_path, ray_session):
    """VERDICT r4 #3: the pathological all-docs-one-stop-ratio pileup —
    the coarse histogram puts EVERY doc in one boundary bucket and stop
    carries zero ordering information — must resolve through the
    iterative key refinement (boundary_cap=0 forces it) without the old
    loud cap firing, and match both the driver-resolve path and the
    brute-force cumsum exactly (phase B's doc_id tiebreak refinement)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "sf"
    d.mkdir()
    rows = []
    # two langs; every doc has stop ratio exactly 0.5 ('the w0i the w1i'
    # pattern, 4 distinct-ish tokens) => n_tok=4, one tied stop value
    for i in range(120):
        rows.append(
            {
                "doc_id": i,
                "lang": "aa" if i % 2 else "bb",
                "text": f"the w{i}x the w{i}y",
            }
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False),
        d / "documents.parquet",
    )
    budget = 50  # 12 docs of 4 tokens fit (48), the 13th would hit 52
    refined = td.token_budget_select(str(d), budget=budget, boundary_cap=0)
    direct = td.token_budget_select(str(d), budget=budget)
    pd.testing.assert_frame_equal(refined, direct)
    for lang, g in refined.groupby("lang"):
        assert len(g) == 12 and g.n_tok.sum() == 48
        # doc_id ascending tiebreak: exactly the 12 smallest ids per lang
        ids = sorted(i for i in range(120) if ("aa" if i % 2 else "bb") == lang)[:12]
        assert g.doc_id.tolist() == ids


def test_token_budget_refinement_matches_driver_resolve_on_sf(ray_session):
    """On real sf0.001 data (many langs, distinct stop values) the
    refinement path must be bit-identical to the driver-resolve path."""
    sf = "/root/testdata/sf0.001"
    direct = td.token_budget_select(sf)
    refined = td.token_budget_select(sf, boundary_cap=0)
    pd.testing.assert_frame_equal(refined, direct)


def test_w_threshold_hex_domain():
    from paddle_ray.pipelines.common import w_threshold_hex

    assert w_threshold_hex(0.5).startswith("80000000")
    assert len(w_threshold_hex(0.1)) == 32
    with pytest.raises(ValueError):
        w_threshold_hex(1.0)
    with pytest.raises(ValueError):
        w_threshold_hex(-0.1)


def test_training_shards_bruteforce():
    """Range-partitioned rank must equal the straight md5-sort layout:
    a permutation of all docs, contiguous shards of SHARD_SIZE, and the
    exact order."""
    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.001"
    out = td.training_shards(sf)
    ids = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id"]).to_pandas().doc_id
    assert sorted(out.doc_id) == sorted(ids)
    order = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    rank = {d: r for r, d in enumerate(order)}
    for _, row in out.iterrows():
        rn = rank[row.doc_id]
        assert (row.shard, row.pos) == (rn // td.SHARD_SIZE, rn % td.SHARD_SIZE)
    # every full shard holds exactly SHARD_SIZE docs
    sizes = out.groupby("shard").size()
    assert (sizes.iloc[:-1] == td.SHARD_SIZE).all() if len(sizes) > 1 else True


def _bpe_reference(texts, n_merges):
    """Independent single-process BPE trainer (Sennrich algorithm) — the
    non-circular ground truth for bpe_train and the BPE_TRAIN_SQL golden."""
    from collections import Counter

    wf = Counter()
    for t in texts:
        wf.update(t.split())
    state = {tuple(w): f for w, f in wf.items()}
    ref = []
    for rnd in range(1, n_merges + 1):
        pc = Counter()
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += f
        if not pc:
            break
        (a, b), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        ref.append((rnd, a, b, a + b, cnt))
        new = {}
        for syms, f in state.items():
            m, i, n = [], 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    m.append(a + b)
                    i += 2
                else:
                    m.append(syms[i])
                    i += 1
            new[tuple(m)] = new.get(tuple(m), 0) + f
        state = new
    return ref


def test_bpe_train_matches_reference(ray_session):
    """Distributed merge chain == the independent reference trainer on
    BOTH the golden synthetic corpus (pins BPE_TRAIN_SQL's values) and
    the sf corpus (different alphabet/tie structure)."""
    import duckdb

    import pyarrow as pa
    import ray.data as rd

    synth = td.bpe_synth_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(synth, preserve_index=False)).repartition(8)
    got = [tuple(r) for r in td.bpe_train("ignored", docs=ds).itertuples(index=False)]
    ref = _bpe_reference(synth.text, td.BPE_MERGES)
    assert got == ref
    # the pinned golden SQL is that same chain
    gold = [tuple(r) for r in duckdb.sql(td.BPE_TRAIN_SQL).df().itertuples(index=False)]
    assert [(int(a), b, c, d, int(e)) for a, b, c, d, e in gold] == ref

    docs = _docs()
    got_sf = [
        tuple(r) for r in td.bpe_train(SF, n_merges=5).itertuples(index=False)
    ]
    assert got_sf == _bpe_reference(docs.text, 5)


def _ref_encode(word, merges):
    syms = list(word)
    for _rnd, a, b, _m, _c in merges:
        if len(syms) < 2:
            break
        m, i, n = [], 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                m.append(a + b)
                i += 2
            else:
                m.append(syms[i])
                i += 1
        syms = m
    return syms


def test_bpe_encode_matches_reference(ray_session):
    """Distributed vocab segmentation == the independent reference encoder
    (merges applied in learned round order) on the golden synth corpus
    (pins BPE_ENCODE_SQL) and the sf corpus; also: the encoder's output
    is the trainer's final symbol state (train/encode consistency)."""
    from collections import Counter

    import duckdb

    import pyarrow as pa
    import ray.data as rd

    synth = td.bpe_synth_corpus()
    ds = rd.from_arrow(pa.Table.from_pandas(synth, preserve_index=False)).repartition(8)
    got = td.bpe_encode("ignored", docs=ds)
    merges = _bpe_reference(synth.text, td.BPE_MERGES)
    wf = Counter()
    for t in synth.text:
        wf.update(t.split())
    ref = pd.DataFrame(
        [
            {
                "word": w,
                "pieces": " ".join(_ref_encode(w, merges)),
                "n_pieces": len(_ref_encode(w, merges)),
                "freq": f,
            }
            for w, f in sorted(wf.items())
        ]
    )
    pd.testing.assert_frame_equal(got, ref.astype({"n_pieces": "int64", "freq": "int64"}))
    gold = duckdb.sql(td.BPE_ENCODE_SQL).df()
    pd.testing.assert_frame_equal(got, gold.astype({"n_pieces": "int64", "freq": "int64"}))

    docs = _docs()
    got_sf = td.bpe_encode(SF, n_merges=5)
    merges_sf = _bpe_reference(docs.text, 5)
    for row in got_sf.sample(n=min(50, len(got_sf)), random_state=7).itertuples(index=False):
        assert row.pieces == " ".join(_ref_encode(row.word, merges_sf))


def test_chunk_documents_covers_every_token():
    """Sliding-window chunking == brute-force per-doc enumeration: chunk
    count ceil(n/stride), full-window sizes except the tail, md5 of the
    exact token slice, and zero-token docs emit nothing."""
    import hashlib
    import math

    import pyarrow.parquet as pq

    from paddle_ray.pipelines.traindata import CHUNK_S, CHUNK_W, chunk_documents

    sf = "/root/testdata/sf0.001"
    out = chunk_documents(sf)
    docs = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    expect = {}
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split()
        for cid, s in enumerate(range(0, len(toks), CHUNK_S)):
            piece = toks[s : s + CHUNK_W]
            expect[(did, cid)] = (len(piece), hashlib.md5(" ".join(piece).encode()).hexdigest())
    got = {(r.doc_id, r.chunk_id): (r.n_tok, r.chunk_md5) for r in out.itertuples()}
    assert got == expect
    n_by_doc = out.groupby("doc_id").chunk_id.max() + 1
    toks_by_doc = docs.set_index("doc_id").text.map(lambda t: len(t.split()))
    for did, n in toks_by_doc.items():
        assert n == 0 or n_by_doc[did] == math.ceil(n / CHUNK_S)

    with pytest.raises(ValueError):
        chunk_documents(sf, window=0)


def test_dsir_select_matches_bruteforce(ray_session):
    """dsir_select == single-process DSIR reference: fit fixed-point
    importance weights w[b] = ((c_tgt+1)*t_raw*SCALE)//((c_raw+1)*t_tgt)
    over hashed unigram buckets, score docs by summed weights, select
    score >= n_tok*SCALE. Also locks zero-token exclusion and the
    empty-target guard."""
    from paddle_ray.pipelines.traindata import (
        DSIR_BUCKETS,
        DSIR_SCALE,
        DSIR_TARGET_LANG,
        _dsir_bucket,
        dsir_select,
    )

    docs = _docs()
    c_raw = [0] * DSIR_BUCKETS
    c_tgt = [0] * DSIR_BUCKETS
    for lang, text in zip(docs.lang, docs.text):
        for tok in text.split():
            b = _dsir_bucket(tok)
            c_raw[b] += 1
            if lang == DSIR_TARGET_LANG:
                c_tgt[b] += 1
    t_raw, t_tgt = sum(c_raw), sum(c_tgt)
    w = [
        (c_tgt[b] + 1) * t_raw * DSIR_SCALE // ((c_raw[b] + 1) * t_tgt)
        for b in range(DSIR_BUCKETS)
    ]
    expect = {}
    for did, text in zip(docs.doc_id, docs.text):
        toks = text.split()
        if not toks:
            continue
        s = sum(w[_dsir_bucket(t)] for t in toks)
        expect[did] = (s, len(toks), int(s >= len(toks) * DSIR_SCALE))

    out = dsir_select(SF)
    got = {r.doc_id: (r.score, r.n_tok, r.selected) for r in out.itertuples()}
    assert got == expect
    # the selection is non-vacuous in both directions on this corpus
    assert 0 < out.selected.sum() < len(out)
    # target-language docs should be selected at a higher rate than others
    sel = docs.merge(out, on="doc_id")
    rate_tgt = sel[sel.lang == DSIR_TARGET_LANG].selected.mean()
    rate_oth = sel[sel.lang != DSIR_TARGET_LANG].selected.mean()
    assert rate_tgt > rate_oth

    with pytest.raises(ValueError):
        dsir_select(SF, target_lang="zz-no-such-lang")


def test_temperature_mixture_matches_bruteforce(ray_session):
    """temperature_mixture == single-process alpha=0.5 reference:
    rate_l = sqrt(n_min/n_l) over whitespace token counts, md5(doc_id)
    fixed-point threshold keep, smallest lang keeps everything. Also
    locks the expected-tokens-proportional-to-sqrt(n_l) property within
    sampling noise and the empty-lang guard."""
    import hashlib
    import math

    from paddle_ray.pipelines.common import w_threshold_hex
    from paddle_ray.pipelines.traindata import temperature_mixture

    docs = _docs()
    n_l: dict[str, int] = {}
    toks = {}
    for did, text, lang in zip(docs.doc_id, docs.text, docs.lang):
        n = len(text.split())
        toks[did] = (lang, n)
        n_l[lang] = n_l.get(lang, 0) + n
    n_min = min(n_l.values())
    th = {
        lang: None if v == n_min else w_threshold_hex(math.sqrt(n_min / v))
        for lang, v in n_l.items()
    }
    expect: dict[str, list[int]] = {}
    for did, (lang, n) in toks.items():
        t = th[lang]
        kept = t is None or hashlib.md5(str(did).encode()).hexdigest() < t
        a = expect.setdefault(lang, [0, 0, 0])
        a[0] += n
        if kept:
            a[1] += 1
            a[2] += n

    out = temperature_mixture(SF)
    got = {r.lang: [r.n_tok_in, r.n_docs_kept, r.n_tok_kept] for r in out.itertuples()}
    assert got == expect
    # the smallest lang keeps every doc; every other lang drops some
    n_docs_in = docs.lang.value_counts()
    small = min(n_l, key=n_l.get)
    assert got[small][1] == int(n_docs_in[small])
    assert any(got[lang][1] < int(n_docs_in[lang]) for lang in n_l if lang != small)
    # kept tokens track the sqrt law: n_tok_kept / sqrt(n_l) roughly
    # constant across langs (within 25% of the mean — sampling noise)
    ratios = [got[lang][2] / math.sqrt(n_l[lang]) for lang in n_l]
    mid = sum(ratios) / len(ratios)
    assert all(abs(r - mid) / mid < 0.25 for r in ratios)


def test_source_budget_allocation_exact(ray_session):
    """Hamilton apportionment: quotas sum EXACTLY to the budget, every
    quota is floor or floor+1 of the exact proportional share, the +1s
    go to the largest remainders (ties by source asc), and the whole
    chain is integer arithmetic (engine == single-process reference)."""
    from paddle_ray.pipelines.traindata import (
        BUDGET_TOKENS,
        source_budget_allocation,
    )

    docs = duckdb.sql(
        f"SELECT text, source FROM read_parquet('{SF}/documents.parquet')"
    ).df()
    n_s: dict[str, int] = {}
    for text, src in zip(docs.text, docs.source):
        n_s[src] = n_s.get(src, 0) + len(text.split())
    W = sum(n_s.values())
    srcs = sorted(n_s)
    base = {s: BUDGET_TOKENS * n_s[s] // W for s in srcs}
    rem = {s: BUDGET_TOKENS * n_s[s] % W for s in srcs}
    leftover = BUDGET_TOKENS - sum(base.values())
    extra = set(sorted(srcs, key=lambda s: (-rem[s], s))[:leftover])
    expect = {s: (n_s[s], base[s] + (1 if s in extra else 0)) for s in srcs}

    out = source_budget_allocation(SF)
    got = {r.source: (r.n_tok, r.quota) for r in out.itertuples()}
    assert got == expect
    assert int(out.quota.sum()) == BUDGET_TOKENS
    # every quota within 1 of the exact share, and leftover was nonzero
    # at least once across the sf corpora (floor alone can't sum to B
    # unless every share is integral — vanishingly unlikely)
    assert all(
        q in (BUDGET_TOKENS * n // W, BUDGET_TOKENS * n // W + 1)
        for n, q in got.values()
    )
    with pytest.raises(ValueError):
        source_budget_allocation(SF, budget=-1)

    # budget=0 degenerates cleanly to all-zero quotas
    z = source_budget_allocation(SF, budget=0)
    assert int(z.quota.sum()) == 0 and (z.quota == 0).all()


def test_scrub_duplicate_spans_bytes(ray_session):
    """scrub_duplicate_spans == single-process reference surgery: exact
    scrubbed-text md5s, removal counts, consistency with
    duplicate_ngram_spans' span counts, and non-vacuity (some docs
    scrubbed, none fully emptied... unless fully covered)."""
    import hashlib
    from collections import Counter

    from paddle_ray.pipelines.traindata import (
        NGRAM_K,
        _grams,
        scrub_duplicate_spans,
    )

    docs = _docs()
    cnt: Counter = Counter()
    for t in docs.text:
        cnt.update(_grams(t, NGRAM_K))
    dup = {g for g, c in cnt.items() if c > 1}
    expect = {}
    for did, t in zip(docs.doc_id, docs.text):
        ws = t.split()
        mask = [False] * len(ws)
        for i, g in enumerate(_grams(t, NGRAM_K)):
            if g in dup:
                for j in range(i, i + NGRAM_K):
                    mask[j] = True
        kept = [w for w, m in zip(ws, mask) if not m]
        expect[did] = (
            len(ws),
            sum(mask),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    out = scrub_duplicate_spans(SF)
    got = {r.doc_id: (r.n_tok_in, r.n_removed, r.scrubbed_md5) for r in out.itertuples()}
    assert got == expect
    assert (out.n_removed > 0).any() and (out.n_removed < out.n_tok_in).any()


def test_span_corruption_matches_reference(ray_session):
    """span_corruption == single-process reference masking; T5 contract
    invariants: every span start is masked, overlapping spans merge to
    one sentinel, sentinel count == masked-run count, and the corrupted
    digest changes if the mask rule shifts by one position."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from paddle_ray.pipelines import traindata as td

    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    agg = {}
    for r in t.itertuples():
        toks = r.text.split()
        if not toks:
            continue
        n = len(toks)
        starts = np.array(
            [
                int(hashlib.md5(f"sc:{r.doc_id}:{i}".encode()).hexdigest()[:8], 16)
                < td.SC_THR
                for i in range(n)
            ]
        )
        m = starts.copy()
        for off in range(1, td.SC_SPAN):
            m[off:] |= starts[:-off]
        run_start = m & ~np.concatenate(([False], m[:-1]))
        corrupted = " ".join(
            "<X>" if run_start[i] else toks[i]
            for i in range(n)
            if run_start[i] or not m[i]
        )
        assert corrupted.count("<X>") == int(run_start.sum())
        a = agg.setdefault(r.lang, [0, 0, 0, 0, 0])
        a[0] += 1
        a[1] += n
        a[2] += int(m.sum())
        a[3] += int(run_start.sum())
        a[4] += int(hashlib.md5(corrupted.encode()).hexdigest()[:12], 16)

    out = td.span_corruption(SF)
    assert list(out.lang) == sorted(agg)
    for r in out.itertuples():
        assert [r.n_docs, r.n_tokens, r.n_masked, r.n_spans, r.digest_sum] == agg[r.lang]
        # masking is live and every sentinel covers >= 1 masked token
        # (a merged run may contain MANY starts, so SPAN * n_spans is
        # NOT an upper bound on n_masked)
        assert 0 < r.n_masked < r.n_tokens
        assert 0 < r.n_spans <= r.n_masked


def test_kn_ngram_stats_matches_reference(ray_session):
    """kn_ngram_stats == single-process trigram counter over raw STRINGS
    (the engine ships digests — equality here also certifies the digest
    substitution), plus KN sanity: n1+n2 <= unique <= total, contexts <=
    unique, 0 < discount < 1."""
    from collections import Counter

    import pyarrow.parquet as pq
    import pytest

    from paddle_ray.pipelines import traindata as td

    t = pq.read_table(f"{SF}/documents.parquet", columns=["lang", "text"]).to_pandas()
    ref = {}
    for lang, g in t.groupby("lang"):
        grams, ctxs = Counter(), set()
        for text in g.text:
            toks = text.split()
            for a, b, c in zip(toks, toks[1:], toks[2:]):
                grams[(a, b, c)] += 1
                ctxs.add((a, b))
        n1 = sum(1 for v in grams.values() if v == 1)
        n2 = sum(1 for v in grams.values() if v == 2)
        ref[lang] = (
            sum(grams.values()),
            len(grams),
            n1,
            n2,
            len(ctxs),
            round(n1 / (n1 + 2 * n2), 6),
        )

    out = td.kn_ngram_stats(SF)
    assert list(out.lang) == sorted(ref)
    for r in out.itertuples():
        exp = ref[r.lang]
        assert (
            r.total_trigrams,
            r.unique_trigrams,
            r.n1,
            r.n2,
            r.unique_contexts,
        ) == exp[:5]
        assert r.discount == pytest.approx(exp[5], abs=1e-6)
        assert r.n1 + r.n2 <= r.unique_trigrams <= r.total_trigrams
        assert r.unique_contexts <= r.unique_trigrams
        assert 0 < r.discount < 1
