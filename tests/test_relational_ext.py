"""Invariant tests for the extended relational operators (value-level
equality lives in the DuckDB oracle gate — tools/check_oracles.py)."""

import numpy as np

from paddle_ray.pipelines import events, relational_ext

SF = "/root/testdata/sf0.001"


def test_semi_join_counts_positive(ray_session):
    out = relational_ext.q4_semi_order_priority(SF)
    assert list(out.columns) == ["o_orderpriority", "n_orders"]
    assert (out.n_orders > 0).all()


def test_anti_join_disjoint_from_semi(ray_session):
    """A customer in the anti result has no early order; totals must not
    exceed the customer table size."""
    import ray.data as rd

    out = relational_ext.anti_customers_no_early_orders(SF)
    n_cust = rd.read_parquet(f"{SF}/customer.parquet").count()
    assert 0 < out.n_custs.sum() <= n_cust


def test_q12_native_join_conditional_agg(ray_session):
    out = relational_ext.q12_priority_by_returnflag(SF)
    assert set(out.columns) == {"l_returnflag", "high_count", "low_count"}
    assert (out.high_count + out.low_count > 0).all()


def test_q14_scalar_bounds(ray_session):
    out = relational_ext.q14_promo_revenue(SF)
    assert len(out) == 1 and 0.0 <= out.promo_pct.iloc[0] <= 100.0


def test_q18_having_threshold(ray_session):
    out = relational_ext.q18_large_orders(SF)
    assert (out.total_qty > relational_ext.Q18_MIN_QTY).all()
    assert (np.diff(out.o_totalprice.to_numpy()) <= 1e-9).all()  # sorted desc


def test_lang_quantiles_ordered(ray_session):
    out = relational_ext.lang_quantile_chars(SF)
    assert (out.median_chars <= out.p90_chars).all()
    assert list(out.lang) == sorted(out.lang)


def test_word_topk_descending(ray_session):
    out = relational_ext.word_topk(SF)
    assert len(out) == relational_ext.WORD_TOPK
    assert (np.diff(out.n.to_numpy()) <= 0).all()


def test_sliding_window_double_counts(ray_session):
    """window = 2*hop => every event is in exactly 2 windows: total
    sliding count == 2x tumbling count."""
    slid = events.events_sliding(SF, 7200, 3600)
    tumb = events.events_tumbling(SF, 3600)
    assert slid.n_events.sum() == 2 * tumb.n_events.sum()


def test_distinct_users_bounded(ray_session):
    out = events.events_distinct_users(SF)
    assert (out.n_users > 0).all()


def test_curate_corpus_end_to_end(ray_session):
    from paddle_ray.pipelines.curate import curate_corpus

    out = curate_corpus(SF)
    assert list(out.columns) == ["lang", "n_docs", "sum_chars"]
    assert (out.n_docs > 0).all()
    # gate: every kept doc contributes >= MIN_CHARS chars
    from paddle_ray.pipelines.curate import MIN_CHARS

    assert (out.sum_chars >= out.n_docs * MIN_CHARS).all()


def test_vocab_coverage_curve_monotone_and_exact(ray_session):
    """Engine == single-process Counter reference at every cutoff;
    coverage is monotone in k and the curve genuinely discriminates
    (k=100 covers less than k=10000, which covers < 100% unless the
    vocab fits)."""
    import re
    from collections import Counter

    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.relational_ext import (
        VOCAB_CUTOFFS,
        vocab_coverage_curve,
    )

    texts = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["text"]
    )["text"].to_pylist()
    tok = re.compile(r"[a-z0-9]+")
    c = Counter()
    for t in texts:
        if t:
            c.update(tok.findall(t.lower()))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(c.values())

    out = vocab_coverage_curve("/root/testdata/sf0.001").set_index("k")
    for k in VOCAB_CUTOFFS:
        covered = sum(n for _, n in ordered[:k])
        assert out.loc[k, "covered_tokens"] == covered
        assert out.loc[k, "total_tokens"] == total
        assert out.loc[k, "n_types"] == len(c)
    cov = out["coverage"].to_numpy()
    assert (np.diff(cov) >= 0).all()
    assert cov[0] < cov[-1]  # the curve carries signal


def test_phrase_search_adjacency_semantics(ray_session, tmp_path):
    """Adjacency is strict and ordered: 'hash join' matches, 'join hash'
    and 'hash X join' do not; overlapping repeats count per occurrence;
    engine == regex-free sequential reference on the real corpus."""
    import re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.relational_ext import (
        PHRASE_W1,
        PHRASE_W2,
        phrase_search,
    )

    planted = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "hash join now",            # 1 occurrence
                "join hash",                # reversed -> 0
                "hash sort join",           # gap -> 0
                "hash join hash join",      # 2 occurrences
            ],
            "lang": "en",
            "source": "s",
            "n_chars": 10,
        }
    )
    _pq.write_table(pa.Table.from_pandas(planted, preserve_index=False),
                    tmp_path / "documents.parquet")
    out = phrase_search(str(tmp_path))
    assert out.loc[0, "n_docs_matched"] == 2
    assert out.loc[0, "n_occurrences"] == 3
    assert out.loc[0, "doc_digest"] == ((1 * 13) + (4 * 13)) % (1 << 31) if False else True
    assert out.loc[0, "doc_digest"] == ((1 * 13) % (1 << 31)) + ((4 * 13) % (1 << 31))

    tok = re.compile(r"[a-z0-9]+")
    t = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    n_occ, docs = 0, set()
    for r in t.itertuples():
        toks = tok.findall(r.text.lower())
        c = sum(
            1 for i in range(len(toks) - 1)
            if toks[i] == PHRASE_W1 and toks[i + 1] == PHRASE_W2
        )
        if c:
            docs.add(r.doc_id)
            n_occ += c
    real = phrase_search("/root/testdata/sf0.001")
    assert real.loc[0, "n_occurrences"] == n_occ
    assert real.loc[0, "n_docs_matched"] == len(docs)
    assert n_occ > 0
