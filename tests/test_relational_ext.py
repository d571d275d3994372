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
