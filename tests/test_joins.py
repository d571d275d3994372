"""Join/window/set-op invariant tests (value-level checks live in the
DuckDB oracle gate — tools/check_oracles.py)."""

import numpy as np

from paddle_ray.pipelines import joins

SF = "/root/testdata/sf0.001"


def test_q6_scalar_shape(ray_session):
    out = joins.q6_forecast_revenue(SF)
    assert list(out.columns) == ["revenue"] and len(out) == 1
    assert out.revenue.iloc[0] > 0


def test_q10_native_join_topk(ray_session):
    out = joins.q10_returned_revenue(SF)
    assert list(out.columns) == ["c_custkey", "c_name", "revenue"]
    assert len(out) == 20
    # descending revenue, ties by custkey
    assert (np.diff(out.revenue.to_numpy()) <= 1e-9).all()


def test_asof_join_matches_are_past_orders(ray_session):
    out = joins.asof_events_orders(SF)
    assert (out.n_matched <= out.n_events).all()
    assert (out.sum_age_s >= 0).all()


def test_window_top3_rank_invariants(ray_session):
    out = joins.window_top3_orders(SF)
    assert out.rn.max() <= 3
    # within a customer, rn increases as totalprice decreases
    for _, g in out.groupby("o_custkey"):
        assert list(g.rn) == list(range(1, len(g) + 1))
        assert (np.diff(g.o_totalprice.to_numpy()) <= 1e-9).all()


def test_union_disjoint_and_sorted(ray_session):
    out = joins.union_short_long_docs(SF)
    assert ((out.n_chars < 100) | (out.n_chars > 400)).all()
    assert list(out.doc_id) == sorted(out.doc_id)


def test_distinct_no_dups(ray_session):
    out = joins.distinct_doc_keys(SF)
    assert not out.duplicated(["lang", "source"]).any()
