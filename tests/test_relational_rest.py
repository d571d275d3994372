"""Semantics locks for the round-3 TPC-H remainder
(pipelines/relational_rest.py). The driver oracle value-checks every
query against DuckDB; these tests pin the PROPERTIES a refactor could
silently break (tie-breaks, strictness, uniqueness) against independent
brute-force references."""

import duckdb
import numpy as np
import pandas as pd

from paddle_ray.pipelines import relational_rest as rr

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem".split():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def test_q2_winner_is_the_max_balance_europe_shipper(ray_session):
    out = rr.q2_min_cost_supplier(SF)
    assert len(out) > 0
    con = _con()
    for row in out.itertuples():
        best = con.sql(
            f"""SELECT max(s_acctbal) FROM (SELECT DISTINCT l_suppkey FROM lineitem
                WHERE l_partkey = {row.p_partkey}) p
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN nation ON n_nationkey = s_nationkey
                JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'EUROPE'"""
        ).fetchone()[0]
        assert row.s_acctbal == best


def test_q15_all_rows_share_the_maximum(ray_session):
    out = rr.q15_top_supplier(SF)
    assert len(out) >= 1
    assert out.total_revenue.nunique() == 1
    # and it IS the max over the full per-supplier revenue frame
    con = _con()
    mx = con.sql(
        f"""SELECT ROUND(MAX(r), 4) FROM (SELECT SUM(l_extendedprice * (1 - l_discount)) r
            FROM lineitem WHERE l_shipdate >= TIMESTAMP '{rr.Q15_START}'
            AND l_shipdate < TIMESTAMP '{rr.Q15_END}' GROUP BY l_suppkey)"""
    ).fetchone()[0]
    assert out.total_revenue.iloc[0] == mx


def test_q21_argmax_uniqueness_vs_bruteforce(ray_session):
    li = duckdb.sql(
        f"SELECT l_orderkey, l_suppkey, l_shipdate FROM read_parquet('{SF}/lineitem.parquet')"
    ).df()
    sup = duckdb.sql(
        f"SELECT s_suppkey, s_nationkey, s_name FROM read_parquet('{SF}/supplier.parquet')"
    ).df()
    n3 = set(sup[sup.s_nationkey == rr.Q21_NATION].s_suppkey)
    counts: dict[str, int] = {}
    name = sup.set_index("s_suppkey").s_name
    for ok, g in li.groupby("l_orderkey"):
        per_supp = g.groupby("l_suppkey").l_shipdate.max()
        if len(per_supp) < 2:
            continue
        mx = per_supp.max()
        at_max = per_supp[per_supp == mx]
        if len(at_max) != 1:
            continue
        w = at_max.index[0]
        if w in n3:
            counts[name[w]] = counts.get(name[w], 0) + 1
    expect = pd.DataFrame(
        {"s_name": sorted(counts), "numwait": [counts[k] for k in sorted(counts)]}
    )
    got = rr.q21_waiting_suppliers(SF)
    assert got.numwait.sum() > 0  # non-vacuous at sf0.001
    pd.testing.assert_frame_equal(got, expect.astype({"numwait": "int64"}))


def test_q19_branch_masks_are_disjunctive_not_conjunctive(ray_session):
    # the disjunction must be >= every single branch alone
    total = rr.q19_disjunctive_revenue(SF).revenue.iloc[0]
    con = _con()
    for b in rr.Q19_BRANCHES:
        one = con.sql(
            f"""SELECT COALESCE(SUM(l_extendedprice * (1 - l_discount)), 0)
                FROM lineitem JOIN part ON p_partkey = l_partkey
                WHERE {rr._q19_branch_sql(*b)}"""
        ).fetchone()[0]
        assert total >= round(one, 4) - 1e-6
    assert total > 0


def test_q17_strict_small_quantity_filter(ray_session):
    # threshold strictness: revenue restricted to qty < frac*avg must be
    # strictly below the unrestricted brand revenue / 7
    out = rr.q17_small_quantity_revenue(SF).avg_yearly.iloc[0]
    con = _con()
    full = con.sql(
        f"""SELECT SUM(l_extendedprice) / 7.0 FROM lineitem
            JOIN part ON p_partkey = l_partkey WHERE p_brand = '{rr.Q17_BRAND}'"""
    ).fetchone()[0]
    assert 0 < out < full


def test_probe_drops_unmatched_keys():
    keys = np.array([2, 4, 6], dtype=np.int64)
    vals = np.array([20, 40, 60], dtype=np.int64)
    matched, got = rr._probe(keys, vals, np.array([1, 2, 6, 7], dtype=np.int64))
    assert matched.tolist() == [False, True, True, False]
    assert got.tolist() == [20, 60]
    # empty dim side: nothing matches, nothing crashes
    m2, g2 = rr._probe(keys[:0], vals[:0], np.array([1, 2], dtype=np.int64))
    assert m2.tolist() == [False, False] and len(g2) == 0
