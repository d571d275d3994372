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


def test_salted_join_equals_plain_join(ray_session):
    """The salted (key, salt) join must produce EXACTLY the plain join's
    rollup at any fan-out (1 == unsalted, 8 == default, 13 == coprime
    odd), and cents arithmetic must equal the float-sum rounded."""
    import duckdb

    from paddle_ray.pipelines.joins import salted_segment_rollup

    sf = "/root/testdata/sf0.001"
    expect = duckdb.sql(
        f"""SELECT c.c_mktsegment, COUNT(*) AS n_events,
                   SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS value_cents
            FROM read_parquet('{sf}/events.parquet') e
            JOIN read_parquet('{sf}/customer.parquet') c ON e.user_id = c.c_custkey
            GROUP BY 1 ORDER BY 1"""
    ).df()
    for s in (1, 8, 13):
        out = salted_segment_rollup(sf, n_salts=s)
        assert list(out.c_mktsegment) == list(expect.c_mktsegment)
        assert list(out.n_events) == [int(x) for x in expect.n_events]
        assert list(out.value_cents) == [int(x) for x in expect.value_cents]
    import pytest

    with pytest.raises(ValueError):
        salted_segment_rollup(sf, n_salts=0)


def test_bucketed_join_equals_plain_join(ray_session):
    """The storage-bucketed zero-exchange join must produce EXACTLY the
    plain single-process join's rollup at any bucket count (1 == a single
    co-located pair, 16 == default, 7 == coprime with the key stride), and
    the bucket routing must not lose or duplicate a single row — n_items
    is the full join cardinality."""
    import pandas as pd
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.common import to_cents
    from paddle_ray.pipelines.joins import bucketed_join

    o = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet").to_pandas()
    m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey", how="inner")
    m["revenue_e4"] = to_cents(m.l_extendedprice) * (100 - to_cents(m.l_discount))
    ref = (
        m.groupby("o_orderpriority", as_index=False)
        .agg(n_items=("l_orderkey", "size"), revenue_e4=("revenue_e4", "sum"))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    assert ref.n_items.sum() == len(li)  # every lineitem joins (FK complete)
    for b in (1, 7, 16):
        out = bucketed_join(SF, n_buckets=b)
        pd.testing.assert_frame_equal(
            out.reset_index(drop=True), ref.astype(out.dtypes.to_dict())
        )


def test_adaptive_join_both_plans_bit_equal(ray_session):
    """The stats-driven plan choice must be invisible in the answer:
    force the broadcast plan (threshold = inf) and the shuffle plan
    (threshold = 0) and assert bit-equality; the default probe picks
    broadcast for this corpus (customer parquet << 32 MiB)."""
    import os

    import pandas as pd

    from paddle_ray.pipelines.joins import ADAPTIVE_BCAST_BYTES, adaptive_join_rollup

    bcast = adaptive_join_rollup(SF, bcast_threshold_bytes=1 << 62)
    shuffle = adaptive_join_rollup(SF, bcast_threshold_bytes=0)
    pd.testing.assert_frame_equal(bcast, shuffle)
    assert os.path.getsize(f"{SF}/customer.parquet") < ADAPTIVE_BCAST_BYTES
    default = adaptive_join_rollup(SF)
    pd.testing.assert_frame_equal(default, bcast)
    assert len(default) >= 2 and (default.n_orders > 0).all()


def test_adaptive_join_broadcast_drops_orphan_keys(ray_session, tmp_path):
    """The broadcast plan's searchsorted lookup must keep inner-join
    semantics when an order references a custkey missing from customer
    (in-range gap AND above-max): those rows drop, never silently attach
    a neighbouring customer's nation (ADVICE r4)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.joins import adaptive_join_rollup

    d = tmp_path / "sf"
    d.mkdir()
    cust = pd.DataFrame({"c_custkey": [1, 3, 5], "c_nationkey": [0, 1, 2]})
    # custkey 2 = in-range gap; 9 = above max; both must drop on BOTH plans
    orders = pd.DataFrame(
        {
            "o_custkey": [1, 2, 3, 5, 9, 1],
            "o_totalprice": [10.0, 99.0, 20.0, 30.0, 99.0, 5.0],
        }
    )
    nation = pd.DataFrame(
        {"n_nationkey": [0, 1, 2], "n_name": ["A", "B", "C"]}
    )
    pq.write_table(pa.Table.from_pandas(cust), d / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), d / "orders.parquet")
    pq.write_table(pa.Table.from_pandas(nation), d / "nation.parquet")

    bcast = adaptive_join_rollup(str(d), bcast_threshold_bytes=1 << 62)
    shuffle = adaptive_join_rollup(str(d), bcast_threshold_bytes=0)
    pd.testing.assert_frame_equal(bcast, shuffle)
    assert int(bcast.n_orders.sum()) == 4  # the two orphan orders dropped
    assert int(bcast.revenue_cents.sum()) == 6500


def test_ivm_delta_agg_matches_recompute_and_retracts(ray_session, tmp_path):
    """Engine (base-view + signed delta merge) == single-process recompute
    over the final state; a group whose every member is retracted must
    vanish from the maintained view."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.joins import ivm_delta_agg

    # planted: status 'Z' year 1990 exists ONLY as base rows with key%9==0
    # (keys 9 and 18: %4!=0, %9==0) -> fully retracted -> group must vanish
    df = pd.DataFrame(
        {
            "o_orderkey": [9, 18, 1, 2, 4, 8, 36],
            "o_orderstatus": ["Z", "Z", "O", "O", "F", "F", "F"],
            "o_totalprice": [10.0, 20.0, 1.0, 2.0, 3.0, 4.0, 5.0],
            "o_orderdate": pd.to_datetime(
                ["1990-01-01", "1990-06-01", "1995-01-01", "1995-02-01",
                 "1996-01-01", "1996-02-01", "1996-03-01"]
            ),
        }
    )
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / "orders.parquet")
    out = ivm_delta_agg(str(tmp_path))
    assert "Z" not in set(out["o_orderstatus"])

    # recompute reference on the real sf0.001 corpus
    t = pq.read_table(f"{SF}/orders.parquet").to_pandas()
    k = t["o_orderkey"].to_numpy()
    final = t[(k % 4 == 0) | ((k % 4 != 0) & (k % 9 != 0))].copy()
    final["year"] = final["o_orderdate"].dt.year.astype("int64")
    final["revenue_cents"] = (
        np.sign(final["o_totalprice"]) * np.floor(np.abs(final["o_totalprice"]) * 100.0 + 0.5)
    ).astype("int64")
    ref = (
        final.groupby(["o_orderstatus", "year"], as_index=False)
        .agg(n_orders=("o_orderkey", "size"), revenue_cents=("revenue_cents", "sum"))
        .sort_values(["o_orderstatus", "year"])
        .reset_index(drop=True)
    )
    eng = ivm_delta_agg(SF)
    pd.testing.assert_frame_equal(
        eng, ref[["o_orderstatus", "year", "n_orders", "revenue_cents"]].astype(
            {"n_orders": "int64"}
        ),
    )
    # the delta genuinely both inserts and retracts on this corpus
    assert (k % 4 == 0).any() and ((k % 4 != 0) & (k % 9 == 0)).any()


def test_referential_integrity_audit_both_arms_live(ray_session):
    """Engine == pandas set reference; both failure arms are non-empty
    under the corruption model (the audit carries signal both ways) and
    a shifted key that still resolves is NOT flagged."""
    import numpy as np
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.joins import FK_CORRUPT_MOD, referential_integrity_audit

    li = _pq.read_table(
        f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_linenumber"]
    ).to_pandas()
    od = _pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey"]).to_pandas()
    corrupt = (li.l_orderkey * 7 + li.l_linenumber) % FK_CORRUPT_MOD == 0
    fk = np.where(corrupt, 2 * li.l_orderkey + 1, li.l_orderkey)
    fks = np.unique(fk)
    okeys = set(od.o_orderkey)
    orphans = np.array(sorted(k for k in fks if k not in okeys), dtype=np.int64)
    childless = np.array(sorted(set(od.o_orderkey) - set(fks)), dtype=np.int64)

    out = referential_integrity_audit(SF)
    assert out.loc[0, "n_orphan_keys"] == len(orphans)
    assert out.loc[0, "orphan_digest"] == int(((orphans * 31) % (1 << 31)).sum())
    assert out.loc[0, "n_childless_orders"] == len(childless)
    assert out.loc[0, "childless_digest"] == int(((childless * 31) % (1 << 31)).sum())
    assert len(orphans) > 0 and len(childless) > 0
    # some shifted keys DO resolve (the audit is a real anti join)
    shifted = np.unique(2 * li.l_orderkey[corrupt] + 1)
    assert any(k in okeys for k in shifted)
