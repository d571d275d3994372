"""Edge tests for the native left-outer / left-anti shapes (q13/q16/q22)
with planted inputs the SQL oracle gate can't isolate."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from paddle_ray.pipelines import relational_more

SF = "/root/testdata/sf0.001"


def _write(tmp_path, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp_path / f"{name}.parquet")


def test_q13_zero_order_customers_counted(tmp_path):
    _write(
        tmp_path,
        "customer",
        pd.DataFrame({"c_custkey": [1, 2, 3], "c_name": "x", "c_nationkey": 0,
                      "c_acctbal": 0.0, "c_mktsegment": "s"}),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [10, 11, 12],
                "o_custkey": [1, 1, 2],
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("1996-01-01"),
                # customer 2's only order is URGENT -> excluded -> c_count 0
                "o_orderpriority": ["2-HIGH", "2-HIGH", "1-URGENT"],
            }
        ),
    )
    out = relational_more.q13_customer_distribution(str(tmp_path)).set_index("c_count")
    # customers 2 and 3 both have zero qualifying orders; customer 1 has 2
    assert out.loc[0, "custdist"] == 2
    assert out.loc[2, "custdist"] == 1


def test_q22_anti_join_drops_urgent_customers(tmp_path):
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": [1, 2, 3, 4],
                "c_name": "x",
                "c_nationkey": [7, 7, 8, 8],
                # avg positive balance = 400; only 500-balance rows qualify
                "c_acctbal": [500.0, 500.0, 500.0, 100.0],
                "c_mktsegment": "s",
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [10, 11],
                "o_custkey": [1, 3],
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("1996-01-01"),
                "o_orderpriority": ["1-URGENT", "5-LOW"],
            }
        ),
    )
    out = relational_more.q22_sales_opportunity(str(tmp_path))
    # cust 1 dropped (urgent), cust 4 dropped (below avg); 2 and 3 survive
    assert list(out.c_nationkey) == [7, 8]
    assert list(out.numcust) == [1, 1]


def test_q22_empty_anti_side(tmp_path):
    """No urgent orders at all: the anti side is legitimately empty and
    the sentinel guard must keep the native join from crashing."""
    _write(
        tmp_path,
        "customer",
        pd.DataFrame(
            {
                "c_custkey": [1, 2],
                "c_name": "x",
                "c_nationkey": [3, 3],
                "c_acctbal": [500.0, 100.0],
                "c_mktsegment": "s",
            }
        ),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [10],
                "o_custkey": [1],
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("1996-01-01"),
                "o_orderpriority": ["5-LOW"],
            }
        ),
    )
    out = relational_more.q22_sales_opportunity(str(tmp_path))
    # avg positive = 300 -> only cust 1 is rich; no urgent orders drop it
    assert list(out.c_nationkey) == [3]
    assert list(out.numcust) == [1]
    assert list(out.totacctbal) == [500.0]


def test_q16_distinct_suppliers_full_sf():
    out = relational_more.q16_supplier_cnt(SF)
    assert len(out) > 0
    assert (out.supplier_cnt >= 1).all()
    # survivors respect the predicate gates
    assert (out.p_brand != "Brand#1").all()
    assert (~out.p_type.str.startswith("SMALL")).all()
    assert out.p_size.between(1, 8).all()


def test_rollup_levels_consistent():
    """Subtotals and grand total must equal the sums of the detail rows."""
    out = relational_more.orders_rollup(SF)
    detail = out[(out.o_orderstatus != "ALL") & (out.o_orderpriority != "ALL")]
    subs = out[(out.o_orderstatus != "ALL") & (out.o_orderpriority == "ALL")]
    grand = out[(out.o_orderstatus == "ALL")]
    assert len(grand) == 1
    assert grand.n_orders.iloc[0] == detail.n_orders.sum()
    assert abs(grand.total.iloc[0] - round(detail.total.sum(), 4)) < 1e-9
    for _, s in subs.iterrows():
        d = detail[detail.o_orderstatus == s.o_orderstatus]
        assert s.n_orders == d.n_orders.sum()


def test_lang_modal_source_tie_break(tmp_path):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": "x",
            "lang": ["en"] * 4,
            # srcA and srcB tie at 2 -> lexicographically smaller srcA wins
            "source": ["srcB", "srcA", "srcB", "srcA"],
            "n_chars": 1,
        }
    )
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), tmp_path / "documents.parquet")
    out = relational_more.lang_modal_source(str(tmp_path))
    assert list(out.modal_source) == ["srcA"]
    assert list(out.n_docs) == [2]


def test_q13_hot_key_skew_correct(tmp_path):
    """One customer owning half of all orders (hot join key) must not
    corrupt the native left-outer join's counts."""
    import duckdb
    import numpy as np

    rng = np.random.default_rng(5)
    n_orders = 4000
    hot = np.full(n_orders // 2, 1)
    cold = rng.integers(2, 200, size=n_orders // 2)
    cust_ids = np.concatenate([hot, cold])
    _write(
        tmp_path,
        "customer",
        pd.DataFrame({"c_custkey": range(1, 201), "c_name": "x", "c_nationkey": 0,
                      "c_acctbal": 0.0, "c_mktsegment": "s"}),
    )
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": range(n_orders),
                "o_custkey": cust_ids,
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.Timestamp("1996-01-01"),
                "o_orderpriority": "5-LOW",
            }
        ),
    )
    out = relational_more.q13_customer_distribution(str(tmp_path))
    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{tmp_path}/{t}.parquet')")
    ora = con.sql(relational_more.Q13_SQL).df()
    pd.testing.assert_frame_equal(
        out.reset_index(drop=True), ora.astype({"c_count": "int64", "custdist": "int64"})
    )
    # the hot key's bucket (2000 orders) must appear
    assert (out.c_count == n_orders // 2).any()


def test_year_reconcile_outer_rows(tmp_path):
    """Years present on only one side must survive the full outer join
    with 0 on the missing side."""
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": [1, 2],
                "o_custkey": 1,
                "o_orderstatus": "O",
                "o_totalprice": 1.0,
                "o_orderdate": pd.to_datetime(["1995-06-01", "1995-07-01"]),
                "o_orderpriority": "5-LOW",
            }
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [1],
                "l_partkey": 1,
                "l_suppkey": 1,
                "l_linenumber": 1,
                "l_quantity": 1.0,
                "l_extendedprice": 1.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.to_datetime(["1997-01-15"]),
            }
        ),
    )
    out = relational_more.year_reconcile(str(tmp_path)).set_index("yr")
    assert out.loc[1995].tolist() == [2, 0]  # orders-only year
    assert out.loc[1997].tolist() == [0, 1]  # shipments-only year


def test_year_reconcile_empty_side(tmp_path):
    """A zero-row (schema-bearing) orders side must yield shipment-only
    rows, not the schemaless-partition join crash (sentinel guard)."""
    _write(
        tmp_path,
        "orders",
        pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype="int64"),
                "o_custkey": pd.Series([], dtype="int64"),
                "o_orderstatus": pd.Series([], dtype="object"),
                "o_totalprice": pd.Series([], dtype="float64"),
                "o_orderdate": pd.Series([], dtype="datetime64[us]"),
                "o_orderpriority": pd.Series([], dtype="object"),
            }
        ),
    )
    _write(
        tmp_path,
        "lineitem",
        pd.DataFrame(
            {
                "l_orderkey": [1],
                "l_partkey": 1,
                "l_suppkey": 1,
                "l_linenumber": 1,
                "l_quantity": 1.0,
                "l_extendedprice": 1.0,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.to_datetime(["1997-01-15"]),
            }
        ),
    )
    out = relational_more.year_reconcile(str(tmp_path))
    assert list(out.yr) == [1997]
    assert list(out.n_orders) == [0]
    assert list(out.n_shipped) == [1]


def test_orders_cube_marginals_consistent(ray_session):
    """CUBE algebra: each one-dimension marginal and the grand total must
    equal the sum of the detail cells they cover (exact int cents via the
    rounded totals), and the row count is detail + |status| + |priority| + 1."""
    from paddle_ray.pipelines.relational_more import orders_cube

    out = orders_cube("/root/testdata/sf0.001")
    detail = out[(out.o_orderstatus != "ALL") & (out.o_orderpriority != "ALL")]
    by_status = out[(out.o_orderstatus != "ALL") & (out.o_orderpriority == "ALL")]
    by_priority = out[(out.o_orderstatus == "ALL") & (out.o_orderpriority != "ALL")]
    grand = out[(out.o_orderstatus == "ALL") & (out.o_orderpriority == "ALL")]
    assert len(grand) == 1
    assert len(out) == len(detail) + len(by_status) + len(by_priority) + 1
    assert by_status.n_orders.sum() == detail.n_orders.sum() == int(grand.n_orders.iloc[0])
    assert by_priority.n_orders.sum() == detail.n_orders.sum()
    for r in by_priority.itertuples():
        cells = detail[detail.o_orderpriority == r.o_orderpriority]
        assert round(cells.total.sum(), 4) == r.total


# --------------------------------------------------------------------------
# skyline_orders: the window-sup oracle restates dominance; this test
# brute-forces the NOT-EXISTS DEFINITION itself so the restatement is
# independently verified.
# --------------------------------------------------------------------------


def test_skyline_matches_bruteforce_definition():
    import numpy as np
    import pyarrow.compute as pc

    from paddle_ray.pipelines.common import to_cents

    t = pq.read_table(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice", "o_orderdate"])
    p = to_cents(t["o_totalprice"].to_numpy(zero_copy_only=False))
    d = pc.cast(t["o_orderdate"], pa.int64()).to_numpy()
    k = t["o_orderkey"].to_numpy(zero_copy_only=False)
    # dominance definition, O(n^2) via broadcasting
    dom = (p[None, :] >= p[:, None]) & (d[None, :] >= d[:, None]) & (
        (p[None, :] > p[:, None]) | (d[None, :] > d[:, None])
    )
    dominated = dom.any(axis=1)
    expect = sorted(int(x) for x in k[~dominated])

    out = relational_more.skyline_orders(SF)
    assert out["o_orderkey"].tolist() == expect
    assert len(expect) >= 2  # non-degenerate frontier

    # every non-skyline point is dominated by some SKYLINE point
    sp = out["price_cents"].to_numpy()
    sd = out["date_us"].to_numpy()
    for i in np.nonzero(dominated)[0][:200]:
        assert (((sp >= p[i]) & (sd >= d[i]) & ((sp > p[i]) | (sd > d[i])))).any()


def test_skyline_duplicate_points_all_survive(tmp_path):
    df = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_totalprice": [5.0, 5.0, 1.0],
            "o_orderdate": pd.Timestamp("1996-01-01"),
        }
    )
    _write(tmp_path, "orders", df)
    out = relational_more.skyline_orders(str(tmp_path))
    # identical maximal points (1,2) both survive; (3) is dominated
    assert out["o_orderkey"].tolist() == [1, 2]


def test_skyline_distributed_sweep_with_carry(ray_session, tmp_path):
    """The range-partitioned sweep-with-carry (the scale path the old
    loud cap only named) must be bit-identical to the driver merge on
    the real corpus (merge_cap=0 forces it), and must survive its own
    worst case: a fully ANTI-CORRELATED corpus (p + d monotone opposed)
    where every point is on the skyline — exactly the shape that blew
    the driver-merge cap — plus a carry-kill corpus where whole ranges
    are dominated by a single high-price-late-date point."""
    import pandas as pd

    sweep = relational_more.skyline_orders(SF, merge_cap=0)
    direct = relational_more.skyline_orders(SF)
    pd.testing.assert_frame_equal(sweep, direct)

    # anti-correlated: skyline == corpus, no point dominates any other
    n = 3000
    anti = pd.DataFrame(
        {
            "o_orderkey": range(n),
            "o_totalprice": [float(i + 1) for i in range(n)],
            "o_orderdate": pd.to_datetime("1995-01-01")
            + pd.to_timedelta([n - i for i in range(n)], unit="D"),
        }
    )
    _write(tmp_path, "orders", anti)
    out = relational_more.skyline_orders(str(tmp_path), merge_cap=0)
    assert out["o_orderkey"].tolist() == list(range(n))

    # carry-kill: one point with max price AND max date dominates all —
    # every lower range must be emptied purely by the carried max date
    kill = anti.copy()
    kill.loc[n - 1, "o_orderdate"] = pd.to_datetime("2010-01-01")  # > every anti date (max ~2003)
    _write(tmp_path, "orders", kill)
    out2 = relational_more.skyline_orders(str(tmp_path), merge_cap=0)
    assert out2["o_orderkey"].tolist() == [n - 1]
    pd.testing.assert_frame_equal(out2, relational_more.skyline_orders(str(tmp_path)))


def test_division_full_coverage_semantics(ray_session, tmp_path):
    """FOR-ALL semantics on a planted table: a customer missing ONE
    priority never qualifies; plus engine == pandas reference on the
    real corpus and the predicate genuinely discriminates."""
    import numpy as np
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.relational_more import division_full_coverage

    df = pd.DataFrame(
        {
            "o_orderkey": range(1, 8),
            "o_custkey": [1, 1, 1, 2, 2, 3, 3],
            "o_orderstatus": "O",
            "o_totalprice": 1.0,
            "o_orderdate": pd.Timestamp("1996-01-01"),
            # priorities observed: A, B, C. cust 1 covers all three;
            # cust 2 covers A,B; cust 3 covers A,A (dup must not help)
            "o_orderpriority": ["A", "B", "C", "A", "B", "A", "A"],
        }
    )
    _write(tmp_path, "orders", df)
    out = division_full_coverage(str(tmp_path))
    assert out.loc[0, "n_customers"] == 1
    assert out.loc[0, "n_priorities"] == 3
    assert out.loc[0, "cust_digest"] == (1 * 2654435761) % (1 << 31)

    t = _pq.read_table(
        "/root/testdata/sf0.001/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).to_pandas()
    n_p = t["o_orderpriority"].nunique()
    per = t.groupby("o_custkey")["o_orderpriority"].nunique()
    qual = per[per == n_p].index.to_numpy()
    real = division_full_coverage("/root/testdata/sf0.001")
    assert real.loc[0, "n_customers"] == len(qual)
    assert real.loc[0, "cust_digest"] == int(((qual * 2654435761) % (1 << 31)).sum())
    assert 0 < len(qual) < per.size  # non-vacuous: some qualify, some don't


def test_rfm_segments_ntile_contract(ray_session):
    """Engine == pandas NTILE replica (sizes rule + desc/custkey ties);
    the cube partitions all customers exactly; each tile dimension is
    balanced to the NTILE sizes rule."""
    import numpy as np
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.relational_more import RFM_TILES, rfm_segments

    od = _pq.read_table(
        "/root/testdata/sf0.001/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    od["day"] = od.o_orderdate.astype("datetime64[us]").astype("int64") // 86_400_000_000
    od["cents"] = (np.floor(np.abs(od.o_totalprice) * 100 + 0.5) * np.sign(od.o_totalprice)).astype("int64")
    cust = od.groupby("o_custkey").agg(
        recency_day=("day", "max"), n_orders=("day", "size"), cents=("cents", "sum")
    ).reset_index().rename(columns={"o_custkey": "c"})

    def ntile(df, col):
        order = df.sort_values([col, "c"], ascending=[False, True], kind="mergesort").index
        n = len(df)
        base, rem = divmod(n, RFM_TILES)
        tiles = np.repeat(np.arange(1, RFM_TILES + 1), [base + 1] * rem + [base] * (RFM_TILES - rem))
        out = np.empty(n, dtype=np.int64)
        out[df.index.get_indexer(order)] = tiles
        return out

    cust = cust.reset_index(drop=True)
    for col, sc in (("recency_day", "r"), ("n_orders", "f"), ("cents", "m")):
        cust[sc] = ntile(cust, col)
    ref = cust.groupby(["r", "f", "m"], as_index=False).agg(
        n_customers=("c", "size"), sum_cents=("cents", "sum")
    )
    out = rfm_segments("/root/testdata/sf0.001")
    m = out.merge(ref, on=["r", "f", "m"], suffixes=("", "_ref"))
    assert len(m) == len(out) == len(ref)
    assert (m.n_customers == m.n_customers_ref).all() and (m.sum_cents == m.sum_cents_ref).all()
    assert out["n_customers"].sum() == len(cust)
    # per-dimension balance
    n = len(cust)
    base, rem = divmod(n, RFM_TILES)
    expect = sorted([base + 1] * rem + [base] * (RFM_TILES - rem))
    for dim in ("r", "f", "m"):
        sizes = sorted(out.groupby(dim)["n_customers"].sum().tolist())
        assert sizes == expect
