"""Relational operator pipelines over the testdata star schema.

Demonstrates the engine's general query capability Ray-Data-first:
- column pruning at the read (`read_parquet(columns=...)`),
- vectorized pyarrow.compute batch kernels,
- **partial pre-aggregation inside map_batches before every groupby** (the
  shuffle then moves one row per key per block, not the raw table),
- **broadcast hash joins** for small dimension sides (`ray.put` once, read
  per task) instead of all-to-all shuffle joins,
- sort + limit for top-k.

Each function takes sf_dir and returns a Dataset/DataFrame; all are
registered in __ray_entry__.queries() with DuckDB oracles. Column names
match the oracle SQL exactly.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


from .common import read_table as _read


# --------------------------------------------------------------------------
# q1: pricing summary (TPC-H Q1 shape) — partial agg then tiny groupby
# --------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    ds = _read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag",
            "l_linestatus",
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_shipdate",
        ],
    )

    cutoff = pa.scalar(pd.Timestamp("1998-09-02"), pa.timestamp("us"))
    _RENAME = {
        "l_quantity_sum": "sum_qty",
        "l_extendedprice_sum": "sum_base_price",
        "disc_price_sum": "sum_disc_price",
        "l_quantity_count": "count_order",
    }

    def partial(batch: pa.Table) -> pa.Table:
        # pure pyarrow C++ kernels end-to-end: filter -> project -> hash agg
        batch = batch.filter(pc.less_equal(batch["l_shipdate"], cutoff))
        disc_price = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "l_linestatus": batch["l_linestatus"],
                "l_quantity": batch["l_quantity"],
                "l_extendedprice": batch["l_extendedprice"],
                "disc_price": disc_price,
            }
        )
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("l_quantity", "sum"),
                ("l_extendedprice", "sum"),
                ("disc_price", "sum"),
                ("l_quantity", "count"),
            ]
        )
        return g.rename_columns([_RENAME.get(c, c) for c in g.column_names])

    # batch_size=None => one partial per block, not 1024-row micro-batches
    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
    from ray.data.aggregate import Sum

    out = (
        partials.groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_price", alias_name="sum_base_price"),
            Sum("sum_disc_price", alias_name="sum_disc_price"),
            Sum("count_order", alias_name="count_order"),
        )
        .to_pandas()
    )
    out = out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)
    out["avg_qty"] = (out.sum_qty / out.count_order).round(6)
    out["avg_price"] = (out.sum_base_price / out.count_order).round(6)
    out["sum_qty"] = out.sum_qty.round(4)
    out["sum_base_price"] = out.sum_base_price.round(4)
    out["sum_disc_price"] = out.sum_disc_price.round(4)
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4)                          AS sum_qty,
       ROUND(SUM(l_extendedprice), 4)                     AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)  AS sum_disc_price,
       COUNT(*)                                           AS count_order,
       ROUND(SUM(l_quantity) / COUNT(*), 6)               AS avg_qty,
       ROUND(SUM(l_extendedprice) / COUNT(*), 6)          AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3: revenue top-10 orders — broadcast dim join + partial agg + top-k
# --------------------------------------------------------------------------

def q3_top_orders(sf_dir: str) -> pd.DataFrame:
    # small sides: customer (segment filter), orders -> broadcast to lineitem
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    keep_cust = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]).to_pandas()
    orders = orders[orders.o_custkey.isin(keep_cust)]
    odate = dict(zip(orders.o_orderkey, orders.o_orderdate))
    # broadcast just the key set as an Arrow array (ray.put once, zero-copy
    # reads per task) — not a Python dict, which would unpickle per worker
    keep_keys_ref = ray.put(pa.array(sorted(odate), pa.int64()))

    def partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(keep_keys_ref)
        batch = batch.filter(pc.is_in(batch["l_orderkey"], value_set=keys))
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        )
        t = pa.table({"l_orderkey": batch["l_orderkey"], "revenue": revenue})
        g = t.group_by("l_orderkey").aggregate([("revenue", "sum")])
        return g.rename_columns(["revenue" if c == "revenue_sum" else c for c in g.column_names])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
    from ray.data.aggregate import Sum

    agg = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
    )
    agg["o_orderdate"] = agg.l_orderkey.map(odate)
    agg["revenue"] = agg.revenue.round(4)
    out = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return out[["l_orderkey", "revenue", "o_orderdate"]].reset_index(drop=True)


Q3_SQL = """
SELECT l.l_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, l.l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5-shape: revenue by nation via chained broadcast joins
# --------------------------------------------------------------------------

def q5_nation_revenue(sf_dir: str) -> pd.DataFrame:
    import numpy as np

    nation = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"]).to_pandas()
    supplier = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    n2name = dict(zip(nation.n_nationkey, nation.n_name))
    # broadcast a vectorized lookup: sorted supplier keys + their nation name
    sup_keys = np.sort(supplier.s_suppkey.to_numpy())
    order = np.argsort(supplier.s_suppkey.to_numpy())
    sup_names = supplier.s_nationkey.map(n2name).to_numpy()[order]
    lookup_ref = ray.put((sup_keys, sup_names))

    def partial(batch: pa.Table) -> pa.Table:
        sup_keys_, sup_names_ = ray.get(lookup_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False)
        # guarded probe (inner-join semantics): unmatched suppkeys would
        # crash (key > max) or silently credit the wrong nation
        idx = np.clip(np.searchsorted(sup_keys_, sk), 0, len(sup_keys_) - 1)
        matched = sup_keys_[idx] == sk
        revenue = pc.multiply(
            batch["l_extendedprice"], pc.subtract(pa.scalar(1.0), batch["l_discount"])
        ).to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "n_name": pa.array(sup_names_[idx[matched]], pa.string()),
                "revenue": pa.array(revenue[matched], pa.float64()),
            }
        )
        g = t.group_by("n_name").aggregate([("revenue", "sum")])
        return g.rename_columns(["revenue" if c == "revenue_sum" else c for c in g.column_names])

    li = _read(sf_dir, "lineitem", columns=["l_suppkey", "l_extendedprice", "l_discount"])
    from ray.data.aggregate import Sum

    out = (
        li.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("n_name")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    out["revenue"] = out.revenue.round(4)
    return out


Q5_SQL = """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY n.n_name
"""


# --------------------------------------------------------------------------
# simple shapes: groupby-count, sort+limit, filter+project
# --------------------------------------------------------------------------

def orders_by_status(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])
    out = (
        ds.groupby("o_orderstatus")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total"))
        .to_pandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    out["total"] = out.total.round(4)
    return out


ORDERS_BY_STATUS_SQL = """
SELECT o_orderstatus, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS total
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def top_parts_by_retail(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "part", columns=["p_partkey", "p_name", "p_retailprice"])
    return (
        ds.sort(["p_retailprice", "p_partkey"], descending=[True, False])
        .limit(15)
        .to_pandas()
    )


TOP_PARTS_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part ORDER BY p_retailprice DESC, p_partkey LIMIT 15
"""


def filter_project_documents(sf_dir: str) -> pd.DataFrame:
    """Predicate pushed into the parquet read (row-group pruning +
    fragment-level filtering) — only matching rows ever leave storage."""
    import pyarrow.dataset as pads

    expr = (pads.field("lang") == "en") & (pads.field("n_chars") > 300)
    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"], filter=expr
    )
    return ds.sort("doc_id").to_pandas()


FILTER_PROJECT_SQL = """
SELECT doc_id, lang, n_chars FROM documents
WHERE lang = 'en' AND n_chars > 300 ORDER BY doc_id
"""
