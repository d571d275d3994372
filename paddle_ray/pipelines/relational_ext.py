"""Extended relational operators: semi/anti joins, join+conditional-agg,
broadcast flag join, HAVING, grouped quantiles, wordcount top-k.

Widens SURVEY.md §2.4/§2.5 coverage beyond the reference's single in-row
bbox join (`/root/reference/imageCaptioningExperiments/layout_captioning.py:236-265`)
with the join/aggregate family any production extraction pipeline needs
downstream (filtering crawl partitions by membership, percentile QA stats,
corpus token counts). Scale contracts:

- **semi/anti join**: coarse hash-partition cogroup — both sides tagged
  into a COMMON slim schema (part, key, payload..., side), one shuffle on
  `part`, then ONE vectorized membership test per partition via
  `groupby(part).map_groups`. Neither side is broadcast; the build side is
  locally pre-deduplicated per batch so the shuffle moves distinct keys,
  not raw rows.
- **join + conditional agg** (q12 shape): the native shuffle hash join
  (`Dataset.join`) followed by partial conditional aggregation.
- **broadcast flag join** (q14 shape): the small side collapses to
  (sorted key array, flag array) in the object store — `ray.put` once,
  `np.searchsorted` probe per batch. Valid while the small side fits a
  worker heap (~10^7 keys); beyond that, switch to the shuffle join.
- **HAVING** (q18 shape): partial per-batch pre-aggregation, small global
  groupby, then the qualifying key set (tiny by construction) broadcast
  back to filter the fact tables.
- **grouped quantiles**: `groupby(lang).map_groups` with vectorized
  np.quantile per group (linear interpolation == DuckDB quantile_cont).
- **wordcount top-k**: per-batch Counter partials (C-speed regex findall),
  shuffle carries one row per distinct token per block.

Column names match the paired oracle SQL exactly.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray


from .common import read_table as _read


N_COGROUP_PARTS = 64


def _part_of(key_np: np.ndarray) -> pa.Array:
    # splitmix64-hashed (not raw modulo): stride-allocated keys must not
    # collapse into one partition
    from ..functions.hashes import splitmix64

    h = splitmix64(key_np.astype(np.uint64))
    return pa.array((h % np.uint64(N_COGROUP_PARTS)).astype(np.int32), pa.int32())


# --------------------------------------------------------------------------
# q4 shape: EXISTS semi join — orders with >=1 returned lineitem, by priority
# --------------------------------------------------------------------------

def q4_semi_order_priority(sf_dir: str) -> pd.DataFrame:
    """Orders placed in 1996 with at least one returned ('R') lineitem,
    counted per o_orderpriority. Distributed semi join: no broadcast —
    probe side (orders) and build side (distinct qualifying orderkeys) are
    hash-cogrouped on the join key."""
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def tag_orders(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["o_orderdate"], lo), pc.less(batch["o_orderdate"], hi)
        )
        b = batch.filter(m)
        key = b["o_orderkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _part_of(key),
                "key": pc.cast(b["o_orderkey"], pa.int64()),
                "o_orderpriority": b["o_orderpriority"],
                "side": pa.array(np.zeros(len(key), np.int8), pa.int8()),
            }
        )

    def tag_lineitem(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        # local distinct: the shuffle moves unique keys per block, not rows
        keys = pc.unique(b["l_orderkey"])
        key = keys.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _part_of(key),
                "key": pc.cast(keys, pa.int64()),
                "o_orderpriority": pa.nulls(len(key), pa.string()),
                "side": pa.array(np.ones(len(key), np.int8), pa.int8()),
            }
        )

    both = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(tag_orders, batch_format="pyarrow", batch_size=None)
        .union(
            _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"]).map_batches(
                tag_lineitem, batch_format="pyarrow", batch_size=None
            )
        )
    )

    def semi_part(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g.side == 0]
        build = g.loc[g.side == 1, "key"]
        hit = probe[probe.key.isin(set(build))]
        return hit.groupby("o_orderpriority", as_index=False).agg(n_orders=("key", "size"))

    out = (
        both.groupby("part")
        .map_groups(semi_part, batch_format="pandas")
        .to_pandas()
        .groupby("o_orderpriority", as_index=False)
        .agg(n_orders=("n_orders", "sum"))
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return out.astype({"n_orders": "int64"})


Q4_SEMI_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q22 shape: NOT EXISTS anti join — customers with no early orders
# --------------------------------------------------------------------------

def anti_customers_no_early_orders(sf_dir: str) -> pd.DataFrame:
    """Customers with NO order before 1995-07-01, aggregated per market
    segment. Same cogroup dataflow as the semi join, inverted membership."""
    cutoff = pa.scalar(pd.Timestamp("1995-07-01"), pa.timestamp("us"))

    def tag_customer(batch: pa.Table) -> pa.Table:
        key = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _part_of(key),
                "key": pc.cast(batch["c_custkey"], pa.int64()),
                "c_mktsegment": batch["c_mktsegment"],
                "c_acctbal": pc.cast(batch["c_acctbal"], pa.float64()),
                "side": pa.array(np.zeros(len(key), np.int8), pa.int8()),
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.less(batch["o_orderdate"], cutoff))
        keys = pc.unique(b["o_custkey"])
        key = keys.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _part_of(key),
                "key": pc.cast(keys, pa.int64()),
                "c_mktsegment": pa.nulls(len(key), pa.string()),
                "c_acctbal": pa.nulls(len(key), pa.float64()),
                "side": pa.array(np.ones(len(key), np.int8), pa.int8()),
            }
        )

    both = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment", "c_acctbal"])
        .map_batches(tag_customer, batch_format="pyarrow", batch_size=None)
        .union(
            _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"]).map_batches(
                tag_orders, batch_format="pyarrow", batch_size=None
            )
        )
    )

    def anti_part(g: pd.DataFrame) -> pd.DataFrame:
        probe = g[g.side == 0]
        build = set(g.loc[g.side == 1, "key"])
        miss = probe[~probe.key.isin(build)]
        return miss.groupby("c_mktsegment", as_index=False).agg(
            n_custs=("key", "size"), sum_acctbal=("c_acctbal", "sum")
        )

    out = (
        both.groupby("part")
        .map_groups(anti_part, batch_format="pandas")
        .to_pandas()
        .groupby("c_mktsegment", as_index=False)
        .agg(n_custs=("n_custs", "sum"), sum_acctbal=("sum_acctbal", "sum"))
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    out["sum_acctbal"] = out.sum_acctbal.round(4)
    return out.astype({"n_custs": "int64"})


ANTI_CUSTOMERS_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_custs, ROUND(SUM(c_acctbal), 4) AS sum_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate < TIMESTAMP '1995-07-01')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


# --------------------------------------------------------------------------
# q12 shape: native shuffle join + conditional aggregate
# --------------------------------------------------------------------------

def q12_priority_by_returnflag(sf_dir: str) -> pd.DataFrame:
    """1996-shipped lineitems joined to their order's priority via the
    native `Dataset.join`, then high/low-priority counts per returnflag."""
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def filt(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo), pc.less(batch["l_shipdate"], hi)
        )
        return batch.filter(m).select(["l_orderkey", "l_returnflag"])

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag", "l_shipdate"]).map_batches(
        filt, batch_format="pyarrow", batch_size=None
    )
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    # aggregator-pool sizing: see q10 note (paddle_ray/pipelines/joins.py)
    joined = li.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    def partial(batch: pa.Table) -> pa.Table:
        is_high = pc.is_in(batch["o_orderpriority"], value_set=pa.array(["1-URGENT", "2-HIGH"]))
        t = pa.table(
            {
                "l_returnflag": batch["l_returnflag"],
                "high_count": pc.cast(is_high, pa.int64()),
                "low_count": pc.cast(pc.invert(is_high), pa.int64()),
            }
        )
        g = t.group_by("l_returnflag").aggregate([("high_count", "sum"), ("low_count", "sum")])
        return g.rename_columns([c.removesuffix("_sum") for c in g.column_names])

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(Sum("high_count", alias_name="high_count"), Sum("low_count", alias_name="low_count"))
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    return out.astype({"high_count": "int64", "low_count": "int64"})


Q12_SQL = """
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01' AND l.l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l.l_returnflag ORDER BY l.l_returnflag
"""


# --------------------------------------------------------------------------
# q14 shape: broadcast flag join -> single scalar (promo revenue share)
# --------------------------------------------------------------------------

def q14_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """Share of July-1996 revenue from PROMO parts. part collapses to a
    (sorted p_partkey, is_promo) pair of arrays broadcast via ray.put."""
    part = _read(sf_dir, "part", columns=["p_partkey", "p_type"]).to_pandas()
    order = np.argsort(part.p_partkey.to_numpy())
    keys = part.p_partkey.to_numpy()[order]
    promo = part.p_type.str.startswith("PROMO").to_numpy()[order]
    lookup_ref = ray.put((keys, promo))

    lo = pa.scalar(pd.Timestamp("1996-07-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1996-08-01"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        keys_, promo_ = ray.get(lookup_ref)
        m = pc.and_(
            pc.greater_equal(batch["l_shipdate"], lo), pc.less(batch["l_shipdate"], hi)
        )
        b = batch.filter(m)
        rev = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        ).to_numpy(zero_copy_only=False)
        pk = b["l_partkey"].to_numpy(zero_copy_only=False)
        # guarded probe: searchsorted alone crashes/misclassifies on keys
        # absent from part; verify equality and keep inner-join semantics
        # (unmatched rows contribute to NEITHER promo nor total). An empty
        # build side means nothing matches (clip-to--1 indexed an empty
        # array before)
        if len(keys_) == 0:
            matched = np.zeros(len(pk), dtype=bool)
            is_promo = matched
        else:
            idx = np.clip(np.searchsorted(keys_, pk), 0, len(keys_) - 1)
            matched = keys_[idx] == pk
            is_promo = promo_[idx] & matched
        return pa.table(
            {
                "promo": pa.array([float(rev[is_promo].sum())], pa.float64()),
                "total": pa.array([float(rev[matched].sum())], pa.float64()),
            }
        )

    df = (
        _read(sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    pct = 100.0 * df.promo.sum() / df.total.sum()
    return pd.DataFrame({"promo_pct": [round(float(pct), 6)]})


Q14_SQL = """
SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                              THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END)
             / SUM(l.l_extendedprice * (1 - l.l_discount)), 6) AS promo_pct
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1996-07-01' AND l.l_shipdate < TIMESTAMP '1996-08-01'
"""


# --------------------------------------------------------------------------
# q18 shape: HAVING + broadcast-back join of the (tiny) qualifying key set
# --------------------------------------------------------------------------

Q18_MIN_QTY = 200.0
Q18_LIMIT = 50


def q18_large_orders(sf_dir: str) -> pd.DataFrame:
    """Orders whose total lineitem quantity exceeds Q18_MIN_QTY, with
    customer name and order total, top-N by totalprice. The HAVING result
    is tiny by construction, so it broadcasts back to filter orders, and
    the qualifying custkeys broadcast to filter customer — the big tables
    never shuffle."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(["l_orderkey", "l_quantity"])
        g = t.group_by("l_orderkey").aggregate([("l_quantity", "sum")])
        # rename by NAME — positional renaming silently swaps key/sum if
        # pyarrow's group_by column order changes across versions
        return g.rename_columns(
            ["total_qty" if c == "l_quantity_sum" else c for c in g.column_names]
        )

    from ray.data.aggregate import Sum

    qty = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_orderkey")
        .aggregate(Sum("total_qty", alias_name="total_qty"))
        .to_pandas()
    )
    qty = qty[qty.total_qty > Q18_MIN_QTY]  # HAVING
    keys_ref = ray.put(pa.array(np.sort(qty.l_orderkey.to_numpy()), pa.int64()))

    def filter_orders(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["o_orderkey"], value_set=ray.get(keys_ref)))

    orders = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(filter_orders, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    ck_ref = ray.put(pa.array(np.sort(orders.o_custkey.unique()), pa.int64()))

    def filter_cust(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["c_custkey"], value_set=ray.get(ck_ref)))

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(filter_cust, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )

    out = orders.merge(qty, left_on="o_orderkey", right_on="l_orderkey").merge(
        cust, left_on="o_custkey", right_on="c_custkey"
    )
    out["total_qty"] = out.total_qty.round(4)
    out = out.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True]).head(Q18_LIMIT)
    return out[["c_name", "o_custkey", "o_orderkey", "o_totalprice", "total_qty"]].reset_index(
        drop=True
    )


Q18_SQL = f"""
SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_totalprice,
       ROUND(SUM(l.l_quantity), 4) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c.c_name, o.o_custkey, o.o_orderkey, o.o_totalprice
HAVING SUM(l.l_quantity) > {Q18_MIN_QTY}
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT {Q18_LIMIT}
"""


# --------------------------------------------------------------------------
# grouped quantiles: per-lang median / p90 doc length
# --------------------------------------------------------------------------

def lang_quantile_chars(sf_dir: str) -> pd.DataFrame:
    """Per-lang n_chars median and p90 via groupby(lang).map_groups —
    vectorized np.quantile (linear interpolation) per group; groups are
    lang-cardinality (small), rows within a group can be millions and stay
    columnar."""

    def quant(g: pd.DataFrame) -> pd.DataFrame:
        x = g.n_chars.to_numpy(dtype=np.float64)
        return pd.DataFrame(
            {
                "lang": [g.lang.iloc[0]],
                "n_docs": [np.int64(len(x))],
                "median_chars": [round(float(np.quantile(x, 0.5)), 4)],
                "p90_chars": [round(float(np.quantile(x, 0.9)), 4)],
            }
        )

    out = (
        _read(sf_dir, "documents", columns=["lang", "n_chars"])
        .groupby("lang")
        .map_groups(quant, batch_format="pandas")
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64"})


LANG_QUANTILE_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       ROUND(quantile_cont(n_chars, 0.5), 4) AS median_chars,
       ROUND(quantile_cont(n_chars, 0.9), 4) AS p90_chars
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# wordcount top-k over documents.text
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[a-z0-9]+")
WORD_TOPK = 25


def word_topk(sf_dir: str) -> pd.DataFrame:
    """Top-25 tokens across the corpus: per-batch Counter partials (regex
    findall is C-speed), shuffle moves one row per distinct token per
    block, global Sum, sort+limit."""

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in pc.utf8_lower(batch["text"]).to_pylist():
            if s:  # NULL text rows contribute no tokens (== oracle unnest)
                c.update(_TOKEN_RE.findall(s))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = out.sort_values(["n", "token"], ascending=[False, True]).head(WORD_TOPK)
    return out.reset_index(drop=True).astype({"n": "int64"})


WORD_TOPK_SQL = f"""
SELECT token, CAST(COUNT(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT {WORD_TOPK}
"""


# cutoffs sized INSIDE the synthetic corpus's 31-type vocabulary so the
# curve genuinely discriminates (production uses 1e4..1e5; a cutoff past
# the vocab saturates at 1.0 and oracles nothing)
VOCAB_CUTOFFS = (5, 15, 30)


def vocab_coverage_curve(sf_dir: str) -> pd.DataFrame:
    """Vocabulary coverage curve: for each candidate vocab size k, the
    fraction of corpus TOKEN OCCURRENCES covered by the k most frequent
    types (ties: count desc, token asc on both sides) — the planning
    table a tokenizer build reads before choosing its vocab budget
    (bpe_train picks merges; this says what any top-k vocab buys), and
    the Zipf-curve summary every corpus card reports.

    Scale: word_topk's exchange (one (token, n) row per distinct token
    per block -> token-typed groupby). The cumulative walk needs only
    the max(VOCAB_CUTOFFS) most frequent types, and the global top-K is
    a subset of the union of per-block top-Ks (blocks hold DISTINCT
    types post-groupby), so the driver merges #blocks x K candidate
    rows — never the type table (round 5: this replaces the old 50M-row
    loud-capped driver collect; the type table now never leaves the
    cluster at ANY vocabulary size). total/n_types are distributed
    scalars. Exact integers + one final round-6 division per row."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for s in pc.utf8_lower(batch["text"]).to_pylist():
            if s:
                c.update(_TOKEN_RE.findall(s))
        return pa.table(
            {
                "token": pa.array(list(c.keys()), pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            }
        )

    counts_ds = (
        _read(sf_dir, "documents", columns=["text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()  # three consumers: stats, top-K candidates
    )
    stats = counts_ds.aggregate(Count(), Sum("n", alias_name="total"))
    n_types, total = int(stats["count()"]), int(stats["total"] or 0)
    K = max(VOCAB_CUTOFFS)

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas().sort_values(["n", "token"], ascending=[False, True])
        return pa.Table.from_pandas(df.head(K), preserve_index=False)

    counts = (
        counts_ds.map_batches(local_topk, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["n", "token"], ascending=[False, True])
        .head(K)
        .reset_index(drop=True)
    )
    cum = counts["n"].cumsum().to_numpy()
    rows = []
    for k in VOCAB_CUTOFFS:
        covered = int(cum[min(k, n_types) - 1]) if n_types else 0
        rows.append(
            {
                "k": k,
                "n_types": n_types,
                "covered_tokens": covered,
                "total_tokens": total,
                "coverage": round(covered / total, 6) if total else 0.0,
            }
        )
    return pd.DataFrame(rows).astype(
        {"k": "int64", "n_types": "int64", "covered_tokens": "int64", "total_tokens": "int64"}
    )


def vocab_coverage_sql() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT {k} AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM counts) AS n_types,
       (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM ranked WHERE rk <= {k}) AS covered_tokens,
       (SELECT CAST(SUM(n) AS BIGINT) FROM counts) AS total_tokens,
       ROUND((SELECT CAST(COALESCE(SUM(n), 0) AS DOUBLE) FROM ranked WHERE rk <= {k})
             / (SELECT CAST(SUM(n) AS DOUBLE) FROM counts), 6) AS coverage"""
        for k in VOCAB_CUTOFFS
    )
    return f"""
WITH counts AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token FROM documents)
  GROUP BY token
),
ranked AS (
  SELECT n, row_number() OVER (ORDER BY n DESC, token ASC) AS rk FROM counts
)
{arms}
ORDER BY k
"""


PHRASE_W1, PHRASE_W2 = "hash", "join"
_PHRASE_POS_BITS = 20  # positions fit 20 bits (docs are ~100 tokens)


def phrase_search(sf_dir: str) -> pd.DataFrame:
    """Positional phrase search: exact-adjacency match of the two-word
    phrase '{w1} {w2}' via a POSITIONAL postings join — the IR operator
    inverted_index (doc-level df) cannot answer, because phrases need
    positions ("hash join" != "join ... hash"). The classic positional-
    index evaluation: postings(w1) shifted by +1 equi-join
    postings(w2).

    Scale contract: postings are materialized ONLY for the two query
    terms (the filter runs inside tokenization — at 100 TB you never
    build the full positional index to answer one phrase); each posting
    is ONE packed int64 (doc_id << 20 | position), so the adjacency
    join is a slim native int-key hash join (shift = +1 on the packed
    key, valid because a position never crosses the 20-bit boundary —
    asserted loudly). Output: matched-doc count, total occurrences and
    an exact matched-doc digest."""
    from ray.data.aggregate import Sum

    def postings(which: str, shift: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = []
            for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
                if not t:
                    continue
                toks = _TOKEN_RE.findall(t.lower())
                assert len(toks) < (1 << _PHRASE_POS_BITS), "position overflows pack"
                base = d << _PHRASE_POS_BITS
                keys.extend(base + i + shift for i, w in enumerate(toks) if w == which)
            return pa.table({"k": pa.array(keys, pa.int64())})

        return fn

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    left = docs.map_batches(postings(PHRASE_W1, 1), batch_format="pyarrow", batch_size=None)
    right = docs.map_batches(postings(PHRASE_W2, 0), batch_format="pyarrow", batch_size=None)
    hits = left.join(right, join_type="inner", num_partitions=8, on=("k",))

    def fold(batch: pa.Table) -> pa.Table:
        k = batch["k"].to_numpy()
        doc = k >> _PHRASE_POS_BITS
        u = np.unique(doc)
        return pa.table(
            {
                "n_occurrences": pa.array([len(k)], pa.int64()),
                # per-block doc sets may overlap across blocks; ship the
                # distinct docs per block and re-distinct in the final fold
                "docs": pa.array([u.tolist()]),
            }
        )

    parts = hits.map_batches(fold, batch_format="pyarrow", batch_size=None).to_pandas()
    if parts.empty:
        all_docs = np.array([], dtype=np.int64)
        n_occ = 0
    else:
        all_docs = np.unique(np.concatenate([np.array(d, dtype=np.int64) for d in parts["docs"]]))
        n_occ = int(parts["n_occurrences"].sum())
    return pd.DataFrame(
        {
            "n_docs_matched": pd.Series([len(all_docs)], dtype="int64"),
            "n_occurrences": pd.Series([n_occ], dtype="int64"),
            "doc_digest": pd.Series(
                [int(((all_docs * 13) % (1 << 31)).sum())], dtype="int64"
            ),
        }
    )


PHRASE_SEARCH_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
),
pos AS (
  SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS tok FROM t
),
hits AS (
  SELECT a.doc_id
  FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.i = a.i + 1
  WHERE a.tok = '{PHRASE_W1}' AND b.tok = '{PHRASE_W2}'
)
SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_matched,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences,
       CAST(COALESCE((SELECT SUM((d * 13) % 2147483648)
                      FROM (SELECT DISTINCT doc_id AS d FROM hits)), 0) AS BIGINT)
         AS doc_digest
FROM hits
"""
