"""Join / window / set-operator pipelines (operator-coverage widening).

The reference's only join is the in-row bbox equi-join (J1,
`/root/reference/imageCaptioningExperiments/layout_captioning.py:236-265`),
implemented in stages/caption.py. This module adds the general join family
a data-processing engine needs, each Ray-Data-first with an explicit
scale contract:

- **broadcast join** (small dim side `ray.put` once, probe in map_batches)
  — q10's customer-name attach, range-band join
- **native shuffle hash join** (`Dataset.join`) — q10's lineitem x orders
- **as-of join** (distributed: tag + union + cogroup by key, one vectorized
  `pd.merge_asof` per coarse partition) — events x orders
- **range join** (broadcast band edges + np.searchsorted) — part price bands
- **window function** (row_number per partition via coarse-partition
  map_groups + vectorized in-group rank) — top-3 orders per customer
- **distinct / union** set ops

Every function returns columns named exactly as its oracle SQL in
__ray_entry__.oracle_sql().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


from .common import read_table as _read


def _hash_part(key_np, n_parts: int):
    """splitmix64-hashed coarse partition id — raw modulo collapses ids
    allocated with a stride (e.g. multiples of 64) into one partition."""
    from ..functions.hashes import splitmix64

    h = splitmix64(key_np.astype(np.uint64))
    return pa.array((h % np.uint64(n_parts)).astype(np.int32), pa.int32())


# --------------------------------------------------------------------------
# q6: single-value filter aggregate (no shuffle at all — partials + driver sum)
# --------------------------------------------------------------------------

def q6_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    lo = pa.scalar(pd.Timestamp("1996-01-01"), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp("1997-01-01"), pa.timestamp("us"))

    def partial(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(batch["l_shipdate"], lo), pc.less(batch["l_shipdate"], hi)
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(batch["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(batch["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(batch["l_quantity"], pa.scalar(24.0)),
            ),
        )
        b = batch.filter(m)
        s = pc.sum(pc.multiply(b["l_extendedprice"], b["l_discount"]))
        return pa.table({"revenue": pa.array([s.as_py() or 0.0], pa.float64())})

    ds = _read(
        sf_dir, "lineitem", columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    )
    total = ds.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas().revenue.sum()
    return pd.DataFrame({"revenue": [round(float(total), 4)]})


Q6_SQL = """
SELECT ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q10 shape: native shuffle hash join (Dataset.join) + broadcast dim attach
# --------------------------------------------------------------------------

def q10_returned_revenue(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Revenue from returned lineitems per customer, top-k.

    lineitem(R) is pre-aggregated per orderkey (the shuffle then moves one
    row per order, not per lineitem), hash-joined with orders via the
    native `Dataset.join`, re-aggregated per customer. Top-k is a
    per-block partial top-k under the total order (revenue DESC, custkey
    ASC) merged on the driver (<= k rows per block — the per-customer
    aggregate itself never lands on the driver; at crawl scale that frame
    is 10^8 rows), and only the <= k winning customers' names are read
    back for the attach."""

    def partial(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch["l_returnflag"], pa.scalar("R")))
        revenue = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        t = pa.table({"l_orderkey": b["l_orderkey"], "revenue": revenue})
        g = t.group_by("l_orderkey").aggregate([("revenue", "sum")])
        return g.rename_columns(["revenue" if c == "revenue_sum" else c for c in g.column_names])

    li_agg = _read(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"]
    ).map_batches(partial, batch_format="pyarrow", batch_size=None)
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    # num_partitions sizes the join's aggregator actor pool; each aggregator
    # reserves CPUs, so it must stay well under the cluster CPU count or the
    # upstream map tasks starve (16 aggregators on a 32-cpu node ran 7x
    # slower than 8). On a real cluster: ~1-2 per node.
    joined = li_agg.join(
        orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    from ray.data.aggregate import Sum

    def topk_part(batch: pa.Table) -> pa.Table:
        # round BEFORE ranking so boundary ties match the rounded-value
        # order the final sort (and the SQL oracle) uses
        df = batch.to_pandas()
        df["revenue"] = df.revenue.round(4)
        if len(df) > k:
            df = df.sort_values(
                ["revenue", "o_custkey"], ascending=[False, True], kind="mergesort"
            ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = (
        joined.select_columns(["o_custkey", "revenue"])
        .groupby("o_custkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
        .map_batches(topk_part, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    top = cand.sort_values(["revenue", "o_custkey"], ascending=[False, True], kind="mergesort").head(k)
    keep = pa.array(sorted(top.o_custkey.astype("int64")), pa.int64())

    def name_rows(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(pc.cast(batch["c_custkey"], pa.int64()), value_set=keep))

    cust = (
        _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
        .map_batches(name_rows, batch_format="pyarrow")
        .to_pandas()
    )
    out = top.merge(cust, left_on="o_custkey", right_on="c_custkey", how="inner")
    out = out.sort_values(["revenue", "c_custkey"], ascending=[False, True], kind="mergesort")
    return out[["c_custkey", "c_name", "revenue"]].reset_index(drop=True)


Q10_SQL = """
SELECT c.c_custkey, c.c_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# conditional aggregate: priority matrix per order status
# --------------------------------------------------------------------------

def orders_priority_matrix(sf_dir: str) -> pd.DataFrame:
    def partial(batch: pa.Table) -> pa.Table:
        is_high = pc.is_in(
            batch["o_orderpriority"], value_set=pa.array(["1-URGENT", "2-HIGH"])
        )
        t = pa.table(
            {
                "o_orderstatus": batch["o_orderstatus"],
                "high_count": pc.cast(is_high, pa.int64()),
                "low_count": pc.cast(pc.invert(is_high), pa.int64()),
            }
        )
        g = t.group_by("o_orderstatus").aggregate([("high_count", "sum"), ("low_count", "sum")])
        return g.rename_columns(
            [c.removesuffix("_sum") for c in g.column_names]
        )

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "orders", columns=["o_orderstatus", "o_orderpriority"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("o_orderstatus")
        .aggregate(Sum("high_count", alias_name="high_count"), Sum("low_count", alias_name="low_count"))
        .to_pandas()
        .sort_values("o_orderstatus")
        .reset_index(drop=True)
    )
    return out.astype({"high_count": "int64", "low_count": "int64"})


ORDERS_PRIORITY_SQL = """
SELECT o_orderstatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


# --------------------------------------------------------------------------
# as-of join: events x orders (latest order at or before the event time)
# --------------------------------------------------------------------------

N_ASOF_PARTS = 64


def asof_events_orders(sf_dir: str) -> pd.DataFrame:
    """Distributed as-of join: for each event, the user's most recent order
    (o_orderdate <= ts, key user_id = o_custkey), aggregated per event_type.

    Dataflow (scales — neither side is broadcast): tag both tables with a
    common schema + coarse key-hash partition, union, cogroup by partition,
    then ONE vectorized `pd.merge_asof(by=key)` per partition. The
    partition count bounds group size; skewed keys split across... no —
    same key must co-locate, so a hot user bounds a partition (documented
    limit; salting would need a two-level asof)."""
    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def tag_events(batch: pa.Table) -> pa.Table:
        key = batch["user_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _hash_part(key, N_ASOF_PARTS),
                "key": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "kind": pa.array(np.ones(len(key), dtype=np.int8), pa.int8()),
                "event_type": batch["event_type"],
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "part": _hash_part(key, N_ASOF_PARTS),
                "key": batch["o_custkey"],
                "ts_us": pc.cast(batch["o_orderdate"], pa.int64()),
                "kind": pa.array(np.zeros(len(key), dtype=np.int8), pa.int8()),
                "event_type": pa.array([None] * len(key), pa.string()),
            }
        )

    both = ev.map_batches(tag_events, batch_format="pyarrow", batch_size=None).union(
        od.map_batches(tag_orders, batch_format="pyarrow", batch_size=None)
    )

    def asof_part(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g.kind == 1].sort_values("ts_us", kind="mergesort")
        right = (
            g[g.kind == 0][["key", "ts_us"]]
            .rename(columns={"ts_us": "o_ts_us"})
            .sort_values("o_ts_us", kind="mergesort")
        )
        m = pd.merge_asof(
            left, right, left_on="ts_us", right_on="o_ts_us", by="key", direction="backward"
        )
        m["matched"] = m.o_ts_us.notna()
        m["age_s"] = ((m.ts_us - m.o_ts_us) // 1_000_000).fillna(0).astype("int64")
        out = m.groupby("event_type", as_index=False, dropna=False).agg(
            n_events=("ts_us", "size"),
            n_matched=("matched", "sum"),
            sum_age_s=("age_s", "sum"),
        )
        return out

    agg = (
        both.groupby("part")
        .map_groups(asof_part, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False, dropna=False)
        .agg(n_events=("n_events", "sum"), n_matched=("n_matched", "sum"), sum_age_s=("sum_age_s", "sum"))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return agg.astype({"n_events": "int64", "n_matched": "int64", "sum_age_s": "int64"})


ASOF_EVENTS_SQL = """
SELECT e.event_type,
       COUNT(*) AS n_events,
       COUNT(o.o_orderdate) AS n_matched,
       CAST(COALESCE(SUM((epoch_us(e.ts) - epoch_us(o.o_orderdate)) // 1000000), 0) AS BIGINT) AS sum_age_s
FROM events e
ASOF LEFT JOIN orders o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY e.event_type ORDER BY e.event_type
"""


# --------------------------------------------------------------------------
# range join: part price -> static band table (broadcast + searchsorted)
# --------------------------------------------------------------------------

PRICE_BANDS = [
    ("b0_900_925", 900.0, 925.0),
    ("b1_925_950", 925.0, 950.0),
    ("b2_950_975", 950.0, 975.0),
    ("b3_975_1000", 975.0, 1000.0),
]


def range_join_price_bands(sf_dir: str) -> pd.DataFrame:
    """Band membership via broadcast range join: band edges are tiny, so the
    'join' is an np.searchsorted per batch — no shuffle of the fact side."""
    names = np.array([b[0] for b in PRICE_BANDS])
    los = np.array([b[1] for b in PRICE_BANDS])

    def partial(batch: pa.Table) -> pa.Table:
        price = batch["p_retailprice"].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(los, price, side="right") - 1
        ok = (idx >= 0) & (price < PRICE_BANDS[-1][2])
        t = pa.table(
            {
                "band": pa.array(names[idx[ok]], pa.string()),
                "n_parts": pa.array(np.ones(int(ok.sum()), dtype=np.int64), pa.int64()),
                "sum_price": pa.array(price[ok], pa.float64()),
            }
        )
        g = t.group_by("band").aggregate([("n_parts", "sum"), ("sum_price", "sum")])
        return g.rename_columns([c.removesuffix("_sum") for c in g.column_names])

    from ray.data.aggregate import Sum

    out = (
        _read(sf_dir, "part", columns=["p_retailprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("band")
        .aggregate(Sum("n_parts", alias_name="n_parts"), Sum("sum_price", alias_name="sum_price"))
        .to_pandas()
        .sort_values("band")
        .reset_index(drop=True)
    )
    out["sum_price"] = out.sum_price.round(4)
    return out.astype({"n_parts": "int64"})


RANGE_BANDS_SQL = """
SELECT b.band, COUNT(*) AS n_parts, ROUND(SUM(p.p_retailprice), 4) AS sum_price
FROM part p
JOIN (VALUES ('b0_900_925', 900.0, 925.0), ('b1_925_950', 925.0, 950.0),
             ('b2_950_975', 950.0, 975.0), ('b3_975_1000', 975.0, 1000.0))
     AS b(band, lo, hi)
  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
GROUP BY b.band ORDER BY b.band
"""


# --------------------------------------------------------------------------
# window function: top-3 orders per customer by totalprice (row_number)
# --------------------------------------------------------------------------

N_WINDOW_PARTS = 64


def window_top3_orders(sf_dir: str) -> pd.DataFrame:
    """ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC,
    o_orderkey) <= 3, as coarse-partition map_groups (one call per hash
    partition, vectorized in-group rank — NOT one call per customer)."""

    def add_part(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(key, N_WINDOW_PARTS))

    def rank_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"], ascending=[True, False, True], kind="mergesort"
        )
        g["rn"] = g.groupby("o_custkey").cumcount() + 1
        g = g[g.rn <= 3]
        return g[["o_custkey", "o_orderkey", "o_totalprice", "rn"]]

    out = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(rank_part, batch_format="pandas")
        .to_pandas()
        .sort_values(["o_custkey", "rn"])
        .reset_index(drop=True)
    )
    return out.astype({"o_custkey": "int64", "o_orderkey": "int64", "rn": "int64"})


WINDOW_TOP3_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
FROM orders
QUALIFY rn <= 3
ORDER BY o_custkey, rn
"""


# --------------------------------------------------------------------------
# set ops: distinct, union
# --------------------------------------------------------------------------

def distinct_doc_keys(sf_dir: str) -> pd.DataFrame:
    """SELECT DISTINCT lang, source — local distinct per block, then a tiny
    global groupby (the shuffle carries one row per distinct pair per block)."""

    def local_distinct(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["lang", "source"]).aggregate([])
        return g

    from ray.data.aggregate import Count

    out = (
        _read(sf_dir, "documents", columns=["lang", "source"])
        .map_batches(local_distinct, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()[["lang", "source"]]
        .sort_values(["lang", "source"])
        .reset_index(drop=True)
    )
    return out


DISTINCT_DOC_KEYS_SQL = """
SELECT DISTINCT lang, source FROM documents ORDER BY lang, source
"""


def union_short_long_docs(sf_dir: str) -> pd.DataFrame:
    """UNION ALL of two disjoint filters (short docs + long docs)."""
    docs = lambda: _read(sf_dir, "documents", columns=["doc_id", "n_chars"])  # noqa: E731

    def short(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["n_chars"], pa.scalar(100)))

    def long(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.greater(batch["n_chars"], pa.scalar(400)))

    u = docs().map_batches(short, batch_format="pyarrow").union(
        docs().map_batches(long, batch_format="pyarrow")
    )
    return u.sort("doc_id").to_pandas().astype({"doc_id": "int64", "n_chars": "int64"})


UNION_DOCS_SQL = """
SELECT doc_id, n_chars FROM documents WHERE n_chars < 100
UNION ALL
SELECT doc_id, n_chars FROM documents WHERE n_chars > 400
ORDER BY doc_id
"""


class _BloomPrefilter:
    """Actor-pool probe stage: fetches the broadcast filter ONCE per actor
    in __init__ (per-batch ray.get re-deserialized the whole filter)."""

    def __init__(self, bloom_ref):
        import ray

        self.bloom = ray.get(bloom_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.sketch import bloom_contains

        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        keep = bloom_contains(self.bloom, keys)
        b = batch.filter(pa.array(keep))
        revenue = pc.multiply(
            b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"])
        )
        t = pa.table({"l_orderkey": b["l_orderkey"], "revenue": revenue})
        g = t.group_by("l_orderkey").aggregate([("revenue", "sum")])
        return pa.table({"l_orderkey": g["l_orderkey"], "revenue": g["revenue_sum"]})


def urgent_revenue_bloom(sf_dir: str) -> pd.DataFrame:
    """Revenue of lineitems belonging to URGENT orders, via a Bloom
    pre-join — the shuffle-bytes reducer for large-large joins at scale:

      1. build side (urgent orders) -> count keys, size the filter at
         ~10 bits/key (a fixed size either wastes memory or saturates:
         an undersized filter's FP rate climbs toward 1 and the
         prefilter silently stops reducing), then per-block Bloom
         partials OR-merged driver-side — ~10 bits/key vs 64 for an
         exact key set, the regime where the exact broadcast no longer
         fits;
      2. probe side (lineitem) drops every row whose orderkey the filter
         rejects BEFORE the shuffle join — rejection is exact, so only
         false-positive rows (~1%) travel needlessly;
      3. the native inner join against the true key set makes the final
         result EXACT (Bloom positives are verified, never trusted).

    Value-oracled by URGENT_REVENUE_SQL — the result must be identical
    to the plain join, proving the prefilter loses nothing."""
    import ray
    from ray.data.aggregate import Sum

    from ..functions.sketch import bloom_merge, bloom_partial

    def urgent_keys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["o_orderpriority"], pa.scalar("1-URGENT")))
        return t.select(["o_orderkey"])

    urgent = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"]).map_batches(
        urgent_keys, batch_format="pyarrow", batch_size=None
    )
    # size m from the BUILD side: ~10 bits/key, power of two, floor 2^14
    n_keys = urgent.count()
    m_bits = max(1 << 14, 1 << max(14, (10 * max(n_keys, 1) - 1).bit_length()))

    def bloom_block(batch: pa.Table) -> pa.Table:
        packed = bloom_partial(batch["o_orderkey"].to_numpy(zero_copy_only=False), m_bits)
        return pa.table({"bloom": pa.array([packed.tobytes()], pa.binary())})

    parts = urgent.map_batches(bloom_block, batch_format="pyarrow", batch_size=None).to_pandas()
    merged = bloom_merge(
        np.stack([np.frombuffer(b, dtype=np.uint8) for b in parts.bloom])
    )
    bloom_ref = ray.put(merged)

    li = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])
        .map_batches(
            _BloomPrefilter,
            batch_format="pyarrow",
            batch_size=None,
            concurrency=(1, 4),
            fn_constructor_kwargs={"bloom_ref": bloom_ref},
        )
        .groupby("l_orderkey")
        .aggregate(Sum("revenue", alias_name="revenue"))
    )
    # exact verify: inner join against the TRUE urgent key set drops
    # bloom false positives
    joined = li.join(
        urgent,
        join_type="inner",
        num_partitions=8,
        on=("l_orderkey",),
        right_on=("o_orderkey",),
    ).to_pandas()
    total = float(joined.revenue.sum())
    from .common import to_cents

    # half-away-from-zero at 2dp == DuckDB ROUND (Python round() is
    # half-to-even — the exact divergence to_cents exists to prevent)
    total = float(to_cents(total) / 100.0)
    return pd.DataFrame(
        {"n_orders": pd.Series([len(joined)], dtype="int64"),
         "revenue": pd.Series([total], dtype="float64")}
    )


URGENT_REVENUE_SQL = """
SELECT CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS n_orders,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
"""


# --------------------------------------------------------------------------
# skew-resistant salted hash join (hot-key mitigation pattern)
# --------------------------------------------------------------------------

SALT_FANOUT = 8


def salted_segment_rollup(sf_dir: str, n_salts: int = SALT_FANOUT) -> pd.DataFrame:
    """Events x customer enrichment join executed with KEY SALTING — the
    standard hot-key mitigation for shuffle hash joins (a power-law user
    would otherwise pin its entire event mass on one join partition):
    every probe row gets salt = event_id % S, the build (dimension) side
    is replicated S ways with one salt each, and the join runs on
    (key, salt) — so a hot key's rows spread across S partitions while
    the result stays EXACTLY the plain join's (asserted against the
    unsalted `Dataset.join` in tests and against the plain-join SQL
    oracle). Rollup: events + value mass per market segment.

    Scale contract: the replication cost is S x the DIMENSION side
    (the small side by construction — that asymmetry is the whole
    trick); the probe side gains one int8-sized column. Value mass is
    summed in exact integer CENTS (ROUND(value*100) — the corpus
    values are 2-decimal, so the distributed Sum is drift-free)."""
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")

    def probe_prep(batch: pa.Table) -> pa.Table:
        ev = batch["event_id"].to_numpy(zero_copy_only=False)
        cents = np.rint(batch["value"].to_numpy(zero_copy_only=False) * 100).astype(
            np.int64
        )
        return pa.table(
            {
                "user_id": batch["user_id"],
                "salt": pa.array((ev % n_salts).astype(np.int64), pa.int64()),
                "cents": pa.array(cents, pa.int64()),
            }
        )

    def build_prep(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        seg = batch["c_mktsegment"].to_pylist()
        return pa.table(
            {
                "c_custkey": pa.array(np.repeat(keys, n_salts), pa.int64()),
                "salt": pa.array(
                    np.tile(np.arange(n_salts, dtype=np.int64), n), pa.int64()
                ),
                "c_mktsegment": pa.array(
                    [s for s in seg for _ in range(n_salts)], pa.string()
                ),
            }
        )

    probe = _read(sf_dir, "events", columns=["event_id", "user_id", "value"]).map_batches(
        probe_prep, batch_format="pyarrow"
    )
    build = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).map_batches(
        build_prep, batch_format="pyarrow"
    )
    joined = probe.join(
        build,
        join_type="inner",
        num_partitions=8,
        on=("user_id", "salt"),
        right_on=("c_custkey", "salt"),
    )

    from ray.data.aggregate import Count, Sum

    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_events"), Sum("cents", alias_name="value_cents"))
        .to_pandas()
        .sort_values("c_mktsegment")
        .reset_index(drop=True)
    )
    return out.astype({"n_events": "int64", "value_cents": "int64"})


SALTED_ROLLUP_SQL = """
SELECT c.c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


# --------------------------------------------------------------------------
# CDC MERGE: keyed changelog (insert/update/delete) applied onto a snapshot
# --------------------------------------------------------------------------

CDC_INSERT_OFFSET = 4_000_000_000  # insert keys live above every real orderkey


def cdc_merge_snapshot(sf_dir: str) -> pd.DataFrame:
    """Lakehouse MERGE INTO: apply a keyed changelog with UPDATE, DELETE
    and INSERT arms onto a snapshot and emit the merged snapshot — the
    maintenance operation a 100 TB curated corpus runs per ingest cycle
    (events_latest_per_user is the pure-upsert compaction; this adds the
    delete arm, the insert arm, and the multi-source union).

    The changelog is DERIVED deterministically from orders so the oracle
    can rebuild it: seq 1 updates every key % 3 == 0 (price + $1000,
    status 'P'), seq 2 deletes every key % 7 == 0 (so a key % 21 == 0
    receives both and the DELETE must win by seq), seq 3 inserts a fresh
    key (+CDC_INSERT_OFFSET) for every key % 11 == 0. Winner per key = max seq;
    delete winners drop out of the merged table.

    Scale contract: one stateless scan emits snapshot + changelog rows
    with vectorized numpy masks; per-block keep-last pre-reduce means
    the shuffle moves at most one row per (key, block) — snapshot-sized,
    never (snapshot + changelog)-sized; the merge is a vectorized pass
    per coarse splitmix64 partition (events_latest_per_user pattern),
    never a per-key map_groups."""
    from .common import to_cents

    n_parts = 64

    def explode(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy().astype(np.int64)
        cents = to_cents(batch["o_totalprice"].to_numpy()).astype(np.int64)
        st = np.asarray(batch["o_orderstatus"].to_pylist(), dtype=object)
        m3, m7, m11 = k % 3 == 0, k % 7 == 0, k % 11 == 0
        ks = np.concatenate([k, k[m3], k[m7], k[m11] + CDC_INSERT_OFFSET])
        seq = np.concatenate(
            [
                np.zeros(len(k), np.int64),
                np.full(int(m3.sum()), 1, np.int64),
                np.full(int(m7.sum()), 2, np.int64),
                np.full(int(m11.sum()), 3, np.int64),
            ]
        )
        is_del = (seq == 2).astype(np.int64)
        price = np.concatenate(
            [cents, cents[m3] + 100_000, np.zeros(int(m7.sum()), np.int64), cents[m11]]
        )
        status = np.concatenate(
            [st, np.full(int(m3.sum()), "P", object),
             np.full(int(m7.sum()), "", object), np.full(int(m11.sum()), "N", object)]
        )
        df = pd.DataFrame(
            {"k": ks, "seq": seq, "is_del": is_del, "price_cents": price, "status": status}
        )
        # per-block keep-last pre-reduce: at most one row per key per block
        df = df.sort_values(["k", "seq"], kind="mergesort").drop_duplicates("k", keep="last")
        df["part"] = _hash_part(df.k.to_numpy(), n_parts)
        return pa.Table.from_pandas(df, preserve_index=False)

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["k", "seq"], kind="mergesort").drop_duplicates("k", keep="last")
        g = g[g.is_del == 0]
        return g[["k", "price_cents", "status"]]

    out = (
        _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice", "o_orderstatus"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
        .rename(columns={"k": "o_orderkey"})
        .sort_values("o_orderkey")
        .reset_index(drop=True)
    )
    return out.astype({"o_orderkey": "int64", "price_cents": "int64", "status": "str"})


CDC_MERGE_SQL = f"""
WITH base AS (
  SELECT o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS pc,
         o_orderstatus AS st
  FROM orders),
ops AS (
  SELECT k, 0 AS seq, 0 AS is_del, pc AS price_cents, st AS status FROM base
  UNION ALL
  SELECT k, 1, 0, pc + 100000, 'P' FROM base WHERE k % 3 = 0
  UNION ALL
  SELECT k, 2, 1, 0, '' FROM base WHERE k % 7 = 0
  UNION ALL
  SELECT k + {CDC_INSERT_OFFSET}, 3, 0, pc, 'N' FROM base WHERE k % 11 = 0),
w AS (SELECT * FROM ops
      QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1)
SELECT k AS o_orderkey, price_cents, status FROM w
WHERE is_del = 0 ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# last-touch attribution (reverse as-of: order revenue -> crediting event)
# --------------------------------------------------------------------------

def next_touch_after_order(sf_dir: str) -> pd.DataFrame:
    """Next-touch analysis: every order credits its full price to the
    user's FIRST event at-or-after the order date (the post-purchase
    follow-up model — which touchpoint do buyers hit next, and how much
    revenue sits behind each; the forward twin of asof_events_orders,
    and the direction that is live on this corpus, whose events all
    postdate its orders). Orders whose user never appears in the event
    stream credit '(none)'. Ties are airtight: events are pre-reduced
    to ONE winner per (user, ts) by MIN event_id on BOTH sides, so the
    as-of match is deterministic even under timestamp collisions.

    Scale contract: the asof_events_orders dataflow — both sides tag
    into a common slim schema, union, ONE cogrouped exchange by coarse
    key hash, one vectorized `pd.merge_asof(by=key)` per partition,
    per-partition integer-cent rollups into an #event_types-bounded
    groupby. Revenue is exact int64 cents."""
    from .common import to_cents

    ev = _read(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type"])
    od = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def tag_events(batch: pa.Table) -> pa.Table:
        key = batch["user_id"].to_numpy(zero_copy_only=False)
        n = len(key)
        return pa.table(
            {
                "part": _hash_part(key, N_ASOF_PARTS),
                "key": batch["user_id"],
                "ts_us": pc.cast(batch["ts"], pa.int64()),
                "kind": pa.array(np.zeros(n, dtype=np.int8), pa.int8()),
                "event_id": batch["event_id"],
                "cents": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    def tag_orders(batch: pa.Table) -> pa.Table:
        key = batch["o_custkey"].to_numpy(zero_copy_only=False)
        n = len(key)
        return pa.table(
            {
                "part": _hash_part(key, N_ASOF_PARTS),
                "key": batch["o_custkey"],
                "ts_us": pc.cast(batch["o_orderdate"], pa.int64()),
                "kind": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
                "event_id": pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "cents": pa.array(to_cents(batch["o_totalprice"].to_numpy()), pa.int64()),
                "event_type": pa.array([None] * n, pa.string()),
            }
        )

    both = ev.map_batches(tag_events, batch_format="pyarrow", batch_size=None).union(
        od.map_batches(tag_orders, batch_format="pyarrow", batch_size=None)
    )

    def attrib(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g.kind == 1][["key", "ts_us", "cents"]].sort_values(
            "ts_us", kind="mergesort"
        )
        right = (
            g[g.kind == 0]
            .sort_values(["key", "ts_us", "event_id"], kind="mergesort")
            .drop_duplicates(["key", "ts_us"], keep="first")[["key", "ts_us", "event_type"]]
            .rename(columns={"ts_us": "e_ts_us"})
            .sort_values("e_ts_us", kind="mergesort")
        )
        if left.empty:
            return pd.DataFrame({"event_type": [], "n_orders": [], "revenue_cents": []})
        m = pd.merge_asof(
            left, right, left_on="ts_us", right_on="e_ts_us", by="key", direction="forward"
        )
        m["event_type"] = m.event_type.fillna("(none)")
        return m.groupby("event_type", as_index=False).agg(
            n_orders=("cents", "size"), revenue_cents=("cents", "sum")
        )

    out = (
        both.groupby("part")
        .map_groups(attrib, batch_format="pandas")
        .to_pandas()
        .groupby("event_type", as_index=False)
        .agg(n_orders=("n_orders", "sum"), revenue_cents=("revenue_cents", "sum"))
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype({"event_type": "str", "n_orders": "int64", "revenue_cents": "int64"})


NEXT_TOUCH_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_type FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) = 1)
SELECT COALESCE(e.event_type, '(none)') AS event_type,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders o
ASOF LEFT JOIN ev e ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# bucketed (storage-partitioned) join — the shuffle-free join layout
# --------------------------------------------------------------------------

BUCKETS = 16


def bucketed_join(sf_dir: str, n_buckets: int = BUCKETS) -> pd.DataFrame:
    """Storage-bucketed zero-exchange join (the Hive/Iceberg bucketed-table
    / Spark storage-partitioned-join layout): both fact tables are written
    ONCE hive-partitioned by `bucket = splitmix64(orderkey) % n_buckets`,
    after which ANY number of orderkey joins run with NO shuffle at all —
    bucket i of lineitem can only match bucket i of orders, so each join
    task reads exactly one co-bucketed directory pair and joins in-heap.

    This is the "bucket by key hash when you must co-locate" scale
    technique: at 100 TB the one-time bucketing cost at ingest replaces an
    all-to-all exchange in EVERY downstream join of the key. Here the
    layout lives under /tmp (single node); on a cluster the same
    directories sit on shared storage and the per-bucket task reads stay
    node-local to wherever the scheduler places them.

    Scale contract: the bucketed write is per-block streaming
    (write_parquet(partition_cols)); the join phase is one task per
    bucket over a #buckets-sized Dataset — each task's heap holds one
    bucket pair (size the bucket count to the heap: 100 TB / n_buckets
    per task). The per-task output is a <=#priorities-row partial; the
    driver folds #buckets x 5 rows. Revenue is exact integer
    price_cents x (100 - disc_pct) (1e-4 dollar units), so the oracle
    equality is bit-exact — any row lost or duplicated by the bucket
    routing flips the hash.

    Reference parity note: the reference engine has no bucketed layout
    (single-process, `server/` serving loop); this is part of the general
    join family SURVEY.md §2 J1-J3 motivates.
    """
    import os
    import shutil
    import tempfile

    import ray.data as rd

    from ..functions.hashes import splitmix64
    from .common import sized_read_parquet, to_cents

    root = tempfile.mkdtemp(prefix="bucketed_join_")
    try:
        def add_bucket(batch: pa.Table, key: str) -> pa.Table:
            k = batch[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            b = (splitmix64(k) % np.uint64(n_buckets)).astype(np.int32)
            return batch.append_column("bucket", pa.array(b, pa.int32()))

        orders = sized_read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"]
        ).map_batches(lambda t: add_bucket(t, "o_orderkey"), batch_format="pyarrow")
        orders.write_parquet(f"{root}/orders", partition_cols=["bucket"])

        def li_prep(batch: pa.Table) -> pa.Table:
            t = add_bucket(batch, "l_orderkey")
            cents = to_cents(t["l_extendedprice"].to_numpy(zero_copy_only=False))
            disc = to_cents(t["l_discount"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "l_orderkey": t["l_orderkey"],
                    "price_cents": pa.array(cents, pa.int64()),
                    "disc_pct": pa.array(disc, pa.int64()),
                    "bucket": t["bucket"],
                }
            )

        lineitem = sized_read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount"],
        ).map_batches(li_prep, batch_format="pyarrow")
        lineitem.write_parquet(f"{root}/lineitem", partition_cols=["bucket"])

        import pyarrow.parquet as pq

        def join_bucket(batch: pa.Table) -> pa.Table:
            parts = []
            for b in batch["item"].to_pylist():
                od = os.path.join(root, "orders", f"bucket={b}")
                ld = os.path.join(root, "lineitem", f"bucket={b}")
                if not (os.path.isdir(od) and os.path.isdir(ld)):
                    continue  # a side with no rows in this bucket joins to nothing
                o = pq.read_table(od).to_pandas()
                li = pq.read_table(ld).to_pandas()
                m = li.merge(o, left_on="l_orderkey", right_on="o_orderkey", how="inner")
                m["revenue_e4"] = m.price_cents * (100 - m.disc_pct)
                parts.append(
                    m.groupby("o_orderpriority", as_index=False).agg(
                        n_items=("l_orderkey", "size"), revenue_e4=("revenue_e4", "sum")
                    )
                )
            if not parts:
                return pa.table(
                    {
                        "o_orderpriority": pa.array([], pa.string()),
                        "n_items": pa.array([], pa.int64()),
                        "revenue_e4": pa.array([], pa.int64()),
                    }
                )
            return pa.Table.from_pandas(pd.concat(parts), preserve_index=False)

        partials = (
            rd.from_items(list(range(n_buckets)))
            .map_batches(join_bucket, batch_format="pyarrow", batch_size=1)
            .to_pandas()
        )
        out = (
            partials.groupby("o_orderpriority", as_index=False)
            .agg(n_items=("n_items", "sum"), revenue_e4=("revenue_e4", "sum"))
            .sort_values("o_orderpriority")
            .reset_index(drop=True)
        )
        return out.astype(
            {"o_orderpriority": "str", "n_items": "int64", "revenue_e4": "int64"}
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


BUCKETED_JOIN_SQL = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100.0) AS BIGINT))) AS BIGINT)
         AS revenue_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# --------------------------------------------------------------------------
# adaptive join strategy (cost-based broadcast vs shuffle)
# --------------------------------------------------------------------------

ADAPTIVE_BCAST_BYTES = 32 << 20  # dim side under 32 MiB broadcasts


def adaptive_join_rollup(
    sf_dir: str, bcast_threshold_bytes: int = ADAPTIVE_BCAST_BYTES
) -> pd.DataFrame:
    """Revenue per nation (orders ⋈ customer ⋈ nation) where the
    orders-customer join PICKS ITS PHYSICAL PLAN from statistics — the
    cost-based decision every distributed engine makes and this repo
    otherwise hard-codes per operator: probe the dim side's on-disk
    bytes (parquet footer — free, no scan) and broadcast it via ray.put
    when it fits comfortably in a worker heap, else run the native hash
    join. Output is PLAN-INVARIANT (the pytest forces both paths and
    asserts bit-equality; the oracle checks whichever the probe picks),
    so adaptivity can never change answers, only cost.

    Scale contract: broadcast path = one ray.put of the (custkey ->
    nationkey) int array pair + stateless map_batches lookups (fact
    never shuffles); shuffle path = per-block (custkey, cents, n)
    pre-aggregation into the native join (one row per custkey per
    block, never per order). nation (25 rows) always broadcasts.
    Exact int cents end to end."""
    import os

    import ray
    import ray.data as rd

    from .common import sized_read_parquet, to_cents

    from ray.data.aggregate import Sum

    def fact_partial(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        t = pa.table(
            {
                "c_custkey": batch["o_custkey"],
                "cents": pa.array(cents, pa.int64()),
                "n": pa.array(np.ones(len(cents), np.int64)),
            }
        )
        g = t.group_by("c_custkey").aggregate([("cents", "sum"), ("n", "sum")])
        return g.rename_columns(["c_custkey", "cents", "n"])

    fact = sized_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(fact_partial, batch_format="pyarrow", batch_size=None)

    dim_path = f"{sf_dir}/customer.parquet"
    dim_bytes = os.path.getsize(dim_path)

    if dim_bytes < bcast_threshold_bytes:
        # broadcast plan: ship the slim key->nation arrays once
        cust = sized_read_parquet(
            dim_path, columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        lookup_ref = ray.put(
            (
                cust.c_custkey.to_numpy(dtype=np.int64),
                cust.c_nationkey.to_numpy(dtype=np.int64),
            )
        )

        def attach(batch: pa.Table) -> pa.Table:
            keys, nats = ray.get(lookup_ref)
            order = np.argsort(keys)
            probe = batch["c_custkey"].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(keys[order], probe)
            # inner-join semantics must match the shuffle plan: a probe key
            # absent from customer would otherwise silently attach the NEXT
            # customer's nationkey (and a key above max would IndexError) —
            # clip then drop non-matches instead (ADVICE r4)
            idx = np.minimum(idx, len(order) - 1)
            hit = keys[order][idx] == probe
            return pa.table(
                {
                    "c_nationkey": pa.array(nats[order][idx][hit], pa.int64()),
                    "cents": batch["cents"].filter(pa.array(hit)),
                    "n": batch["n"].filter(pa.array(hit)),
                }
            )

        tagged = fact.map_batches(attach, batch_format="pyarrow", batch_size=None)
    else:
        # shuffle plan: native hash join on the pre-aggregated fact
        dim = sized_read_parquet(dim_path, columns=["c_custkey", "c_nationkey"])
        tagged = fact.join(
            dim, join_type="inner", num_partitions=8, on=("c_custkey",)
        ).select_columns(["c_nationkey", "cents", "n"])

    per_nation = (
        tagged.groupby("c_nationkey")
        .aggregate(Sum("cents", alias_name="revenue_cents"), Sum("n", alias_name="n_orders"))
        .to_pandas()
    )
    names = sized_read_parquet(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    out = (
        per_nation.merge(names, left_on="c_nationkey", right_on="n_nationkey")
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return out[["n_name", "n_orders", "revenue_cents"]].astype(
        {"n_name": "str", "n_orders": "int64", "revenue_cents": "int64"}
    )


ADAPTIVE_JOIN_SQL = """
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""


# --------------------------------------------------------------------------
# incremental view maintenance: self-maintainable grouped aggregate
# --------------------------------------------------------------------------


def ivm_delta_agg(sf_dir: str) -> pd.DataFrame:
    """Incremental view maintenance of a grouped COUNT/SUM view from a
    SIGNED delta log — the standard IVM result (Gupta & Mumick, "Materialized
    Views"): count and sum are self-maintainable, so the view over
    (base + delta) is view(base) + delta-aggregate with multiplicity
    +1 per insert / -1 per delete, NO base rescan. This is how a 100 TB
    corpus keeps its per-(status, year) rollup current per ingest cycle:
    maintenance cost is O(|delta| + |groups|), never O(|base|).

    Derived scenario (cdc_merge_snapshot's derivation-oracle pattern):
    base = orders with o_orderkey % 4 != 0; the cycle's delta INSERTs
    every o_orderkey % 4 == 0 row and DELETEs (retracts) base rows with
    o_orderkey % 9 == 0. The engine computes view(base) and agg(delta)
    as two independent distributed partial-aggregate passes (each
    shuffle is #groups x #blocks bounded), merges the two GROUP-sized
    tables driver-side with signed arithmetic, and drops groups whose
    maintained count reaches 0. The oracle aggregates the final state
    directly — any sign error, lost retraction, or ghost group breaks
    the value hash. Exact int cents end-to-end."""
    from ray.data.aggregate import Sum

    from .common import to_cents

    def partials(which: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch["o_orderkey"].to_numpy().astype(np.int64)
            cents = to_cents(batch["o_totalprice"].to_numpy())
            status = np.asarray(batch["o_orderstatus"].to_pylist(), dtype=object)
            year = pc.year(batch["o_orderdate"]).to_numpy().astype(np.int64)
            base_m = k % 4 != 0
            if which == "base":
                mult = np.where(base_m, 1, 0).astype(np.int64)
            else:  # delta: +1 inserts (k%4==0), -1 retractions (base & k%9==0)
                mult = np.where(k % 4 == 0, 1, 0) - np.where(base_m & (k % 9 == 0), 1, 0)
                mult = mult.astype(np.int64)
            live = mult != 0
            df = pd.DataFrame(
                {
                    "o_orderstatus": status[live],
                    "year": year[live],
                    "n": mult[live],
                    "revenue_cents": mult[live] * cents[live],
                }
            )
            g = df.groupby(["o_orderstatus", "year"], as_index=False).sum()
            return pa.Table.from_pandas(g, preserve_index=False)

        return fn

    def agg(which: str) -> pd.DataFrame:
        return (
            _read(sf_dir, "orders", columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"])
            .map_batches(partials(which), batch_format="pyarrow", batch_size=None)
            .groupby(["o_orderstatus", "year"])
            .aggregate(Sum("n", alias_name="n"), Sum("revenue_cents", alias_name="revenue_cents"))
            .to_pandas()
        )

    view = agg("base")
    delta = agg("delta")
    merged = (
        pd.concat([view, delta], ignore_index=True)
        .groupby(["o_orderstatus", "year"], as_index=False)
        .sum()
    )
    out = merged[merged["n"] > 0].sort_values(["o_orderstatus", "year"]).reset_index(drop=True)
    return out.rename(columns={"n": "n_orders"}).astype(
        {"year": "int64", "n_orders": "int64", "revenue_cents": "int64"}
    )[["o_orderstatus", "year", "n_orders", "revenue_cents"]]


IVM_DELTA_SQL = """
SELECT o_orderstatus,
       CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
WHERE (o_orderkey % 4 = 0) OR (o_orderkey % 4 != 0 AND o_orderkey % 9 != 0)
GROUP BY o_orderstatus, year
ORDER BY o_orderstatus, year
"""


# --------------------------------------------------------------------------
# cross-table referential-integrity audit
# --------------------------------------------------------------------------

FK_CORRUPT_MOD = 13  # every 13th line's FK is mangled to 2k+1 (simulated ingest
# bug; +1 would be vacuous here — orderkeys are dense, so an off-by-one
# always resolves. 2k+1 resolves for small keys and orphans for large ones,
# keeping BOTH behaviors live so the anti join is genuinely exercised)


def referential_integrity_audit(sf_dir: str) -> pd.DataFrame:
    """Cross-table FK integrity audit between lineitem and orders —
    validate_orders checks INTRA-table constraints; referential
    integrity is the CROSS-table half every warehouse load verifies
    before publishing. The derivation-oracle scenario: an ingest bug
    mangled lines with (l_orderkey*7 + l_linenumber) % 13 == 0 to fk = 2k+1
    (l_linenumber alone spans only 1..7 here, so a pure line-number mod
    would never fire), and the audit must
    find exactly the mangled keys that no longer resolve (a mangled key
    can still hit a REAL order — the audit is a genuine anti join, not
    a doc_id lookup; the oracle restates the same shift with NOT
    EXISTS).

    Both directions in one report: orphan lines (FK resolves to no
    order) and childless orders (no line references them, under the
    same corrupted FK map). Scale: keys are pre-deduplicated per block
    on both sides, each direction is ONE slim native LEFT ANTI hash
    join (8 B keys — payloads never join), counts + exact key digests
    fold per block."""
    from ray.data.aggregate import Sum

    def line_keys(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy().astype(np.int64)
        ln = batch["l_linenumber"].to_numpy().astype(np.int64)
        fk = np.where((k * 7 + ln) % FK_CORRUPT_MOD == 0, 2 * k + 1, k)
        df = pd.DataFrame({"fk": fk}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    def order_keys(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"o_orderkey": batch["o_orderkey"].to_numpy()}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    lines = (
        _read(sf_dir, "lineitem", columns=["l_orderkey", "l_linenumber"])
        .map_batches(line_keys, batch_format="pyarrow", batch_size=None)
        .groupby("fk")
        .count()
        .select_columns(["fk"])
        .materialize()
    )
    orders = (
        _read(sf_dir, "orders", columns=["o_orderkey"])
        .map_batches(order_keys, batch_format="pyarrow", batch_size=None)
        .materialize()
    )

    orphan = lines.join(
        orders.map_batches(
            lambda b: pa.table({"fk": b["o_orderkey"]}), batch_format="pyarrow"
        ),
        join_type="left_anti",
        num_partitions=8,
        on=("fk",),
    )
    childless = orders.join(
        lines.map_batches(
            lambda b: pa.table({"o_orderkey": b["fk"]}), batch_format="pyarrow"
        ),
        join_type="left_anti",
        num_partitions=8,
        on=("o_orderkey",),
    )

    def fold(col: str):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[col].to_numpy()
            return pa.table(
                {
                    "n": pa.array([len(k)], pa.int64()),
                    "digest": pa.array([int(((k * 31) % (1 << 31)).sum())], pa.int64()),
                }
            )

        return fn

    o = orphan.map_batches(fold("fk"), batch_format="pyarrow", batch_size=None).to_pandas().sum()
    c = childless.map_batches(fold("o_orderkey"), batch_format="pyarrow", batch_size=None).to_pandas().sum()
    return pd.DataFrame(
        {
            "n_orphan_keys": pd.Series([int(o.get("n", 0))], dtype="int64"),
            "orphan_digest": pd.Series([int(o.get("digest", 0))], dtype="int64"),
            "n_childless_orders": pd.Series([int(c.get("n", 0))], dtype="int64"),
            "childless_digest": pd.Series([int(c.get("digest", 0))], dtype="int64"),
        }
    )


REFERENTIAL_INTEGRITY_SQL = f"""
WITH lk AS (
  SELECT DISTINCT CASE WHEN (l_orderkey * 7 + l_linenumber) % {FK_CORRUPT_MOD} = 0
                       THEN 2 * l_orderkey + 1 ELSE l_orderkey END AS fk
  FROM lineitem
),
orphan AS (
  SELECT fk FROM lk WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = lk.fk)
),
childless AS (
  SELECT o_orderkey FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM lk WHERE lk.fk = o.o_orderkey)
)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM orphan) AS n_orphan_keys,
       (SELECT CAST(COALESCE(SUM((fk * 31) % 2147483648), 0) AS BIGINT) FROM orphan)
         AS orphan_digest,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM childless) AS n_childless_orders,
       (SELECT CAST(COALESCE(SUM((o_orderkey * 31) % 2147483648), 0) AS BIGINT) FROM childless)
         AS childless_digest
"""
