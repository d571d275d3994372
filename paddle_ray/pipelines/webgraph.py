"""Link-graph operators over a deterministically-derived document graph:
distributed PageRank power iterations.

The crawl-prioritization / host-authority signal every web-curation
pipeline keeps next to its quality scores (the original PageRank paper;
CommonCrawl publishes host-level harmonic-centrality ranks for exactly
this use). The sf `documents` corpus has no link column, so the edge
list is DERIVED deterministically from doc_id (the scrub.py
deterministic-derivation oracle pattern): every doc emits two out-links,

    dst1 = (doc_id * doc_id + 3) % n      (quadratic -> ~2-to-1, skew)
    dst2 = (doc_id // 7) % n              (7-to-1 -> hub nodes)

so out-degree is exactly 2 everywhere (no dangling-mass term needed —
a real crawl graph adds one) while in-degree is non-uniform enough
that ranks genuinely spread (the SQL oracle reproduces the identical
derivation, full kernel-chain value coverage with zero golden
constants).

Scale contract
--------------
- Edges are derived per batch and never materialized driver-side; each
  power iteration is: edges ⋈ ranks on src (native hash join, rank rows
  are 16 B) -> per-block (dst, contrib) pre-aggregation -> #nodes-sized
  groupby -> left-outer join back to the node list (nodes with no
  in-links keep the teleport term). Document text never enters the
  operator (doc_id-only read).
- Each round's rank Dataset is materialize()d: iterating a LAZY dataset
  re-executes a growing history tail (the dedup_clusters pregel lesson,
  BASELINE r2) — the snapshot is node-sized, 16 B/row.
- The driver sees only the final (doc_id, rank) collect; at a web-scale
  node count the caller writes the Dataset instead (`collect=False`).

Float parity with the oracle: iteration-1 ranks are bit-exact on both
sides (same literal expression over the same doubles); iteration 2 sums
neighbor ranks in engine-block vs SQL-scan order, so the output is
reported relative to the uniform rank (r * n ~ 1.0) and rounded to 6
decimals — ~7 significant digits of agreement headroom (the
embedding_quantize_error contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from .common import sized_read_parquet

PR_DAMPING = 0.85
PR_ITERS = 2


def _ids(sf_dir: str):
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])


def _edges_batch(batch: pa.Table, n: int) -> pa.Table:
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst1 = (ids * ids + 3) % n
    dst2 = (ids // 7) % n
    return pa.table(
        {
            "src": pa.array(np.concatenate([ids, ids]), pa.int64()),
            "dst": pa.array(np.concatenate([dst1, dst2]), pa.int64()),
        }
    )


def pagerank(sf_dir: str, iters: int = PR_ITERS, damping: float = PR_DAMPING) -> pd.DataFrame:
    """`iters` PageRank power iterations over the derived doc graph
    (uniform 1/n init, out-degree 2 by construction). Returns
    (doc_id, rank) with rank = r * n (relative to uniform), rounded to
    6 decimals. Oracled by PAGERANK_SQL (iters=2)."""
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nodes = _ids(sf_dir)
    n = nodes.count()
    edges = nodes.map_batches(
        lambda b: _edges_batch(b, n), batch_format="pyarrow"
    ).materialize()

    teleport = (1.0 - damping) / n

    # rank_0 = 1/n everywhere, represented implicitly: the first
    # iteration's neighbor sum is indegree/n, folded into the same join
    # topology by starting from an explicit uniform rank table
    ranks = nodes.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "r": pa.array(np.full(len(b), 1.0 / n))}
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        # key the rank table by src for the native hash join with edges
        rank_by_src = ranks.map_batches(
            lambda b: pa.table({"src": b["doc_id"], "r": b["r"]}),
            batch_format="pyarrow",
            batch_size=None,
        )
        contribs = edges.join(rank_by_src, join_type="inner", num_partitions=8, on=("src",))

        def contrib_partial(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "doc_id": batch["dst"],
                    "c": pa.array(
                        batch["r"].to_numpy(zero_copy_only=False) / 2.0, pa.float64()
                    ),
                }
            )
            g = t.group_by("doc_id").aggregate([("c", "sum")])
            return g.rename_columns(["doc_id", "c"])

        insum = (
            contribs.map_batches(contrib_partial, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Sum("c", alias_name="c"))
        )
        joined = nodes.join(insum, join_type="left_outer", num_partitions=8, on=("doc_id",))

        def update(batch: pa.Table) -> pa.Table:
            c = batch["c"].to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c), 0.0, c)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "r": pa.array(teleport + damping * c, pa.float64()),
                }
            )

        ranks = joined.map_batches(update, batch_format="pyarrow").materialize()

    out = ranks.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["rank"] = (out.r * n).round(6)
    return out[["doc_id", "rank"]].astype({"doc_id": "int64"})


PAGERANK_SQL = f"""
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
e AS (
  SELECT doc_id AS src,
         (doc_id * doc_id + 3) % (SELECT COUNT(*) FROM documents) AS dst
  FROM documents
  UNION ALL
  SELECT doc_id, (doc_id // 7) % (SELECT COUNT(*) FROM documents)
  FROM documents
),
r1 AS (
  SELECT d.doc_id,
         (1.0 - {PR_DAMPING}) / n.n
           + {PR_DAMPING} * COALESCE(i.s, 0) / 2 AS r
  FROM documents d CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst, SUM(1.0 / n.n) AS s FROM e CROSS JOIN n GROUP BY e.dst
  ) i ON i.dst = d.doc_id
),
r2 AS (
  SELECT d.doc_id,
         (1.0 - {PR_DAMPING}) / n.n
           + {PR_DAMPING} * COALESCE(i.s, 0) / 2 AS r
  FROM documents d CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst, SUM(r1.r) AS s FROM e JOIN r1 ON r1.doc_id = e.src GROUP BY e.dst
  ) i ON i.dst = d.doc_id
)
SELECT r2.doc_id, ROUND(r2.r * n.n, 6) AS rank
FROM r2 CROSS JOIN n ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# triangle counting (node-iterator on the minimum vertex)
# --------------------------------------------------------------------------

def triangle_count(sf_dir: str) -> pd.DataFrame:
    """Exact triangle count over the undirected version of the derived
    doc graph — the clustering-coefficient numerator, the standard
    graph-analytics companion to PageRank (spam-farm link rings and
    organic communities separate on triangle density). Node-iterator on
    the MINIMUM vertex: every triangle a < b < c is counted exactly
    once, as the wedge (b, c) pivoting at a that closes with edge
    (b, c). Output: (n_edges, n_wedges, n_triangles) exact int64.

    Scale contract: edges derive per block (never driver-side) and
    canonicalize/dedup on coarse u-hash partitions; wedges form by a
    vectorized per-partition self-merge at the shared minimum vertex
    (all edges of a pivot co-locate by the partitioning); closure is
    ONE native hash join of wedge rows against 'u:v' edge keys. Wedge
    volume is sum-of-deg^2-bounded — the hub-degree skew hazard of
    triangle counting; the derived graph's max degree is ~11, and a
    power-law graph caps pivots by degree-ordering (each edge pivots at
    its LOWER-degree endpoint), noted for the 100 TB path."""
    import hashlib

    from ray.data.aggregate import Sum

    n = _ids(sf_dir).count()
    n_parts = 64

    def canon(batch: pa.Table) -> pa.Table:
        e = _edges_batch(batch, n)
        src = e["src"].to_numpy()
        dst = e["dst"].to_numpy()
        keep = src != dst
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        df["part"] = (df.u % n_parts).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (
        _ids(sf_dir)
        .map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: g[["u", "v"]].drop_duplicates(), batch_format="pandas")
        .materialize()
    )
    n_edges = edges.count()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="u")
        m = m[m.v_x < m.v_y]
        return m[["v_x", "v_y"]].rename(columns={"v_x": "v1", "v_y": "v2"})

    def repart(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array((batch["u"].to_numpy() % n_parts).astype(np.int32))
        )

    wedge_ds = (
        edges.map_batches(repart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pandas")
    )
    n_wedges = wedge_ds.count()

    def wkey(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(
                    [
                        f"{a}:{b}"
                        for a, b in zip(batch["v1"].to_pylist(), batch["v2"].to_pylist())
                    ],
                    pa.string(),
                )
            }
        )

    def ekey(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(
                    [
                        f"{a}:{b}"
                        for a, b in zip(batch["u"].to_pylist(), batch["v"].to_pylist())
                    ],
                    pa.string(),
                )
            }
        )

    closed = wedge_ds.map_batches(wkey, batch_format="pyarrow").join(
        edges.map_batches(ekey, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("k",),
    )
    n_tri = closed.count()
    return pd.DataFrame(
        {
            "n_edges": pd.Series([n_edges], dtype="int64"),
            "n_wedges": pd.Series([n_wedges], dtype="int64"),
            "n_triangles": pd.Series([n_tri], dtype="int64"),
        }
    )


TRIANGLE_SQL = """
WITH ids AS (SELECT doc_id AS id FROM documents),
nn AS (SELECT COUNT(*) AS n FROM ids),
raw AS (
  SELECT id AS src, (id * id + 3) % nn.n AS dst FROM ids, nn
  UNION ALL
  SELECT id, (id // 7) % nn.n FROM ids, nn),
e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM raw WHERE src <> dst),
w AS (SELECT a.v AS v1, b.v AS v2 FROM e a JOIN e b ON a.u = b.u AND a.v < b.v),
t AS (SELECT COUNT(*) AS tri FROM w JOIN e ON e.u = w.v1 AND e.v = w.v2)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM w) AS n_wedges,
       CAST(t.tri AS BIGINT) AS n_triangles
FROM t
"""


# --------------------------------------------------------------------------
# k-core decomposition (iterative degree peel) over the derived doc graph
# --------------------------------------------------------------------------

KCORE_K = 3  # 6 peel rounds, non-empty core at every sf (141/141/1178 nodes)
KCORE_ROUNDS = 10  # shared engine/oracle round budget; engine raises past it
KCORE_BCAST_CAP = 1_000_000  # dead-id broadcast path cap (8 B ids -> <= 8 MB)


def _undirected_edges(sf_dir: str):
    """The derived doc graph as a globally-deduped undirected,
    self-loop-free edge Dataset (u < v) — shared by kcore_membership
    and label_propagation (pagerank keeps the DIRECTED multi-edge view
    its mass semantics need). Slim int rows cross ONE coarse
    u-hash dedup exchange; materialized for the iterative consumers."""
    import pyarrow.compute as pc

    n = _ids(sf_dir).count()

    def pair_batch(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate([ids, ids])
        v = np.concatenate([(ids * ids + 3) % n, (ids // 7) % n])
        keep = u != v  # self-loops never count toward degree
        uu = np.minimum(u[keep], v[keep])
        vv = np.maximum(u[keep], v[keep])
        t = pa.table({"u": pa.array(uu, pa.int64()), "v": pa.array(vv, pa.int64())})
        t = t.group_by(["u", "v"]).aggregate([])  # block-local dedup
        return t.append_column(
            "ep", pc.cast(pc.bit_wise_and(t["u"], pa.scalar(63, pa.int64())), pa.int32())
        )

    def global_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    return (
        _ids(sf_dir)
        .map_batches(pair_batch, batch_format="pyarrow")
        .groupby("ep")
        .map_groups(global_dedup, batch_format="pandas")
        .materialize()
    )


def kcore_membership(sf_dir: str, k: int = KCORE_K, max_rounds: int = KCORE_ROUNDS) -> pd.DataFrame:
    """k-core of the derived (undirected, self-loop-free, deduped) doc
    graph: iteratively peel nodes of degree < k until fixpoint — the
    community-density complement of pagerank (authority) and
    triangle_count (local clustering): spam link-rings survive high
    PageRank but collapse under peeling, organic communities persist
    (Seidman 1983; the standard web-graph denoising cut). Returns the
    surviving nodes with their WITHIN-CORE degree (>= k by definition —
    pytest invariant).

    Engine = iterative semi-join peel, the pregel-family machinery with
    a DELETION (not label-exchange) round body: live edges ->
    per-block (node, c) degree partials -> coarse node-hash partition
    sum (one exchange, node-sized) -> dead = deg < k. Dead-node removal
    is HYBRID like dedup_clusters' driver-cap: below KCORE_BCAST_CAP
    the dead-id array broadcasts once (ray.put) and the prune is a
    stateless vectorized np.isin filter (zero shuffle); above it, two
    LEFT-ANTI native hash joins (u-side, v-side) keep the dead set
    distributed — the 100 TB round-1 path where half the corpus can
    die at once. Every round materialize()s the shrinking edge set
    (the dedup_clusters lazy-lineage lesson). Rounds are bounded by
    peel depth; raises loudly past the shared `max_rounds` budget
    (KCORE_ROUNDS — the oracle runs the identical fixed round count,
    idempotent after fixpoint, so both sides fail together if a corpus
    ever peels deeper).

    Oracled by kcore_sql() — chained MATERIALIZED CTEs (one join pair +
    groupby per round; MATERIALIZED is load-bearing: inlined CTEs
    re-open the parquet per reference and hit the fd limit)."""
    if k < 1 or max_rounds < 1:
        raise ValueError(f"need k >= 1 and max_rounds >= 1, got k={k}, max_rounds={max_rounds}")
    live = _undirected_edges(sf_dir)

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate(
            [
                batch["u"].to_numpy(zero_copy_only=False),
                batch["v"].to_numpy(zero_copy_only=False),
            ]
        )
        un, cnt = np.unique(nodes, return_counts=True)
        return pa.table(
            {
                "node": pa.array(un, pa.int64()),
                "c": pa.array(cnt, pa.int64()),
                "dp": pa.array(un & 63, pa.int32()),
            }
        )

    def deg_sum(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", as_index=False).agg(deg=("c", "sum"))

    _empty = pd.DataFrame(
        {"doc_id": pd.Series([], dtype="int64"), "core_deg": pd.Series([], dtype="int64")}
    )

    for _rnd in range(1, max_rounds + 1):
        deg = (
            live.map_batches(deg_partial, batch_format="pyarrow")
            .groupby("dp")
            .map_groups(deg_sum, batch_format="pandas")
            .materialize()
        )
        dead = deg.filter(expr=f"deg < {k}")
        n_dead = dead.count()
        if n_dead == 0:
            out = deg.to_pandas()
            if out.empty:
                return _empty
            return (
                out.rename(columns={"node": "doc_id", "deg": "core_deg"})
                .sort_values("doc_id")
                .reset_index(drop=True)
                .astype({"doc_id": "int64", "core_deg": "int64"})
            )
        if n_dead <= KCORE_BCAST_CAP:
            dead_ref = ray.put(np.sort(dead.to_pandas().node.to_numpy().astype(np.int64)))

            def drop_dead(batch: pa.Table, ref=dead_ref) -> pa.Table:
                arr = ray.get(ref)
                uu = batch["u"].to_numpy(zero_copy_only=False)
                vv = batch["v"].to_numpy(zero_copy_only=False)
                keep = ~(np.isin(uu, arr) | np.isin(vv, arr))
                return batch.filter(pa.array(keep))

            live = live.map_batches(drop_dead, batch_format="pyarrow").materialize()
        else:
            dead_u = dead.map_batches(
                lambda b: pa.table({"u": b["node"]}), batch_format="pyarrow"
            )
            dead_v = dead.map_batches(
                lambda b: pa.table({"v": b["node"]}), batch_format="pyarrow"
            )
            live = (
                live.join(dead_u, join_type="left_anti", num_partitions=8, on=("u",))
                .join(dead_v, join_type="left_anti", num_partitions=8, on=("v",))
                .materialize()
            )
    raise RuntimeError(
        f"k-core peel did not converge in {max_rounds} rounds; raise max_rounds "
        "(and the shared oracle round count KCORE_ROUNDS) — peel depth is "
        "graph-dependent, not corpus-size-dependent"
    )


# --------------------------------------------------------------------------
# label-propagation community detection (synchronous, deterministic ties)
# --------------------------------------------------------------------------

LP_ROUNDS = 3  # fixed synchronous round count, shared engine/oracle


def label_propagation(sf_dir: str, rounds: int = LP_ROUNDS) -> pd.DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the shared undirected doc graph — the third web-graph
    denoising signal next to pagerank (authority) and kcore (density):
    link farms collapse into one community, organic topic clusters stay
    distinct. Determinism: SYNCHRONOUS rounds (the async random-order
    variant of the paper is irreproducible by design) with ties among
    equally-frequent neighbor labels broken toward the SMALLEST label,
    run for a FIXED `rounds` budget on both engine and oracle — parity
    holds even on oscillating (near-bipartite) neighborhoods because
    both sides compute the identical fixed-point-free recurrence.
    Integer-only end to end: labels are doc_ids and votes are COUNTs,
    so there is zero float drift (the zorder/source_budget discipline).

    Round body (all exchanges slim): labels keyed by neighbor -> native
    hash join against the (node, nbr) directed view (16 B label rows) ->
    per-block (node, lab, cnt) pyarrow partials -> coarse node-hash
    partition election (sort by cnt desc, lab asc; first per node) ->
    left-outer join back onto the previous labels (isolated nodes keep
    their own). Each round materialize()s the node-sized label snapshot
    (the dedup_clusters lazy-lineage lesson). Returns per-node
    (doc_id, community), the full label vector value-locked by
    LABEL_PROP_SQL's identical chained-CTE recurrence."""
    from ray.data.aggregate import Sum  # noqa: F401  (parity with siblings)

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    edges = _undirected_edges(sf_dir)

    def both_dirs(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([u, v]), pa.int64()),
                "nbr": pa.array(np.concatenate([v, u]), pa.int64()),
            }
        )

    und = edges.map_batches(both_dirs, batch_format="pyarrow").materialize()

    labels = (
        _ids(sf_dir)
        .map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"], "lab": b["doc_id"]}),
            batch_format="pyarrow",
        )
        .materialize()
    )

    def cnt_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "node": batch["node"],
                "lab": batch["lab"],
                "cnt": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = t.group_by(["node", "lab"]).aggregate([("cnt", "sum")])
        g = g.rename_columns(["node", "lab", "cnt"])
        return g.append_column(
            "lp", pa.array((g["node"].to_numpy() & 63).astype(np.int32))
        )

    def elect(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby(["node", "lab"], as_index=False).agg(cnt=("cnt", "sum"))
        s = s.sort_values(["node", "cnt", "lab"], ascending=[True, False, True])
        w = s.drop_duplicates("node")
        return pd.DataFrame({"doc_id": w.node.to_numpy(), "new_lab": w.lab.to_numpy()})

    for _ in range(rounds):
        lab_by_nbr = labels.map_batches(
            lambda b: pa.table({"nbr": b["doc_id"], "lab": b["lab"]}),
            batch_format="pyarrow",
        )
        winners = (
            und.join(lab_by_nbr, join_type="inner", num_partitions=8, on=("nbr",))
            .map_batches(cnt_partial, batch_format="pyarrow")
            .groupby("lp")
            .map_groups(elect, batch_format="pandas")
        )
        joined = labels.join(winners, join_type="left_outer", num_partitions=8, on=("doc_id",))

        def upd(batch: pa.Table) -> pa.Table:
            nl = batch["new_lab"].to_numpy(zero_copy_only=False).astype(np.float64)
            old = batch["lab"].to_numpy(zero_copy_only=False).astype(np.float64)
            lab = np.where(np.isnan(nl), old, nl).astype(np.int64)
            return pa.table({"doc_id": batch["doc_id"], "lab": pa.array(lab, pa.int64())})

        labels = joined.map_batches(upd, batch_format="pyarrow").materialize()

    out = labels.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return (
        out.rename(columns={"lab": "community"})[["doc_id", "community"]]
        .astype({"doc_id": "int64", "community": "int64"})
    )


def label_propagation_sql(rounds: int = LP_ROUNDS) -> str:
    ctes = [
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents)",
        "e0 AS (\n"
        "  SELECT doc_id AS s, (doc_id * doc_id + 3) % nn.n AS d FROM documents, nn\n"
        "  UNION ALL\n"
        "  SELECT doc_id, (doc_id // 7) % nn.n FROM documents, nn)",
        "edges AS MATERIALIZED (SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v"
        " FROM e0 WHERE s != d)",
        "und AS MATERIALIZED (SELECT u AS node, v AS nbr FROM edges"
        " UNION ALL SELECT v, u FROM edges)",
        "l0 AS MATERIALIZED (SELECT doc_id AS node, doc_id AS lab FROM documents)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"c{i} AS MATERIALIZED (\n"
            f"  SELECT und.node, l.lab, COUNT(*) AS cnt\n"
            f"  FROM und JOIN l{p} l ON l.node = und.nbr GROUP BY und.node, l.lab)"
        )
        ctes.append(
            f"w{i} AS MATERIALIZED (\n"
            "  SELECT node, lab FROM (\n"
            "    SELECT node, lab, ROW_NUMBER() OVER"
            " (PARTITION BY node ORDER BY cnt DESC, lab ASC) AS rn\n"
            f"    FROM c{i}) WHERE rn = 1)"
        )
        ctes.append(
            f"l{i} AS MATERIALIZED (\n"
            f"  SELECT p.node, COALESCE(w.lab, p.lab) AS lab\n"
            f"  FROM l{p} p LEFT JOIN w{i} w ON w.node = p.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(node AS BIGINT) AS doc_id, CAST(lab AS BIGINT) AS community"
        f"\nFROM l{rounds} ORDER BY doc_id"
    )


def kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    ctes = [
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents)",
        "e0 AS (\n"
        "  SELECT doc_id AS s, (doc_id * doc_id + 3) % nn.n AS d FROM documents, nn\n"
        "  UNION ALL\n"
        "  SELECT doc_id, (doc_id // 7) % nn.n FROM documents, nn)",
        "edges AS MATERIALIZED (SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v"
        " FROM e0 WHERE s != d)",
        "s0 AS MATERIALIZED (SELECT doc_id AS node FROM documents)",
    ]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(
            f"d{i} AS MATERIALIZED (\n"
            "  SELECT node, COUNT(*) AS c FROM (\n"
            f"    SELECT e.u AS node FROM edges e JOIN s{p} a ON e.u = a.node"
            f" JOIN s{p} b ON e.v = b.node\n"
            "    UNION ALL\n"
            f"    SELECT e.v FROM edges e JOIN s{p} a ON e.u = a.node"
            f" JOIN s{p} b ON e.v = b.node\n"
            "  ) GROUP BY node)"
        )
        ctes.append(f"s{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE c >= {k})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(d.node AS BIGINT) AS doc_id, CAST(d.c AS BIGINT) AS core_deg"
        f"\nFROM d{rounds} d JOIN s{rounds} s ON d.node = s.node ORDER BY doc_id"
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities (Kleinberg 1999) over the directed doc graph
# --------------------------------------------------------------------------

HITS_ROUNDS = 2  # fixed round budget shared engine/oracle


def hits_scores(sf_dir: str, rounds: int = HITS_ROUNDS) -> pd.DataFrame:
    """HITS hubs/authorities over the DIRECTED multi-edge doc graph
    (pagerank's exact edge view, self-loops and the dst1==dst2
    multi-edge included) — the mutually-recursive complement of
    PageRank's single authority score: hubs point at good authorities,
    authorities are pointed at by good hubs (link directories vs
    content pages separate here, not under PageRank). Runs `rounds`
    full update pairs a := A^T h, h := A a from h0 = 1 **without
    per-round normalization**: normalization only guards overflow, and
    for a fixed round budget the scores stay exact INTEGERS (degree
    sums of degree sums — bounded by max_deg^(2*rounds), tiny in
    int64), so the ONLY float ops are the two final rescale divisions
    (authority * n / sum, hub * n / sum — exact int operands, one
    correctly-rounded division each, round-6 bit parity; the pagerank
    r*n convention).

    Scale contract: every spread step is the pagerank round topology —
    16 B score rows ⋈ edges (native hash join) -> per-block (node, v)
    partials -> node-sized Sum -> left-outer join back for
    zero-score nodes; node-sized materialize per step (the lazy-lineage
    lesson). Nothing driver-side until the final n-row collect."""
    from ray.data.aggregate import Sum

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    nodes = _ids(sf_dir)
    n = nodes.count()
    edges = nodes.map_batches(
        lambda b: _edges_batch(b, n), batch_format="pyarrow"
    ).materialize()

    def _with_zeros(summed):
        """left-outer join the node list so score vectors stay n-row."""
        joined = nodes.join(summed, join_type="left_outer", num_partitions=8, on=("doc_id",))

        def fill(batch: pa.Table) -> pa.Table:
            v = batch["v"].to_numpy(zero_copy_only=False).astype(np.float64)
            v = np.where(np.isnan(v), 0.0, v).astype(np.int64)
            return pa.table({"doc_id": batch["doc_id"], "v": pa.array(v, pa.int64())})

        return joined.map_batches(fill, batch_format="pyarrow").materialize()

    def _spread(scores, key_from: str, key_to: str):
        """v'(y) = sum over edges x->y (or y<-x) of v(x): join scores
        on key_from, integer-sum per key_to."""
        keyed = scores.map_batches(
            lambda b, kf=key_from: pa.table({kf: b["doc_id"], "v": b["v"]}),
            batch_format="pyarrow",
        )
        j = edges.join(keyed, join_type="inner", num_partitions=8, on=(key_from,))

        def partial(batch: pa.Table, kt=key_to) -> pa.Table:
            t = pa.table({"doc_id": batch[kt], "v": batch["v"]})
            g = t.group_by("doc_id").aggregate([("v", "sum")])
            return g.rename_columns(["doc_id", "v"])

        s = (
            j.map_batches(partial, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Sum("v", alias_name="v"))
        )
        return _with_zeros(s)

    ones = nodes.map_batches(
        lambda b: pa.table(
            {"doc_id": b["doc_id"], "v": pa.array(np.ones(len(b), np.int64))}
        ),
        batch_format="pyarrow",
    ).materialize()

    h = ones
    for _ in range(rounds):
        a = _spread(h, "src", "dst")
        h = _spread(a, "dst", "src")

    sa = int(a.sum("v"))
    sh = int(h.sum("v"))
    adf = a.to_pandas().rename(columns={"v": "a"})
    hdf = h.to_pandas().rename(columns={"v": "h"})
    out = adf.merge(hdf, on="doc_id").sort_values("doc_id").reset_index(drop=True)
    out["authority"] = (out.a.astype("int64") * n / sa).round(6)
    out["hub"] = (out.h.astype("int64") * n / sh).round(6)
    return out[["doc_id", "authority", "hub"]].astype({"doc_id": "int64"})


def hits_sql(rounds: int = HITS_ROUNDS) -> str:
    ctes = [
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM documents)",
        "e AS MATERIALIZED (\n"
        "  SELECT doc_id AS src, (doc_id * doc_id + 3) % nn.n AS dst FROM documents, nn\n"
        "  UNION ALL\n"
        "  SELECT doc_id, (doc_id // 7) % nn.n FROM documents, nn)",
        "h0 AS MATERIALIZED (SELECT doc_id, 1 AS v FROM documents)",
    ]
    prev_h = "h0"
    for i in range(1, rounds + 1):
        ctes.append(
            f"a{i} AS MATERIALIZED (\n"
            "  SELECT d.doc_id, COALESCE(s.v, 0) AS v FROM documents d LEFT JOIN (\n"
            f"    SELECT e.dst, SUM({prev_h}.v) AS v FROM e"
            f" JOIN {prev_h} ON {prev_h}.doc_id = e.src GROUP BY e.dst\n"
            "  ) s ON s.dst = d.doc_id)"
        )
        ctes.append(
            f"h{i} AS MATERIALIZED (\n"
            "  SELECT d.doc_id, COALESCE(s.v, 0) AS v FROM documents d LEFT JOIN (\n"
            f"    SELECT e.src, SUM(a{i}.v) AS v FROM e"
            f" JOIN a{i} ON a{i}.doc_id = e.dst GROUP BY e.src\n"
            "  ) s ON s.src = d.doc_id)"
        )
        prev_h = f"h{i}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
ta AS (SELECT SUM(v) AS s FROM a{rounds}),
th AS (SELECT SUM(v) AS s FROM h{rounds})
SELECT a.doc_id,
       ROUND(a.v * nn.n * 1.0 / ta.s, 6) AS authority,
       ROUND(h.v * nn.n * 1.0 / th.s, 6) AS hub
FROM a{rounds} a JOIN h{rounds} h USING (doc_id), nn, ta, th
ORDER BY a.doc_id"""
    )


# --------------------------------------------------------------------------
# multi-source BFS (crawl depth from the seed list)
# --------------------------------------------------------------------------

BFS_ROUNDS = 4
BFS_SEED_MOD = 101
_BFS_BIG = 1 << 31  # unreached sentinel inside the loop; -1 in the output


def bfs_distance(sf_dir: str, rounds: int = BFS_ROUNDS) -> pd.DataFrame:
    """Multi-source BFS over the directed doc graph: dist(v) = min #hops
    from the seed set {doc_id % BFS_SEED_MOD == 0} following out-links,
    bounded at `rounds` hops (unreached -> -1). The crawl-frontier depth
    signal (how far a page sits from the seed list) every crawl scheduler
    keeps next to PageRank — and the FRONTIER-EXPANSION primitive the
    graph family was missing (pagerank/HITS spread mass, kcore peels,
    LPA relabels; BFS grows a set).

    Scale contract (the pagerank round topology, integer-only): per round
    the FRONTIER (rows with d == r, never the full reached set) joins
    edges natively on src -> per-block dst dedup (the candidate value is
    the constant r+1, so the partial is a distinct, not a min) ->
    node-bounded groupby Min -> left-outer min-update against the dist
    snapshot. Each round's dist Dataset is materialize()d (the
    dedup_clusters pregel lesson); rows are 16 B. All arithmetic is int64
    — the oracle equality is exact, no float discipline needed.

    Oracled by bfs_sql(rounds) — the identical chained MATERIALIZED-CTE
    recurrence (one LEFT JOIN min-update per round).
    """
    from ray.data.aggregate import Min

    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    nodes = _ids(sf_dir)
    n = nodes.count()
    edges = nodes.map_batches(
        lambda b: _edges_batch(b, n), batch_format="pyarrow"
    ).materialize()

    def init(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = np.where(ids % BFS_SEED_MOD == 0, 0, _BFS_BIG).astype(np.int64)
        return pa.table({"doc_id": batch["doc_id"], "d": pa.array(d, pa.int64())})

    dist = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for r in range(rounds):
        def frontier_by_src(batch: pa.Table, rr=r) -> pa.Table:
            m = pc.equal(batch["d"], pa.scalar(rr, pa.int64()))
            t = batch.filter(m)
            return pa.table({"src": t["doc_id"], "d": t["d"]})

        frontier = dist.map_batches(
            frontier_by_src, batch_format="pyarrow", batch_size=None
        )
        reached = edges.join(frontier, join_type="inner", num_partitions=8, on=("src",))

        def cand_partial(batch: pa.Table, rr=r) -> pa.Table:
            dst = np.unique(batch["dst"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "doc_id": pa.array(dst, pa.int64()),
                    "cd": pa.array(np.full(len(dst), rr + 1, dtype=np.int64)),
                }
            )

        cand = (
            reached.map_batches(cand_partial, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Min("cd", alias_name="cd"))
        )
        joined = dist.join(cand, join_type="left_outer", num_partitions=8, on=("doc_id",))

        def upd(batch: pa.Table) -> pa.Table:
            d = batch["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            cd = batch["cd"].to_numpy(zero_copy_only=False).astype(np.float64)
            cd = np.where(np.isnan(cd), float(_BFS_BIG), cd).astype(np.int64)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "d": pa.array(np.minimum(d, cd), pa.int64()),
                }
            )

        dist = joined.map_batches(upd, batch_format="pyarrow").materialize()

    out = dist.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["dist"] = np.where(out.d >= _BFS_BIG, -1, out.d).astype("int64")
    return out[["doc_id", "dist"]].astype({"doc_id": "int64"})


def bfs_sql(rounds: int = BFS_ROUNDS) -> str:
    parts = [
        f"""
WITH ids AS MATERIALIZED (SELECT doc_id FROM documents),
e AS MATERIALIZED (
  SELECT doc_id AS src,
         (doc_id * doc_id + 3) % (SELECT COUNT(*) FROM ids) AS dst FROM ids
  UNION ALL
  SELECT doc_id, (doc_id // 7) % (SELECT COUNT(*) FROM ids) FROM ids
),
d0 AS MATERIALIZED (
  SELECT doc_id,
         CASE WHEN doc_id % {BFS_SEED_MOD} = 0 THEN 0 ELSE {_BFS_BIG} END AS d
  FROM ids
)"""
    ]
    for r in range(rounds):
        parts.append(
            f""",
d{r + 1} AS MATERIALIZED (
  SELECT p.doc_id, LEAST(p.d, COALESCE(m.md, {_BFS_BIG})) AS d
  FROM d{r} p LEFT JOIN (
    SELECT e.dst AS doc_id, MIN(s.d) + 1 AS md
    FROM e JOIN d{r} s ON s.doc_id = e.src
    WHERE s.d = {r}
    GROUP BY e.dst
  ) m ON m.doc_id = p.doc_id
)"""
        )
    parts.append(
        f"""
SELECT doc_id,
       CAST(CASE WHEN d >= {_BFS_BIG} THEN -1 ELSE d END AS BIGINT) AS dist
FROM d{rounds} ORDER BY doc_id
"""
    )
    return "".join(parts)


# --------------------------------------------------------------------------
# personalized PageRank (seed-set teleport)
# --------------------------------------------------------------------------


def ppr_seed_set(sf_dir: str, iters: int = PR_ITERS, damping: float = PR_DAMPING) -> pd.DataFrame:
    """Personalized PageRank with teleport restricted to the crawl seed
    set {doc_id % BFS_SEED_MOD == 0} — the seed-proximity score that
    complements bfs_distance (hops) with a stationary-mass notion of
    'how reachable from the whitelist', the TrustRank recipe for
    seeding crawl trust. Identical round topology to pagerank (edges ⋈
    scores native join, per-block partials, node-sized groupby,
    left-outer zero-fill, per-round materialize); the only change is
    the teleport term: (1-d)/|S| on seeds, 0 elsewhere, and the uniform
    init is over seeds. Scores reported * n (the pagerank rescale
    contract) rounded 6. Oracled by ppr_sql(iters) — the same chained
    recurrence with a CASE teleport."""
    from ray.data.aggregate import Sum

    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    nodes = _ids(sf_dir)
    n = nodes.count()
    edges = nodes.map_batches(
        lambda b: _edges_batch(b, n), batch_format="pyarrow"
    ).materialize()

    def seed_mask(ids: np.ndarray) -> np.ndarray:
        return ids % BFS_SEED_MOD == 0

    n_seeds = int(
        nodes.map_batches(
            lambda b: pa.table(
                {
                    "c": pa.array(
                        [int(seed_mask(b["doc_id"].to_numpy(zero_copy_only=False)).sum())],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
        .c.sum()
    )
    if n_seeds == 0:
        raise ValueError("seed set is empty at this corpus size")

    def init(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = np.where(seed_mask(ids), 1.0 / n_seeds, 0.0)
        return pa.table({"doc_id": batch["doc_id"], "r": pa.array(r, pa.float64())})

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()

    for _ in range(iters):
        rank_by_src = ranks.map_batches(
            lambda b: pa.table({"src": b["doc_id"], "r": b["r"]}),
            batch_format="pyarrow",
            batch_size=None,
        )
        contribs = edges.join(rank_by_src, join_type="inner", num_partitions=8, on=("src",))

        def contrib_partial(batch: pa.Table) -> pa.Table:
            t = pa.table(
                {
                    "doc_id": batch["dst"],
                    "c": pa.array(
                        batch["r"].to_numpy(zero_copy_only=False) / 2.0, pa.float64()
                    ),
                }
            )
            g = t.group_by("doc_id").aggregate([("c", "sum")])
            return g.rename_columns(["doc_id", "c"])

        insum = (
            contribs.map_batches(contrib_partial, batch_format="pyarrow", batch_size=None)
            .groupby("doc_id")
            .aggregate(Sum("c", alias_name="c"))
        )
        joined = nodes.join(insum, join_type="left_outer", num_partitions=8, on=("doc_id",))

        def update(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = batch["c"].to_numpy(zero_copy_only=False)
            c = np.where(np.isnan(c), 0.0, c)
            tele = np.where(seed_mask(ids), (1.0 - damping) / n_seeds, 0.0)
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "r": pa.array(tele + damping * c, pa.float64()),
                }
            )

        ranks = joined.map_batches(update, batch_format="pyarrow").materialize()

    out = ranks.to_pandas().sort_values("doc_id").reset_index(drop=True)
    out["rank"] = (out.r * n).round(6)
    return out[["doc_id", "rank"]].astype({"doc_id": "int64"})


def ppr_sql(iters: int = PR_ITERS, damping: float = PR_DAMPING) -> str:
    head = f"""
WITH ids AS MATERIALIZED (SELECT doc_id FROM documents),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM ids),
ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM ids
       WHERE doc_id % {BFS_SEED_MOD} = 0),
e AS MATERIALIZED (
  SELECT doc_id AS src,
         (doc_id * doc_id + 3) % (SELECT COUNT(*) FROM ids) AS dst FROM ids
  UNION ALL
  SELECT doc_id, (doc_id // 7) % (SELECT COUNT(*) FROM ids) FROM ids
),
r0 AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {BFS_SEED_MOD} = 0 THEN 1.0 / ns.ns ELSE 0.0 END AS r
  FROM ids d CROSS JOIN ns
)"""
    parts = [head]
    for t in range(1, iters + 1):
        parts.append(
            f""",
r{t} AS MATERIALIZED (
  SELECT d.doc_id,
         CASE WHEN d.doc_id % {BFS_SEED_MOD} = 0
              THEN (1.0 - {damping}) / ns.ns ELSE 0.0 END
           + {damping} * COALESCE(i.s, 0) / 2 AS r
  FROM ids d CROSS JOIN ns
  LEFT JOIN (
    SELECT e.dst, SUM(p.r) AS s FROM e JOIN r{t - 1} p ON p.doc_id = e.src
    GROUP BY e.dst
  ) i ON i.dst = d.doc_id
)"""
        )
    parts.append(
        f"""
SELECT r{iters}.doc_id, ROUND(r{iters}.r * n.n, 6) AS rank
FROM r{iters} CROSS JOIN n ORDER BY doc_id
"""
    )
    return "".join(parts)


# --------------------------------------------------------------------------
# link reciprocity — mutual-edge pairs
# --------------------------------------------------------------------------


def reciprocal_links(sf_dir: str) -> pd.DataFrame:
    """Link reciprocity over the derived doc graph: unordered pairs
    {u, v}, u < v, with at least one u->v AND one v->u edge — the
    mutual-citation signal link-spam detection keys on (organic link
    graphs are ~asymmetric; link farms trade edges both ways; the
    classic web-graph reciprocity statistic). Completes the structural
    family: pagerank/HITS spread mass, kcore peels, triangles close
    wedges, this measures SYMMETRY.

    One streaming pass derives edges per block (the shared pagerank
    topology), normalizes to (lo, hi, dir) with self-loops dropped,
    dedups per block, then one distinct-pair-sized groupby folds max
    fwd/bwd flags; reciprocal pairs are the both-flags rows. Output is
    the count plus an order-independent pair digest (sum of
    (u * 1000003 + v) mod 2^31 — locks pair identities without a
    row-per-pair artifact at web scale) and the two smallest pairs'
    endpoints inline as a spot anchor."""
    from ray.data.aggregate import Max

    ids_ds = _ids(sf_dir)
    n = ids_ds.count()

    def pair_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        dst1 = (ids * ids + 3) % n
        dst2 = (ids // 7) % n
        src = np.concatenate([ids, ids])
        dst = np.concatenate([dst1, dst2])
        m = src != dst  # self-loops carry no reciprocity
        src, dst = src[m], dst[m]
        lo = np.minimum(src, dst)
        hi = np.maximum(src, dst)
        fwd = (src < dst).astype(np.int64)  # direction lo->hi
        df = pd.DataFrame({"lo": lo, "hi": hi, "fwd": fwd, "bwd": 1 - fwd})
        g = df.groupby(["lo", "hi"], as_index=False).max()
        return pa.Table.from_pandas(g, preserve_index=False)

    pairs = (
        ids_ds.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lo", "hi"])
        .aggregate(Max("fwd", alias_name="fwd"), Max("bwd", alias_name="bwd"))
    )

    def fold(batch: pa.Table) -> pa.Table:
        lo = batch["lo"].to_numpy()
        hi = batch["hi"].to_numpy()
        rec = (batch["fwd"].to_numpy() == 1) & (batch["bwd"].to_numpy() == 1)
        dig = int(((lo[rec] * 1000003 + hi[rec]) % (1 << 31)).sum())
        return pa.table(
            {
                "n_pairs": pa.array([int(rec.sum())], pa.int64()),
                "pair_digest": pa.array([dig], pa.int64()),
            }
        )

    agg = pairs.map_batches(fold, batch_format="pyarrow", batch_size=None).to_pandas().sum()
    return pd.DataFrame(
        {
            "n_pairs": pd.Series([int(agg.n_pairs)], dtype="int64"),
            "pair_digest": pd.Series([int(agg.pair_digest)], dtype="int64"),
        }
    )


RECIPROCAL_LINKS_SQL = """
WITH nn AS (SELECT COUNT(*) AS n FROM documents),
e AS (
  SELECT doc_id AS src, (doc_id * doc_id + 3) % nn.n AS dst FROM documents CROSS JOIN nn
  UNION ALL
  SELECT doc_id, (doc_id // 7) % nn.n FROM documents CROSS JOIN nn
),
p AS (
  SELECT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS bwd
  FROM e WHERE src != dst GROUP BY 1, 2
),
r AS (SELECT lo, hi FROM p WHERE fwd = 1 AND bwd = 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COALESCE(SUM((lo * 1000003 + hi) % 2147483648), 0) AS BIGINT) AS pair_digest
FROM r
"""


# --------------------------------------------------------------------------
# local clustering coefficient — per-degree profile
# --------------------------------------------------------------------------


def clustering_coefficient(sf_dir: str) -> pd.DataFrame:
    """Per-degree local clustering-coefficient profile over the
    undirected derived graph: cc_v = 2*T_v / (d_v * (d_v - 1)) — the
    per-NODE refinement of triangle_count's global census and the
    standard link-farm discriminator (spam rings have near-clique cc at
    every degree; organic graphs decay with degree). Output one row per
    degree: node count, incident-triangle sum, and sum_cc_e6 =
    sum over nodes of floor(2*T_v*1e6 / (d(d-1))) — per-node integer
    floor then integer sum, so the profile is EXACT on both sides (no
    float ordering anywhere).

    Scale: triangle_count's min-vertex machinery with the closed wedge
    carrying its three vertex ids; each triangle explodes to 3 (node, 1)
    rows -> per-block partials -> node-sized groupby; degrees fold from
    the edge list the same way; isolated nodes (self-loop-only) rejoin
    via the node list with d = 0."""
    from ray.data.aggregate import Sum

    n = _ids(sf_dir).count()
    n_parts = 64

    def canon(batch: pa.Table) -> pa.Table:
        e = _edges_batch(batch, n)
        src = e["src"].to_numpy()
        dst = e["dst"].to_numpy()
        keep = src != dst
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        df["part"] = (df.u % n_parts).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (
        _ids(sf_dir)
        .map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: g[["u", "v"]].drop_duplicates(), batch_format="pandas")
        .materialize()
    )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="u")
        m = m[m.v_x < m.v_y]
        return pd.DataFrame(
            {
                "p": m.u.to_numpy(),
                "k": [f"{a}:{b}" for a, b in zip(m.v_x, m.v_y)],
            }
        )

    def repart(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "part", pa.array((batch["u"].to_numpy() % n_parts).astype(np.int32))
        )

    wedge_ds = (
        edges.map_batches(repart, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pandas")
    )

    def ekey(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": pa.array(
                    [f"{a}:{b}" for a, b in zip(batch["u"].to_pylist(), batch["v"].to_pylist())],
                    pa.string(),
                )
            }
        )

    closed = wedge_ds.join(
        edges.map_batches(ekey, batch_format="pyarrow"),
        join_type="inner",
        num_partitions=8,
        on=("k",),
    )

    def tri_nodes(batch: pa.Table) -> pa.Table:
        p = batch["p"].to_numpy()
        ks = batch["k"].to_pylist()
        v1 = np.array([int(s.split(":")[0]) for s in ks], dtype=np.int64)
        v2 = np.array([int(s.split(":")[1]) for s in ks], dtype=np.int64)
        nodes = np.concatenate([p, v1, v2])
        df = pd.DataFrame({"node": nodes}).groupby("node", as_index=False).size()
        return pa.Table.from_pandas(df.rename(columns={"size": "t"}), preserve_index=False)

    tri = (
        closed.map_batches(tri_nodes, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("t", alias_name="t"))
        .to_pandas()
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([batch["u"].to_numpy(), batch["v"].to_numpy()])
        df = pd.DataFrame({"node": nodes}).groupby("node", as_index=False).size()
        return pa.Table.from_pandas(df.rename(columns={"size": "d"}), preserve_index=False)

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .to_pandas()
    )

    ids = _ids(sf_dir).to_pandas().rename(columns={"doc_id": "node"})
    full = ids.merge(deg, on="node", how="left").merge(tri, on="node", how="left").fillna(0)
    full["d"] = full["d"].astype("int64")
    full["t"] = full["t"].astype("int64")
    cc_e6 = np.where(
        full.d >= 2, (2 * full.t * 1_000_000) // (full.d * (full.d - 1)), 0
    ).astype("int64")
    out = (
        full.assign(cc_e6=cc_e6, n_nodes=1)
        .groupby("d", as_index=False)
        .agg(n_nodes=("n_nodes", "sum"), sum_tri=("t", "sum"), sum_cc_e6=("cc_e6", "sum"))
        .rename(columns={"d": "degree"})
        .sort_values("degree")
        .reset_index(drop=True)
    )
    return out.astype(
        {"degree": "int64", "n_nodes": "int64", "sum_tri": "int64", "sum_cc_e6": "int64"}
    )


CLUSTERING_COEFF_SQL = """
WITH ids AS (SELECT doc_id AS id FROM documents),
nn AS (SELECT COUNT(*) AS n FROM ids),
raw AS (
  SELECT id AS src, (id * id + 3) % nn.n AS dst FROM ids, nn
  UNION ALL
  SELECT id, (id // 7) % nn.n FROM ids, nn),
e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM raw WHERE src <> dst),
w AS (SELECT a.u AS p, a.v AS v1, b.v AS v2 FROM e a JOIN e b ON a.u = b.u AND a.v < b.v),
tri AS (SELECT w.p, w.v1, w.v2 FROM w JOIN e ON e.u = w.v1 AND e.v = w.v2),
tn AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT p AS node FROM tri
    UNION ALL SELECT v1 FROM tri
    UNION ALL SELECT v2 FROM tri
  ) GROUP BY node
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
),
allnodes AS (
  SELECT ids.id AS node, COALESCE(deg.d, 0) AS d, COALESCE(tn.t, 0) AS t
  FROM ids LEFT JOIN deg ON deg.node = ids.id LEFT JOIN tn ON tn.node = ids.id
)
SELECT d AS degree, COUNT(*) AS n_nodes,
       CAST(SUM(t) AS BIGINT) AS sum_tri,
       CAST(SUM(CASE WHEN d >= 2 THEN (2 * t * 1000000) // (d * (d - 1)) ELSE 0 END) AS BIGINT)
         AS sum_cc_e6
FROM allnodes GROUP BY d ORDER BY d
"""


# --------------------------------------------------------------------------
# degree assortativity (Newman 2002)
# --------------------------------------------------------------------------


def degree_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree-assortativity coefficient (Newman 2002) over the undirected
    derived graph: the Pearson correlation of endpoint degrees across
    edges — THE structural mixing statistic (social graphs are
    assortative, the web is disassortative: hubs link to leaves; a
    sudden shift flags synthetic link structure). Completes the
    structural family next to clustering_coefficient and
    reciprocal_links.

    Exact-integer sufficient statistics (the regression_by_lang shape):
    each undirected edge contributes BOTH orderings (du,dv),(dv,du), so
    sum_x == sum_y and the Pearson r closes from (M, Σx, Σxx, Σxy) big
    ints with ONE exact division driver-side (engine divides exact big
    ints — correctly rounded; oracle casts HUGEINT->DOUBLE then divides,
    ~1e-16 apart, 10 orders under the round-6 gate).

    Scale: the degree table is node-sized; attaching du/dv is two
    native 16 B-row hash joins (edges never carry payloads); moments
    fold to ONE row per block."""
    from ray.data.aggregate import Sum

    n = _ids(sf_dir).count()
    n_parts = 64

    def canon(batch: pa.Table) -> pa.Table:
        e = _edges_batch(batch, n)
        src = e["src"].to_numpy()
        dst = e["dst"].to_numpy()
        keep = src != dst
        u = np.minimum(src[keep], dst[keep])
        v = np.maximum(src[keep], dst[keep])
        df = pd.DataFrame({"u": u, "v": v}).drop_duplicates()
        df["part"] = (df.u % n_parts).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    edges = (
        _ids(sf_dir)
        .map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: g[["u", "v"]].drop_duplicates(), batch_format="pandas")
        .materialize()
    )

    def deg_partial(batch: pa.Table) -> pa.Table:
        nodes = np.concatenate([batch["u"].to_numpy(), batch["v"].to_numpy()])
        df = pd.DataFrame({"node": nodes}).groupby("node", as_index=False).size()
        return pa.Table.from_pandas(df.rename(columns={"size": "d"}), preserve_index=False)

    deg = (
        edges.map_batches(deg_partial, batch_format="pyarrow", batch_size=None)
        .groupby("node")
        .aggregate(Sum("d", alias_name="d"))
        .materialize()
    )

    du = edges.join(
        deg.map_batches(
            lambda b: pa.table({"u": b["node"], "du": b["d"]}), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=8,
        on=("u",),
    )
    both = du.join(
        deg.map_batches(
            lambda b: pa.table({"v": b["node"], "dv": b["d"]}), batch_format="pyarrow"
        ),
        join_type="inner",
        num_partitions=8,
        on=("v",),
    )

    def moments(batch: pa.Table) -> pa.Table:
        a = batch["du"].to_numpy()
        b = batch["dv"].to_numpy()
        # both orderings: x over (a ++ b), y over (b ++ a)
        sx = int(a.sum() + b.sum())
        sxx = int((a * a).sum() + (b * b).sum())
        sxy = int(2 * (a * b).sum())
        return pa.table(
            {
                "m": pa.array([2 * len(a)], pa.int64()),
                "sx": pa.array([sx], pa.int64()),
                "sxx": pa.array([sxx], pa.int64()),
                "sxy": pa.array([sxy], pa.int64()),
            }
        )

    agg = both.map_batches(moments, batch_format="pyarrow", batch_size=None).to_pandas().sum()
    m, sx, sxx, sxy = (int(agg[c]) for c in ("m", "sx", "sxx", "sxy"))
    num = m * sxy - sx * sx
    den = m * sxx - sx * sx
    return pd.DataFrame(
        {
            "m_ordered_pairs": pd.Series([m], dtype="int64"),
            "sum_deg": pd.Series([sx], dtype="int64"),
            "assortativity": [round(num / den, 6)],
        }
    )


ASSORTATIVITY_SQL = """
WITH ids AS (SELECT doc_id AS id FROM documents),
nn AS (SELECT COUNT(*) AS n FROM ids),
raw AS (
  SELECT id AS src, (id * id + 3) % nn.n AS dst FROM ids, nn
  UNION ALL
  SELECT id, (id // 7) % nn.n FROM ids, nn),
e AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
      FROM raw WHERE src <> dst),
deg AS (
  SELECT node, CAST(COUNT(*) AS HUGEINT) AS d FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
),
pairs AS (
  SELECT a.d AS x, b.d AS y
  FROM e JOIN deg a ON a.node = e.u JOIN deg b ON b.node = e.v
  UNION ALL
  SELECT b.d, a.d
  FROM e JOIN deg a ON a.node = e.u JOIN deg b ON b.node = e.v
),
mom AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS m, SUM(x) AS sx,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pairs
)
SELECT CAST(m AS BIGINT) AS m_ordered_pairs,
       CAST(sx AS BIGINT) AS sum_deg,
       ROUND(CAST(m * sxy - sx * sx AS DOUBLE)
             / CAST(m * sxx - sx * sx AS DOUBLE), 6) AS assortativity
FROM mom
"""
