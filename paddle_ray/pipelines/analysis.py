"""Text-analysis pipelines over `documents`: token counting, quality
scoring, language ID, fingerprinting, extraction-side stats.

All hot paths are map_batches with per-batch vectorized/linear kernels
from functions/textstats.py; aggregates pre-reduce per batch before any
groupby. SQL-expressible ops carry DuckDB oracles in __ray_entry__.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.textstats import (
    _B as _FP_B,
    _MOD as _FP_MOD,
    bpe_token_count,
    detect_lang,
    quality_features,
    token_count,
    winnow_fingerprint,
)
from .common import sized_read_parquet


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def token_counts(sf_dir: str) -> pd.DataFrame:
    """Per-doc whitespace + BPE-ish token counts (oracled)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
                "n_bpe_tokens": pa.array([bpe_token_count(t) for t in texts], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+')) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality features (stop_ratio oracled via list_filter)."""

    def f(batch: pa.Table) -> pa.Table:
        rows = [quality_features(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
                "stop_ratio": pa.array([r["stop_ratio"] for r in rows], pa.float64()),
                "mean_word_len": pa.array([r["mean_word_len"] for r in rows], pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
)
SELECT doc_id,
       len(ts) AS n_tokens,
       ROUND(CASE WHEN len(ts) = 0 THEN 0.0 ELSE len(list_filter(ts, t -> lower(t) IN
         ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
         * 1.0 / len(ts) END, 6) AS stop_ratio,
       ROUND(CASE WHEN len(ts) = 0 THEN 0.0
                  ELSE list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts) END, 6) AS mean_word_len
FROM toks ORDER BY doc_id
"""


def lang_id(sf_dir: str) -> pd.DataFrame:
    """Heuristic language ID per doc (value-oracled: the marker/script
    heuristic is re-expressed in SQL — LANG_ID_SQL — so the driver
    hash-checks predictions, not just row counts)."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array([detect_lang(t) for t in batch["text"].to_pylist()], pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


def _marker_count_sql(marker: str) -> str:
    """Non-overlapping occurrence count of `marker` in `probe` — same
    semantics as str.count (both scan greedily left-to-right)."""
    esc = marker.replace("'", "''")
    return f"(length(probe) - length(replace(probe, '{esc}', ''))) // {len(marker)}"


def _lang_id_sql() -> str:
    """DuckDB twin of functions/textstats.detect_lang, generated from the
    SAME _LANG_MARKERS table so heuristic and oracle cannot drift.

    Tie-break: detect_lang takes max() over sorted(lang) keys, i.e. the
    alphabetically-first language wins ties — the CASE arms below test
    langs in sorted order with >= so first-max wins identically."""
    from ..functions.textstats import _LANG_MARKERS

    marked = sorted(lang for lang, ms in _LANG_MARKERS.items() if ms)
    scores = ",\n           ".join(
        f"({' + '.join(_marker_count_sql(m) for m in _LANG_MARKERS[lang])}) AS s_{lang}"
        for lang in marked
    )
    arms = []
    for idx, lang in enumerate(marked):
        rest = marked[idx + 1 :]
        if rest:
            cond = " AND ".join(f"s_{lang} >= s_{o}" for o in rest)
            arms.append(f"WHEN {cond} THEN '{lang}'")
        else:
            arms.append(f"ELSE '{lang}'")
    arm_sql = "\n            ".join(arms)
    greatest = ", ".join(f"s_{lang}" for lang in marked)
    return f"""
WITH p AS (
    SELECT doc_id,
           lower(substr(text, 1, 2000)) AS probe,
           substr(text, 1, 2000) AS raw
    FROM documents
),
s AS (
    SELECT doc_id,
           length(regexp_replace(raw, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS n_cjk,
           length(regexp_replace(raw, '[^\\x{{0900}}-\\x{{097f}}]', '', 'g')) AS n_deva,
           length(probe) AS plen,
           {scores}
    FROM p
)
SELECT doc_id,
       CASE WHEN plen = 0 THEN 'und'
            WHEN n_cjk > plen * 0.05 THEN 'zh'
            WHEN n_deva > plen * 0.05 THEN 'hi'
            WHEN greatest({greatest}) = 0 THEN 'und'
            {arm_sql} END AS pred_lang
FROM s ORDER BY doc_id
"""


LANG_ID_SQL = _lang_id_sql()


def content_hashes(sf_dir: str) -> pd.DataFrame:
    """sha256 per doc (oracled — the lineage hash used by manifests)."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_hash": pa.array(
                    [hashlib.sha256(t.encode()).hexdigest() for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


CONTENT_HASHES_SQL = """
SELECT doc_id, sha256(text) AS content_hash FROM documents ORDER BY doc_id
"""


def fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprints (rolling k-gram hashes, min per window).
    Value-oracled: FINGERPRINTS_SQL re-derives the identical Rabin-Karp
    winnow in DuckDB (HUGEINT modular prefix sums + window MIN), so the
    driver hash-checks fingerprint values. Returns doc_id + fingerprint
    size + first fingerprint value (stable summary columns)."""

    def f(batch: pa.Table) -> pa.Table:
        fps = [winnow_fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fp": pa.array([len(fp) for fp in fps], pa.int64()),
                "fp_head": pa.array([(fp[0] if fp else 0) - (1 << 60) for fp in fps], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


def _fingerprints_sql() -> str:
    """DuckDB twin of functions/textstats.winnow_fingerprint (k=8,
    window=16) over `documents` — value-oracles the Rabin-Karp winnow.

    Math: the Python kernel's k-gram hash is W_j = sum c_t * B^(e-t) mod M
    (t = j..e, e = j+k-1, M = 2^61-1 prime). With invB = B^-1 mod M and
    the modular prefix sum S_i = sum_{t<=i} (c_t * invB^t mod M) — summed
    RAW in HUGEINT, 2000 terms * 2^61 < 2^127, no overflow — each window
    is W_j = ((S_e - S_{j-1}) mod M) * B^e mod M. Powers come from one
    recursive CTE; B^e * (diff mod M) < 2^122 stays inside HUGEINT.

    Pitfall encoded here: LAG(s, k) must run in its own CTE BEFORE the
    i >= k filter — a WHERE in the same SELECT filters rows before window
    evaluation and the lag would fall off the front (silently COALESCEd
    to 0 for every window after the first).

    Preconditions (asserted true of the test tables at every sf): ASCII
    text (unicode(substr(..)) == Python ord) and len(text) >= k+window-1
    so the short-document branches of the kernel never trigger."""
    shift = 1 << 60  # fp_head offset used by fingerprints() for int64 output
    return (
        _winnow_cte_prefix()
        + f"""
SELECT doc_id,
       COUNT(*) FILTER (WHERE prev IS NULL OR mv != prev) AS n_fp,
       CAST(MIN(CASE WHEN j = 1 THEN mv END) - {shift} AS BIGINT) AS fp_head
FROM kept CROSS JOIN guard WHERE guard.ok = 1 GROUP BY doc_id ORDER BY doc_id
"""
    )


def _winnow_cte_prefix() -> str:
    """The shared Rabin-Karp + winnow CTE chain (pows..kept + guard),
    used by both the per-doc fingerprint oracle and the MOSS pair
    oracle — one source of truth for the hash math."""
    B = _FP_B
    M = _FP_MOD
    inv_b = pow(B, M - 2, M)
    return f"""
WITH RECURSIVE pows(i, p, invp) AS (
    SELECT 0, CAST(1 AS HUGEINT), CAST(1 AS HUGEINT)
    UNION ALL
    SELECT i + 1, (p * {B}) % {M}, (invp * {inv_b}) % {M}
    FROM pows WHERE i < 5000
),
chars AS (
    SELECT d.doc_id, gs.i,
           unicode(substr(d.text, CAST(gs.i AS INTEGER), 1)) AS c,
           length(d.text) AS n
    FROM documents d, LATERAL unnest(generate_series(1, length(d.text))) AS gs(i)
),
terms AS (
    SELECT ch.doc_id, ch.i, ch.n, pw.p,
           SUM((CAST(ch.c AS HUGEINT) * pw.invp) % {M})
               OVER (PARTITION BY ch.doc_id ORDER BY ch.i ROWS UNBOUNDED PRECEDING) AS s
    FROM chars ch JOIN pows pw ON pw.i = ch.i
),
lagged AS (
    SELECT doc_id, i, n, p, s,
           COALESCE(LAG(s, 8) OVER (PARTITION BY doc_id ORDER BY i), 0) AS s_prev
    FROM terms
),
winhash AS (
    SELECT doc_id, i - 7 AS j, n,
           (((s - s_prev) % {M}) * p) % {M} AS w
    FROM lagged WHERE i >= 8
),
mins AS (
    SELECT doc_id, j, n,
           MIN(w) OVER (PARTITION BY doc_id ORDER BY j
                        ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS mv
    FROM winhash
),
kept AS (
    SELECT doc_id, j, mv,
           LAG(mv) OVER (PARTITION BY doc_id ORDER BY j) AS prev
    FROM mins WHERE j <= n - 7 - 15
),
guard AS (
    -- the pows CTE stops at i = 5000 (a recursive CTE iterates once per
    -- row: 32k rows cost ~4.5 s, too slow for the gate), and the INNER
    -- join in `terms` would SILENTLY drop characters past that bound.
    -- Fail loudly instead of wrong-hashing the tail.
    SELECT CASE WHEN max(length(text)) > 5000 THEN error(
        'fingerprints oracle: document exceeds the 5000-char pows bound; raise the recursive-CTE limit')
        ELSE 1 END AS ok
    FROM documents
)
"""


FINGERPRINTS_SQL = _fingerprints_sql()


def lang_doc_stats(sf_dir: str) -> pd.DataFrame:
    """groupby(lang): doc count + char sum (partial agg per batch first)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("lang", as_index=False).agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "sum_chars": "int64"})


LANG_DOC_STATS_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def hll_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate COUNT(DISTINCT user_id) per event_type via a mergeable
    HyperLogLog sketch (functions/sketch.py): one 4 KiB register row per
    (event_type, batch) partial, elementwise-max merged driver-side. At
    scale the shuffle carries O(#blocks x 4 KiB) regardless of user
    cardinality — the scale path where events_distinct_users' exact
    two-level distinct would move every distinct pair.

    Rows-only driver check (approximation is engine-defined); accuracy is
    locked by tests/test_sketch.py (<3% rel. error vs exact)."""
    import numpy as np

    from ..functions.sketch import HLL_M, hash64_ints, hll_estimate, hll_merge, hll_partial

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        types, regs = [], []
        for et, g in df.groupby("event_type"):
            types.append(et)
            regs.append(hll_partial(hash64_ints(g.user_id.to_numpy())))
        reg_lists = np.stack(regs).tolist() if regs else []  # empty block => empty partial
        return pa.table(
            {
                "event_type": pa.array(types, pa.string()),
                "regs": pa.array(reg_lists, pa.list_(pa.uint8(), HLL_M)),
            }
        )

    parts = (
        sized_read_parquet(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    rows = []
    for et, g in parts.groupby("event_type"):
        regs = hll_merge(np.stack([np.asarray(r, dtype=np.uint8) for r in g.regs]))
        rows.append({"event_type": et, "approx_users": int(round(hll_estimate(regs)))})
    return pd.DataFrame(rows).sort_values("event_type").reset_index(drop=True).astype(
        {"approx_users": "int64"}
    )


def corr_quantity_price(sf_dir: str) -> pd.DataFrame:
    """Sample correlation corr(l_quantity, l_extendedprice) per returnflag
    via distributive moment sums (n, Σx, Σy, Σxx, Σyy, Σxy) — one partial
    row per (flag, batch), exact final assembly driver-side."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("l_returnflag")
        agg = pd.DataFrame(
            {
                "n": g.size(),
                "sx": g.l_quantity.sum(),
                "sy": g.l_extendedprice.sum(),
                "sxx": g.apply(lambda d: float((d.l_quantity**2).sum()), include_groups=False),
                "syy": g.apply(lambda d: float((d.l_extendedprice**2).sum()), include_groups=False),
                "sxy": g.apply(
                    lambda d: float((d.l_quantity * d.l_extendedprice).sum()), include_groups=False
                ),
            }
        ).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    s = (
        sized_read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_returnflag", "l_quantity", "l_extendedprice"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("l_returnflag")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values("l_returnflag")
        .reset_index(drop=True)
    )
    n = s.n.astype(float)
    # sample covariance/correlation (n-1 denominators cancel in corr)
    cov = (s.sxy - s.sx * s.sy / n) / (n - 1)
    sdx = np.sqrt((s.sxx - s.sx**2 / n) / (n - 1))
    sdy = np.sqrt((s.syy - s.sy**2 / n) / (n - 1))
    return pd.DataFrame(
        {
            "l_returnflag": s.l_returnflag,
            "n": s.n.astype("int64"),
            "corr_qty_price": (cov / (sdx * sdy)).round(6),
        }
    )


CORR_SQL = """
SELECT l_returnflag, COUNT(*) AS n,
       ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def orders_by_year_status(sf_dir: str) -> pd.DataFrame:
    """Rollup by (year, status): date-function coverage + two-key groupby
    with per-batch partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["yr"] = df.o_orderdate.dt.year.astype("int64")
        g = df.groupby(["yr", "o_orderstatus"], as_index=False).agg(
            n_orders=("o_orderdate", "size"), total=("o_totalprice", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        sized_read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_orderstatus", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["yr", "o_orderstatus"])
        .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("total", alias_name="total"))
        .to_pandas()
        .sort_values(["yr", "o_orderstatus"])
        .reset_index(drop=True)
    )
    out["total"] = out.total.round(4)
    return out.astype({"yr": "int64", "n_orders": "int64"})


ORDERS_BY_YEAR_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, o_orderstatus,
       COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS total
FROM orders GROUP BY 1, 2 ORDER BY yr, o_orderstatus
"""


def lang_source_list(sf_dir: str) -> pd.DataFrame:
    """Ordered string_agg: per-lang comma-joined sorted distinct sources.
    Two-level distinct (local per batch, then global) so the shuffle moves
    one row per distinct pair per block; the join-to-string happens on the
    tiny distinct result."""
    from ray.data.aggregate import Count

    def local_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["lang", "source"]).aggregate([])

    pairs = (
        _docs(sf_dir, columns=("lang", "source"))
        .map_batches(local_distinct, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "source"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    out = (
        pairs.sort_values(["lang", "source"])
        .groupby("lang", as_index=False)
        .agg(sources=("source", ",".join))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out


LANG_SOURCE_LIST_SQL = """
SELECT lang, string_agg(source, ',' ORDER BY source) AS sources
FROM (SELECT DISTINCT lang, source FROM documents)
GROUP BY lang ORDER BY lang
"""


def approx_quantile_chars(sf_dir: str) -> pd.DataFrame:
    """Approximate per-lang n_chars quantiles via the mergeable
    log-histogram sketch (functions/sketch.py) — the scale path beside
    lang_quantile_chars' exact map_groups: the shuffle carries one
    ~2 KB count vector per (lang, block) regardless of row count, where
    the exact form moves every row of the group.

    Rows-only driver check (the estimate is engine-defined); accuracy vs
    the exact quantiles is locked by tests/test_sketch.py (<8% rel err,
    the 240-bin log-spacing bound)."""
    import numpy as np

    from ..functions.sketch import HIST_BINS, hist_partial, hist_quantile

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        langs, counts = [], []
        for lang, g in df.groupby("lang"):
            langs.append(lang)
            counts.append(hist_partial(g.n_chars.to_numpy()).tolist())
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "counts": pa.array(counts, pa.list_(pa.int64(), HIST_BINS + 2)),
            }
        )

    parts = (
        _docs(sf_dir, columns=("lang", "n_chars"))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    rows = []
    for lang, g in parts.groupby("lang"):
        merged = np.sum(np.stack([np.asarray(c, dtype=np.int64) for c in g.counts]), axis=0)
        rows.append(
            {
                "lang": lang,
                "p50_approx": round(hist_quantile(merged, 0.5), 4),
                "p90_approx": round(hist_quantile(merged, 0.9), 4),
                "p99_approx": round(hist_quantile(merged, 0.99), 4),
            }
        )
    return pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)


# --------------------------------------------------------------------------
# order-independent table checksum (anti-entropy / replica verification)
# --------------------------------------------------------------------------

# per-ROW values are reduced mod 2^31 BEFORE summation, so the engine's
# int64 partial-sum tree stays exact up to 2^32 blocks (sum < #blocks x
# 2^31 < 2^63) and the oracle's HUGEINT SUM agrees after one final mod —
# a 2^62 modulus overflowed the distributed Sum at >2 partials
CHECKSUM_MOD = 1 << 31


def table_checksum(sf_dir: str) -> pd.DataFrame:
    """Order-independent per-lang content checksum of `documents`: sum
    of each row's mod-2^31-reduced md5-prefix integer over a canonical
    field serialization, reduced mod 2^31 again at the end. The anti-entropy primitive for verifying two
    copies of a corpus (replica sync, migration, resume output vs
    one-shot output) WITHOUT sorting or shuffling content — per-block
    partial sums are commutative, so the only shuffle is a #langs-sized
    groupby of int64 partials. Oracled by TABLE_CHECKSUM_SQL (identical
    serialization and modulus)."""
    import hashlib

    import pyarrow as pa

    from ray.data.aggregate import Sum

    from .common import sized_read_parquet

    def partial(batch: pa.Table) -> pa.Table:
        langs, sums, counts = {}, {}, {}
        for d, t, lang, s, n in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["source"].to_pylist(),
            batch["n_chars"].to_pylist(),
        ):
            # canonical serialization: unit-separator-joined fields in
            # schema order — any field change flips the row hash
            row = f"{d}\x1f{t}\x1f{lang}\x1f{s}\x1f{n}"
            h = int(hashlib.md5(row.encode()).hexdigest()[:15], 16) % CHECKSUM_MOD
            sums[lang] = sums.get(lang, 0) + h
            counts[lang] = counts.get(lang, 0) + 1
        ks = sorted(sums)
        return pa.table(
            {
                "lang": pa.array(ks, pa.string()),
                "checksum": pa.array([sums[k] for k in ks], pa.int64()),
                "n_rows": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df["checksum"] = df.checksum % CHECKSUM_MOD
        return df

    out = (
        sized_read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text", "lang", "source", "n_chars"],
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("checksum", alias_name="checksum"), Sum("n_rows", alias_name="n_rows"))
        .to_pandas()
        .pipe(finish)
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"checksum": "int64", "n_rows": "int64"})


TABLE_CHECKSUM_SQL = f"""
SELECT lang,
       CAST(SUM(CAST(CONCAT('0x', substr(md5(
           CAST(doc_id AS VARCHAR) || chr(31) || text || chr(31) || lang
           || chr(31) || source || chr(31) || CAST(n_chars AS VARCHAR)
       ), 1, 15)) AS BIGINT) % {CHECKSUM_MOD}) % {CHECKSUM_MOD} AS BIGINT) AS checksum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM documents GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# word-distribution entropy (quality signal: gibberish / boilerplate both
# sit at distribution extremes)
# --------------------------------------------------------------------------

def word_entropy(sf_dir: str) -> pd.DataFrame:
    """Per-doc Shannon entropy (nats) of the word distribution — the
    classic webtext quality signal: keyword-stuffed/repetitive pages
    score low, random-gibberish pages score near log(n). Stateless
    per-batch kernel, no shuffle; float contract: p = c/n computed in
    float64, summed per doc and rounded to 6 (magnitudes ~3, reorder
    noise ~1e-15 — well inside the rounding). Oracled by
    WORD_ENTROPY_SQL (identical expression). Empty-doc arm: both sides
    drop docs with no ASCII-non-space character (the oracle's
    regexp_matches guard ≙ Python's split() -> [] on ASCII text; a
    plain trim(text) != '' would keep '\\t\\n' docs and split them into
    [''] phantom tokens). Unicode whitespace diverges between Python
    split and RE2 \\S — the corpus ASCII contract (see _words in
    webtext.py) applies."""
    import math
    from collections import Counter

    import pyarrow as pa

    from .common import sized_read_parquet

    def f(batch: pa.Table) -> pa.Table:
        ids, ns, hs = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ws = t.split()
            n = len(ws)
            if n == 0:
                continue  # oracle's WHERE trim(text) != '' arm
            s = 0.0
            for c in Counter(ws).values():
                p = c * 1.0 / n
                s += p * math.log(p)
            ids.append(d)
            ns.append(n)
            hs.append(round(-s, 6))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_words": pa.array(ns, pa.int64()),
                "entropy": pa.array(hs, pa.float64()),
            }
        )

    return (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(f, batch_format="pyarrow")
        .sort("doc_id")
        .to_pandas()
    )


WORD_ENTROPY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
),
cw AS (SELECT doc_id, w, COUNT(*) AS c FROM toks GROUP BY 1, 2),
n AS (SELECT doc_id, SUM(c) AS n FROM cw GROUP BY 1)
SELECT cw.doc_id, CAST(n.n AS BIGINT) AS n_words,
       ROUND(-SUM((c * 1.0 / n.n) * ln(c * 1.0 / n.n)), 6) AS entropy
FROM cw JOIN n USING (doc_id)
GROUP BY cw.doc_id, n.n ORDER BY cw.doc_id
"""


# --------------------------------------------------------------------------
# CDC snapshot diff (the other half of the anti-entropy pair: checksum
# says WHETHER two snapshots differ, diff says WHICH rows and HOW)
# --------------------------------------------------------------------------

DIFF_MOD_EVERY = 101   # modified: o_totalprice += 1.0
DIFF_DEL_EVERY = 97    # deleted from v2
DIFF_INS_EVERY = 89    # inserted into v2 under key + offset
DIFF_INS_OFFSET = 10_000_000


def table_diff(sf_dir: str) -> pd.DataFrame:
    """Row-level diff of two snapshots of `orders` — the CDC/replica-
    repair primitive that follows a checksum mismatch. Snapshot v2 is
    derived deterministically from v1 (the scrub.py oracle pattern):
    keys % {DEL} are deleted, keys % {MOD} get o_totalprice + 1.0,
    and keys % {INS} insert a new row under key + offset — so the SQL
    oracle reproduces the identical pair of tables.

    Returns (o_orderkey, change in {added, deleted, modified}), sorted.
    Scale contract: both sides shuffle (key, price) rows only (~16 B);
    the full-outer hash join is the one exchange; unchanged rows are
    dropped INSIDE the post-join map_batches, so the driver collect is
    diff-sized, never table-sized."""
    import numpy as np

    from .common import sized_read_parquet
    from .relational_more import N_JOIN_PARTS

    def v1_rows(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch["o_orderkey"], "p1": batch["o_totalprice"]})

    def v2_rows(batch: pa.Table) -> pa.Table:
        ks = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        ps = batch["o_totalprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = ks % DIFF_DEL_EVERY != 0
        k2 = ks[keep]
        p2 = np.where(k2 % DIFF_MOD_EVERY == 0, ps[keep] + 1.0, ps[keep])
        ins = ks[ks % DIFF_INS_EVERY == 0] + DIFF_INS_OFFSET
        return pa.table(
            {
                "k": pa.array(np.concatenate([k2, ins]), pa.int64()),
                "p2": pa.array(
                    np.concatenate([p2, np.full(len(ins), 42.0)]), pa.float64()
                ),
            }
        )

    def _orders(fn):
        return sized_read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        ).map_batches(fn, batch_format="pyarrow", batch_size=None)

    joined = _orders(v1_rows).join(
        _orders(v2_rows), join_type="full_outer", num_partitions=N_JOIN_PARTS, on=("k",)
    )

    def classify(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        p1, p2 = df.p1.to_numpy(), df.p2.to_numpy()
        added = np.isnan(p1)
        deleted = np.isnan(p2)
        modified = ~added & ~deleted & (p1 != p2)
        keep = added | deleted | modified
        change = np.where(added, "added", np.where(deleted, "deleted", "modified"))
        return pa.table(
            {
                "o_orderkey": pa.array(df.k.to_numpy()[keep].astype("int64"), pa.int64()),
                "change": pa.array(change[keep], pa.string()),
            }
        )

    out = joined.map_batches(classify, batch_format="pyarrow", batch_size=None).to_pandas()
    if out.empty:
        return pd.DataFrame(
            {"o_orderkey": pd.Series([], dtype="int64"), "change": pd.Series([], dtype="object")}
        )
    return out.sort_values("o_orderkey").reset_index(drop=True).astype({"o_orderkey": "int64"})


TABLE_DIFF_SQL = f"""
WITH v1 AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
v2 AS (
  SELECT k, CASE WHEN k % {DIFF_MOD_EVERY} = 0 THEN p + 1.0 ELSE p END AS p
  FROM v1 WHERE k % {DIFF_DEL_EVERY} != 0
  UNION ALL
  SELECT k + {DIFF_INS_OFFSET}, 42.0 FROM v1 WHERE k % {DIFF_INS_EVERY} = 0
)
SELECT COALESCE(v1.k, v2.k) AS o_orderkey,
       CASE WHEN v1.k IS NULL THEN 'added'
            WHEN v2.k IS NULL THEN 'deleted'
            ELSE 'modified' END AS change
FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
WHERE v1.k IS NULL OR v2.k IS NULL OR v1.p != v2.p
ORDER BY o_orderkey
"""


# --------------------------------------------------------------------------
# BM25 top-k retrieval (Robertson/Sparck-Jones; Lucene idf form)
# --------------------------------------------------------------------------

BM25_TERMS = ("spark", "vector", "customer", "window")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_topk(
    sf_dir: str, terms: tuple[str, ...] = BM25_TERMS, topk: int = BM25_TOPK
) -> pd.DataFrame:
    """BM25 top-k document retrieval for a fixed query — the classic
    lexical ranking (Robertson et al.; idf in the non-negative Lucene
    form ln(1 + (N - df + 0.5)/(df + 0.5))) as two shuffle-free passes:

    pass 1 collapses the corpus to O(1) integer stats per block
    (n_docs, sum dl, per-term df) -> one tiny driver reduce; pass 2
    re-scans with the O(#terms) idf table broadcast, scores each doc
    vectorized, and emits only the per-block top-k — the driver merge
    sees #blocks x k rows (the knn partial-top-k pattern), so nothing
    document-sized ever leaves the workers and there is no sort/shuffle.

    Float contract: scores are float64 with the SAME expression tree and
    the SAME term-order summation on both sides (the oracle writes one
    explicit addend per term, never a SUM over unnested rows whose
    accumulation order floats free); N counts docs with >= 1 whitespace
    token (oracle's regexp non-space guard ≙ split() -> []); ranking
    ties break by doc_id. Docs matching no term score 0 and are
    excluded before the top-k."""
    import numpy as np
    import ray
    from math import log

    if not terms or topk < 1:
        raise ValueError("need >= 1 query term and topk >= 1")

    m = len(terms)

    def stats_partial(batch: pa.Table) -> pa.Table:
        n = 0
        sum_dl = 0
        df = [0] * m
        for text in batch["text"].to_pylist():
            toks = text.split()
            if not toks:
                continue
            n += 1
            sum_dl += len(toks)
            for i, t in enumerate(terms):
                if t in toks:
                    df[i] += 1
        cols = {"n_docs": [n], "sum_dl": [sum_dl]}
        cols |= {f"df_{i}": [df[i]] for i in range(m)}
        return pa.table({k: pa.array(v, pa.int64()) for k, v in cols.items()})

    st = (
        _docs(sf_dir, columns=("text",))
        .map_batches(stats_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sum()
    )
    n_docs, sum_dl = int(st.n_docs), int(st.sum_dl)
    if n_docs == 0:
        raise ValueError("corpus has no non-empty documents")
    avgdl = sum_dl / n_docs
    idf = [
        log(1 + (n_docs - int(st[f"df_{i}"]) + 0.5) / (int(st[f"df_{i}"]) + 0.5))
        for i in range(m)
    ]
    bcast = ray.put((idf, avgdl))

    def score_partial(batch: pa.Table) -> pa.Table:
        idf_v, avg = ray.get(bcast)
        ids, scores = [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            toks = text.split()
            if not toks:
                continue
            dl = len(toks)
            s = 0.0
            hit = False
            for i, t in enumerate(terms):
                tf = toks.count(t)
                if tf:
                    hit = True
                    s += idf_v[i] * (tf * (BM25_K1 + 1)) / (
                        tf + BM25_K1 * (1 - BM25_B + BM25_B * dl / avg)
                    )
            if hit:
                ids.append(did)
                scores.append(s)
        if not ids:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}
            )
        sc = np.asarray(scores, np.float64)
        di = np.asarray(ids, np.int64)
        order = np.lexsort((di, -sc))[:topk]  # local top-k, ties by doc_id
        return pa.table(
            {
                "doc_id": pa.array(di[order], pa.int64()),
                "score": pa.array(sc[order], pa.float64()),
            }
        )

    cand = (
        _docs(sf_dir, columns=("doc_id", "text"))
        .map_batches(score_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    cand = cand.sort_values(["score", "doc_id"], ascending=[False, True]).head(topk)
    cand = cand.reset_index(drop=True)
    cand.insert(0, "rank", np.arange(1, len(cand) + 1, dtype=np.int64))
    cand["score"] = cand.score.round(6)
    return cand.astype({"rank": "int64", "doc_id": "int64"})


def bm25_sql(terms: tuple[str, ...] = BM25_TERMS, topk: int = BM25_TOPK) -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(toks, x -> x = '{t}')) AS tf{i}" for i, t in enumerate(terms)
    )
    df_cols = ",\n             ".join(
        f"COUNT(*) FILTER (WHERE tf{i} > 0) AS df{i}" for i in range(len(terms))
    )
    addends = "\n       + ".join(
        f"(ln(1 + (g.n - g.df{i} + 0.5) / (g.df{i} + 0.5))"
        f" * (s.tf{i} * ({BM25_K1} + 1))"
        f" / (s.tf{i} + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * s.dl"
        f" / (CAST(g.sum_dl AS DOUBLE) / g.n))))"
        for i in range(len(terms))
    )
    any_hit = " + ".join(f"s.tf{i}" for i in range(len(terms)))
    return rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE regexp_matches(text, '[^ \t\n\r\f\v]')),
s AS (
  SELECT doc_id, len(toks) AS dl,
         {tf_cols}
  FROM d),
g AS (SELECT COUNT(*) AS n, SUM(dl) AS sum_dl,
             {df_cols}
      FROM s),
sc AS (
  SELECT s.doc_id,
       {addends} AS score
  FROM s, g WHERE {any_hit} > 0)
SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank,
       doc_id, ROUND(score, 6) AS score
FROM sc ORDER BY score DESC, doc_id LIMIT {topk}
"""


# --------------------------------------------------------------------------
# adjacent-bigram PMI collocations (word2phrase-style phrase mining)
# --------------------------------------------------------------------------

PMI_MIN_COUNT = 20
PMI_TOPK = 50


def pmi_bigrams(
    sf_dir: str, min_count: int = PMI_MIN_COUNT, topk: int = PMI_TOPK
) -> pd.DataFrame:
    """Pointwise-mutual-information collocation mining over ADJACENT
    token bigrams (the word2phrase / phrase-detection statistic,
    Mikolov et al. 2013): pmi(x,y) = ln(N * c_xy / (c_x * c_y)) with
    c_xy = corpus count of the ordered bigram, c_x/c_y = unigram
    counts, N = total tokens; bigrams below min_count drop, output is
    the top-k by (pmi desc, w1, w2).

    Scale contract: each block emits its local bigram/unigram Counters
    as integer partials — the shuffle is vocabulary-sized (bigram space
    hash-partitions by pair at web vocab), never corpus-sized; the PMI
    arithmetic runs on the (min_count-filtered) pair table. Adjacent
    pairs (not all co-occurring pairs) keep per-doc fan-out at
    n_tok - 1 rows — the reason word2phrase scales and presence-pair
    PMI does not.

    Float contract: N*c_xy and c_x*c_y are exact int64 products on both
    sides; the single division is one correctly-rounded double op, and
    ln is the only libm call (bit-stable at the gate's 6-decimal
    rounding); integer counts are exact, ranking ties break by words."""
    from collections import Counter
    from math import log

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        uni: Counter = Counter()
        bi: Counter = Counter()
        for text in batch["text"].to_pylist():
            toks = text.split()
            uni.update(toks)
            bi.update(zip(toks, toks[1:]))
        w1 = [w for w, _ in bi] + [w for w in uni]
        w2 = [w for _, w in bi] + ["" for _ in uni]  # "" marks unigram rows
        c = [int(v) for v in bi.values()] + [int(v) for v in uni.values()]
        return pa.table(
            {
                "w1": pa.array(w1, pa.string()),
                "w2": pa.array(w2, pa.string()),
                "c": pa.array(c, pa.int64()),
            }
        )

    counts = (
        _docs(sf_dir, columns=("text",))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
    )
    uni = counts[counts.w2 == ""].set_index("w1").c
    bi = counts[(counts.w2 != "") & (counts.c >= min_count)]
    n_tok = int(uni.sum())
    if bi.empty:
        return pd.DataFrame(
            {
                "w1": pd.Series([], dtype=object),
                "w2": pd.Series([], dtype=object),
                "c_xy": pd.Series([], dtype="int64"),
                "pmi": pd.Series([], dtype="float64"),
            }
        )
    pmi = [
        log((n_tok * int(cxy)) / (int(uni[x]) * int(uni[y])))
        for x, y, cxy in zip(bi.w1, bi.w2, bi.c)
    ]
    out = pd.DataFrame(
        {"w1": bi.w1.values, "w2": bi.w2.values, "c_xy": bi.c.values, "pmi": pmi}
    )
    out = out.sort_values(["pmi", "w1", "w2"], ascending=[False, True, True]).head(topk)
    out["pmi"] = out.pmi.round(6)
    return out.reset_index(drop=True).astype({"c_xy": "int64"})


PMI_BIGRAMS_SQL = rf"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents WHERE regexp_matches(text, '[^ \t\n\r\f\v]')),
tok AS (
  SELECT doc_id, gs.i, toks[gs.i] AS w
  FROM d, LATERAL unnest(generate_series(1, len(toks))) AS gs(i)),
big AS (
  SELECT w AS w1, LEAD(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2
  FROM tok),
cb AS (SELECT w1, w2, COUNT(*) AS c_xy FROM big WHERE w2 IS NOT NULL
       GROUP BY 1, 2 HAVING COUNT(*) >= {PMI_MIN_COUNT}),
cu AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
n AS (SELECT COUNT(*) AS n_tok FROM tok)
SELECT cb.w1, cb.w2, CAST(cb.c_xy AS BIGINT) AS c_xy,
       ROUND(ln(CAST(n.n_tok * cb.c_xy AS DOUBLE)
                / CAST(u1.c * u2.c AS DOUBLE)), 6) AS pmi
FROM cb JOIN cu u1 ON u1.w = cb.w1 JOIN cu u2 ON u2.w = cb.w2, n
ORDER BY ln(CAST(n.n_tok * cb.c_xy AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE)) DESC,
         cb.w1, cb.w2
LIMIT {PMI_TOPK}
"""


# --------------------------------------------------------------------------
# Deequ-style declarative data-quality constraint suite
# --------------------------------------------------------------------------

VALIDATE_STATUS_DOMAIN = ("F", "O", "P")
VALIDATE_DATE_LO = "1992-01-01"
VALIDATE_DATE_HI = "1999-01-01"  # half-open; corpus runs past it -> real hits


def validate_orders(sf_dir: str) -> pd.DataFrame:
    """Declarative constraint validation over `orders` (the
    Deequ/Great-Expectations gate a 100 TB ingest runs before training
    jobs consume a snapshot): key uniqueness, null rate, referential
    integrity into `customer`, value positivity, categorical domain,
    and date range. Output: one row per check with its exact violation
    count and pass flag — on the test corpora the date-range check
    REALLY fails (orderdate runs past 1999), so both arms are live.

    Scale contract: the five scalar checks are one streaming pass of
    per-block integer partials (O(1) rows per block); uniqueness counts
    key groups via a key-space groupby (never a driver set); referential
    integrity pre-aggregates orders to (custkey, n) — custkey-space, not
    order-space — then LEFT-ANTI native-hash-joins against the customer
    key column, so the shuffle carries keys, never rows. All counts are
    exact int64; null guards mirror the oracle's FILTER semantics."""
    from ray.data.aggregate import Count, Sum

    from .common import sized_read_parquet

    lo = pd.Timestamp(VALIDATE_DATE_LO)
    hi = pd.Timestamp(VALIDATE_DATE_HI)

    def scalar_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        status_bad = int(
            (df.o_orderstatus.notna() & ~df.o_orderstatus.isin(VALIDATE_STATUS_DOMAIN)).sum()
        )
        date_bad = int(
            (df.o_orderdate.notna() & ((df.o_orderdate < lo) | (df.o_orderdate >= hi))).sum()
        )
        return pa.table(
            {
                "n_rows": pa.array([len(df)], pa.int64()),
                "custkey_null": pa.array([int(df.o_custkey.isna().sum())], pa.int64()),
                "price_nonpos": pa.array(
                    [int((df.o_totalprice.notna() & (df.o_totalprice <= 0)).sum())],
                    pa.int64(),
                ),
                "status_bad": pa.array([status_bad], pa.int64()),
                "date_bad": pa.array([date_bad], pa.int64()),
            }
        )

    orders_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    st = (
        sized_read_parquet(f"{sf_dir}/orders.parquet", columns=orders_cols)
        .map_batches(scalar_partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sum()
    )

    n_distinct = (
        sized_read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
        .groupby("o_orderkey")
        .aggregate(Count())
        .count()
    )

    # referential integrity: orders pre-agg to (custkey, n) then anti-join
    per_cust = (
        sized_read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .groupby("o_custkey")
        .aggregate(Count(alias_name="n"))
    )
    cust_keys = sized_read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    dangling = per_cust.join(
        cust_keys, join_type="left_anti", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    )
    dang_df = dangling.to_pandas()
    n_dangling = int(dang_df.n.sum()) if len(dang_df) else 0

    rows = [
        ("custkey_not_null", int(st.custkey_null)),
        ("orderdate_in_range", int(st.date_bad)),
        ("orderkey_unique", int(st.n_rows) - int(n_distinct)),
        ("referential_custkey", n_dangling),
        ("status_in_domain", int(st.status_bad)),
        ("totalprice_positive", int(st.price_nonpos)),
    ]
    return pd.DataFrame(
        {
            "check": [r[0] for r in rows],
            "n_violations": pd.Series([r[1] for r in rows], dtype="int64"),
            "passed": pd.Series([int(r[1] == 0) for r in rows], dtype="int64"),
        }
    )


VALIDATE_ORDERS_SQL = f"""
WITH u AS (
  SELECT COUNT(*) AS n_rows,
         COUNT(DISTINCT o_orderkey) AS n_keys,
         COUNT(*) FILTER (WHERE o_custkey IS NULL) AS custkey_null,
         COUNT(*) FILTER (WHERE o_totalprice IS NOT NULL AND o_totalprice <= 0) AS price_nonpos,
         COUNT(*) FILTER (WHERE o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN {VALIDATE_STATUS_DOMAIN!r}) AS status_bad,
         COUNT(*) FILTER (WHERE o_orderdate IS NOT NULL
                          AND (o_orderdate < TIMESTAMP '{VALIDATE_DATE_LO}'
                               OR o_orderdate >= TIMESTAMP '{VALIDATE_DATE_HI}')) AS date_bad
  FROM orders),
ref AS (
  SELECT COUNT(*) AS dangling
  FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_custkey IS NULL AND o.o_custkey IS NOT NULL)
SELECT v.check, CAST(v.n AS BIGINT) AS n_violations,
       CAST(v.n = 0 AS BIGINT) AS passed
FROM u, ref, LATERAL (VALUES
  ('custkey_not_null', u.custkey_null),
  ('orderdate_in_range', u.date_bad),
  ('orderkey_unique', u.n_rows - u.n_keys),
  ('referential_custkey', ref.dangling),
  ('status_in_domain', u.status_bad),
  ('totalprice_positive', u.price_nonpos)) AS v("check", n)
ORDER BY v.check
"""


# --------------------------------------------------------------------------
# gaps-and-islands: contiguity audit of a key sequence
# --------------------------------------------------------------------------

ISLAND_PRICE_MIN = 150_000.0  # high-value order subset -> a gapped key set


def orderkey_islands(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands audit of a key sequence (the backfill /
    completeness probe every ingest pipeline runs: 'which contiguous id
    runs do we actually have?'), over the deterministically-gapped
    high-value order subset (o_totalprice >= threshold — the raw
    synthetic keys are dense, so the subset is what makes the audit
    non-vacuous; the oracle restates the same filter).

    The distributed trick: an island START is any key whose predecessor
    key-1 is ABSENT — counted with one self LEFT-ANTI hash join of the
    key set against its own shifted copy, so the whole audit is
    key-set-sized shuffles and O(1) output; no global sort, no window
    function over a corpus-length frame (the textbook ROW_NUMBER
    islands solution materializes a total order — this doesn't).
    Output: n_keys, n_islands, min/max key, coverage_ppm (integer
    fixed-point density of the spanned range)."""
    from .common import sized_read_parquet

    def keys_ds():
        def flt(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            m = pc.greater_equal(batch["o_totalprice"], pa.scalar(ISLAND_PRICE_MIN))
            t = batch.filter(m)
            return pa.table({"key": t["o_orderkey"]})

        return sized_read_parquet(
            f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
        ).map_batches(flt, batch_format="pyarrow")

    # island starts: key k survives the anti-join iff no key equals k-1,
    # i.e. iff k does not appear in the successor set {key + 1}
    def succs(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"succ": pc.add(batch["key"], pa.scalar(1, pa.int64()))})

    shifted = keys_ds().map_batches(succs, batch_format="pyarrow")
    starts = keys_ds().join(
        shifted, join_type="left_anti", num_partitions=8, on=("key",), right_on=("succ",)
    )
    n_islands = int(starts.count())

    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    stats = keys_ds().aggregate(Count(), Min("key"), Max("key"))
    n_keys = int(stats["count()"])
    mn, mx = int(stats["min(key)"]), int(stats["max(key)"])
    span = mx - mn + 1
    return pd.DataFrame(
        {
            "n_keys": pd.Series([n_keys], dtype="int64"),
            "n_islands": pd.Series([n_islands], dtype="int64"),
            "min_key": pd.Series([mn], dtype="int64"),
            "max_key": pd.Series([mx], dtype="int64"),
            "coverage_ppm": pd.Series([n_keys * 1_000_000 // span], dtype="int64"),
        }
    )


ORDERKEY_ISLANDS_SQL = f"""
WITH k AS (SELECT o_orderkey AS key FROM orders WHERE o_totalprice >= {ISLAND_PRICE_MIN}),
s AS (SELECT COUNT(*) AS n_islands
      FROM k WHERE NOT EXISTS (SELECT 1 FROM k k2 WHERE k2.key = k.key - 1)),
g AS (SELECT COUNT(*) AS n_keys, MIN(key) AS mn, MAX(key) AS mx FROM k)
SELECT CAST(g.n_keys AS BIGINT) AS n_keys,
       CAST(s.n_islands AS BIGINT) AS n_islands,
       CAST(g.mn AS BIGINT) AS min_key, CAST(g.mx AS BIGINT) AS max_key,
       CAST(g.n_keys * 1000000 // (g.mx - g.mn + 1) AS BIGINT) AS coverage_ppm
FROM g, s
"""


# --------------------------------------------------------------------------
# MOSS winnow-overlap near-dup pairs (Schleimer et al. 2003 §4)
# --------------------------------------------------------------------------

WINNOW_MAX_DF = 10  # fingerprints in more docs are boilerplate (MOSS's own rule)
WINNOW_MIN_SHARED = 2


def winnow_overlap_pairs(
    sf_dir: str, max_df: int = WINNOW_MAX_DF, min_shared: int = WINNOW_MIN_SHARED
) -> pd.DataFrame:
    """MOSS-style near-dup pairs: document pairs sharing >= min_shared
    DISTINCT winnowing fingerprints (the positional rolling-hash
    signature of `fingerprints`), after dropping fingerprints present
    in more than max_df documents — Schleimer et al.'s own boilerplate
    rule, and ALSO the hot-key guard: a fingerprint in S docs costs
    C(S, 2) pair rows, so capping S bounds the expansion (on this
    word-soup corpus one uncapped fingerprint sits in 347/500 docs).

    Scale contract: per-doc DISTINCT fingerprint rows (8 B hash +
    doc_id) hash-partition by fingerprint into 64 coarse parts — every
    copy of a fingerprint lands in one part, so the df filter is LOCAL
    and exact there, and the pair expansion is one vectorized
    self-merge (the source_overlap_matrix pattern); per-part (a, b, n)
    partials roll up in an output-sized groupby. Text never crosses a
    shuffle. Oracle: the shared Rabin-Karp winnow CTE chain + the same
    df-capped self-join."""
    from ray.data.aggregate import Sum

    from ..functions.textstats import winnow_fingerprint

    if min_shared < 1 or max_df < 2:
        raise ValueError("need min_shared >= 1 and max_df >= 2")
    n_parts = 64

    def fp_rows(batch: pa.Table) -> pa.Table:
        fps, ids, parts = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for f in set(winnow_fingerprint(text)):
                fps.append(f)
                ids.append(did)
                parts.append(f % n_parts)
        return pa.table(
            {
                "fp": pa.array(fps, pa.int64()),
                "doc_id": pa.array(ids, pa.int64()),
                "part": pa.array(parts, pa.int64()),
            }
        )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "n_shared": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        df_ok = g.groupby("fp").doc_id.transform("size") <= max_df
        d = g[df_ok][["fp", "doc_id"]]
        if d.empty:
            return empty
        m = d.merge(d, on="fp")
        m = m[m.doc_id_x < m.doc_id_y]
        if m.empty:
            return empty
        out = (
            m.groupby(["doc_id_x", "doc_id_y"], as_index=False)
            .size()
            .rename(columns={"doc_id_x": "id_a", "doc_id_y": "id_b", "size": "n_shared"})
        )
        return out.astype({"id_a": "int64", "id_b": "int64", "n_shared": "int64"})

    out = (
        _docs(sf_dir)
        .map_batches(fp_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .groupby(["id_a", "id_b"])
        .aggregate(Sum("n_shared", alias_name="n_shared"))
        .to_pandas()
    )
    out = out[out.n_shared >= min_shared].sort_values(["id_a", "id_b"]).reset_index(drop=True)
    return out.astype({"id_a": "int64", "id_b": "int64", "n_shared": "int64"})


def _winnow_pairs_sql(
    max_df: int = WINNOW_MAX_DF, min_shared: int = WINNOW_MIN_SHARED
) -> str:
    return (
        _winnow_cte_prefix()
        + f""",
fps AS (
  SELECT DISTINCT doc_id, mv AS fp FROM mins WHERE j <= n - 7 - 15
),
ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_df})
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM fps a JOIN ok USING (fp)
JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
CROSS JOIN guard
WHERE guard.ok = 1
GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared}
ORDER BY id_a, id_b
"""
    )


WINNOW_PAIRS_SQL = _winnow_pairs_sql()


# --------------------------------------------------------------------------
# language-ID confusion matrix (classifier audit against labels)
# --------------------------------------------------------------------------

def lang_confusion(sf_dir: str) -> pd.DataFrame:
    """Confusion matrix of the heuristic language-ID against the labeled
    lang column — the classifier-audit rollup every model-gated filter
    stage needs before it is trusted to drop documents. Cells are exact
    integer counts; the prediction rule is lang_id's (machinery nested
    here), so LANG_ID_SQL's oracle arms gate the predictions and this
    op's oracle gates the rollup on top.

    Scale contract: one stateless pass emitting per-block
    (lang, pred_lang, n) integer partials into a #langs²-bounded
    groupby."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        preds = [detect_lang(t) for t in batch["text"].to_pylist()]
        t = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "pred_lang": pa.array(preds, pa.string()),
                "n": pa.array(np.ones(len(langs), np.int64)),
            }
        )
        g = t.group_by(["lang", "pred_lang"]).aggregate([("n", "sum")])
        return g.rename_columns(["lang", "pred_lang", "n"])

    out = (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "pred_lang"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values(["lang", "pred_lang"])
        .reset_index(drop=True)
    )
    return out.astype({"n": "int64"})


def lang_confusion_sql() -> str:
    return f"""
WITH pred AS ({_lang_id_sql().replace("ORDER BY doc_id", "")})
SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
FROM documents d JOIN pred p USING (doc_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# exact edit-distance verification of the MOSS candidate pairs
# --------------------------------------------------------------------------

def _lev_row_dp(a: str, b: str) -> int:
    """Exact unit-cost Levenshtein via the vectorized row DP: one numpy
    row per character of `a`; the in-row left dependency
    cur[j] = min(cur[j], cur[j-1] + 1) collapses to
    minimum.accumulate(cur - j) + j (monotone prefix trick). Integer
    arithmetic end-to-end — parity with DuckDB levenshtein() asserted
    in tests on 200 random string pairs."""
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return max(n, m)
    av = np.array([ord(c) for c in a], dtype=np.int64)
    bv = np.array([ord(c) for c in b], dtype=np.int64)
    idx = np.arange(m + 1, dtype=np.int64)
    d = idx.copy()
    cur = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        cost = (bv != av[i - 1]).astype(np.int64)
        cur[0] = i
        cur[1:] = np.minimum(d[1:] + 1, d[:-1] + cost)
        cur = np.minimum.accumulate(cur - idx) + idx
        d, cur = cur, d
    return int(d[m])


def edit_distance_pairs(sf_dir: str) -> pd.DataFrame:
    """Exact character-level edit distance for every MOSS candidate pair
    (winnow_overlap_pairs, machinery nested here) — the verification
    layer a fingerprint-based near-dup stage runs before acting on a
    match: fingerprint overlap says 'same shingles somewhere',
    Levenshtein says how far apart the full texts actually are.
    sim_e6 = (maxlen - lev) * 1e6 // maxlen is integer fixed-point, so
    the whole output is exact int64 (no float similarity drift).

    Scale contract: the pair list is output-sized by winnow's df-cap
    contract; each side's TEXT crosses exactly one exchange (two native
    hash joins attach text_a / text_b to the slim pair rows); the DP is
    a stateless per-pair map_batches kernel, O(len_a) numpy rows per
    pair, never a Python cell loop."""
    import numpy as np
    import ray.data as rd

    pairs = winnow_overlap_pairs(sf_dir)
    if pairs.empty:
        return pd.DataFrame(
            {
                "id_a": pd.Series([], dtype="int64"),
                "id_b": pd.Series([], dtype="int64"),
                "lev": pd.Series([], dtype="int64"),
                "sim_e6": pd.Series([], dtype="int64"),
            }
        )
    pair_ds = rd.from_pandas(pairs[["id_a", "id_b"]])
    docs = _docs(sf_dir)
    withe_a = pair_ds.join(
        docs, join_type="inner", num_partitions=8, on=("id_a",), right_on=("doc_id",)
    ).rename_columns({"text": "text_a"})
    both = withe_a.join(
        docs, join_type="inner", num_partitions=8, on=("id_b",), right_on=("doc_id",)
    ).rename_columns({"text": "text_b"})

    def dp(batch: pa.Table) -> pa.Table:
        ia = batch["id_a"].to_pylist()
        ib = batch["id_b"].to_pylist()
        levs, sims = [], []
        for a, b in zip(batch["text_a"].to_pylist(), batch["text_b"].to_pylist()):
            lv = _lev_row_dp(a, b)
            mx = max(len(a), len(b))
            levs.append(lv)
            sims.append((mx - lv) * 1_000_000 // mx if mx else 1_000_000)
        return pa.table(
            {
                "id_a": pa.array(ia, pa.int64()),
                "id_b": pa.array(ib, pa.int64()),
                "lev": pa.array(levs, pa.int64()),
                "sim_e6": pa.array(sims, pa.int64()),
            }
        )

    out = (
        both.map_batches(dp, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    return out.astype({"id_a": "int64", "id_b": "int64", "lev": "int64", "sim_e6": "int64"})


def edit_distance_pairs_sql(
    max_df: int = WINNOW_MAX_DF, min_shared: int = WINNOW_MIN_SHARED
) -> str:
    return (
        _winnow_cte_prefix()
        + f""",
fps AS (
  SELECT DISTINCT doc_id, mv AS fp FROM mins WHERE j <= n - 7 - 15
),
ok AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_df}),
wp AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fps a JOIN ok USING (fp)
  JOIN fps b ON b.fp = a.fp AND a.doc_id < b.doc_id
  CROSS JOIN guard WHERE guard.ok = 1
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_shared})
SELECT wp.id_a, wp.id_b,
       CAST(levenshtein(da.text, db.text) AS BIGINT) AS lev,
       CAST((GREATEST(length(da.text), length(db.text))
             - levenshtein(da.text, db.text)) * 1000000
            // GREATEST(length(da.text), length(db.text)) AS BIGINT) AS sim_e6
FROM wp JOIN documents da ON da.doc_id = wp.id_a
JOIN documents db ON db.doc_id = wp.id_b
ORDER BY id_a, id_b
"""
    )


# --------------------------------------------------------------------------
# inverted index build: term -> posting list (df + order-locked digest)
# --------------------------------------------------------------------------

def inverted_index(sf_dir: str) -> pd.DataFrame:
    """Materialize the inverted index over `documents`: one row per term
    with its document frequency and the md5 of the ascending-doc_id
    posting list (csv) — the retrieval-index BUILD step bm25_topk scores
    against but never materializes. The digest makes the gate check the
    exact posting bytes while output stays vocabulary-sized.

    Scale contract: per-block per-doc `set(text.split())` emits distinct
    (term, doc_id) rows (the block-local dedup — a term repeated in a
    doc ships once); rows hash by term digest into 64 coarse partitions
    where each term's full posting assembles with one vectorized pandas
    groupby (never per-term map_groups). Hot-term skew is the classic
    inverted-index hazard: a stopword's partition holds df rows — at
    100 TB posting lists for df over a residency bound shard by doc-id
    range prefix (term, shard_i) and the digests chain; the 64-way term
    spread plus digest-only output keeps per-partition memory bounded
    here. Oracled by INVERTED_INDEX_SQL (DISTINCT unnest + ordered
    string_agg md5)."""
    n_parts = 64

    def pairs(batch: pa.Table) -> pa.Table:
        terms, dids, parts = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for w in set(t.split()):
                terms.append(w)
                dids.append(d)
                parts.append(int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_parts)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(dids, pa.int64()),
                "part": pa.array(parts, pa.int32()),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        agg = g.groupby("term", sort=True).doc_id.agg(
            df="size", posting=lambda s: ",".join(str(i) for i in s)
        )
        return pd.DataFrame(
            {
                "term": agg.index,
                "df": agg["df"].astype("int64"),
                "posting_md5": [hashlib.md5(p.encode()).hexdigest() for p in agg["posting"]],
            }
        )

    out = (
        _docs(sf_dir)
        .map_batches(pairs, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assemble, batch_format="pandas")
        .to_pandas()
        .sort_values("term", kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype({"term": "str", "df": "int64", "posting_md5": "str"})


INVERTED_INDEX_SQL = r"""
WITH toks AS (
  SELECT doc_id, CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
                      THEN regexp_split_to_array(trim(text), '\s+')
                      ELSE CAST([] AS VARCHAR[]) END AS ts
  FROM documents),
td AS (SELECT DISTINCT doc_id, unnest(ts) AS term FROM toks)
SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
       md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS posting_md5
FROM td GROUP BY term ORDER BY term
"""


# --------------------------------------------------------------------------
# Neyman-allocation stratified sampling (variance-proportional quotas)
# --------------------------------------------------------------------------

NEYMAN_K = 300


def neyman_allocation_sample(sf_dir: str, k_total: int = NEYMAN_K) -> pd.DataFrame:
    """Neyman (1934) optimal stratified sampling over orders: the sample
    budget K apportions across strata (o_orderstatus) proportionally to
    N_h * sd_h — high-variance strata get more probes, the allocation
    that minimizes the estimator's variance at fixed K (plain
    proportional allocation ignores within-stratum spread). Quotas are
    Hamilton largest-remainder on integer micro-unit weights
    (source_budget_allocation's zero-drift apportionment), and the
    selection inside each stratum is the deterministic md5-rank keep
    ('ney:'-prefixed key, independent of every other sampling op's key).

    Float contract: stratum stats are EXACT integers distributed-summed
    (cents; cents^2 split hi/lo by 2^32 so block partials never overflow
    int64, recombined to arbitrary precision on the O(#strata) driver
    table; HUGEINT in the oracle); variance and sd are each ONE mirrored
    float expression rounded to 6 decimals before reuse (the doremi
    chained discipline); the Hamilton stage is pure integers.

    Scale contract: pass 1 emits <= #strata integer partial rows per
    block; pass 2 re-scans (the kmeans_train two-pass contract) and
    each block ships at most quota_h candidate rows per stratum (the
    partial-top-k pattern — #blocks x K rows reach the driver, never
    the table); final resolve + rollup run on that bounded frame."""
    import math

    import numpy as np
    from ray.data.aggregate import Sum

    from .common import to_cents

    HI = 1 << 32

    def stats_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "st": batch["o_orderstatus"].to_pylist(),
                "c": to_cents(batch["o_totalprice"].to_numpy()).astype(np.int64),
            }
        )
        c2 = df.c * df.c  # cents < 2^27 => c^2 < 2^54, no per-element overflow
        df["c2_hi"], df["c2_lo"] = c2 // HI, c2 % HI
        g = df.groupby("st", as_index=False).agg(
            n=("c", "size"), s1=("c", "sum"), s2_hi=("c2_hi", "sum"), s2_lo=("c2_lo", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    src = sized_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus", "o_totalprice"]
    )
    per = (
        src.map_batches(stats_partial, batch_format="pyarrow")
        .groupby("st")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("s1", alias_name="s1"),
            Sum("s2_hi", alias_name="s2_hi"),
            Sum("s2_lo", alias_name="s2_lo"),
        )
        .to_pandas()
        .sort_values("st")
        .reset_index(drop=True)
    )
    stats = []
    for r in per.itertuples():
        n, s1, s2 = int(r.n), int(r.s1), int(r.s2_hi) * HI + int(r.s2_lo)
        var6 = round(float(s2 * n - s1 * s1) / (float(n) * float(n)), 6)
        sd6 = round(math.sqrt(var6), 6)
        wi = n * int(math.floor(sd6 * 1e6 + 0.5))  # integer micro-unit weight
        stats.append((r.st, n, sd6, wi))
    W = sum(w for *_, w in stats)
    if W == 0:
        raise ValueError("all strata have zero variance — Neyman weights degenerate")
    base = [k_total * w // W for *_, w in stats]
    rem = [k_total * w % W for *_, w in stats]
    leftover = k_total - sum(base)
    order = sorted(range(len(stats)), key=lambda i: (-rem[i], stats[i][0]))
    extra = set(order[:leftover])
    quota = {
        stats[i][0]: base[i] + (1 if i in extra else 0) for i in range(len(stats))
    }

    def cand(batch: pa.Table) -> pa.Table:
        kk = batch["o_orderkey"].to_numpy().astype(np.int64)
        df = pd.DataFrame(
            {
                "st": batch["o_orderstatus"].to_pylist(),
                "k": kk,
                "c": to_cents(batch["o_totalprice"].to_numpy()).astype(np.int64),
                "key": [hashlib.md5(f"ney:{int(x)}".encode()).hexdigest() for x in kk],
            }
        )
        df = df.sort_values(["st", "key", "k"], kind="mergesort")
        df = df[df.groupby("st").cumcount() < df.st.map(quota).fillna(0).astype(int)]
        return pa.Table.from_pandas(df, preserve_index=False)

    cands = (
        src.map_batches(cand, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["st", "key", "k"], kind="mergesort")
    )
    cands = cands[cands.groupby("st").cumcount() < cands.st.map(quota).astype(int)]
    roll = cands.groupby("st").agg(n_sel=("k", "size"), sel_id_sum=("k", "sum"), sel_cents_sum=("c", "sum"))
    out = pd.DataFrame(
        {
            "stratum": [s for s, *_ in stats],
            "n": [n for _, n, *_ in stats],
            "sd6": [sd for _, _, sd, _ in stats],
            "quota": [int(quota[s]) for s, *_ in stats],
        }
    )
    out["n_sel"] = out.stratum.map(roll.n_sel).fillna(0).astype("int64")
    out["sel_id_sum"] = out.stratum.map(roll.sel_id_sum).fillna(0).astype("int64")
    out["sel_cents_sum"] = out.stratum.map(roll.sel_cents_sum).fillna(0).astype("int64")
    return out.astype({"stratum": "str", "n": "int64", "sd6": "float64", "quota": "int64"})


def neyman_sql(k_total: int = NEYMAN_K) -> str:
    return f"""
WITH b AS (
  SELECT o_orderstatus AS st, o_orderkey AS k,
         CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS c
  FROM orders),
s AS (
  SELECT st, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(CAST(c AS HUGEINT)) AS s1,
         SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2
  FROM b GROUP BY st),
v AS (
  SELECT st, n, ROUND(CAST(s2 * n - s1 * s1 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS var6
  FROM s),
d AS (SELECT st, n, ROUND(sqrt(var6), 6) AS sd6 FROM v),
wi AS (SELECT st, n, sd6,
              n * CAST(ROUND(sd6 * 1000000.0, 0) AS HUGEINT) AS w
       FROM d),
tot AS (SELECT SUM(w) AS W FROM wi),
q AS (SELECT wi.st, wi.n, wi.sd6,
             ({k_total} * wi.w) // tot.W AS base,
             ({k_total} * wi.w) % tot.W AS rem
      FROM wi, tot),
l AS (SELECT {k_total} - SUM(base) AS leftover FROM q),
r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, st) AS rk FROM q),
qq AS (SELECT r.st, r.n, r.sd6,
              CAST(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
       FROM r, l),
sel AS (
  SELECT b.st, b.k, b.c FROM b JOIN qq ON qq.st = b.st
  QUALIFY row_number() OVER (PARTITION BY b.st
                             ORDER BY md5('ney:' || CAST(b.k AS VARCHAR)), b.k) <= qq.quota)
SELECT qq.st AS stratum, CAST(qq.n AS BIGINT) AS n, qq.sd6, qq.quota,
       CAST(COUNT(sel.k) AS BIGINT) AS n_sel,
       CAST(COALESCE(SUM(sel.k), 0) AS BIGINT) AS sel_id_sum,
       CAST(COALESCE(SUM(sel.c), 0) AS BIGINT) AS sel_cents_sum
FROM qq LEFT JOIN sel ON sel.st = qq.st
GROUP BY qq.st, qq.n, qq.sd6, qq.quota
ORDER BY stratum
"""


# --------------------------------------------------------------------------
# Merkle range-digest hierarchy (anti-entropy / replica repair)
# --------------------------------------------------------------------------

MERKLE_SPAN = 1024  # orderkeys per leaf range
MERKLE_FANOUT = 16  # leaf ranges per mid-level node


def merkle_table_digest(sf_dir: str) -> pd.DataFrame:
    """Fixed-depth Merkle digest hierarchy over orders — the
    anti-entropy structure two replicas exchange to locate WHICH key
    range diverges in O(log) probes instead of re-hashing the table
    (table_checksum's flat verdict says only THAT something diverged;
    table_diff then needs a full scan — the Merkle walk needs only the
    divergent leaf). Three levels: leaf = md5 of the key-ordered row
    digests in each {MERKLE_SPAN}-key range, mid = md5 of the
    bucket-ordered leaf digests per {MERKLE_FANOUT} leaves, root = md5
    over the ordered mids. Row digest = md5(key:cents:status), the
    mirrored canonical row serialization.

    Scale contract: row digests are stateless per block; leaves
    assemble on 64 coarse bucket-hash partitions (each leaf's rows
    co-locate; the in-leaf md5 chain is one C-speed string join per
    bucket); levels above shrink {MERKLE_FANOUT}x per step and run on
    the driver here (leaf table = keyspace / {MERKLE_SPAN} rows —
    re-apply the same bucket-hash groupby per level when that exceeds
    driver bounds). Output: every node of all three levels, so the
    oracle value-locks the entire hierarchy, not just the root."""
    import numpy as np

    from .common import to_cents

    n_parts = 64

    def rowdig(batch: pa.Table) -> pa.Table:
        k = batch["o_orderkey"].to_numpy().astype(np.int64)
        c = to_cents(batch["o_totalprice"].to_numpy()).astype(np.int64)
        st = batch["o_orderstatus"].to_pylist()
        dig = [
            hashlib.md5(f"{int(kk)}:{int(cc)}:{ss}".encode()).hexdigest()
            for kk, cc, ss in zip(k, c, st)
        ]
        bucket = k // MERKLE_SPAN
        part = [
            int(hashlib.md5(str(int(b)).encode()).hexdigest()[:8], 16) % n_parts
            for b in bucket
        ]
        return pa.table(
            {
                "k": pa.array(k, pa.int64()),
                "bucket": pa.array(bucket, pa.int64()),
                "dig": pa.array(dig, pa.string()),
                "part": pa.array(part, pa.int32()),
            }
        )

    def leaf(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["bucket", "k"], kind="mergesort")
        agg = g.groupby("bucket", sort=True).agg(
            n_rows=("k", "size"), chain=("dig", "".join)
        )
        return pd.DataFrame(
            {
                "bucket": agg.index.astype("int64"),
                "n_rows": agg.n_rows.astype("int64"),
                "digest": [hashlib.md5(c.encode()).hexdigest() for c in agg.chain],
            }
        )

    leaves = (
        sized_read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        )
        .map_batches(rowdig, batch_format="pyarrow")
        .groupby("part")
        .map_groups(leaf, batch_format="pandas")
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    mids_src = leaves.assign(parent=leaves.bucket // MERKLE_FANOUT)
    mids = (
        mids_src.sort_values("bucket")
        .groupby("parent", sort=True)
        .agg(n_rows=("n_rows", "sum"), chain=("digest", "".join))
        .reset_index()
    )
    mids["digest"] = [hashlib.md5(c.encode()).hexdigest() for c in mids.chain]
    root_chain = "".join(mids.sort_values("parent").digest)
    out = pd.concat(
        [
            pd.DataFrame(
                {"level": 0, "bucket": leaves.bucket, "n_rows": leaves.n_rows, "digest": leaves.digest}
            ),
            pd.DataFrame(
                {"level": 1, "bucket": mids.parent, "n_rows": mids.n_rows, "digest": mids.digest}
            ),
            pd.DataFrame(
                {
                    "level": [2],
                    "bucket": [0],
                    "n_rows": [int(leaves.n_rows.sum())],
                    "digest": [hashlib.md5(root_chain.encode()).hexdigest()],
                }
            ),
        ],
        ignore_index=True,
    ).sort_values(["level", "bucket"]).reset_index(drop=True)
    return out.astype({"level": "int64", "bucket": "int64", "n_rows": "int64", "digest": "str"})


MERKLE_SQL = f"""
WITH r AS (
  SELECT o_orderkey AS k, o_orderkey // {MERKLE_SPAN} AS bucket,
         md5(CAST(o_orderkey AS VARCHAR) || ':' ||
             CAST(CAST(ROUND(o_totalprice * 100.0) AS BIGINT) AS VARCHAR) || ':' ||
             o_orderstatus) AS dig
  FROM orders),
leaf AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
         md5(string_agg(dig, '' ORDER BY k)) AS digest
  FROM r GROUP BY bucket),
mid AS (
  SELECT bucket // {MERKLE_FANOUT} AS bucket, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
         md5(string_agg(digest, '' ORDER BY bucket)) AS digest
  FROM leaf GROUP BY bucket // {MERKLE_FANOUT}),
root AS (
  SELECT 0 AS bucket, CAST(SUM(n_rows) AS BIGINT) AS n_rows,
         md5(string_agg(digest, '' ORDER BY bucket)) AS digest
  FROM mid)
SELECT CAST(0 AS BIGINT) AS level, bucket, n_rows, digest FROM leaf
UNION ALL SELECT 1, bucket, n_rows, digest FROM mid
UNION ALL SELECT 2, bucket, n_rows, digest FROM root
ORDER BY level, bucket
"""


# --------------------------------------------------------------------------
# market-basket co-purchase lift (association mining over order baskets)
# --------------------------------------------------------------------------

COPURCHASE_MIN_SUPPORT = 2


def copurchase_lift(sf_dir: str, min_support: int = COPURCHASE_MIN_SUPPORT) -> pd.DataFrame:
    """Association mining over order baskets: for every part pair
    co-purchased in >= {min_support} orders, the exact lift
    lift_ppm = n_ab * N_orders * 1e6 // (n_a * n_b) — lift > 1e6 means
    the pair co-occurs more than independence predicts (the
    recommendation / bundling signal). All arithmetic is exact int64.

    Scale contract: (order, part) rows co-locate by coarse orderkey
    hash — ONE exchange — and pair expansion is a vectorized
    per-partition self-merge bounded by basket size squared
    (C(7,2) = 21 pairs per TPC-H order; a mega-basket hazard caps at
    basket_size^2, the same guard class as winnow's df cap); pair
    partials pre-aggregate per partition before the pair-space groupby,
    the support filter shrinks pairs to output size BEFORE the two
    native marginal joins (the part-marginal table is part-space-sized
    and never broadcast), and N_orders sums per-partition distinct
    counts (exact — partitions own disjoint orderkeys)."""
    from ray.data.aggregate import Sum

    n_parts_hash = 64

    def slim(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "ok": batch["l_orderkey"].to_numpy().astype("int64"),
                "pk": batch["l_partkey"].to_numpy().astype("int64"),
            }
        ).drop_duplicates()
        df["part"] = (df.ok % n_parts_hash).astype("int32")
        return pa.Table.from_pandas(df, preserve_index=False)

    # global (ok, pk) dedup: block-local dedup in `slim` leaves cross-block
    # duplicates (an order's lineitems span blocks, and TPC-H repeats a
    # part within an order), which would inflate the marginals; duplicates
    # co-locate under the ok-hash partitioning, so one map_groups dedup is
    # exact
    li = (
        sized_read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
        .map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(lambda g: g.drop_duplicates(["ok", "pk"]), batch_format="pandas")
        .materialize()
    )

    def pairs_partial(g: pd.DataFrame) -> pd.DataFrame:
        m = g.merge(g, on="ok")
        m = m[m.pk_x < m.pk_y]
        out = m.groupby(["pk_x", "pk_y"], as_index=False).size()
        # ONE int64 group key (pa << 32 | pb): Ray's multi-column groupby
        # sorts 100k+ composite groups ~50x slower than the single-column
        # hash path (136 s vs 3 s at sf0.01, measured); partkeys < 2^32
        out["pk2"] = out.pk_x * 4294967296 + out.pk_y
        out = out.rename(columns={"size": "n_ab"})[["pk2", "n_ab"]]
        out["n_orders_part"] = 0
        # carry this partition's distinct-order count on one marker row
        marker = pd.DataFrame({"pk2": [-1], "n_ab": [0], "n_orders_part": [g.ok.nunique()]})
        return pd.concat([out, marker], ignore_index=True)

    def add_part2(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # splitmix-free coarse key: pk2 % 64 suffices (pair keys are dense
        # composites, not strided); Ray's hash-aggregate at 100k+ groups
        # ran 57 s where this coarse map_groups sum runs in ~2 s (measured)
        p = pc.cast(
            pc.bit_wise_and(pc.add(batch["pk2"], pa.scalar(1, pa.int64())), pa.scalar(63, pa.int64())),
            pa.int32(),
        )
        return batch.append_column("part2", p)

    def sum_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("pk2", as_index=False).agg(n_ab=("n_ab", "sum"), no=("n_orders_part", "sum"))
        return out

    raw_ds = (
        li.groupby("part")
        .map_groups(pairs_partial, batch_format="pandas")
        .map_batches(add_part2, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(sum_pairs, batch_format="pandas")
        .materialize()
    )
    def take_markers(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch["pk2"], pa.scalar(-1, pa.int64())))

    def take_supported(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.and_(
            pc.greater_equal(batch["pk2"], pa.scalar(0, pa.int64())),
            pc.greater_equal(batch["n_ab"], pa.scalar(min_support, pa.int64())),
        )
        b = batch.filter(m)
        pk2 = b["pk2"].to_numpy()
        return pa.table(
            {
                "pa": pa.array(pk2 // 4294967296, pa.int64()),
                "pb": pa.array(pk2 % 4294967296, pa.int64()),
                "n_ab": b["n_ab"],
            }
        )

    n_orders = int(
        raw_ds.map_batches(take_markers, batch_format="pyarrow").to_pandas().no.sum()
    )
    # support filter INSIDE the Dataset: the sub-support pair mass
    # (pair-space-sized, ~1.2M rows at sf0.1) never reaches the driver
    pairs = raw_ds.map_batches(take_supported, batch_format="pyarrow").to_pandas()

    def marg_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("pk").aggregate([("ok", "count")])
        return t.rename_columns(["pk", "c"])

    marg = (
        li.map_batches(marg_partial, batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("c", alias_name="n"))
    )
    import ray.data as rd

    pair_ds = rd.from_pandas(pairs.reset_index(drop=True))
    j1 = pair_ds.join(
        marg, join_type="inner", num_partitions=8, on=("pa",), right_on=("pk",)
    ).rename_columns({"n": "na"})
    j2 = j1.join(
        marg, join_type="inner", num_partitions=8, on=("pb",), right_on=("pk",)
    ).rename_columns({"n": "nb"})
    out = j2.to_pandas()
    out["lift_ppm"] = [
        int(ab) * n_orders * 1_000_000 // (int(a) * int(b))
        for ab, a, b in zip(out.n_ab, out.na, out.nb)
    ]
    out = (
        out[["pa", "pb", "n_ab", "lift_ppm"]]
        .sort_values(["pa", "pb"])
        .reset_index(drop=True)
    )
    return out.astype({c: "int64" for c in out.columns})


def copurchase_sql(min_support: int = COPURCHASE_MIN_SUPPORT) -> str:
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
m AS (SELECT l_partkey, COUNT(*) AS n FROM li GROUP BY 1),
no AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM li),
p AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS n_ab
  FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= {min_support})
SELECT p.pa, p.pb, CAST(p.n_ab AS BIGINT) AS n_ab,
       CAST(p.n_ab * no.n * 1000000 // (ma.n * mb.n) AS BIGINT) AS lift_ppm
FROM p
CROSS JOIN no
JOIN m ma ON ma.l_partkey = p.pa
JOIN m mb ON mb.l_partkey = p.pb
ORDER BY p.pa, p.pb
"""


# --------------------------------------------------------------------------
# value-oracled per-day HyperLogLog (md5-pinned hash, exact-int registers)
# --------------------------------------------------------------------------

HLL_DAILY_P = 8
HLL_DAILY_M = 1 << HLL_DAILY_P  # 256 registers, ~6.5% standard error


def hll_daily_users(sf_dir: str) -> pd.DataFrame:
    """Distinct users per DAY via a per-group HyperLogLog — and, unlike
    the rows-only `hll_distinct_users`, fully VALUE-ORACLED: the sketch
    is probabilistic only in its accuracy, not in its value. Pinning the
    hash to md5('hll:' || user) makes every register deterministic, and
    the indicator sum Z is kept as an EXACT integer (each register
    contributes 2^(57 - M_j), zero registers 2^57 — HUGEINT in the
    oracle, python bigint here), so the only float ops are the single
    final division (correctly rounded from identical exact operands on
    both sides) and the small-range ln, both under the repo's round-6
    discipline. Flores & Fuster (HLL, Flajolet et al. 2007): idx = top
    8 hash bits, rho = 57 - bit_length(56-bit tail), estimate
    alpha_256 * 256^2 / sum(2^-M_j) with linear counting below 2.5*m.

    Scale contract: per-block per-(day, register) max pre-reduce means
    each block ships <= #days x 256 slim int rows regardless of event
    volume or user cardinality (the mergeable-sketch property the exact
    `events_distinct_users` two-level distinct lacks); the final
    groupby is (days x 256)-sized and the driver holds only the per-day
    register tables."""
    import math

    import numpy as np

    TAIL = (1 << 56) - 1

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        pairs = pd.DataFrame(
            {
                "day": df.ts.astype("int64") // 86_400_000_000,
                "uid": df.user_id.astype("int64"),
            }
        ).drop_duplicates()
        best: dict[tuple[int, int], int] = {}
        for d, u in zip(pairs.day.to_numpy(), pairs.uid.to_numpy()):
            h = int(hashlib.md5(f"hll:{int(u)}".encode()).hexdigest()[:16], 16)
            tail = h & TAIL
            rho = 57 - tail.bit_length() if tail else 57
            key = (int(d), h >> 56)
            if best.get(key, 0) < rho:
                best[key] = rho
        ks = sorted(best)
        return pa.table(
            {
                "day": pa.array([k[0] for k in ks], pa.int64()),
                "idx": pa.array([k[1] for k in ks], pa.int64()),
                "rho": pa.array([best[k] for k in ks], pa.int64()),
            }
        )

    from ray.data.aggregate import Max

    parts = (
        sized_read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["day", "idx"])
        .aggregate(Max("rho", alias_name="mr"))
        .to_pandas()
    )
    m = HLL_DAILY_M
    alpha_num = 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0 * 144115188075855872.0
    rows = []
    for d, g in parts.groupby("day"):
        n_hit = len(g)
        v_zero = m - n_hit
        z = v_zero * (1 << 57) + sum(1 << (57 - int(r)) for r in g.mr)
        est = alpha_num / float(z)
        if est <= 2.5 * m and v_zero > 0:
            est = 256.0 * math.log(256.0 / v_zero)
        rows.append({"day": int(d), "n_hit": n_hit, "est_users": round(est, 6)})
    return (
        pd.DataFrame(rows)
        .sort_values("day")
        .reset_index(drop=True)
        .astype({"day": "int64", "n_hit": "int64"})
    )


HLL_DAILY_SQL = """
WITH du AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day, user_id FROM events
),
h AS (
  SELECT day,
         ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT AS h
  FROM du
),
r AS (
  SELECT day, CAST(h >> 56 AS BIGINT) AS idx,
         CASE WHEN (h & ((1::UBIGINT << 56) - 1)) = 0 THEN 57
              ELSE 57 - length(bin(h & ((1::UBIGINT << 56) - 1))) END AS rho
  FROM h
),
mx AS (SELECT day, idx, MAX(rho) AS mr FROM r GROUP BY day, idx),
z AS (
  SELECT day, COUNT(*) AS n_hit,
         (256 - COUNT(*))::HUGEINT * (1::HUGEINT << 57)
           + SUM(1::HUGEINT << (57 - mr)) AS zz
  FROM mx GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day, CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(CASE WHEN 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
                       * 144115188075855872.0 / CAST(zz AS DOUBLE) <= 640.0
                   AND n_hit < 256
              THEN 256.0 * ln(256.0 / (256 - n_hit))
              ELSE 0.7213 / (1.0 + 1.079 / 256.0) * 256.0 * 256.0
                   * 144115188075855872.0 / CAST(zz AS DOUBLE) END, 6) AS est_users
FROM z ORDER BY day
"""


# --------------------------------------------------------------------------
# entity resolution / record linkage over a derived dirty registry
# --------------------------------------------------------------------------
#
# The tables ship no name/address column with real string entropy
# (c_name is 'Customer#...' — every pair is distance-1), so the registry
# is DERIVED deterministically (the cdc_merge_snapshot changelog
# pattern): entity name = three md5-indexed words from RL_WORDS, and
# every third entity also appears as a DIRTY record with one character
# deleted at an id-derived position. The oracle rederives the identical
# registry, so the whole chain — corruption, blocking, scoring,
# election — is value-checked with zero golden constants.

RL_WORDS = [
    "amber", "birch", "cobalt", "delta", "flint", "fjord", "grove", "heron",
    "indigo", "jasper", "kelpie", "lumen", "maple", "noble", "ochre", "plume",
    "quartz", "raven", "sable", "topaz", "tundra", "vireo", "walnut", "zephyr",
]
RL_OFFSET = 10_000_000
RL_DIRTY_MOD = 3
RL_BLOCK_W = 8  # double-ended block key width
RL_MAX_LEV = 2


def _rl_name(ck: int) -> str:
    # 4 tokens -> 24^4 = 331k distinct names: entity collisions (two
    # customers drawing the SAME name — indistinguishable records, the
    # honest ER failure mode) stay rare at every sf
    return " ".join(
        RL_WORDS[int(hashlib.md5(f"nm{i}:{ck}".encode()).hexdigest()[:8], 16) % len(RL_WORDS)]
        for i in (1, 2, 3, 4)
    )


def record_linkage(sf_dir: str) -> pd.DataFrame:
    """Record linkage / entity resolution (Fellegi & Sunter 1969 shape;
    Papadakis et al. survey the blocking): link every dirty registry
    record back to a clean entity by double-ended 8-char blocking +
    exact Levenshtein scoring + deterministic per-record argmin
    (lev asc, clean id asc). Blocking is COMPLETE for the corruption
    model by construction: a single deletion at position p >= 2 of a
    >= 17-char name cannot damage both the first 8 and the last 8
    characters, so at least one of the two passes always co-blocks a
    dirty record with its source (the classic multi-pass blocking
    completeness argument) — every dirty record therefore has a match
    row with lev = 1 (pytest invariant).

    Scale contract: the registry derives per block (one md5 triple per
    entity); each blocking pass ships slim (block_key, id, name) rows
    into 64 coarse key-hash partitions where the dirty x clean pair
    expansion is a vectorized per-partition merge bounded by block size
    squared (the word list is built so 8-char keys split the corpus
    into ~500 blocks — the hot-block hazard and its key-widening escape
    are the inverted_index stopword story); cross-pass pair dedup and
    the final argmin election run on coarse dirty-id partitions
    (two-level: per-block best, then partition best). Levenshtein is
    the shared vectorized row DP (_lev_row_dp), never a per-cell Python
    loop; nothing corpus-sized lands on the driver before the final
    match-table collect (output = one row per dirty record)."""
    import numpy as np

    n_words = len(RL_WORDS)
    w = RL_BLOCK_W

    def registry(batch: pa.Table) -> pa.Table:
        cks = batch["c_custkey"].to_pylist()
        rid, name, side = [], [], []
        for ck in cks:
            nm = _rl_name(int(ck))
            rid.append(int(ck))
            name.append(nm)
            side.append(0)
            if ck % RL_DIRTY_MOD == 0:
                p = 2 + int(ck) % (len(nm) - 2)  # 1-based delete position in [2, L-1]
                rid.append(int(ck) + RL_OFFSET)
                name.append(nm[: p - 1] + nm[p:])
                side.append(1)
        return pa.table(
            {
                "rid": pa.array(rid, pa.int64()),
                "name": pa.array(name, pa.string()),
                "side": pa.array(side, pa.int32()),
            }
        )

    reg = (
        sized_read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(registry, batch_format="pyarrow")
        .materialize()  # two blocking passes consume it
    )

    def block_key(end: str):
        def _bk(batch: pa.Table) -> pa.Table:
            names = batch["name"].to_pylist()
            bks = [nm[:w] if end == "prefix" else nm[-w:] for nm in names]
            kp = [int(hashlib.md5(b.encode()).hexdigest()[:4], 16) & 63 for b in bks]
            return pa.table(
                {
                    "bk": pa.array(bks, pa.string()),
                    "rid": batch["rid"],
                    "name": batch["name"],
                    "side": batch["side"],
                    "kp": pa.array(kp, pa.int32()),
                }
            )

        return _bk

    def expand_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[g.side == 1][["bk", "rid", "name"]]
        c = g[g.side == 0][["bk", "rid", "name"]]
        m = d.merge(c, on="bk", suffixes=("_d", "_c"))
        out = m[["rid_d", "rid_c", "name_d", "name_c"]].rename(
            columns={"rid_d": "did", "rid_c": "cid", "name_d": "dname", "name_c": "cname"}
        )
        out["dp"] = out.did.to_numpy() & 63
        return out

    passes = [
        reg.map_batches(block_key(end), batch_format="pyarrow")
        .groupby("kp")
        .map_groups(expand_pairs, batch_format="pandas")
        for end in ("prefix", "suffix")
    ]
    cand = (
        passes[0]
        .union(passes[1])
        .groupby("dp")
        .map_groups(
            lambda g: g.drop_duplicates(["did", "cid"]), batch_format="pandas"
        )
    )

    def score(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        if df.empty:
            return pa.table(
                {
                    "did": pa.array([], pa.int64()),
                    "cid": pa.array([], pa.int64()),
                    "lev": pa.array([], pa.int64()),
                }
            )
        df["lev"] = [
            _lev_row_dp(a, b) for a, b in zip(df.dname.to_numpy(), df.cname.to_numpy())
        ]
        df = df[df.lev <= RL_MAX_LEV]
        # per-block best per dirty id (two-level argmin election)
        best = (
            df.sort_values(["did", "lev", "cid"]).groupby("did", sort=False).head(1)
        )
        return pa.table(
            {
                "did": pa.array(best.did.to_numpy(), pa.int64()),
                "cid": pa.array(best.cid.to_numpy(), pa.int64()),
                "lev": pa.array(best.lev.to_numpy(), pa.int64()),
            }
        )

    def final_best(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["did", "lev", "cid"]).groupby("did", sort=False).head(1)[
            ["did", "cid", "lev"]
        ]

    out = (
        cand.map_batches(score, batch_format="pyarrow")
        .map_batches(
            lambda b: b.append_column(
                "fp",
                pa.array(
                    (b["did"].to_numpy(zero_copy_only=False) & 63).astype(np.int32),
                    pa.int32(),
                ),
            ),
            batch_format="pyarrow",
        )
        .groupby("fp")
        .map_groups(final_best, batch_format="pandas")
        .to_pandas()
    )
    return (
        out.rename(columns={"did": "dirty_id", "cid": "matched_id"})
        .sort_values("dirty_id")
        .reset_index(drop=True)
        .astype({"dirty_id": "int64", "matched_id": "int64", "lev": "int64"})
    )


def record_linkage_sql() -> str:
    words = ", ".join(f"'{x}'" for x in RL_WORDS)
    name_expr = " || ' ' || ".join(
        f"wl.w[(1 + ('0x' || substr(md5('nm{i}:' || CAST(c_custkey AS VARCHAR)), 1, 8))::UBIGINT"
        f" % {len(RL_WORDS)})::INT]"
        for i in (1, 2, 3, 4)
    )
    return f"""
WITH wl AS (SELECT [{words}] AS w),
clean AS (SELECT c_custkey AS id, {name_expr} AS name FROM customer, wl),
dpos AS (
  SELECT id, name, 2 + (id % (length(name) - 2)) AS p
  FROM clean WHERE id % {RL_DIRTY_MOD} = 0),
dirty AS (
  SELECT id + {RL_OFFSET} AS did,
         substr(name, 1, CAST(p - 1 AS INT)) || substr(name, CAST(p + 1 AS INT)) AS dname
  FROM dpos),
cand AS (
  SELECT d.did, c.id AS cid, d.dname, c.name
  FROM dirty d JOIN clean c ON substr(d.dname, 1, {RL_BLOCK_W}) = substr(c.name, 1, {RL_BLOCK_W})
  UNION
  SELECT d.did, c.id, d.dname, c.name
  FROM dirty d JOIN clean c ON right(d.dname, {RL_BLOCK_W}) = right(c.name, {RL_BLOCK_W})
),
scored AS (
  SELECT did, cid, levenshtein(dname, name) AS lev FROM cand
  WHERE levenshtein(dname, name) <= {RL_MAX_LEV}),
best AS (
  SELECT did, cid, lev,
         row_number() OVER (PARTITION BY did ORDER BY lev, cid) AS rn
  FROM scored)
SELECT CAST(did AS BIGINT) AS dirty_id, CAST(cid AS BIGINT) AS matched_id,
       CAST(lev AS BIGINT) AS lev
FROM best WHERE rn = 1 ORDER BY dirty_id
"""


# --------------------------------------------------------------------------
# exact distributed ROC-AUC (Mann-Whitney rank-sum) — model-eval metrics
# --------------------------------------------------------------------------

AUC_SCALE = 1_000_000  # fixed-point stop-ratio score (integer end to end)
AUC_SCORE_CAP = 5_000_000  # loud cap on distinct (source, score) cells


def roc_auc_by_source(sf_dir: str) -> pd.DataFrame:
    """Exact grouped ROC-AUC audit — the model-evaluation metric a
    quality-classifier training pipeline computes at corpus scale:
    does the stopword-ratio signal (the Gopher-gate feature) separate
    English from non-English documents, per source? AUC is computed
    EXACTLY as the Mann-Whitney U rank-sum with standard half-credit
    ties, never by sampling or sorting the corpus:

        2U = sum over distinct scores s of  p_s * (2 * N_below(s) + n_s)
        AUC = U / (P * N)

    where p_s/n_s are the positive/negative counts at score s and
    N_below the negatives strictly below. The score is the FIXED-POINT
    integer (n_stop * 1e6) // n_words (the dsir_select discipline), so
    everything up to the single final division is exact integer
    arithmetic on both engine and oracle (one correctly-rounded float
    op -> round-6 bit parity, the hll/doremi float contract).

    Scale contract: per-block (source, score, p, n) partials pre-reduce
    inside map_batches, so the one exchange is bounded by distinct
    (source, score) cells x #blocks — stop-ratio quantizes to at most
    1e6+1 values and real corpora use a few thousand; the per-source
    map_groups then holds only distinct-score rows (prefix-sum +
    integer dot product, fully vectorized). Raises loudly past
    AUC_SCORE_CAP distinct cells naming the histogram-bucket fallback
    (percentile_normalize's coarse-bucket machinery). No text crosses
    any shuffle; u2 stays < 2^53 so the oracle's HUGEINT -> DOUBLE
    division is exact (u2 <= P*N*2 <= corpus^2/2 — guard documented)."""
    from ..functions.textstats import STOPWORDS

    def partials(batch: pa.Table) -> pa.Table:
        rows: dict[tuple, list[int]] = {}
        for src, lang, text in zip(
            batch["source"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            ws = text.split()
            n = len(ws)
            score = (
                sum(1 for w in ws if w.lower() in STOPWORDS) * AUC_SCALE
            ) // n if n else 0
            cell = rows.setdefault((src, score), [0, 0])
            cell[0 if lang == "en" else 1] += 1
        keys = sorted(rows)
        return pa.table(
            {
                "source": pa.array([k[0] for k in keys], pa.string()),
                "score": pa.array([k[1] for k in keys], pa.int64()),
                "p": pa.array([rows[k][0] for k in keys], pa.int64()),
                "n": pa.array([rows[k][1] for k in keys], pa.int64()),
            }
        )

    cells = _docs(sf_dir, columns=("source", "lang", "text")).map_batches(
        partials, batch_format="pyarrow"
    )
    n_cells = cells.count()
    if n_cells > AUC_SCORE_CAP:
        raise RuntimeError(
            f"{n_cells} (source, score) partial cells exceed AUC_SCORE_CAP="
            f"{AUC_SCORE_CAP}; coarsen the fixed-point scale or bucket scores "
            "first (percentile_normalize's histogram machinery) — exactness "
            "then holds per bucket instead of per distinct score"
        )

    def auc_of_group(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("score", as_index=False).agg(p=("p", "sum"), n=("n", "sum"))
        s = s.sort_values("score")
        nb = s.n.cumsum().shift(1, fill_value=0).to_numpy()
        u2 = int((s.p.to_numpy() * (2 * nb + s.n.to_numpy())).sum())
        P, N = int(s.p.sum()), int(s.n.sum())
        return pd.DataFrame(
            {
                "source": [g.source.iloc[0]],
                "n_pos": pd.Series([P], dtype="int64"),
                "n_neg": pd.Series([N], dtype="int64"),
                "auc": [round(u2 / (2.0 * P * N), 6)],
            }
        )

    out = (
        cells.groupby("source")
        .map_groups(auc_of_group, batch_format="pandas")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    return out


ROC_AUC_SQL = f"""
WITH t AS (
  SELECT source,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos,
         CASE WHEN trim(text) = '' THEN 0
              ELSE (len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        w -> lower(w) IN
      ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
                    * {AUC_SCALE})
                   // len(regexp_split_to_array(trim(text), '\\s+')) END AS score
  FROM documents),
g AS (
  SELECT source, score, SUM(pos) AS p, SUM(1 - pos) AS n
  FROM t GROUP BY source, score),
c AS (
  SELECT source, score, p, n,
         COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY score
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nb
  FROM g),
u AS (
  SELECT source, SUM(p * (2 * nb + n)) AS u2, SUM(p) AS np, SUM(n) AS nn
  FROM c GROUP BY source)
SELECT source, CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       ROUND(u2 / (2.0 * np * nn), 6) AS auc
FROM u ORDER BY source
"""


# --------------------------------------------------------------------------
# table NDV profile — the ANALYZE TABLE / optimizer-statistics pass
# --------------------------------------------------------------------------

NDV_COLUMNS = ("o_custkey", "o_orderdate", "o_orderpriority", "o_orderstatus", "o_totalprice")


def table_ndv_profile(sf_dir: str) -> pd.DataFrame:
    """Exact per-column distinct-value counts over `orders` — the
    ANALYZE-TABLE statistics pass every cost-based planner (and every
    partitioning decision in this repo) feeds on: NDV decides join
    sides, salt factors, and dictionary-encoding wins. One scan emits
    per-block per-column DEDUPED (col, val) rows — the exchange is
    bounded by NDV x #blocks per column, never row count — then one
    composite groupby distincts globally and a per-block partial count
    folds to (column, n_distinct).

    Canonicalization is injective on both sides so 'distinct canonical'
    == 'distinct raw': ints/strings pass through, timestamps become
    epoch-us, money becomes exact cents (to_cents ≙ ROUND(x*100) —
    NOTE the oracle counts distinct CENTS too; two doubles inside the
    same cent are one value by contract on BOTH sides)."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from .common import to_cents

    ds = sized_read_parquet(f"{sf_dir}/orders.parquet", columns=list(NDV_COLUMNS))

    def dedup_partial(batch: pa.Table) -> pa.Table:
        cols, vals = [], []
        for name in NDV_COLUMNS:
            arr = batch[name]
            if name == "o_totalprice":
                u = np.unique(to_cents(arr.to_numpy(zero_copy_only=False)))
                sv = [str(int(x)) for x in u]
            elif pa.types.is_timestamp(arr.type):
                u = np.unique(arr.to_numpy(zero_copy_only=False).astype("datetime64[us]").astype("int64"))
                sv = [str(int(x)) for x in u]
            elif pa.types.is_integer(arr.type):
                u = np.unique(arr.to_numpy(zero_copy_only=False))
                sv = [str(int(x)) for x in u]
            else:
                sv = sorted(set(arr.to_pylist()))
            cols.extend([name] * len(sv))
            vals.extend(sv)
        return pa.table({"col": pa.array(cols, pa.string()), "val": pa.array(vals, pa.string())})

    distinct = (
        ds.map_batches(dedup_partial, batch_format="pyarrow")
        .groupby(["col", "val"])
        .aggregate(Count())
    )

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"col": batch["col"], "c": pa.array(np.ones(len(batch), np.int64))})
        g = t.group_by("col").aggregate([("c", "sum")])
        return g.rename_columns(["column", "n_distinct"])

    out = (
        distinct.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("column")
        .aggregate(Sum("n_distinct", alias_name="n_distinct"))
        .to_pandas()
        .sort_values("column")
        .reset_index(drop=True)
    )
    return out.astype({"column": "string", "n_distinct": "int64"}).astype({"column": object})


TABLE_NDV_SQL = """
SELECT 'o_custkey' AS "column", CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_distinct FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(COUNT(DISTINCT epoch_us(o_orderdate)) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderpriority', CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_orderstatus', CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(DISTINCT CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) FROM orders
ORDER BY "column"
"""


# --------------------------------------------------------------------------
# Benford first-digit audit (data-quality / fraud screening)
# --------------------------------------------------------------------------


def benford_audit(sf_dir: str) -> pd.DataFrame:
    """First-significant-digit distribution of order totals vs Benford's
    law, with the per-digit chi-square contribution — the classic
    fabricated-data screen an auditor (or a synthetic-data debugger)
    runs over money columns. Genuinely discriminating here: TPC-H-ish
    totals are sums of uniform-ish prices, NOT Benford-distributed, so
    the contributions are large and any drift in the pipeline shows.

    Exactness: the observed counts are exact ints over cents (first
    significant digit is invariant to the x100 power-of-ten scaling);
    expected = n * log10(1 + 1/d) and contribution = (o - e)^2 / e use
    one libm log10 + the same literal arithmetic on both sides, reported
    round-6. Scale: per-block 9-row digit-count partials -> 9-row
    groupby; nothing else moves."""
    import numpy as np

    from ray.data.aggregate import Sum

    from .common import sized_read_parquet, to_cents

    def partial(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch["o_totalprice"].to_numpy(zero_copy_only=False))
        first = np.array([int(str(c)[0]) for c in cents], dtype=np.int64)
        d, n = np.unique(first, return_counts=True)
        return pa.table(
            {"digit": pa.array(d, pa.int64()), "observed": pa.array(n, pa.int64())}
        )

    obs = (
        sized_read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("digit")
        .aggregate(Sum("observed", alias_name="observed"))
        .to_pandas()
        .set_index("digit")
        .observed
    )
    n = int(obs.sum())
    rows = []
    for d in range(1, 10):
        o = int(obs.get(d, 0))
        e = n * np.log10(1.0 + 1.0 / d)
        rows.append(
            {
                "digit": d,
                "observed": o,
                "expected": round(float(e), 6),
                "chi2_term": round(float((o - e) ** 2 / e), 6),
            }
        )
    return pd.DataFrame(rows).astype(
        {"digit": "int64", "observed": "int64", "expected": "float64", "chi2_term": "float64"}
    )


BENFORD_SQL = """
WITH obs AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)
              AS VARCHAR), 1, 1) AS BIGINT) AS digit,
         CAST(COUNT(*) AS BIGINT) AS observed
  FROM orders GROUP BY 1
),
n AS (SELECT CAST(SUM(observed) AS DOUBLE) AS n FROM obs),
digits AS (SELECT unnest(generate_series(1, 9)) AS digit)
SELECT d.digit,
       CAST(COALESCE(o.observed, 0) AS BIGINT) AS observed,
       ROUND(n.n * log10(1.0 + 1.0 / d.digit), 6) AS expected,
       ROUND(pow(COALESCE(o.observed, 0) - n.n * log10(1.0 + 1.0 / d.digit), 2)
             / (n.n * log10(1.0 + 1.0 / d.digit)), 6) AS chi2_term
FROM digits d LEFT JOIN obs o ON o.digit = d.digit CROSS JOIN n
ORDER BY d.digit
"""


# --------------------------------------------------------------------------
# grouped OLS via distributive sufficient statistics
# --------------------------------------------------------------------------


def regression_by_lang(sf_dir: str) -> pd.DataFrame:
    """Per-lang least-squares fit of token count on char count — the
    distributed-OLS pattern (sufficient statistics, the only way
    regression scales: each block contributes one exact-integer moment
    row (n, Σx, Σy, Σxx, Σyy, Σxy) per lang and the closed-form solve
    runs on the #langs-sized fold; no residual passes, no gradient
    loop). The bytes→tokens slope is itself a real corpus statistic
    (chars-per-token planning for budget ops).

    Exactness: x = n_chars and y = whitespace token count are both
    integers, so every moment is EXACT (int64-safe per block and per
    corpus; the final normal-equation products can exceed int64 and are
    assembled in Python big ints driver-side, and as HUGEINT in the
    oracle). Each output is ONE correctly-rounded big-int division:
    slope = (nΣxy - ΣxΣy) / (nΣxx - Σx²),
    intercept = (ΣyΣxx - ΣxΣxy) / (nΣxx - Σx²),
    r² = (nΣxy - ΣxΣy)² / ((nΣxx - Σx²)(nΣyy - Σy²)) — round-6."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        x = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.fromiter(
            (len(t.split()) for t in batch["text"].to_pylist()),
            dtype=np.int64,
            count=len(langs),
        )
        df = pd.DataFrame(
            {"lang": langs, "n": 1, "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y}
        )
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (
        sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["lang", "n_chars", "text"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sx", alias_name="sx"),
            Sum("sy", alias_name="sy"),
            Sum("sxx", alias_name="sxx"),
            Sum("syy", alias_name="syy"),
            Sum("sxy", alias_name="sxy"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    rows = []
    for r in m.itertuples():
        n, sx, sy, sxx, syy, sxy = (int(r.n), int(r.sx), int(r.sy), int(r.sxx), int(r.syy), int(r.sxy))
        den = n * sxx - sx * sx  # python big ints — exact
        cov = n * sxy - sx * sy
        vy = n * syy - sy * sy
        rows.append(
            {
                "lang": r.lang,
                "n": n,
                "slope": round(cov / den, 6),
                "intercept": round((sy * sxx - sx * sxy) / den, 6),
                "r2": round((cov * cov) / (den * vy), 6),
            }
        )
    return pd.DataFrame(rows).astype(
        {"lang": "str", "n": "int64", "slope": "float64", "intercept": "float64", "r2": "float64"}
    )


REGRESSION_SQL = """
WITH pts AS (
  SELECT lang, CAST(n_chars AS HUGEINT) AS x,
         CAST(CASE WHEN regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
              THEN len(regexp_split_to_array(trim(text), '\\s+'))
              ELSE 0 END AS HUGEINT) AS y
  FROM documents
),
m AS (
  SELECT lang, CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
  FROM pts GROUP BY lang
)
SELECT lang, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
       ROUND(CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS intercept,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
             / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)),
             6) AS r2
FROM m ORDER BY lang
"""


# --------------------------------------------------------------------------
# constraint-driven imputation (data repair)
# --------------------------------------------------------------------------

IMPUTE_MISSING_MOD = 11


def impute_lang_by_source(sf_dir: str) -> pd.DataFrame:
    """Missing-value repair by group majority — the REPAIR member of the
    data-quality family (validate_orders detects, table_diff localizes,
    this fixes): docs with doc_id % 11 == 0 have their lang treated as
    MISSING (the deterministic-derivation pattern — the truth is held
    out, so repair accuracy is measurable exactly), and each missing
    value is imputed with the majority lang of the doc's source among
    NON-missing rows (ties -> lexicographically smallest, both sides).
    Reports per source: missing count, the imputed lang, how many
    imputations match the held-out truth, and the non-missing majority
    size — the audit table a cleaning job emits before applying.

    Scale contract: one streaming pass emits (source, lang,
    n_known/n_missing/n_match-if-imputed) integer partials keyed by the
    (#sources x #langs)-bounded group space; the majority election and
    accuracy join run on that bounded fold driver-side. Exact integers
    throughout."""
    import numpy as np

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        missing = ids % IMPUTE_MISSING_MOD == 0
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pylist(),
                "lang": batch["lang"].to_pylist(),
                "known": (~missing).astype(np.int64),
                "miss": missing.astype(np.int64),
            }
        )
        g = df.groupby(["source", "lang"], as_index=False).agg(
            n_known=("known", "sum"), n_missing=("miss", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    folded = (
        sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "lang"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["source", "lang"])
        .aggregate(Sum("n_known", alias_name="n_known"), Sum("n_missing", alias_name="n_missing"))
        .to_pandas()
    )
    rows = []
    for src, g in folded.groupby("source"):
        g = g.sort_values(["n_known", "lang"], ascending=[False, True])
        imputed = g.lang.iloc[0]
        n_majority = int(g.n_known.iloc[0])
        n_missing = int(g.n_missing.sum())
        n_correct = int(g.loc[g.lang == imputed, "n_missing"].sum())
        rows.append(
            {
                "source": src,
                "n_missing": n_missing,
                "imputed_lang": imputed,
                "n_correct": n_correct,
                "n_majority": n_majority,
            }
        )
    out = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
    return out.astype(
        {
            "source": "str",
            "n_missing": "int64",
            "imputed_lang": "str",
            "n_correct": "int64",
            "n_majority": "int64",
        }
    )


IMPUTE_LANG_SQL = f"""
WITH tagged AS (
  SELECT source, lang, doc_id % {IMPUTE_MISSING_MOD} = 0 AS missing
  FROM documents
),
counts AS (
  SELECT source, lang,
         SUM(CASE WHEN missing THEN 0 ELSE 1 END) AS n_known,
         SUM(CASE WHEN missing THEN 1 ELSE 0 END) AS n_missing
  FROM tagged GROUP BY source, lang
),
major AS (
  SELECT source, lang AS imputed_lang, n_known AS n_majority
  FROM counts
  QUALIFY row_number() OVER (PARTITION BY source
                             ORDER BY n_known DESC, lang ASC) = 1
)
SELECT m.source,
       CAST(t.n_missing AS BIGINT) AS n_missing,
       m.imputed_lang,
       CAST(COALESCE(c.n_missing, 0) AS BIGINT) AS n_correct,
       CAST(m.n_majority AS BIGINT) AS n_majority
FROM major m
JOIN (SELECT source, SUM(n_missing) AS n_missing FROM counts GROUP BY source) t
  ON t.source = m.source
LEFT JOIN counts c ON c.source = m.source AND c.lang = m.imputed_lang
ORDER BY m.source
"""


# --------------------------------------------------------------------------
# robust outlier audit — exact median / MAD from value histograms
# --------------------------------------------------------------------------

MAD_K = 2  # Hampel cut: |x - median| > K * MAD (K=2 — this corpus's
# synthetic lengths are light-tailed; the classic K=3 flags nothing at
# any sf, making the statistic vacuous. K is a config, not a truth.)


def mad_outliers(sf_dir: str) -> pd.DataFrame:
    """Robust per-lang outlier audit via the Hampel identifier
    (|x - median| > K * MAD over doc length) — the screen that replaces
    mean/stddev z-scores on the heavy-tailed length distributions web
    corpora actually have (one 10 MB page drags a mean z-score; it
    cannot drag a median). EXACT and integer end-to-end: both the
    median and the MAD (median absolute deviation) are computed by rank
    walk on the merged value histogram under the established
    quantile_disc contract (rank = ceil(n/2), 1-based — the
    exact_ts_quantiles contract).

    Scale: ONE streaming pass folds to (lang, n_chars, cnt) partials
    bounded by distinct-values x #langs x #blocks (the ks_two_sample
    histogram shape); the deviation histogram is DERIVED from the value
    histogram driver-side (|v - med| folds counts — no second corpus
    scan), and the outlier count is a weighted sum over the same
    histogram. Distinct doc lengths grow with text diversity, never
    corpus size."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": batch["lang"].to_pylist(), "v": batch["n_chars"].to_numpy()}
        )
        g = df.groupby(["lang", "v"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )

    def rank_value(vals: np.ndarray, cnts: np.ndarray, rank: int) -> int:
        """Value at 1-based `rank` of the expanded sorted multiset."""
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(cnts[order])
        return int(vals[order][np.searchsorted(cum, rank)])

    rows = []
    for lang, g in hist.groupby("lang"):
        vals = g["v"].to_numpy()
        cnts = g["cnt"].to_numpy()
        n = int(cnts.sum())
        med = rank_value(vals, cnts, -(-n // 2))  # ceil(n/2)
        dev = np.abs(vals - med)
        # fold the deviation histogram (distinct devs <= distinct values)
        dd = pd.DataFrame({"d": dev, "cnt": cnts}).groupby("d", as_index=False).sum()
        mad = rank_value(dd["d"].to_numpy(), dd["cnt"].to_numpy(), -(-n // 2))
        n_out = int(cnts[dev > MAD_K * mad].sum())
        rows.append({"lang": lang, "n": n, "median": med, "mad": mad, "n_outliers": n_out})
    return (
        pd.DataFrame(rows)
        .sort_values("lang")
        .reset_index(drop=True)
        .astype({"lang": "str", "n": "int64", "median": "int64", "mad": "int64", "n_outliers": "int64"})
    )


MAD_OUTLIERS_SQL = f"""
WITH d AS (SELECT lang, n_chars AS v FROM documents),
med AS (SELECT lang, quantile_disc(v, 0.5) AS med FROM d GROUP BY lang),
mad AS (
  SELECT d.lang, ANY_VALUE(med.med) AS med,
         quantile_disc(abs(d.v - med.med), 0.5) AS mad
  FROM d JOIN med ON d.lang = med.lang GROUP BY d.lang
)
SELECT d.lang, COUNT(*) AS n,
       CAST(ANY_VALUE(mad.med) AS BIGINT) AS median,
       CAST(ANY_VALUE(mad.mad) AS BIGINT) AS mad,
       CAST(SUM(CASE WHEN abs(d.v - mad.med) > {MAD_K} * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM d JOIN mad ON d.lang = mad.lang
GROUP BY d.lang ORDER BY d.lang
"""


# --------------------------------------------------------------------------
# dynamic PIVOT — long-to-wide transpose
# --------------------------------------------------------------------------


def pivot_source_lang(sf_dir: str) -> pd.DataFrame:
    """Dynamic PIVOT: the per-source language-mix matrix (one row per
    source, one COLUMN per observed lang, cells = doc counts) — the
    long-to-wide transpose every reporting layer runs on top of a
    grouped aggregate, and the inverse of priority_unpivot. 'Dynamic'
    because the output schema is DATA-derived: the column set is the
    observed lang values (sorted), exactly like DuckDB's PIVOT
    statement builds it.

    Scale contract: the distributed work is the ordinary (source, lang)
    pre-aggregated groupby — #sources x #langs bounded partials; the
    transpose itself runs on that group-sized result driver-side (a
    wide matrix with a data-derived schema is a REPORT, not a dataset —
    at 100 TB you pivot the rollup, never the corpus). Missing cells
    fill 0 ≙ PIVOT's semantics; exact integer counts."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"source": batch["source"].to_pylist(), "lang": batch["lang"].to_pylist()}
        )
        g = df.groupby(["source", "lang"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    long = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["source", "lang"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    wide = (
        long.pivot_table(index="source", columns="lang", values="cnt", fill_value=0)
        .sort_index(axis=1)
        .reset_index()
        .sort_values("source")
        .reset_index(drop=True)
    )
    wide.columns.name = None
    langs = [c for c in wide.columns if c != "source"]
    return wide.astype({"source": "str", **{c: "int64" for c in langs}})


PIVOT_SOURCE_LANG_SQL = """
PIVOT documents ON lang USING COUNT(*) GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# Poisson bootstrap — the streaming-scale bootstrap
# --------------------------------------------------------------------------

BOOT_B = 32  # bootstrap replicates


def _poisson_thresholds() -> list[float]:
    """Cumulative Poisson(1) CDF thresholds c_0..c_5, spelled as the
    IDENTICAL left-to-right sum the SQL oracle uses (same libm exp,
    same IEEE adds) so u-vs-threshold compares agree bitwise."""
    import math

    e = math.exp(-1.0)
    c0 = e
    c1 = c0 + e
    c2 = c1 + e / 2.0
    c3 = c2 + e / 6.0
    c4 = c3 + e / 24.0
    c5 = c4 + e / 120.0
    return [c0, c1, c2, c3, c4, c5]


def poisson_bootstrap_means(sf_dir: str) -> pd.DataFrame:
    """Poisson bootstrap over mean doc length — the bootstrap that
    actually streams (Chamandy et al., Google 2012): the classical
    bootstrap resamples n items WITH replacement and needs global n
    up front plus a shuffle per replicate; the Poisson bootstrap gives
    each row an independent Poisson(1) multiplicity PER REPLICATE, so
    all B resamples fold in ONE streaming pass with no coordination —
    at 100 TB each block computes its B (sum, count) partials locally
    and the exchange is B x #blocks tiny integer rows.

    Multiplicities are md5-seeded (u = 48-bit md5 prefix / 2^48, exact
    in double; k = inverse-CDF walk over cumulative Poisson(1)
    thresholds, capped at 6 where P ~ 1e-4 — both sides use the same
    cap rule and the same IEEE threshold sums). Output: one row per
    replicate (b, n_eff, sum_chars, mean round-6) — the CI is any
    quantile over these 32 value-locked means."""
    from ray.data.aggregate import Sum

    thr = _poisson_thresholds()

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        x = batch["n_chars"].to_numpy()
        rows = {"b": [], "n_eff": [], "sum_chars": []}
        for b in range(BOOT_B):
            us = np.array(
                [
                    int(hashlib.md5(f"boot:{d}:{b}".encode()).hexdigest()[:12], 16)
                    for d in ids
                ],
                dtype=np.int64,
            ) / 281474976710656.0
            k = np.searchsorted(np.array(thr), us, side="right")  # u >= c5 -> 6
            rows["b"].append(b)
            rows["n_eff"].append(int(k.sum()))
            rows["sum_chars"].append(int((k * x).sum()))
        return pa.Table.from_pandas(pd.DataFrame(rows), preserve_index=False)

    m = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("b")
        .aggregate(Sum("n_eff", alias_name="n_eff"), Sum("sum_chars", alias_name="sum_chars"))
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    m["mean_chars"] = (
        m["sum_chars"].astype(float) / m["n_eff"].astype(float)
    ).round(6)
    return m.astype({"b": "int64", "n_eff": "int64", "sum_chars": "int64"})


def poisson_bootstrap_sql() -> str:
    e = "exp(-1.0)"
    c = [
        f"{e}",
        f"{e} + {e}",
        f"{e} + {e} + {e} / 2.0",
        f"{e} + {e} + {e} / 2.0 + {e} / 6.0",
        f"{e} + {e} + {e} / 2.0 + {e} / 6.0 + {e} / 24.0",
        f"{e} + {e} + {e} / 2.0 + {e} / 6.0 + {e} / 24.0 + {e} / 120.0",
    ]
    return f"""
WITH reps AS (SELECT b FROM range({BOOT_B}) t(b)),
draw AS (
  SELECT reps.b, d.n_chars,
         CAST(CONCAT('0x', substr(md5('boot:' || CAST(d.doc_id AS VARCHAR) || ':'
              || CAST(reps.b AS VARCHAR)), 1, 12)) AS BIGINT) / 281474976710656.0 AS u
  FROM documents d CROSS JOIN reps
),
mult AS (
  SELECT b, n_chars,
         CASE WHEN u < {c[0]} THEN 0
              WHEN u < {c[1]} THEN 1
              WHEN u < {c[2]} THEN 2
              WHEN u < {c[3]} THEN 3
              WHEN u < {c[4]} THEN 4
              WHEN u < {c[5]} THEN 5
              ELSE 6 END AS k
  FROM draw
)
SELECT CAST(b AS BIGINT) AS b,
       CAST(SUM(k) AS BIGINT) AS n_eff,
       CAST(SUM(k * n_chars) AS BIGINT) AS sum_chars,
       ROUND(CAST(SUM(k * n_chars) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6) AS mean_chars
FROM mult GROUP BY b ORDER BY b
"""


# --------------------------------------------------------------------------
# winsorized mean — robust rollup by percentile clipping
# --------------------------------------------------------------------------

WINSOR_LO_Q = 0.05
WINSOR_HI_Q = 0.95
# the same quantiles as exact integer fractions for the engine's rank rule
_WINSOR_LO_NUM, _WINSOR_HI_NUM, _WINSOR_DEN = 1, 19, 20
assert _WINSOR_LO_NUM / _WINSOR_DEN == WINSOR_LO_Q
assert _WINSOR_HI_NUM / _WINSOR_DEN == WINSOR_HI_Q


def winsorized_mean(sf_dir: str) -> pd.DataFrame:
    """Per-lang winsorized mean of doc length: clip every value to the
    exact [p05, p95] rank bounds, then average — the REPAIR companion
    of mad_outliers (that flags the tail; this neutralizes it, the
    robust rollup a corpus card reports when a handful of mega-pages
    would otherwise own the mean). Bounds use the established
    quantile_disc rank contract (ceil(q*n), 1-based) on the merged
    value histogram; the clipped sum is exact int64 (clip then
    cnt-weighted sum over the histogram — the corpus is never
    re-scanned), and the one final division is exact-big-int vs the
    oracle's cast-to-double (~1e-16 under round-6).

    Scale: the mad_outliers single-pass (lang, n_chars, cnt) histogram;
    everything after is distinct-value-sized driver work."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {"lang": batch["lang"].to_pylist(), "v": batch["n_chars"].to_numpy()}
        )
        g = df.groupby(["lang", "v"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "n_chars"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )

    def rank_value(vals, cnts, rank):
        order = np.argsort(vals, kind="stable")
        cum = np.cumsum(cnts[order])
        return int(vals[order][np.searchsorted(cum, rank)])

    rows = []
    for lang, g in hist.groupby("lang"):
        vals = g["v"].to_numpy()
        cnts = g["cnt"].to_numpy()
        n = int(cnts.sum())
        # exact integer rank rule ceil(q*n) with q as a true fraction
        # (1/20 and 19/20) — no float detour whose double rounding a
        # ceil-div would have to absorb (ADVICE r4)
        lo = rank_value(vals, cnts, -(-(_WINSOR_LO_NUM * n) // _WINSOR_DEN))
        hi = rank_value(vals, cnts, -(-(_WINSOR_HI_NUM * n) // _WINSOR_DEN))
        clipped = np.clip(vals, lo, hi)
        s = int((clipped.astype(object) * cnts.astype(object)).sum())
        rows.append(
            {"lang": lang, "n": n, "lo": lo, "hi": hi, "winsorized_mean": round(s / n, 6)}
        )
    return (
        pd.DataFrame(rows)
        .sort_values("lang")
        .reset_index(drop=True)
        .astype({"lang": "str", "n": "int64", "lo": "int64", "hi": "int64"})
    )


WINSORIZED_MEAN_SQL = f"""
WITH d AS (SELECT lang, n_chars AS v FROM documents),
q AS (
  SELECT lang, quantile_disc(v, {WINSOR_LO_Q}) AS lo, quantile_disc(v, {WINSOR_HI_Q}) AS hi
  FROM d GROUP BY lang
)
SELECT d.lang, COUNT(*) AS n,
       CAST(ANY_VALUE(q.lo) AS BIGINT) AS lo,
       CAST(ANY_VALUE(q.hi) AS BIGINT) AS hi,
       ROUND(CAST(SUM(CASE WHEN d.v < q.lo THEN q.lo
                           WHEN d.v > q.hi THEN q.hi
                           ELSE d.v END) AS DOUBLE) / COUNT(*), 6)
         AS winsorized_mean
FROM d JOIN q ON d.lang = q.lang
GROUP BY d.lang ORDER BY d.lang
"""
