"""Event-stream-shaped pipelines over the `events` table.

Ray Data is a batch engine; stream semantics are expressed as ordered,
partitioned computation (ray_guide.md pattern): tumbling windows =
floor(ts) bucketing + groupby; sessionization = per-user map_groups over
ts-sorted rows. All windows are oracle-checkable in SQL.
"""

from __future__ import annotations

import json
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _events(sf_dir: str, columns=None) -> rd.Dataset:
    from .common import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def events_tumbling(sf_dir: str, window_s: int = 3600) -> pd.DataFrame:
    """Tumbling-window counts + value sums per event_type. Window key =
    epoch seconds floored to window_s; partial agg per batch, then a small
    groupby over (window_start, event_type) partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # arrow-native: cast timestamp[us] -> int64 µs, integer floor to
        # the window — identical math to the oracle's epoch_us expression
        # (duckdb's ::BIGINT cast ROUNDS doubles, so stay integral), no
        # pandas round-trip per batch
        epoch_us = pc.cast(batch["ts"], pa.int64())
        w_us = pa.scalar(window_s * 1_000_000, pa.int64())
        ws = pc.multiply(pc.divide(epoch_us, w_us), pa.scalar(window_s, pa.int64()))
        t = pa.table(
            {
                "window_start": ws,
                "event_type": batch["event_type"],
                "n_events": pa.array(np.ones(len(batch), np.int64)),
                "sum_value": batch["value"],
            }
        )
        g = t.group_by(["window_start", "event_type"]).aggregate(
            [("n_events", "sum"), ("sum_value", "sum")]
        )
        return pa.table(
            {
                "window_start": g["window_start"],
                "event_type": g["event_type"],
                "n_events": g["n_events_sum"],
                "sum_value": g["sum_value_sum"],
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "ts", "event_type", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["window_start", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
        .sort_values(["window_start", "event_type"])
        .reset_index(drop=True)
    )
    out["sum_value"] = out.sum_value.round(4)
    return out.astype({"window_start": "int64", "n_events": "int64"})


EVENTS_TUMBLING_SQL_T = """
SELECT (epoch_us(ts) // (CAST({window_s} AS BIGINT) * 1000000)) * {window_s} AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(value), 4) AS sum_value
FROM events
GROUP BY 1, 2 ORDER BY window_start, event_type
"""


def events_topk_users(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k users by total value: partial per-batch user sums -> groupby
    -> per-block top-k -> merge of <= k rows per block driver-side (q10's
    pattern: the driver never sees the full per-user aggregate, which is
    user-cardinality-sized at crawl scale)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("user_id", as_index=False).agg(total_value=("value", "sum"), n_events=("event_id", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    def topk_part(batch: pa.Table) -> pa.Table:
        # round BEFORE ranking so boundary ties match the rounded-value
        # order the final merge (and the SQL oracle) uses
        df = batch.to_pandas()
        df["total_value"] = df.total_value.round(4)
        if len(df) > k:
            df = df.sort_values(
                ["total_value", "user_id"], ascending=[False, True], kind="mergesort"
            ).head(k)
        return pa.Table.from_pandas(df, preserve_index=False)

    cand = (
        _events(sf_dir, columns=["event_id", "user_id", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("user_id")
        .aggregate(Sum("total_value", alias_name="total_value"), Sum("n_events", alias_name="n_events"))
        .map_batches(topk_part, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    out = cand.sort_values(["total_value", "user_id"], ascending=[False, True], kind="mergesort").head(k)
    return out[["user_id", "total_value", "n_events"]].astype({"user_id": "int64", "n_events": "int64"}).reset_index(drop=True)


EVENTS_TOPK_SQL_T = """
SELECT user_id, ROUND(SUM(value), 4) AS total_value, COUNT(*) AS n_events
FROM events GROUP BY user_id
ORDER BY total_value DESC, user_id LIMIT {k}
"""


def events_json_props(sf_dir: str) -> pd.DataFrame:
    """JSON scalar extraction: parse props (a JSON object string), extract
    int field k, aggregate per event_type (map/json function coverage,
    SURVEY.md §2.8)."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        # per-row json.loads is unavoidable (pyarrow 16 has no JSON-path
        # kernel); one list comprehension over the column, no pandas
        # round-trip (COALESCE semantics: missing k -> 0)
        ks = pa.array(
            [int(json.loads(s).get("k", 0)) for s in batch["props"].to_pylist()],
            pa.int64(),
        )
        g = pa.TableGroupBy(
            pa.table({"event_type": batch["event_type"], "k": ks}), "event_type"
        ).aggregate([("k", "sum"), ("k", "max")])
        import pyarrow.compute as _pc

        return pa.table(
            {
                "event_type": g["event_type"],
                "sum_k": _pc.cast(g["k_sum"], pa.int64()),
                "max_k": _pc.cast(g["k_max"], pa.int64()),
            }
        )

    out = (
        _events(sf_dir, columns=["event_type", "props"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("sum_k", alias_name="sum_k"), Max("max_k", alias_name="max_k"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype({"sum_k": "int64", "max_k": "int64"})


# missing 'k' counts as 0 on BOTH sides (COALESCE mirrors the pipeline's
# .get("k", 0)) — without it, an event_type whose rows all lack 'k' would
# yield NULL max_k in SQL vs 0 in the pipeline
EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(SUM(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS BIGINT) AS sum_k,
       MAX(COALESCE(CAST(json_extract_string(props, '$.k') AS BIGINT), 0)) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_sliding(sf_dir: str, window_s: int = 7200, hop_s: int = 3600) -> pd.DataFrame:
    """Sliding (hopping) windows: window_s = 2*hop_s, so every event lands
    in exactly two windows. flat-map each event to its window starts inside
    the batch fn (pure array concat, no row loop), partial-agg locally,
    then a small global groupby over (window_start) partials."""
    assert window_s == 2 * hop_s, "oracle SQL assumes exactly 2 windows/event"
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        import pyarrow.compute as pc

        epoch_us = pc.cast(batch["ts"], pa.int64()).to_numpy()
        w0 = (epoch_us // (hop_s * 1_000_000)) * hop_s
        ws = np.concatenate([w0, w0 - hop_s])
        val = batch["value"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "window_start": pa.array(ws, pa.int64()),
                "n_events": pa.array(np.ones(len(ws), np.int64), pa.int64()),
                "sum_value": pa.array(np.concatenate([val, val]), pa.float64()),
            }
        )
        g = t.group_by("window_start").aggregate([("n_events", "sum"), ("sum_value", "sum")])
        return g.rename_columns([c.removesuffix("_sum") for c in g.column_names])

    out = (
        _events(sf_dir, columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("window_start")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    out["sum_value"] = out.sum_value.round(4)
    return out.astype({"window_start": "int64", "n_events": "int64"})


EVENTS_SLIDING_SQL_T = """
SELECT window_start, COUNT(*) AS n_events, ROUND(SUM(value), 4) AS sum_value
FROM (
  SELECT (epoch_us(ts) // (CAST({hop_s} AS BIGINT) * 1000000)) * {hop_s} AS window_start, value
  FROM events
  UNION ALL
  SELECT (epoch_us(ts) // (CAST({hop_s} AS BIGINT) * 1000000)) * {hop_s} - {hop_s}, value
  FROM events
)
GROUP BY window_start ORDER BY window_start
"""


def events_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Exact COUNT(DISTINCT user_id) per event_type: local distinct pairs
    per batch, global distinct via groupby on the pair, then a second
    distributed rollup to one row per event_type — the shuffle carries
    one row per distinct pair per block and the driver collect is
    #event_types rows, never raw events or the pair set."""
    from ray.data.aggregate import Count, Sum

    def local_distinct(batch: pa.Table) -> pa.Table:
        return batch.group_by(["event_type", "user_id"]).aggregate([])

    def count_pairs(batch: pa.Table) -> pa.Table:
        # rows are globally-distinct pairs here: a plain count per type
        g = batch.group_by("event_type").aggregate([("user_id", "count")])
        return pa.table({"event_type": g["event_type"], "n_users": g["user_id_count"]})

    out = (
        _events(sf_dir, columns=["event_type", "user_id"])
        .map_batches(local_distinct, batch_format="pyarrow", batch_size=None)
        .groupby(["event_type", "user_id"])
        .aggregate(Count(alias_name="_n"))
        # second distributed rollup: the driver sees one row per
        # event_type, never the user-cardinality pair set
        .map_batches(count_pairs, batch_format="pyarrow", batch_size=None)
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return out.astype({"n_users": "int64"})


EVENTS_DISTINCT_USERS_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_sessionize(sf_dir: str, gap_s: int = 1800) -> pd.DataFrame:
    """Session windows per user (gap-based). Coarse-hash-partitioned
    (pattern of joins.window_top3_orders, VERDICT r1): ONE vectorized
    map_groups call per hash partition instead of one Python call per user
    (per-group call overhead dominates at 10^8 users) — inside a partition
    the whole frame is sorted by (user, ts, event_id) once, session breaks
    come from a single shifted comparison, and the per-user rollup is a
    C-level pandas groupby. Returns per-user session count + longest
    session length (oracle via SQL window functions)."""
    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def sessions_part(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {"user_id": pd.Series([], dtype="int64"),
                 "n_sessions": pd.Series([], dtype="int64"),
                 "max_session_events": pd.Series([], dtype="int64")}
            )
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g.user_id.to_numpy()
        epoch = g.ts.to_numpy().astype("datetime64[us]").astype("int64") // 1_000_000
        import numpy as np

        user_change = np.empty(len(g), dtype=bool)
        user_change[0] = True
        user_change[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (epoch[1:] - epoch[:-1]) > gap_s
        new_sess = user_change | gap
        sess_id = np.cumsum(new_sess)
        f = pd.DataFrame({"user_id": uid, "sess_id": sess_id})
        per_sess = f.groupby(["user_id", "sess_id"], sort=False).size().rename("n")
        per_user = per_sess.groupby("user_id").agg(["size", "max"])
        return pd.DataFrame(
            {
                "user_id": per_user.index.to_numpy(),
                "n_sessions": per_user["size"].to_numpy(),
                "max_session_events": per_user["max"].to_numpy(),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "ts", "user_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sessions_part, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype({"user_id": "int64", "n_sessions": "int64", "max_session_events": "int64"})


EVENTS_SESSION_SQL_T = """
WITH ordered AS (
  SELECT user_id, event_id, epoch_us(ts) AS tsu,
         epoch_us(ts) // 1000000 AS es,
         LAG(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
  FROM events
),
marked AS (
  SELECT user_id, tsu, event_id,
         CASE WHEN prev_es IS NULL OR es - prev_es > {gap_s} THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sess AS (
  -- the running sum must replay the SAME total order the flags were
  -- computed in: full-microsecond ts (tsu), not the floored second —
  -- two same-user events sharing a floored second with event_id order
  -- opposite to microsecond order would otherwise swap at a session
  -- boundary and split sessions differently than the pipeline
  SELECT user_id,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
),
sizes AS (
  SELECT user_id, sess_id, COUNT(*) AS n FROM sess GROUP BY user_id, sess_id
)
SELECT user_id, COUNT(*) AS n_sessions, MAX(n) AS max_session_events
FROM sizes GROUP BY user_id ORDER BY user_id
"""


def events_interval_pairs(sf_dir: str, band_s: int = 900) -> pd.DataFrame:
    """Interval self-join: per user, count ordered event pairs (a before
    b) within `band_s` seconds — the time-band join shape (co-occurrence /
    burst detection). Same coarse-hash-partition pattern as sessionize:
    one vectorized call per partition; within it each user's sorted
    timestamp span is answered with ONE np.searchsorted per event, so the
    per-partition cost is O(n log n) — the pair count is never expanded.
    Oracled by EVENTS_INTERVAL_SQL_T (explicit join in DuckDB)."""
    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {"user_id": pd.Series([], dtype="int64"), "n_pairs": pd.Series([], dtype="int64")}
        )
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        uid = g.user_id.to_numpy()
        tus = g.ts.to_numpy().astype("datetime64[us]").astype("int64")
        band = np.int64(band_s) * 1_000_000
        # per event: how many LATER events of the same user fall within
        # the band — searchsorted against the user's own sorted span
        starts = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        ends = np.r_[starts[1:], len(uid)]
        out_u, out_n = [], []
        for s, e in zip(starts, ends):
            span = tus[s:e]
            # strictly-later BY TIMESTAMP within band: ts in (ts_i, ts_i + band].
            # The baseline is each event's count of ts <= its own (right
            # bisect of span against itself), NOT its position — a position
            # baseline (arange) would count equal-ts duplicates as "later",
            # diverging from the oracle's b.ts > a.ts (ADVICE r2).
            cnt = np.searchsorted(span, span + band, side="right") - np.searchsorted(
                span, span, side="right"
            )
            total = int(cnt.sum())
            if total > 0:
                out_u.append(int(uid[s]))
                out_n.append(total)
        if not out_u:
            return empty
        return pd.DataFrame({"user_id": out_u, "n_pairs": out_n})

    out = (
        _events(sf_dir, columns=["ts", "user_id"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype({"user_id": "int64", "n_pairs": "int64"})


EVENTS_INTERVAL_SQL_T = """
SELECT a.user_id, COUNT(*) AS n_pairs
FROM events a JOIN events b
  ON a.user_id = b.user_id AND b.ts > a.ts
 AND epoch_us(b.ts) - epoch_us(a.ts) <= CAST({band_s} AS BIGINT) * 1000000
GROUP BY a.user_id ORDER BY a.user_id
"""


def events_heavy_hitters(sf_dir: str, k: int = 10, capacity: int = 200) -> pd.DataFrame:
    """Approximate top-k users by EVENT COUNT via a mergeable Misra-Gries
    summary: each block contributes one <= `capacity`-item summary (the
    shuffle-free scale path — the collect is O(capacity x #blocks) rows
    no matter how many distinct users exist, where the exact counterpart
    shuffles one row per distinct user per block). Estimates undercount
    by at most N/(capacity+1); with capacity >> k the true top-k all
    survive.

    Rows-only driver check (the estimate is engine-defined); accuracy is
    locked by tests/test_sketch.py against exact counts."""
    from ..functions.sketch import mg_merge, mg_partial

    def partial(batch: pa.Table) -> pa.Table:
        s = mg_partial(batch["user_id"].to_pylist(), capacity)
        return pa.table(
            {
                "user_id": pa.array(list(s.keys()), pa.int64()),
                "cnt": pa.array(list(s.values()), pa.int64()),
            }
        )

    parts = (
        _events(sf_dir, columns=["user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    # k-way merge = sum all partial counts, one trim (valid mergeable-
    # summaries op; the intermediate frame is <= capacity x #blocks rows)
    summed = parts.groupby("user_id").cnt.sum()
    merged = mg_merge([dict(zip(summed.index, summed))], capacity)
    top = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pd.DataFrame(
        {
            "user_id": pd.Series([u for u, _ in top], dtype="int64"),
            "approx_count": pd.Series([c for _, c in top], dtype="int64"),
        }
    )


def events_running_value(sf_dir: str) -> pd.DataFrame:
    """GLOBAL running sum of `value` over event time — the distributed
    prefix-scan pattern (the shape a cumulative metric over an unbounded
    stream needs):

      pass 1: per-block partials of per-day totals -> one small groupby
              (bounded #days rows) -> driver computes day prefix OFFSETS;
      pass 2: groupby(day).map_groups — each day's rows sort locally by
              (ts, event_id), take a vectorized cumsum, and add the
              broadcast offset of everything before that day.

    No step materializes the stream: the cross-partition dependency is
    carried entirely by the bounded offset table. Values sum as exact
    integer cents via common.to_cents (float cumsum order-noise grows
    with prefix length — same hazard as orders_by_status at 10x scale —
    and the helper matches DuckDB's half-away-from-zero rounding).
    Oracled by EVENTS_RUNNING_SQL (window SUM OVER ORDER BY ts,
    event_id)."""
    from ray.data.aggregate import Sum

    from .common import to_cents

    def day_of(batch: pa.Table):
        """ONE owner of the day bucketing: pass 1's offset keys and pass
        2's group keys must never drift. Arrow-native: casting
        timestamp[us] to int64 yields epoch µs without a pandas
        round-trip per batch."""
        import pyarrow.compute as pc

        epoch_us = pc.cast(batch["ts"], pa.int64()).to_numpy()
        return epoch_us // (86400 * 1_000_000)

    def day_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "day": pa.array(day_of(batch), pa.int64()),
                "cents": pa.array(to_cents(batch["value"].to_numpy(zero_copy_only=False)), pa.int64()),
            }
        )
        g = t.group_by("day").aggregate([("cents", "sum")])
        return pa.table({"day": g["day"], "cents": g["cents_sum"]})

    day_totals = (
        _events(sf_dir, columns=["ts", "value"])
        .map_batches(day_partial, batch_format="pyarrow", batch_size=None)
        .groupby("day")
        .aggregate(Sum("cents", alias_name="cents"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    offsets = dict(
        zip(day_totals.day, day_totals.cents.cumsum().shift(1, fill_value=0))
    )
    import ray

    off_ref = ray.put(offsets)

    def add_day(batch: pa.Table) -> pa.Table:
        return batch.append_column("day", pa.array(day_of(batch), pa.int64()))

    def scan_day(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "running_value": pd.Series([], dtype="float64")}
            )
        off = ray.get(off_ref)
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        from .common import to_cents

        cents = pd.Series(to_cents(g.value.to_numpy()), index=g.index)
        run = cents.cumsum() + int(off[int(g.day.iloc[0])])
        return pd.DataFrame(
            {"event_id": g.event_id.to_numpy(), "running_value": (run / 100.0).round(4)}
        )

    out = (
        _events(sf_dir, columns=["event_id", "ts", "value"])
        .map_batches(add_day, batch_format="pyarrow")
        .groupby("day")
        .map_groups(scan_day, batch_format="pandas")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    return out.astype({"event_id": "int64"})


EVENTS_RUNNING_SQL = """
SELECT event_id,
       ROUND(SUM(CAST(ROUND(value * 100.0) AS BIGINT))
                 OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) / 100.0,
             4) AS running_value
FROM events ORDER BY event_id
"""


# --------------------------------------------------------------------------
# CDC compaction: latest row per key (upsert-merge / snapshot shape)
# --------------------------------------------------------------------------

def events_latest_per_user(sf_dir: str) -> pd.DataFrame:
    """Latest event per user — the change-data-capture compaction / upsert-
    merge shape (collapse an update stream to its current snapshot).
    Winner = max (ts, event_id) per user_id; event_id breaks same-µs ties
    deterministically. Two-level argmax: each block keeps ONE candidate
    row per user it sees (vectorized sort + drop_duplicates — the shuffle
    then moves at most one row per (user, block), never the stream), and
    the merge runs over COARSE hash partitions (user_id % 64, the
    events_sessionize pattern — one vectorized pandas pass per
    partition, not one Python call per user; at 10^8 users a per-user
    map_groups is pure scheduling overhead). Shuffle volume stays
    snapshot-sized. Oracled by EVENTS_LATEST_SQL (row_number() OVER ...
    DESC = 1)."""
    n_parts = 64

    def block_best(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        df = df.drop_duplicates("user_id", keep="last")
        df["part"] = (df.user_id % n_parts).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return df.drop_duplicates("user_id", keep="last").drop(columns=["part"])

    out = (
        _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type", "value"])
        .map_batches(block_best, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(pick, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    out = out.rename(
        columns={"ts": "last_ts", "event_id": "last_event_id", "event_type": "last_event_type", "value": "last_value"}
    )
    return out[["user_id", "last_ts", "last_event_id", "last_event_type", "last_value"]].astype(
        {"user_id": "int64", "last_event_id": "int64"}
    )


EVENTS_LATEST_SQL = """
SELECT user_id, ts AS last_ts, event_id AS last_event_id,
       event_type AS last_event_type, value AS last_value
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
ORDER BY user_id
"""


# --------------------------------------------------------------------------
# event-time watermark: late-data accounting for windowed aggregation
# --------------------------------------------------------------------------

WM_WINDOW_S = 3600
WM_LATENESS_S = 1800  # allowed lateness past window close
WM_DELAY_STEP_S = 600  # derived arrival delay: (event_id % 5) * step


def events_watermark(
    sf_dir: str, window_s: int = WM_WINDOW_S, lateness_s: int = WM_LATENESS_S
) -> pd.DataFrame:
    """Tumbling EVENT-TIME windows under a watermark policy: an event is
    accepted iff it ARRIVES no later than `lateness_s` after its window
    closes; later arrivals are counted as dropped-late (the Beam/Flink
    allowed-lateness semantic — the piece a batch tumbling window
    doesn't model). The events table has no arrival column, so arrival
    delay is DERIVED deterministically (module pattern:
    delay = (event_id % 5) * {WM_DELAY_STEP_S} s, up to 2400 s — enough
    to push ~3% of rows past the watermark at the default settings,
    non-vacuous at every sf) and the SQL oracle reproduces the same
    derivation.

    Output per window: accepted count, late-dropped count, accepted
    value sum. Scale contract: stateless per-batch integer-us kernels +
    per-(window, block) partials -> #windows-sized groupby; nothing
    row-sized crosses the shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        epoch_us = pc.cast(batch["ts"], pa.int64())
        w_us = pa.scalar(window_s * 1_000_000, pa.int64())
        ws = pc.multiply(pc.divide(epoch_us, w_us), pa.scalar(window_s, pa.int64()))
        # pyarrow.compute has no modulo kernel — derive the delay in numpy
        ids = batch["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        delay_us = pa.array((ids % 5) * WM_DELAY_STEP_S * 1_000_000, pa.int64())
        arrival_us = pc.add(epoch_us, delay_us)
        deadline_us = pc.multiply(
            pc.add(ws, pa.scalar(window_s + lateness_s, pa.int64())),
            pa.scalar(1_000_000, pa.int64()),
        )
        ok = pc.less_equal(arrival_us, deadline_us)
        ok_i = pc.cast(ok, pa.int64())
        t = pa.table(
            {
                "window_start": ws,
                "n_accepted": ok_i,
                "n_late": pc.subtract(pa.scalar(1, pa.int64()), ok_i),
                "sum_value": pc.if_else(ok, batch["value"], pa.scalar(0.0, pa.float64())),
            }
        )
        g = t.group_by("window_start").aggregate(
            [("n_accepted", "sum"), ("n_late", "sum"), ("sum_value", "sum")]
        )
        return g.rename_columns(["window_start", "n_accepted", "n_late", "sum_value"])

    out = (
        _events(sf_dir, columns=["event_id", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("window_start")
        .aggregate(
            Sum("n_accepted", alias_name="n_accepted"),
            Sum("n_late", alias_name="n_late"),
            Sum("sum_value", alias_name="sum_value"),
        )
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    out["sum_value"] = out.sum_value.round(4)
    return out.astype({"window_start": "int64", "n_accepted": "int64", "n_late": "int64"})


EVENTS_WATERMARK_SQL_T = """
WITH e AS (
  SELECT epoch_us(ts) AS us,
         (event_id % 5) * CAST({delay_step} AS BIGINT) * 1000000 AS delay_us,
         value,
         (epoch_us(ts) // (CAST({window_s} AS BIGINT) * 1000000)) * {window_s} AS ws
  FROM events
)
SELECT ws AS window_start,
       CAST(SUM(CASE WHEN us + delay_us <= (ws + {window_s} + {lateness_s}) * 1000000
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
       CAST(SUM(CASE WHEN us + delay_us <= (ws + {window_s} + {lateness_s}) * 1000000
                     THEN 0 ELSE 1 END) AS BIGINT) AS n_late,
       ROUND(SUM(CASE WHEN us + delay_us <= (ws + {window_s} + {lateness_s}) * 1000000
                      THEN value ELSE 0 END), 4) AS sum_value
FROM e GROUP BY ws ORDER BY window_start
"""

EVENTS_WATERMARK_SQL = EVENTS_WATERMARK_SQL_T.format(
    window_s=WM_WINDOW_S, lateness_s=WM_LATENESS_S, delay_step=WM_DELAY_STEP_S
)


# --------------------------------------------------------------------------
# exact distributed quantiles via iterative histogram refinement
# --------------------------------------------------------------------------

EQ_QUANTILES = (0.5, 0.9, 0.99)
EQ_BUCKETS = 1024


def exact_ts_quantiles(sf_dir: str, quantiles: tuple[float, ...] = EQ_QUANTILES) -> pd.DataFrame:
    """EXACT order statistics of the event-timestamp column (epoch us)
    without ever sorting or collecting the column: iterative histogram
    refinement, the classic distributed exact-quantile algorithm (and
    the scale companion to lang_quantile_chars' per-group map_groups and
    approx_quantile_chars' mergeable sketch — this one is exact AND
    never moves more than #buckets x #blocks int64 partials per pass).

    Per pass, every pending quantile's candidate range [lo, hi] is
    histogrammed into {EQ_BUCKETS} equal integer steps in ONE shared
    map_batches sweep; the driver walks each histogram to the bucket
    containing the target rank and narrows the range by ~1024x. A range
    of W resolves in ceil(log_1024 W) passes (epoch-us spans ~2^45 =>
    4-5 passes). Rank contract: quantile q = the ceil(q*n)-th smallest
    value (1-based) == DuckDB quantile_disc. The single-int64 column is
    materialized once and re-swept per pass; at extreme scale re-read
    the pruned parquet column per pass instead (noted, not needed here).
    Output value is reported relative to the column MIN (value_us - min)
    so the gate's float canonicalization keeps full integer precision."""
    from ray.data.aggregate import Count, Max, Min

    def to_us(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"us": pc.cast(batch["ts"], pa.int64())})

    col = (
        _events(sf_dir, columns=["ts"])
        .map_batches(to_us, batch_format="pyarrow")
        .materialize()
    )
    stats = col.aggregate(Count(), Min("us"), Max("us"))
    n, gmin, gmax = int(stats["count()"]), int(stats["min(us)"]), int(stats["max(us)"])
    # state per quantile: [rank(1-based), lo, hi, n_below_lo]; resolved -> value
    state = {q: [math.ceil(q * n), gmin, gmax, 0] for q in quantiles}
    resolved: dict[float, int] = {}

    while len(resolved) < len(state):
        pend = {q: s for q, s in state.items() if q not in resolved}
        plan = {  # (lo, hi, ceil(width / EQ_BUCKETS))
            q: (s[1], s[2], max(1, (s[2] - s[1] + EQ_BUCKETS) // EQ_BUCKETS))
            for q, s in pend.items()
        }
        pref = ray.put(plan)
        qkeys = sorted(pend)

        def hist_partial(batch: pa.Table) -> pa.Table:
            pl = ray.get(pref)
            x = batch["us"].to_numpy(zero_copy_only=False)
            qi_o, b_o, c_o = [], [], []
            for qi, q in enumerate(sorted(pl)):
                lo, hi, step = pl[q]
                m = (x >= lo) & (x <= hi)
                b = (x[m] - lo) // step
                cnt = np.bincount(b, minlength=EQ_BUCKETS)
                nz = np.nonzero(cnt)[0]
                qi_o.extend([qi] * len(nz))
                b_o.extend(nz.tolist())
                c_o.extend(cnt[nz].tolist())
            return pa.table(
                {
                    "qi": pa.array(qi_o, pa.int64()),
                    "bucket": pa.array(b_o, pa.int64()),
                    "cnt": pa.array(c_o, pa.int64()),
                }
            )

        from ray.data.aggregate import Sum

        hist = (
            col.map_batches(hist_partial, batch_format="pyarrow", batch_size=None)
            .groupby(["qi", "bucket"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        for qi, q in enumerate(qkeys):
            rank, lo, hi, below = state[q]
            step = plan[q][2]
            g = hist[hist.qi == qi].sort_values("bucket")
            cum = below
            for _, row in g.iterrows():
                if cum + row.cnt >= rank:
                    b = int(row.bucket)
                    if step == 1:
                        resolved[q] = lo + b
                    else:
                        state[q] = [rank, lo + b * step, min(hi, lo + (b + 1) * step - 1), cum]
                    break
                cum += int(row.cnt)

    return pd.DataFrame(
        {
            "q": list(quantiles),
            "rank": [state[q][0] for q in quantiles],
            "value_rel_us": [resolved[q] - gmin for q in quantiles],
        }
    ).astype({"rank": "int64", "value_rel_us": "int64"})


EXACT_TS_QUANTILES_SQL = f"""
WITH v AS (SELECT epoch_us(ts) AS us FROM events),
agg AS (SELECT COUNT(*) AS n, MIN(us) AS mn FROM v),
r AS (
  SELECT q, CAST(CEIL(q * agg.n) AS BIGINT) AS rank
  FROM (SELECT unnest([{', '.join(str(q) for q in EQ_QUANTILES)}]) AS q) qs
  CROSS JOIN agg
),
s AS (SELECT us, row_number() OVER (ORDER BY us) AS rn FROM v)
SELECT r.q, r.rank, CAST(s.us - (SELECT mn FROM agg) AS BIGINT) AS value_rel_us
FROM r JOIN s ON s.rn = r.rank ORDER BY r.q
"""


# --------------------------------------------------------------------------
# funnel conversion (ordered step chain) + retention cohorts
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_S = 86_400  # each step must follow the previous within 1 day


def funnel_conversion(
    sf_dir: str,
    steps: tuple[str, ...] = FUNNEL_STEPS,
    window_s: int = FUNNEL_WINDOW_S,
) -> pd.DataFrame:
    """Ordered-funnel conversion counts with an inter-step window (the
    product-analytics staple): a user completes step k when an event of
    type steps[k] occurs STRICTLY after their step k-1 completion time
    and within window_s seconds of it, greedily earliest-first
    (t1 = min ts of step 1; t_k = min ts of step k with
    t_{k-1} < ts <= t_{k-1} + window_s — the greedy chain is the
    well-defined semantic one SQL chain reproduces exactly; Amplitude-
    style any-anchor funnels differ and are out of scope). Output: one
    row per step with the number of users who reached it —
    monotonically non-increasing by construction.

    Scale contract: the read prunes to (user_id, event_type, ts) and
    filters to the funnel's types BEFORE the one shuffle (user_id % 64
    coarse hash partitions — the events_sessionize pattern); each
    partition computes the whole chain with vectorized pandas groupby
    min/merge passes, one per step, never a per-user Python loop. The
    shuffle moves only funnel-typed 20-byte rows. Counts are exact
    integers; strict ts ordering is mirrored by the oracle's e.ts > t."""
    if len(steps) < 2:
        raise ValueError("a funnel needs >= 2 steps")
    if window_s < 1:
        raise ValueError("window_s must be >= 1")
    n_parts = 64
    steps_l = list(steps)
    win = pd.Timedelta(seconds=window_s)

    def tag(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = df[df.event_type.isin(steps_l)]
        df["part"] = (df.user_id % n_parts).astype("int64")
        return pa.Table.from_pandas(df, preserve_index=False)

    def chain(df: pd.DataFrame) -> pd.DataFrame:
        t = df[df.event_type == steps_l[0]].groupby("user_id").ts.min()
        counts = [len(t)]
        for s in steps_l[1:]:
            nxt = df[df.event_type == s].merge(
                t.rename("t_prev"), left_on="user_id", right_index=True
            )
            nxt = nxt[(nxt.ts > nxt.t_prev) & (nxt.ts <= nxt.t_prev + win)]
            t = nxt.groupby("user_id").ts.min()
            counts.append(len(t))
        return pd.DataFrame(
            {
                "step": pd.Series(range(1, len(steps_l) + 1), dtype="int64"),
                "event_type": steps_l,
                "n_users": pd.Series(counts, dtype="int64"),
            }
        )

    parts = (
        _events(sf_dir, columns=["user_id", "event_type", "ts"])
        .map_batches(tag, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(chain, batch_format="pandas")
        .to_pandas()
    )
    out = (
        parts.groupby(["step", "event_type"], as_index=False)
        .n_users.sum()
        .sort_values("step")
        .reset_index(drop=True)
    )
    return out.astype({"step": "int64", "n_users": "int64"})


def _funnel_sql(
    steps: tuple[str, ...] = FUNNEL_STEPS, window_s: int = FUNNEL_WINDOW_S
) -> str:
    ctes = [
        f"s1 AS (SELECT user_id, MIN(ts) AS t FROM events "
        f"WHERE event_type = '{steps[0]}' GROUP BY user_id)"
    ]
    for k in range(2, len(steps) + 1):
        ctes.append(
            f"s{k} AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e "
            f"JOIN s{k - 1} p USING (user_id) "
            f"WHERE e.event_type = '{steps[k - 1]}' AND e.ts > p.t "
            f"AND e.ts <= p.t + INTERVAL {window_s} SECOND "
            f"GROUP BY e.user_id)"
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, '{steps[k - 1]}' AS event_type, "
        f"CAST(COUNT(*) AS BIGINT) AS n_users FROM s{k}"
        for k in range(1, len(steps) + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT CAST(step AS BIGINT) AS step, event_type, n_users FROM (\n{unions}\n) ORDER BY step"
    )


FUNNEL_SQL = _funnel_sql()


def retention_cohorts(sf_dir: str) -> pd.DataFrame:
    """Cohort retention matrix: cohort_day = each user's first active
    day (UTC day index = epoch_us // 86_400_000_000), and for every
    (cohort_day, day_offset) cell the number of that cohort's users
    active day_offset days later — the activation/retention table every
    product-analytics stack materializes.

    Scale contract: the stream collapses FIRST to distinct (user, day)
    rows (per-block drop_duplicates, then one groupby — activity-sized,
    never event-sized); cohorts come from a user-sized groupby Min over
    that table; the cohort map joins back by a native hash join (never
    a driver broadcast — the user table is the BIG side at web scale);
    the final cell rollup is bounded by #days². All-integer day
    arithmetic, exact at any scale."""
    from ray.data.aggregate import Count, Min

    us_per_day = 86_400_000_000

    def to_day(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        day = (df.ts.astype("int64") // us_per_day).astype("int64")
        out = pd.DataFrame({"user_id": df.user_id.astype("int64"), "day": day})
        return pa.Table.from_pandas(
            out.drop_duplicates(), preserve_index=False
        )

    activity = (
        _events(sf_dir, columns=["user_id", "ts"])
        .map_batches(to_day, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "day"])
        .aggregate(Count())
        .drop_columns(["count()"])
    )
    cohort = activity.groupby("user_id").aggregate(Min("day", alias_name="cohort_day"))
    joined = activity.join(cohort, join_type="inner", num_partitions=16, on=("user_id",))

    def cell(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["day_offset"] = (df.day - df.cohort_day).astype("int64")
        g = df.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n_users"}), preserve_index=False
        )

    from ray.data.aggregate import Sum

    out = (
        joined.map_batches(cell, batch_format="pyarrow", batch_size=None)
        .groupby(["cohort_day", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
        .to_pandas()
        .sort_values(["cohort_day", "day_offset"])
        .reset_index(drop=True)
    )
    return out.astype({"cohort_day": "int64", "day_offset": "int64", "n_users": "int64"})


RETENTION_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
c AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
SELECT CAST(c.cohort_day AS BIGINT) AS cohort_day,
       CAST(d.day - c.cohort_day AS BIGINT) AS day_offset,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM d JOIN c USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# user journey paths: top session-opening event-type sequences
# --------------------------------------------------------------------------

JOURNEY_PREFIX_LEN = 3
JOURNEY_TOPK = 10


def user_journey_paths(
    sf_dir: str,
    gap_s: int = 1800,
    prefix_len: int = JOURNEY_PREFIX_LEN,
    topk: int = JOURNEY_TOPK,
) -> pd.DataFrame:
    """Top session-opening journeys: sessionize the event stream
    (events_sessionize's gap rule, byte-identical session boundaries),
    take each session's first `prefix_len` event types in (ts, event_id)
    order, join them as 'a>b>c', and rank paths corpus-wide by
    frequency — the path-analysis staple behind every onboarding-funnel
    dashboard.

    Scale contract: the sessionize coarse-hash-partition pattern (one
    vectorized pass per user_id-hash partition — session boundaries
    never cross partitions because users don't); each partition emits
    (path, n) partials BOUNDED by #event_types^prefix_len, so the final
    groupby and driver top-k are path-space-sized, never stream-sized.
    Counts are exact integers; ranking ties break by path asc."""
    if prefix_len < 1 or topk < 1:
        raise ValueError("prefix_len and topk must be >= 1")
    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def paths_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"path": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g.user_id.to_numpy()
        epoch = g.ts.to_numpy().astype("datetime64[us]").astype("int64") // 1_000_000
        user_change = np.empty(len(g), dtype=bool)
        user_change[0] = True
        user_change[1:] = uid[1:] != uid[:-1]
        gap = np.empty(len(g), dtype=bool)
        gap[0] = True
        gap[1:] = (epoch[1:] - epoch[:-1]) > gap_s
        new_sess = user_change | gap
        sess_id = np.cumsum(new_sess)
        f = pd.DataFrame({"sess_id": sess_id, "et": g.event_type.to_numpy()})
        f["rn"] = f.groupby("sess_id", sort=False).cumcount()
        head = f[f.rn < prefix_len]
        paths = head.groupby("sess_id", sort=False).et.agg(">".join)
        out = paths.value_counts().rename_axis("path").reset_index(name="n")
        return out.astype({"n": "int64"})

    from ray.data.aggregate import Sum

    counts = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(paths_part, batch_format="pandas")
        .groupby("path")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    counts = counts.sort_values(["n", "path"], ascending=[False, True]).head(topk)
    counts = counts.reset_index(drop=True)
    counts.insert(0, "rank", np.arange(1, len(counts) + 1, dtype=np.int64))
    return counts.astype({"rank": "int64", "n": "int64"})


USER_JOURNEY_SQL_T = """
WITH ordered AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS tsu,
         epoch_us(ts) // 1000000 AS es,
         LAG(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_es
  FROM events
),
marked AS (
  SELECT user_id, tsu, event_id, event_type,
         CASE WHEN prev_es IS NULL OR es - prev_es > {gap_s} THEN 1 ELSE 0 END AS new_sess
  FROM ordered
),
sess AS (
  SELECT user_id, tsu, event_id, event_type,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY tsu, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM marked
),
ranked AS (
  SELECT user_id, sess_id, event_type,
         row_number() OVER (PARTITION BY user_id, sess_id
                            ORDER BY tsu, event_id) AS rn,
         tsu, event_id
  FROM sess
),
paths AS (
  SELECT user_id, sess_id,
         string_agg(event_type, '>' ORDER BY tsu, event_id) AS path
  FROM ranked WHERE rn <= {prefix_len}
  GROUP BY user_id, sess_id
),
cnt AS (SELECT path, COUNT(*) AS n FROM paths GROUP BY path)
SELECT CAST(row_number() OVER (ORDER BY n DESC, path) AS BIGINT) AS rank,
       path, CAST(n AS BIGINT) AS n
FROM cnt ORDER BY n DESC, path LIMIT {topk}
"""


# --------------------------------------------------------------------------
# rate-spike anomaly windows (ops alerting over tumbling counts)
# --------------------------------------------------------------------------

ANOM_WINDOW_S = 3600
ANOM_TRAIL = 24  # trailing windows in the baseline
ANOM_MIN_HIST = 12  # need half the trail before judging
ANOM_NUM, ANOM_DEN = 5, 4  # spike iff n > (5/4) * trailing mean, exactly


def events_anomaly_windows(sf_dir: str) -> pd.DataFrame:
    """Rate-spike detection over tumbling windows (the ops-alerting
    staple): a window is anomalous when its event count exceeds 5/4 of
    the trailing-24-window mean, judged only after >= 12 windows of
    history. The compare is EXACT integer cross-multiplication
    (n * prev_n * 4 > 5 * prev_sum) — no float mean, no drift; gaps in
    the window sequence follow the SQL ROWS-frame semantic (the
    baseline is the previous EXISTING windows, not calendar hours —
    both sides state the same rule).

    Scale contract: the distributed part is the tumbling count
    (per-block (wid, n) integer partials -> window-sized groupby, the
    events_tumbling machinery); the trailing scan then runs on the
    TIME-BOUNDED windows table (720 rows per month of data at 1 h —
    driver-sized at any corpus size, because windows grow with time,
    not volume)."""
    from ray.data.aggregate import Sum

    w_us = ANOM_WINDOW_S * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        wid = pc.divide(pc.cast(batch["ts"], pa.int64()), pa.scalar(w_us, pa.int64()))
        t = pa.table({"wid": wid, "n": pa.array(np.ones(len(batch), np.int64))})
        g = t.group_by("wid").aggregate([("n", "sum")])
        return g.rename_columns(["wid", "n"])

    w = (
        _events(sf_dir, columns=["ts"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("wid")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("wid")
        .reset_index(drop=True)
    )
    n = w.n.to_numpy().astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(n)])
    idx = np.arange(len(n))
    lo = np.maximum(idx - ANOM_TRAIL, 0)
    prev_sum = cs[idx] - cs[lo]
    prev_n = idx - lo
    flag = (prev_n >= ANOM_MIN_HIST) & (n * prev_n * ANOM_DEN > ANOM_NUM * prev_sum)
    out = pd.DataFrame(
        {
            "window_start": (w.wid.to_numpy() * ANOM_WINDOW_S).astype("int64"),
            "n_events": n,
            "prev_n": prev_n.astype("int64"),
            "prev_sum": prev_sum.astype("int64"),
        }
    )[flag]
    return out.sort_values("window_start").reset_index(drop=True)


EVENTS_ANOMALY_SQL = f"""
WITH w AS (
  SELECT epoch_us(ts) // {ANOM_WINDOW_S * 1_000_000} AS wid, COUNT(*) AS n
  FROM events GROUP BY 1),
t AS (
  SELECT wid, n,
         COALESCE(SUM(n) OVER (ORDER BY wid
             ROWS BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING), 0) AS prev_sum,
         COUNT(*) OVER (ORDER BY wid
             ROWS BETWEEN {ANOM_TRAIL} PRECEDING AND 1 PRECEDING) AS prev_n
  FROM w)
SELECT CAST(wid * {ANOM_WINDOW_S} AS BIGINT) AS window_start,
       CAST(n AS BIGINT) AS n_events,
       CAST(prev_n AS BIGINT) AS prev_n,
       CAST(prev_sum AS BIGINT) AS prev_sum
FROM t
WHERE prev_n >= {ANOM_MIN_HIST} AND n * prev_n * {ANOM_DEN} > {ANOM_NUM} * prev_sum
ORDER BY window_start
"""


# --------------------------------------------------------------------------
# per-user event-type Markov transition matrix
# --------------------------------------------------------------------------

def markov_transitions(sf_dir: str) -> pd.DataFrame:
    """First-order Markov transition matrix over per-user event-type
    sequences (the behavioral-model fit behind next-event prediction
    and journey simulation): count consecutive (from, to) event-type
    pairs within each user's (ts, event_id)-ordered stream, and report
    row-normalized transition probabilities.

    Scale contract: the one shuffle is the sessionize user-hash coarse
    partition; inside a partition the pair extraction is one shifted
    vectorized compare (no per-user loop); partials are bounded by
    #event_types², so the final groupby and the normalization both run
    on a types²-sized table. Counts exact int64; each probability is
    ONE correctly-rounded division of exact ints, mirrored by the
    oracle."""
    from ray.data.aggregate import Sum

    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "from_type": pd.Series([], dtype=object),
                "to_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
            }
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g.user_id.to_numpy()
        et = g.event_type.to_numpy()
        same = uid[1:] == uid[:-1]
        f = pd.DataFrame({"from_type": et[:-1][same], "to_type": et[1:][same]})
        if f.empty:
            return empty
        out = f.groupby(["from_type", "to_type"], as_index=False).size()
        return out.rename(columns={"size": "n"}).astype({"n": "int64"})

    counts = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .groupby(["from_type", "to_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    tot = counts.groupby("from_type").n.transform("sum")
    counts["p"] = [round(int(a) / int(b), 6) for a, b in zip(counts.n, tot)]
    return (
        counts.sort_values(["from_type", "to_type"])
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )


MARKOV_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
c AS (SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
      FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2),
t AS (SELECT from_type, SUM(n) AS tot FROM c GROUP BY from_type)
SELECT c.from_type, c.to_type, CAST(c.n AS BIGINT) AS n,
       ROUND(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS p
FROM c JOIN t USING (from_type)
ORDER BY from_type, to_type
"""


# --------------------------------------------------------------------------
# SCD2 validity intervals: dimension history from a change stream
# --------------------------------------------------------------------------

def scd2_intervals(sf_dir: str) -> pd.DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse each
    user's event stream into validity intervals — one row per maximal
    run of consecutive equal event_type, with [valid_from_us,
    valid_to_us) half-open in epoch-µs and valid_to_us = -1 for the
    open (current) interval. This is the dimension-history table a
    warehouse derives from a change stream (events_latest_per_user
    keeps only the final state; this keeps the full timeline).

    Scale contract: slim (user_id, tus, event_id, event_type) rows
    cross exactly ONE coarse user-hash exchange (the sessionize
    pattern); the per-partition pass is fully vectorized — shifted
    compares mark run boundaries, cumsum labels islands, one groupby
    aggregates each island, a per-user shift(-1) attaches the successor
    boundary. Output is run-length-bounded (<= one row per event).
    Oracled by SCD2_SQL (LAG change flags -> windowed SUM islands ->
    LEAD validity chaining)."""
    import pyarrow.compute as pc

    n_parts = 64

    def slim(batch: pa.Table) -> pa.Table:
        uid = batch["user_id"]
        return pa.table(
            {
                "user_id": uid,
                "tus": pc.cast(batch["ts"], pa.int64()),
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "part": pc.cast(pc.bit_wise_and(uid, pa.scalar(n_parts - 1)), pa.int32()),
            }
        )

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "tus", "event_id"], kind="mergesort")
        chg = (g.user_id != g.user_id.shift()) | (g.event_type != g.event_type.shift())
        g = g.assign(island=chg.cumsum())
        runs = (
            g.groupby("island", sort=True)
            .agg(
                user_id=("user_id", "first"),
                event_type=("event_type", "first"),
                valid_from_us=("tus", "first"),
                n_events=("tus", "size"),
            )
            .reset_index(drop=True)
            .sort_values(["user_id", "valid_from_us"], kind="mergesort")
        )
        nxt = runs.groupby("user_id")["valid_from_us"].shift(-1)
        runs["valid_to_us"] = nxt.fillna(-1).astype("int64")
        return runs[["user_id", "event_type", "valid_from_us", "valid_to_us", "n_events"]]

    out = (
        _events(sf_dir, columns=["user_id", "ts", "event_id", "event_type"])
        .map_batches(slim, batch_format="pyarrow")
        .groupby("part")
        .map_groups(build, batch_format="pandas")
        .to_pandas()
        .sort_values(["user_id", "valid_from_us"], kind="mergesort")
        .reset_index(drop=True)
    )
    return out.astype(
        {
            "user_id": "int64",
            "event_type": "str",
            "valid_from_us": "int64",
            "valid_to_us": "int64",
            "n_events": "int64",
        }
    )


SCD2_SQL = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, event_type FROM events),
o AS (
  SELECT *, CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id)
                      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM e),
i AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY tus, event_id
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM o),
g AS (
  SELECT user_id, island, ANY_VALUE(event_type) AS event_type,
         MIN(tus) AS valid_from_us, CAST(COUNT(*) AS BIGINT) AS n_events
  FROM i GROUP BY user_id, island)
SELECT user_id, event_type, CAST(valid_from_us AS BIGINT) AS valid_from_us,
       CAST(COALESCE(LEAD(valid_from_us) OVER (PARTITION BY user_id ORDER BY valid_from_us),
                     -1) AS BIGINT) AS valid_to_us,
       n_events
FROM g ORDER BY user_id, valid_from_us
"""


# --------------------------------------------------------------------------
# backlog curve: concurrent open orders per day (interval stabbing sweep)
# --------------------------------------------------------------------------

def orders_backlog_curve(sf_dir: str) -> pd.DataFrame:
    """How many orders are OPEN on each day — the interval-stabbing
    sweep (fulfilment backlog / concurrent-sessions / resource-overlap
    shape): each order contributes +1 at its open day and -1 at its
    close day, and the backlog is the running sum of the day deltas.
    Close day is DERIVED deterministically (open + o_orderkey % 30 + 1
    days) since orders carry no close column; the oracle restates the
    derivation. The sweep never materializes intervals x days: the
    distributed part is per-block (day, delta) integer partials into a
    day-bounded groupby, and the running sum scans the TIME-bounded day
    table on the driver (the events_anomaly_windows argument — days
    grow with time, not data volume).

    Output per delta-day: the net delta and the backlog AFTER applying
    it. Exact integers; the final backlog is 0 (every order closes)."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000

    def deltas(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        od = (pc.cast(batch["o_orderdate"], pa.int64()).to_numpy() // DAY_US).astype(np.int64)
        k = batch["o_orderkey"].to_numpy().astype(np.int64)
        close = od + (k % 30) + 1
        df = pd.DataFrame(
            {
                "day": np.concatenate([od, close]),
                "delta": np.concatenate(
                    [np.ones(len(od), np.int64), -np.ones(len(od), np.int64)]
                ),
            }
        )
        g = df.groupby("day", as_index=False).delta.sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    from .common import sized_read_parquet

    out = (
        sized_read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
        .map_batches(deltas, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("delta", alias_name="delta"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    out["backlog"] = out.delta.cumsum()
    return out.astype({"day": "int64", "delta": "int64", "backlog": "int64"})


BACKLOG_SQL = """
WITH o AS (
  SELECT epoch_us(o_orderdate) // 86400000000 AS od, o_orderkey % 30 + 1 AS dur
  FROM orders),
d AS (
  SELECT od AS day, 1 AS dl FROM o
  UNION ALL
  SELECT od + dur, -1 FROM o),
g AS (SELECT day, SUM(dl) AS delta FROM d GROUP BY day)
SELECT day, CAST(delta AS BIGINT) AS delta,
       CAST(SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS backlog
FROM g ORDER BY day
"""


# --------------------------------------------------------------------------
# activity-skew report: exact Gini over per-user event counts
# --------------------------------------------------------------------------

def user_activity_gini(sf_dir: str) -> pd.DataFrame:
    """EXACT Gini coefficient of per-user event counts — the skew
    diagnostic that tells a partitioning plan whether user-keyed work is
    power-law (salt/split hot keys) or flat (plain hash is fine).
    Computed with zero floats from the COUNT-OF-COUNTS histogram: users
    collapse to (events_per_user, n_users) rows — bounded by the max
    per-user activity, not the user count — and with the histogram
    sorted ascending, a tie-block of f users at value v whose
    predecessors number c contributes v * f * (2c + f + 1) / 2 to the
    rank-weighted sum S1 (consecutive-integer ranks summed in closed
    form), giving G = (2*S1 - (n+1)*T) / (n*T) reported as exact
    fixed-point gini_ppm = (2*S1 - (n+1)*T) * 1e6 // (n*T) via
    arbitrary-precision driver ints (HUGEINT in the oracle).

    Scale contract: per-block (user, n) partials -> user-sized groupby
    -> per-block count-of-counts partials -> activity-bounded groupby;
    the closed-form scan runs on the tiny histogram. Output: one row
    (n_users, total_events, max_per_user, gini_ppm)."""
    from ray.data.aggregate import Sum

    def per_user_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("user_id").aggregate([("event_id", "count")])
        return t.rename_columns(["user_id", "n"])

    per_user = (
        _events(sf_dir, columns=["user_id", "event_id"])
        .map_batches(per_user_partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Sum("n", alias_name="n"))
    )

    def coc_partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by("n").aggregate([("user_id", "count")])
        return t.rename_columns(["n", "f"])

    hist = (
        per_user.map_batches(coc_partial, batch_format="pyarrow")
        .groupby("n")
        .aggregate(Sum("f", alias_name="f"))
        .to_pandas()
        .sort_values("n")
        .reset_index(drop=True)
    )
    n_users = int(hist.f.sum())
    total = int((hist.n * hist.f).sum())
    s1, c = 0, 0
    for v, f in zip(hist.n.astype(int), hist.f.astype(int)):
        s1 += v * f * (2 * c + f + 1) // 2  # f*(2c+f+1) is always even
        c += f
    gini_ppm = (2 * s1 - (n_users + 1) * total) * 1_000_000 // (n_users * total)
    return pd.DataFrame(
        {
            "n_users": pd.Series([n_users], dtype="int64"),
            "total_events": pd.Series([total], dtype="int64"),
            "max_per_user": pd.Series([int(hist.n.max())], dtype="int64"),
            "gini_ppm": pd.Series([gini_ppm], dtype="int64"),
        }
    )


GINI_SQL = """
WITH pu AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
h AS (SELECT n, CAST(COUNT(*) AS HUGEINT) AS f FROM pu GROUP BY n),
w AS (SELECT n, f,
             COALESCE(SUM(f) OVER (ORDER BY n ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS c
      FROM h),
s AS (SELECT SUM(CAST(n AS HUGEINT) * f * (2 * c + f + 1) // 2) AS s1,
             SUM(f) AS nu, SUM(CAST(n AS HUGEINT) * f) AS t,
             MAX(n) AS mx
      FROM w)
SELECT CAST(nu AS BIGINT) AS n_users, CAST(t AS BIGINT) AS total_events,
       CAST(mx AS BIGINT) AS max_per_user,
       CAST((2 * s1 - (nu + 1) * t) * 1000000 // (nu * t) AS BIGINT) AS gini_ppm
FROM s
"""


# --------------------------------------------------------------------------
# keyless interval overlap join via grid-cell bucketing (broadcast side)
# --------------------------------------------------------------------------

IOJ_SLOTS = 8          # maintenance windows per day
IOJ_STEP_S = 10_800    # one window every 3 h
IOJ_LEN_S = 5_400      # 90 min long -> every window SPANS two 1 h cells
IOJ_CELL_S = 3_600     # grid cell width (the bucketing key)


def interval_overlap_join(sf_dir: str) -> pd.DataFrame:
    """Keyless interval overlap join — the join shape Ray Data has no
    native operator for (range_join_price_bands covers scalar-in-range,
    events_interval_pairs the user-keyed band self-join; here NEITHER
    side shares an equi key): per-(user, day) activity spans
    [min ts, max ts] ⋈ a derived calendar of 90-minute maintenance
    windows every 3 h, overlap iff a.s < w.end AND w.start <= a.e.
    Returns per window-of-day slot the exact overlapping-span count —
    the "how many user sessions would each maintenance slot disturb"
    capacity-planning rollup.

    The custom-operator recipe, documented partitioning assumption and
    all: (1) EQUI-IZE by time-grid cells — each span fans out to its
    <= 24 one-hour cells, each window to its 2; (2) the window side is
    CALENDAR-SIZED, so it broadcasts once via ray.put as a cell-keyed
    frame and the probe is a per-batch vectorized merge — zero shuffle
    at any corpus size (the bounded fan-out + bounded-broadcast
    assumption; two BIG interval sets instead would hash-join the cell
    columns natively); (3) a pair meeting in several shared cells is
    counted EXACTLY ONCE by the max-start rule — only the cell
    containing max(a.s, w.start) reports it (that instant lies inside
    both intervals, so both sides emitted the cell; no distinct pass,
    the spatial-join dedup trick); (4) per-block (slot, cnt) partials
    collapse to an 8-row Sum. All-integer microsecond arithmetic,
    exact on both sides (oracle = quadratic explicit-predicate join)."""
    import numpy as np

    from ray.data.aggregate import Min, Max, Sum

    US = 1_000_000
    day_us = 86_400 * US
    cell_us = IOJ_CELL_S * US

    def span_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tus = df.ts.astype("int64")
        out = pd.DataFrame(
            {
                "user_id": df.user_id.astype("int64"),
                "day": (tus // day_us).astype("int64"),
                "s": tus,
                "e": tus,
            }
        )
        g = out.groupby(["user_id", "day"], as_index=False).agg(
            s=("s", "min"), e=("e", "max")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    spans = (
        _events(sf_dir, columns=["ts", "user_id"])
        .map_batches(span_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "day"])
        .aggregate(Min("s", alias_name="s"), Max("e", alias_name="e"))
        .materialize()
    )

    # calendar side: distinct active days (bounded by the calendar, not
    # the corpus) -> slot windows, exploded to their two grid cells
    days = np.unique(
        spans.select_columns(["day"]).to_pandas().day.to_numpy().astype(np.int64)
    )
    w_day = np.repeat(days, IOJ_SLOTS)
    w_slot = np.tile(np.arange(IOJ_SLOTS, dtype=np.int64), len(days))
    ws = w_day * day_us + w_slot * (IOJ_STEP_S * US)
    we = ws + IOJ_LEN_S * US
    c0 = ws // cell_us
    n_c = (we - 1) // cell_us - c0 + 1
    idx = np.repeat(np.arange(len(ws)), n_c)
    off = np.arange(n_c.sum()) - np.repeat(np.cumsum(n_c) - n_c, n_c)
    cells = pd.DataFrame(
        {"cell": c0[idx] + off, "ws": ws[idx], "we": we[idx], "slot": w_slot[idx]}
    )
    wref = ray.put(cells)

    def probe(batch: pa.Table, ref=wref) -> pa.Table:
        w = ray.get(ref)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch["e"].to_numpy(zero_copy_only=False).astype(np.int64)
        c0 = s // cell_us
        n_c = (e // cell_us - c0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), n_c)
        off = np.arange(n_c.sum()) - np.repeat(np.cumsum(n_c) - n_c, n_c)
        a = pd.DataFrame({"cell": c0[idx] + off, "s": s[idx], "e": e[idx]})
        m = a.merge(w, on="cell")
        keep = (
            (m.s < m.we)
            & (m.ws <= m.e)
            & (np.maximum(m.s, m.ws) // cell_us == m.cell)  # counted-once rule
        )
        g = m[keep].groupby("slot", as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "n_pairs"}), preserve_index=False
        )

    out = (
        spans.map_batches(probe, batch_format="pyarrow")
        .groupby("slot")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"))
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    return out.astype({"slot": "int64", "n_pairs": "int64"})


INTERVAL_OVERLAP_SQL = f"""
WITH a AS (
  SELECT user_id, epoch_us(ts) // {86_400 * 1_000_000} AS day,
         MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
  FROM events GROUP BY user_id, epoch_us(ts) // {86_400 * 1_000_000}),
days AS (SELECT DISTINCT day FROM a),
w AS (
  SELECT k.range AS slot,
         d.day * {86_400 * 1_000_000} + k.range * {IOJ_STEP_S * 1_000_000} AS ws,
         d.day * {86_400 * 1_000_000} + k.range * {IOJ_STEP_S * 1_000_000}
           + {IOJ_LEN_S * 1_000_000} AS we
  FROM days d, range({IOJ_SLOTS}) k)
SELECT CAST(w.slot AS BIGINT) AS slot, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM a JOIN w ON a.s < w.we AND w.ws <= a.e
GROUP BY w.slot ORDER BY slot
"""


# --------------------------------------------------------------------------
# Count-Min sketch (value-oracled: md5-pinned rows make registers exact)
# --------------------------------------------------------------------------

CM_DEPTH = 4
CM_WIDTH = 256
CM_QUERY_MOD = 37


def countmin_user_counts(
    sf_dir: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> pd.DataFrame:
    """Count-Min sketch of per-user event counts, queried for the
    deterministic user set {user_id % CM_QUERY_MOD == 0} — the sketch
    family's second VALUE-ORACLED member (hll_daily_users pins HLL
    registers the same way): with the row hashes pinned to
    md5('cm<j>:<user>') the d x w register matrix is an exact integer
    function of the input, so est_count (min over rows of the hit
    register) is value-checkable, and the CM overestimate guarantee
    (est >= true, exceeding it only by collision mass) is visible
    against the exact true_count column computed alongside.

    Scale contract: every block folds its rows into its OWN d x w
    register partial (<= d*w rows per block, any block size), so the
    exchange is d x w x #blocks bounded — never event-count sized; the
    register matrix (1024 int64s) merges by plain Sum, the same
    mergeability that lets 256 nodes sketch 100 TB and union the
    results in KBs. True counts for the query slice ride the same scan
    as (user, n) partials into a query-set-sized groupby.
    """
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, columns=["user_id"])

    def partial(batch: pa.Table) -> pa.Table:
        import hashlib

        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, cnt = np.unique(u, return_counts=True)
        rows = {"j": [], "b": [], "cnt": []}
        for j in range(depth):
            bs = np.array(
                [
                    int(hashlib.md5(f"cm{j}:{x}".encode()).hexdigest()[:8], 16) % width
                    for x in uniq
                ],
                dtype=np.int64,
            )
            for b in np.unique(bs):
                rows["j"].append(j)
                rows["b"].append(int(b))
                rows["cnt"].append(int(cnt[bs == b].sum()))
        # true-count partials for the query slice ride the same pass,
        # tagged j = -1 (never a register row)
        qm = uniq % CM_QUERY_MOD == 0
        rows["j"].extend([-1] * int(qm.sum()))
        rows["b"].extend(int(x) for x in uniq[qm])
        rows["cnt"].extend(int(c) for c in cnt[qm])
        return pa.table(
            {
                "j": pa.array(rows["j"], pa.int64()),
                "b": pa.array(rows["b"], pa.int64()),
                "cnt": pa.array(rows["cnt"], pa.int64()),
            }
        )

    folded = (
        ev.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["j", "b"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    regs = {
        (int(r.j), int(r.b)): int(r.cnt) for r in folded[folded.j >= 0].itertuples()
    }
    true = folded[folded.j < 0].set_index("b").cnt
    import hashlib

    out = []
    for u in sorted(true.index):
        est = min(
            regs.get(
                (j, int(hashlib.md5(f"cm{j}:{u}".encode()).hexdigest()[:8], 16) % width),
                0,
            )
            for j in range(depth)
        )
        out.append({"user_id": int(u), "true_count": int(true[u]), "est_count": est})
    return pd.DataFrame(out, columns=["user_id", "true_count", "est_count"]).astype(
        {"user_id": "int64", "true_count": "int64", "est_count": "int64"}
    )


COUNTMIN_SQL = f"""
WITH arms AS (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS j),
regs AS MATERIALIZED (
  SELECT arms.j,
         CAST(CONCAT('0x', substr(md5('cm' || arms.j || ':' ||
              CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {CM_WIDTH} AS b,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events CROSS JOIN arms GROUP BY 1, 2
),
q AS MATERIALIZED (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM events WHERE user_id % {CM_QUERY_MOD} = 0 GROUP BY 1
),
probes AS (
  SELECT q.user_id, q.true_count, arms.j,
         CAST(CONCAT('0x', substr(md5('cm' || arms.j || ':' ||
              CAST(q.user_id AS VARCHAR)), 1, 8)) AS BIGINT) % {CM_WIDTH} AS b
  FROM q CROSS JOIN arms
)
SELECT p.user_id, p.true_count,
       CAST(MIN(COALESCE(r.cnt, 0)) AS BIGINT) AS est_count
FROM probes p LEFT JOIN regs r ON r.j = p.j AND r.b = p.b
GROUP BY 1, 2 ORDER BY 1
"""


# --------------------------------------------------------------------------
# per-user EWMA — exponentially-weighted activity value
# --------------------------------------------------------------------------

EWMA_ALPHA = 0.3


def ewma_user_value(sf_dir: str) -> pd.DataFrame:
    """Per-user exponentially-weighted moving average of event value in
    (ts, event_id) order — the recency-weighted engagement score a
    ranking/anomaly system keeps per entity (y_1 = x_1; y_i = a*x_i +
    (1-a)*y_{i-1}, pandas ewm adjust=False convention). Computed via
    the closed form y_n = (1-a)^(n-1) x_1 + sum_{i>=2} a (1-a)^(n-i) x_i
    so the whole partition vectorizes (np.power over the rank column,
    one weighted segment-sum per user — never a Python recurrence loop).

    Scale contract: the sessionize coarse user-hash-partition shape —
    one vectorized pass per partition, per-user state never crosses
    partitions; output is #users-sized. Float contract: both sides
    evaluate the same closed form (libm pow + a weighted sum; sum-order
    drift ~1e-15 relative), reported round-6."""
    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def ewma_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "ewma": pd.Series([], dtype="float64"),
            }
        )
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g.user_id.to_numpy()
        val = g.value.to_numpy(dtype=np.float64)
        # per-user 1-based rank and group size, vectorized
        change = np.empty(len(g), dtype=bool)
        change[0] = True
        change[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(g)))
        rn = np.arange(len(g)) - np.repeat(starts, sizes) + 1
        n = np.repeat(sizes, sizes)
        a = EWMA_ALPHA
        w = np.where(rn == 1, np.power(1.0 - a, n - 1), a * np.power(1.0 - a, n - rn))
        contrib = w * val
        ewma = np.add.reduceat(contrib, starts)
        return pd.DataFrame(
            {
                "user_id": uid[starts].astype("int64"),
                "n_events": sizes.astype("int64"),
                "ewma": np.round(ewma, 6),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(ewma_part, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype({"user_id": "int64", "n_events": "int64", "ewma": "float64"})


EWMA_USER_SQL = f"""
WITH ordered AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n
  FROM events
)
SELECT user_id, CAST(ANY_VALUE(n) AS BIGINT) AS n_events,
       ROUND(SUM(CASE WHEN rn = 1 THEN pow(1.0 - {EWMA_ALPHA}, n - 1) * value
                      ELSE {EWMA_ALPHA} * pow(1.0 - {EWMA_ALPHA}, n - rn) * value END),
             6) AS ewma
FROM ordered GROUP BY user_id ORDER BY user_id
"""


# --------------------------------------------------------------------------
# last-touch attribution
# --------------------------------------------------------------------------

ATTR_TOUCHES = ("click", "view")
ATTR_LOOKBACK_S = 7 * 86400


def attribution_last_touch(sf_dir: str) -> pd.DataFrame:
    """Last-touch conversion attribution: every 'purchase' is credited
    to the user's most recent STRICTLY-preceding touch event ('click'
    or 'view') in (ts, event_id) order within a 7-day lookback, else
    'direct' — the marketing-analytics staple next to funnel_conversion
    (the funnel counts ordered progress; attribution assigns REVENUE to
    the step that drove it). Reports per channel: conversions and exact
    int-cents revenue.

    Scale contract: the sessionize coarse user-hash-partition shape;
    per partition one vectorized pass — candidate touch indices fold
    with np.maximum.accumulate and a user-start guard (no per-user
    loop), purchases older than the lookback or before any touch fall
    to 'direct'. The exchange is #channels-sized integer partials."""
    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def attrib_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "channel": pd.Series([], dtype=object),
                "n_purchases": pd.Series([], dtype="int64"),
                "revenue_cents": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        from .common import to_cents

        g = g.sort_values(["user_id", "ts", "event_id"]).reset_index(drop=True)
        n = len(g)
        uid = g.user_id.to_numpy()
        et = g.event_type.to_numpy()
        ts_us = g.ts.to_numpy().astype("datetime64[us]").astype("int64")
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        user_start = np.repeat(starts, sizes)
        is_touch = np.isin(et, ATTR_TOUCHES)
        cand = np.where(is_touch, np.arange(n), -1)
        acc = np.maximum.accumulate(cand)
        valid = acc >= user_start  # never inherit another user's touch
        is_purchase = et == "purchase"
        pm = is_purchase
        touch_idx = acc[pm]
        ok = (
            valid[pm]
            & ((ts_us[pm] - ts_us[np.clip(touch_idx, 0, n - 1)]) <= ATTR_LOOKBACK_S * 1_000_000)
        )
        channel = np.where(ok, et[np.clip(touch_idx, 0, n - 1)], "direct")
        cents = to_cents(g.value.to_numpy()[pm])
        df = pd.DataFrame({"channel": channel, "n_purchases": 1, "revenue_cents": cents})
        out = df.groupby("channel", as_index=False).sum()
        return out.astype({"n_purchases": "int64", "revenue_cents": "int64"})

    from ray.data.aggregate import Sum

    out = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(attrib_part, batch_format="pandas")
        .groupby("channel")
        .aggregate(Sum("n_purchases", alias_name="n_purchases"), Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
        .sort_values("channel")
        .reset_index(drop=True)
    )
    return out.astype({"channel": "str", "n_purchases": "int64", "revenue_cents": "int64"})


ATTRIBUTION_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, event_type, value, epoch_us(ts) AS tsu,
         CASE WHEN event_type IN ('click', 'view') THEN event_type END AS touch,
         CASE WHEN event_type IN ('click', 'view') THEN epoch_us(ts) END AS touch_ts
  FROM events
),
filled AS (
  SELECT user_id, event_id, event_type, value, tsu,
         last_value(touch IGNORE NULLS) OVER w AS last_touch,
         last_value(touch_ts IGNORE NULLS) OVER w AS last_touch_ts
  FROM ordered
  WINDOW w AS (PARTITION BY user_id ORDER BY tsu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
purchases AS (
  SELECT CASE WHEN last_touch IS NOT NULL
                   AND tsu - last_touch_ts <= CAST({ATTR_LOOKBACK_S} AS BIGINT) * 1000000
              THEN last_touch ELSE 'direct' END AS channel,
         CAST(ROUND(value * 100.0) AS BIGINT) AS cents
  FROM filled WHERE event_type = 'purchase'
)
SELECT channel, COUNT(*) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM purchases GROUP BY channel ORDER BY channel
"""


# --------------------------------------------------------------------------
# cumulative adoption — first-touch cohort growth curve
# --------------------------------------------------------------------------


def cumulative_adoption(sf_dir: str) -> pd.DataFrame:
    """Cumulative-adoption curve: distinct users EVER seen, by day — the
    growth metric behind every product dashboard, and the first-touch
    complement of retention_cohorts (retention asks who RETURNS; this
    asks when each user first ARRIVED). A user counts once, on their
    first-seen day: per-user Min(day) (the argmin fold — per-block
    (user, min_day) partials, user-sized groupby), then a #days-sized
    first-seen histogram and a driver cumsum. Exact integers
    end-to-end; the curve is monotone by construction and ends at the
    global distinct-user count (both pytest-locked)."""
    from ray.data.aggregate import Min, Sum

    DAY_US = 86_400_000_000

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.cast(batch["ts"], pa.int64()).to_numpy() // DAY_US
        df = pd.DataFrame({"user_id": batch["user_id"].to_numpy(), "day": day})
        g = df.groupby("user_id", as_index=False).min()
        return pa.Table.from_pandas(g, preserve_index=False)

    first_seen = (
        _events(sf_dir, columns=["ts", "user_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("user_id")
        .aggregate(Min("day", alias_name="day"))
    )

    def day_counts(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({"day": batch["day"].to_numpy(), "n_new": 1})
        g = df.groupby("day", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    days = (
        first_seen.map_batches(day_counts, batch_format="pyarrow", batch_size=None)
        .groupby("day")
        .aggregate(Sum("n_new", alias_name="n_new"))
        .to_pandas()
        .sort_values("day")
        .reset_index(drop=True)
    )
    days["cum_users"] = days["n_new"].cumsum()
    return days.astype({"day": "int64", "n_new": "int64", "cum_users": "int64"})


CUMULATIVE_ADOPTION_SQL = """
WITH fs AS (
  SELECT user_id, MIN(epoch_us(ts) // 86400000000) AS day FROM events GROUP BY user_id
),
d AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM fs GROUP BY day)
SELECT day, n_new,
       CAST(SUM(n_new) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
FROM d ORDER BY day
"""


# --------------------------------------------------------------------------
# maximum drawdown — running-peak shortfall per user
# --------------------------------------------------------------------------

DRAWDOWN_DEBITS = ("click", "error")  # quota-consuming event kinds


def max_drawdown(sf_dir: str) -> pd.DataFrame:
    """Maximum drawdown of each user's running NET balance — credits
    (purchase/signup/view values) minus debits (click/error values,
    the quota-consuming kinds; every value in this corpus is
    non-negative, so an unsigned cumsum never falls and the statistic
    would be vacuously zero) in (ts, event_id) order: max over time of
    running_peak - running_value — the risk/regression metric for any
    cumulative series (balance, quota, queue depth), and the
    running-CUMMAX sequential shape the events family lacked
    (events_running_value is the cumsum; this is the worst shortfall
    against the historical peak, which no pointwise window rewrite of
    cumsum alone gives).

    Exact arithmetic: values fold as int cents (to_cents), so peak,
    trough and drawdown are exact int64. Scale: the sessionize coarse
    user-hash shape; per partition ONE vectorized pass (cumsum +
    np.maximum.accumulate segment-reset via the user-start subtraction
    trick). Output per user: n_events, final_cents, max_drawdown_cents."""
    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def dd_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "user_id": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64"),
                "final_cents": pd.Series([], dtype="int64"),
                "max_drawdown_cents": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        from .common import to_cents

        g = g.sort_values(["user_id", "ts", "event_id"])
        uid = g.user_id.to_numpy()
        cents = to_cents(g.value.to_numpy())
        debit = np.isin(g.event_type.to_numpy(), DRAWDOWN_DEBITS)
        cents = np.where(debit, -cents, cents)
        n = len(g)
        change = np.empty(n, dtype=bool)
        change[0] = True
        change[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, n))
        # segmented cumsum: global cumsum minus the value just before each segment
        cs = np.cumsum(cents)
        seg_base = np.repeat(np.concatenate([[0], cs[starts[1:] - 1]]), sizes)
        run = cs - seg_base
        # segmented cummax of `run`: subtract +inf-reset trick — offset each
        # segment so cross-segment carryover can never win, then restore
        OFF = np.int64(1) << 40
        seg_idx = np.repeat(np.arange(len(starts), dtype=np.int64), sizes)
        peak = np.maximum.accumulate(run + seg_idx * OFF) - seg_idx * OFF
        dd = peak - run
        mdd = np.maximum.reduceat(dd, starts)
        return pd.DataFrame(
            {
                "user_id": uid[starts].astype("int64"),
                "n_events": sizes.astype("int64"),
                "final_cents": run[np.append(starts[1:], n) - 1].astype("int64"),
                "max_drawdown_cents": mdd.astype("int64"),
            }
        )

    out = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dd_part, batch_format="pandas")
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    return out.astype(
        {"user_id": "int64", "n_events": "int64", "final_cents": "int64", "max_drawdown_cents": "int64"}
    )


MAX_DRAWDOWN_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id,
         CASE WHEN event_type IN ('click', 'error')
              THEN -CAST(ROUND(value * 100.0) AS BIGINT)
              ELSE CAST(ROUND(value * 100.0) AS BIGINT) END AS cents
  FROM events
),
r AS (
  SELECT user_id, ts, event_id, cents,
         SUM(cents) OVER w AS run
  FROM s
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
),
p AS (
  SELECT user_id, cents, run,
         MAX(run) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS peak
  FROM r
)
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS final_cents,
       CAST(MAX(peak - run) AS BIGINT) AS max_drawdown_cents
FROM p GROUP BY user_id ORDER BY user_id
"""


def interval_blocked_time(sf_dir: str) -> pd.DataFrame:
    """Exact blocked-time accounting: for each maintenance slot-of-day,
    the total INTERSECTION DURATION between user activity spans and
    that slot's windows — interval_overlap_join counts WHICH sessions a
    slot disturbs; capacity planning also needs HOW LONG (the integral,
    not the indicator: choosing between two slots that disturb equally
    many sessions, you take the one stealing fewer user-seconds).

    Identical machinery and partitioning assumptions (grid equi-ize,
    calendar broadcast via ray.put, max-start counted-once rule so a
    pair meeting in several shared cells contributes its FULL exact
    intersection exactly once); the per-pair contribution is
    max(0, min(e, we) - max(s, ws)) in integer microseconds — the
    windows are mutually disjoint, so per-slot sums are exact with no
    inclusion-exclusion. Quadratic explicit-predicate oracle."""
    import numpy as np

    from ray.data.aggregate import Max, Min, Sum

    US = 1_000_000
    day_us = 86_400 * US
    cell_us = IOJ_CELL_S * US

    def span_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        tus = df.ts.astype("int64")
        out = pd.DataFrame(
            {
                "user_id": df.user_id.astype("int64"),
                "day": (tus // day_us).astype("int64"),
                "s": tus,
                "e": tus,
            }
        )
        g = out.groupby(["user_id", "day"], as_index=False).agg(s=("s", "min"), e=("e", "max"))
        return pa.Table.from_pandas(g, preserve_index=False)

    spans = (
        _events(sf_dir, columns=["ts", "user_id"])
        .map_batches(span_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["user_id", "day"])
        .aggregate(Min("s", alias_name="s"), Max("e", alias_name="e"))
        .materialize()
    )
    days = np.unique(spans.select_columns(["day"]).to_pandas().day.to_numpy().astype(np.int64))
    w_day = np.repeat(days, IOJ_SLOTS)
    w_slot = np.tile(np.arange(IOJ_SLOTS, dtype=np.int64), len(days))
    ws = w_day * day_us + w_slot * (IOJ_STEP_S * US)
    we = ws + IOJ_LEN_S * US
    c0 = ws // cell_us
    n_c = (we - 1) // cell_us - c0 + 1
    idx = np.repeat(np.arange(len(ws)), n_c)
    off = np.arange(n_c.sum()) - np.repeat(np.cumsum(n_c) - n_c, n_c)
    cells = pd.DataFrame({"cell": c0[idx] + off, "ws": ws[idx], "we": we[idx], "slot": w_slot[idx]})
    wref = ray.put(cells)

    def probe(batch: pa.Table, ref=wref) -> pa.Table:
        w = ray.get(ref)
        s = batch["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch["e"].to_numpy(zero_copy_only=False).astype(np.int64)
        c0_ = s // cell_us
        n_c_ = (e // cell_us - c0_ + 1).astype(np.int64)
        idx_ = np.repeat(np.arange(len(s)), n_c_)
        off_ = np.arange(n_c_.sum()) - np.repeat(np.cumsum(n_c_) - n_c_, n_c_)
        a = pd.DataFrame({"cell": c0_[idx_] + off_, "s": s[idx_], "e": e[idx_]})
        m = a.merge(w, on="cell")
        inter = np.minimum(m.e, m.we) - np.maximum(m.s, m.ws)
        keep = (
            (m.s < m.we)
            & (m.ws <= m.e)
            & (np.maximum(m.s, m.ws) // cell_us == m.cell)
        )
        g = (
            m[keep]
            .assign(blocked_us=inter[keep])
            .groupby("slot", as_index=False)
            .agg(n_pairs=("slot", "size"), blocked_us=("blocked_us", "sum"))
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        spans.map_batches(probe, batch_format="pyarrow")
        .groupby("slot")
        .aggregate(Sum("n_pairs", alias_name="n_pairs"), Sum("blocked_us", alias_name="blocked_us"))
        .to_pandas()
        .sort_values("slot")
        .reset_index(drop=True)
    )
    return out.astype({"slot": "int64", "n_pairs": "int64", "blocked_us": "int64"})


INTERVAL_BLOCKED_SQL = f"""
WITH a AS (
  SELECT user_id, epoch_us(ts) // {86_400 * 1_000_000} AS day,
         MIN(epoch_us(ts)) AS s, MAX(epoch_us(ts)) AS e
  FROM events GROUP BY user_id, epoch_us(ts) // {86_400 * 1_000_000}),
days AS (SELECT DISTINCT day FROM a),
w AS (
  SELECT k.range AS slot,
         d.day * {86_400 * 1_000_000} + k.range * {IOJ_STEP_S * 1_000_000} AS ws,
         d.day * {86_400 * 1_000_000} + k.range * {IOJ_STEP_S * 1_000_000}
           + {IOJ_LEN_S * 1_000_000} AS we
  FROM days d, range({IOJ_SLOTS}) k)
SELECT CAST(w.slot AS BIGINT) AS slot, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(LEAST(a.e, w.we) - GREATEST(a.s, w.ws)) AS BIGINT) AS blocked_us
FROM a JOIN w ON a.s < w.we AND w.ws <= a.e
GROUP BY w.slot ORDER BY slot
"""


# --------------------------------------------------------------------------
# calendar seasonality profile
# --------------------------------------------------------------------------


def seasonality_profile(sf_dir: str) -> pd.DataFrame:
    """Day-of-week x 3-hour-bucket activity profile: event count and
    exact cents-sum of value per calendar cell — the seasonal fingerprint
    a capacity planner and an anomaly detector both condition on
    (events_anomaly_windows asks "is this window unusual?"; this is the
    baseline it should be unusual AGAINST). Epoch day 0 is a Thursday
    (1970-01-01) — dow = (epoch_day + 4) % 7 gives the 0=Sunday
    convention (Thursday maps to 4), the same expression on both sides.

    One stateless streaming pass folds to the 7 x 8 = 56-cell integer
    partial table per block; the exchange is 56 x #blocks rows. Means
    are one exact-int division per cell, round-6."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from .common import to_cents

        us = pc.cast(batch["ts"], pa.int64()).to_numpy()
        day = us // 86_400_000_000
        dow = (day + 4) % 7
        h3 = (us % 86_400_000_000) // (3 * 3_600_000_000)
        df = pd.DataFrame(
            {
                "dow": dow,
                "h3": h3,
                "n_events": 1,
                "sum_cents": to_cents(batch["value"].to_numpy()),
            }
        )
        return pa.Table.from_pandas(
            df.groupby(["dow", "h3"], as_index=False).sum(), preserve_index=False
        )

    out = (
        _events(sf_dir, columns=["ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["dow", "h3"])
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_cents", alias_name="sum_cents"))
        .to_pandas()
        .sort_values(["dow", "h3"])
        .reset_index(drop=True)
    )
    out["mean_cents"] = (
        out["sum_cents"].map(int).combine(out["n_events"].map(int), lambda s, n: round(s / n, 6))
    )
    return out.astype({"dow": "int64", "h3": "int64", "n_events": "int64", "sum_cents": "int64"})


SEASONALITY_SQL = """
WITH c AS (
  SELECT ((epoch_us(ts) // 86400000000) + 4) % 7 AS dow,
         (epoch_us(ts) % 86400000000) // 10800000000 AS h3,
         CAST(ROUND(value * 100.0) AS BIGINT) AS cents
  FROM events
)
SELECT dow, h3, COUNT(*) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents,
       ROUND(CAST(SUM(cents) AS DOUBLE) / COUNT(*), 6) AS mean_cents
FROM c GROUP BY dow, h3 ORDER BY dow, h3
"""


# --------------------------------------------------------------------------
# time-to-convert quantiles
# --------------------------------------------------------------------------


def time_to_convert(sf_dir: str) -> pd.DataFrame:
    """Signup -> first-purchase latency quantiles: for each user with a
    signup, the delay to their first purchase AT OR AFTER that signup —
    funnel_conversion counts who converts; growth teams price HOW LONG
    conversion takes (the p50/p75 of this delay is the activation SLA).
    Exact integer seconds (floor of the microsecond delta), quantiles
    under the established quantile_disc rank contract.

    Scale: the sessionize coarse user-hash shape — per partition ONE
    vectorized pass computes each user's min signup ts and min
    qualifying purchase ts (two groupby-min folds over masked columns,
    no per-user loop); converted users' deltas are #users-bounded, the
    driver rank-walks them."""
    import math

    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def convert_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"delta_s": pd.Series([], dtype="int64")})
        if g.empty:
            return empty
        us = g.ts.to_numpy().astype("datetime64[us]").astype("int64")
        g = g.assign(us=us)
        s = g[g.event_type == "signup"].groupby("user_id")["us"].min()
        if s.empty:
            return empty
        p = g[g.event_type == "purchase"][["user_id", "us"]].merge(
            s.rename("ts_s"), left_on="user_id", right_index=True
        )
        p = p[p.us >= p.ts_s]
        if p.empty:
            return empty
        first = p.groupby("user_id").agg(ts_p=("us", "min"), ts_s=("ts_s", "first"))
        return pd.DataFrame({"delta_s": ((first.ts_p - first.ts_s) // 1_000_000).astype("int64")})

    deltas = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(convert_part, batch_format="pandas")
        .to_pandas()["delta_s"]
        .to_numpy()
    )
    deltas = np.sort(deltas)
    n = len(deltas)

    def qd(q: float) -> int:
        return int(deltas[math.ceil(q * n) - 1])

    return pd.DataFrame(
        {
            "n_converted": pd.Series([n], dtype="int64"),
            "p25_s": pd.Series([qd(0.25)], dtype="int64"),
            "p50_s": pd.Series([qd(0.50)], dtype="int64"),
            "p75_s": pd.Series([qd(0.75)], dtype="int64"),
        }
    )


TIME_TO_CONVERT_SQL = """
WITH s AS (
  SELECT user_id, MIN(epoch_us(ts)) AS ts_s
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
p AS (
  SELECT e.user_id, MIN(epoch_us(e.ts)) AS ts_p
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= s.ts_s
  GROUP BY e.user_id
),
d AS (
  SELECT (p.ts_p - s.ts_s) // 1000000 AS delta_s
  FROM p JOIN s ON p.user_id = s.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
       CAST(quantile_disc(delta_s, 0.25) AS BIGINT) AS p25_s,
       CAST(quantile_disc(delta_s, 0.50) AS BIGINT) AS p50_s,
       CAST(quantile_disc(delta_s, 0.75) AS BIGINT) AS p75_s
FROM d
"""


# --------------------------------------------------------------------------
# inter-arrival statistics — burstiness profile per event type
# --------------------------------------------------------------------------


def interarrival_stats(sf_dir: str) -> pd.DataFrame:
    """Per-type inter-arrival statistics over each user's own event
    stream: mean gap and coefficient of variation (CV = sigma/mean,
    population) in integer MINUTES — the burstiness fingerprint
    reliability engineering reads before sizing queues (CV ~ 1 is
    Poisson; CV >> 1 is bursty and needs headroom; CV << 1 is a
    scheduled/heartbeat signal). Gaps are user-local and type-local
    (the gap between MY clicks, not anyone's).

    Scale: coarse user-hash partitions; per partition one vectorized
    pass (sort by (user, type, ts, event_id), diff, boundary mask —
    no per-group loop) folding to (type, n, s1, s2) int64 moment rows
    (minutes keep s2 inside int64 at any realistic block size; the
    driver closes mean/CV from exact big ints — the regression_by_lang
    float contract, one libm sqrt)."""
    import math

    N_PARTS = 64

    def add_part(batch):
        from .joins import _hash_part

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def gap_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n": pd.Series([], dtype="int64"),
                "s1": pd.Series([], dtype="int64"),
                "s2": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"])
        us = g.ts.to_numpy().astype("datetime64[us]").astype("int64")
        uid = g.user_id.to_numpy()
        et = g.event_type.to_numpy()
        gap_min = (us[1:] - us[:-1]) // 60_000_000
        same = (uid[1:] == uid[:-1]) & (et[1:] == et[:-1])
        df = pd.DataFrame(
            {
                "event_type": et[1:][same],
                "n": 1,
                "s1": gap_min[same],
                "s2": gap_min[same] ** 2,
            }
        )
        return df.groupby("event_type", as_index=False).sum().astype(
            {"n": "int64", "s1": "int64", "s2": "int64"}
        )

    from ray.data.aggregate import Sum

    m = (
        _events(sf_dir, columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(gap_part, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s1", alias_name="s1"), Sum("s2", alias_name="s2"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    rows = []
    for r in m.itertuples():
        n, s1, s2 = int(r.n), int(r.s1), int(r.s2)
        mean = s1 / n
        cv = math.sqrt(float(n * s2 - s1 * s1)) / float(s1) if s1 > 0 else 0.0
        rows.append(
            {
                "event_type": r.event_type,
                "n_gaps": n,
                "mean_gap_min": round(mean, 6),
                "cv": round(cv, 6),
            }
        )
    return pd.DataFrame(rows).astype({"event_type": "str", "n_gaps": "int64"})


INTERARRIVAL_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY user_id, event_type
                                                 ORDER BY ts, event_id)) // 60000000 AS gap
  FROM events
),
m AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(gap) AS HUGEINT) AS s1, CAST(SUM(gap * gap) AS HUGEINT) AS s2
  FROM g WHERE gap IS NOT NULL GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_gap_min,
       CASE WHEN s1 > 0
            THEN ROUND(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) / CAST(s1 AS DOUBLE), 6)
            ELSE 0.0 END AS cv
FROM m ORDER BY event_type
"""
