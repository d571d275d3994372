"""Per-stage/per-partition metrics & lineage side Dataset.

Replaces the reference's heartbeat-file monitoring plane
(`layout_status.py` + `status_server.py:56-123`: instance heartbeats to
/tmp JSON, aggregated by Sum/Max over fresh files) with a Ray-native
equivalent: stages report batch-level counters to a small named
MetricsActor (fire-and-forget, one tiny message per batch — the actor is
never on the data path), and the driver snapshots them into a metrics
Dataset written next to the output.

At multi-node scale the actor is a single lightweight sink receiving
O(#batches) tiny messages; if that ever became hot, the same interface
shards by stage name.
"""

from __future__ import annotations

import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

METRICS_ACTOR_NAME = "paddle_ray_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: dict[tuple, dict] = {}
        # idempotency keys: Ray tasks are at-least-once (a crashed actor's
        # block is resubmitted and reprocessed), so += counters would
        # double-count retried batches. Senders derive a content key per
        # batch; duplicates are dropped here. One small entry per reported
        # batch, cleared by reset() — bounded by job size.
        self._seen: set[tuple] = set()

    def _cell(self, stage: str, partition_id: int) -> dict:
        return self.counters.setdefault(
            (stage, partition_id),
            {"rows": 0, "bytes_in": 0, "blocks": 0, "errors": 0, "captions": 0, "wall_s": 0.0},
        )

    def _dup(self, namespace: str, key: str | None, partition_id: int) -> bool:
        if key is None:
            return False
        k = (namespace, key, partition_id)
        if k in self._seen:
            return True
        self._seen.add(k)
        return False

    def report(self, stage: str, partition_id: int, rows: int, bytes_in: int, blocks: int, errors: int, wall_s: float, key: str | None = None):
        if self._dup("r", key, partition_id):
            return
        c = self._cell(stage, partition_id)
        c["rows"] += rows
        c["bytes_in"] += bytes_in
        c["blocks"] += blocks
        c["errors"] += errors
        c["wall_s"] += wall_s

    def report_captions(self, stage: str, partition_id: int, n: int, key: str | None = None):
        """A5 caption-merge count (`layout_captioning.py:322-343` merged
        tally) — a dedicated counter so the enrichment volume is visible
        per partition."""
        if self._dup("c", key, partition_id):
            return
        self._cell(stage, partition_id)["captions"] += n

    def snapshot(self) -> list[dict]:
        return [
            {"stage": k[0], "partition_id": k[1], **v} for k, v in sorted(self.counters.items())
        ]

    def reset(self):
        self.counters.clear()
        self._seen.clear()


_ACTOR_HANDLE = None


def get_metrics_actor():
    """Get-or-create the named collector (idempotent across tasks).

    NOT detached: the actor dies with the driver that owns it — a detached
    collector outlived jobs on shared clusters and double-counted every
    subsequent run. The handle is cached at module level because a named
    non-detached actor is garbage-collected the moment its last in-scope
    handle drops; the pipeline driver creates it (and resets counters)
    before launching work, so worker-side lookups always find it."""
    global _ACTOR_HANDLE
    try:
        existing = ray.get_actor(METRICS_ACTOR_NAME)
    except ValueError:
        existing = None
    if existing is None:
        # nothing registered in the CURRENT Ray session: a cached handle
        # here is stale (ray.shutdown()/ray.init() in one process left
        # every metrics entry point raising on a dead actor) — recreate
        _ACTOR_HANDLE = MetricsActor.options(
            name=METRICS_ACTOR_NAME, get_if_exists=True
        ).remote()
    elif _ACTOR_HANDLE is None or _ACTOR_HANDLE._actor_id != existing._actor_id:
        _ACTOR_HANDLE = existing
    return _ACTOR_HANDLE


def batch_report_key(
    stage_name: str, out: pa.Table, fallback: pa.Table | None = None
) -> str:
    """Content-derived idempotency key for one reported batch. Ray Data
    resubmits a crashed actor's block as a NEW task, so task-id keying
    would not dedup the retry — the batch CONTENT is the stable identity:
    row count + FIRST and LAST rows (stage outputs carry unique urls/doc
    ids, so a same-stage collision needs identical length AND identical
    rows at both ends — ADVICE r2: first-row-only collided for batches
    sharing a leading row). An empty OUTPUT batch is keyed by the INPUT
    batch content when the caller passes it (`fallback`): a crashed-and-
    retried task reprocesses the identical input, so the retry's wall_s
    dedups correctly (ADVICE r3 — a random nonce lost that guarantee).
    Only when both sides are empty does the key collapse to a per-stage
    constant (two distinct empty-in/empty-out reports then merge — a
    bounded wall_s undercount, preferred over retry double-counting)."""
    import hashlib

    if len(out) == 0:
        if fallback is not None and len(fallback) > 0:
            return "e-" + batch_report_key(stage_name, fallback)
        return f"{stage_name}-empty"
    h = hashlib.blake2b(digest_size=12)
    h.update(stage_name.encode())
    h.update(str(len(out)).encode())
    h.update(repr(out.slice(0, 1).to_pylist()).encode())
    h.update(repr(out.slice(len(out) - 1, 1).to_pylist()).encode())
    return h.hexdigest()


def wrap_with_metrics(stage_name: str, fn):
    """Wrap a pyarrow batch fn so each call reports counters. The handle is
    resolved lazily inside the worker (first batch) — cheap thereafter.
    All bookkeeping is try/except-guarded: a metrics failure (dead
    collector on a shared cluster, uncastable counter column) must stay
    an observability glitch, never a data-path failure."""
    state = {}

    def wrapped(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t0 = time.perf_counter()
        out = fn(batch)
        wall = time.perf_counter() - t0
        try:
            actor = state.get("actor")
            if actor is None:
                actor = state["actor"] = get_metrics_actor()
            key = batch_report_key(stage_name, out, fallback=batch)
            if "partition_id" not in out.column_names or len(out) == 0:
                actor.report.remote(stage_name, -1, len(out), 0, 0, 0, wall, key=key)
                return out
            # counters come from the OUTPUT batch (a stage like sniff CREATES
            # n_bytes_in; reading the input reported 0 forever), attributed
            # per partition — one batch can span several partitions
            cols: dict = {"pid": out["partition_id"], "rows": pa.array(np.ones(len(out), np.int64))}
            cols["bytes_in"] = (
                pc.cast(out["n_bytes_in"], pa.int64())
                if "n_bytes_in" in out.column_names
                else pa.array(np.zeros(len(out), np.int64))
            )
            cols["blocks"] = (
                pc.cast(out["n_blocks"], pa.int64())
                if "n_blocks" in out.column_names
                else pa.array(np.zeros(len(out), np.int64))
            )
            cols["errors"] = (
                pc.cast(pc.is_valid(out["error"]), pa.int64())
                if "error" in out.column_names
                else pa.array(np.zeros(len(out), np.int64))
            )
            g = (
                pa.table(cols)
                .group_by("pid")
                .aggregate([("rows", "sum"), ("bytes_in", "sum"), ("blocks", "sum"), ("errors", "sum")])
            )
            n_total = len(out)
            for row in g.to_pylist():
                rows = int(row["rows_sum"])
                actor.report.remote(
                    stage_name,
                    int(row["pid"]),
                    rows,
                    int(row["bytes_in_sum"]),
                    int(row["blocks_sum"]),
                    int(row["errors_sum"]),
                    wall * rows / n_total,  # wall split proportionally by rows
                    key=key,
                )
        except Exception:
            pass  # metrics are best-effort; the data batch is already computed
        return out

    return wrapped


def wrap_class_with_metrics(stage_name: str, cls):
    """Actor-pool analogue of :func:`wrap_with_metrics`: subclass the
    callable stage class so every ``__call__`` reports the same per-partition
    counters. Init cost still runs once per actor (the subclass adds none)."""

    class Metered(cls):
        def __call__(self, batch: pa.Table) -> pa.Table:
            w = getattr(self, "_metered_call", None)
            if w is None:
                w = wrap_with_metrics(stage_name, super().__call__)
                self._metered_call = w
            return w(batch)

    Metered.__name__ = f"Metered{getattr(cls, '__name__', 'Stage')}"
    return Metered


def metrics_snapshot_df() -> pd.DataFrame:
    """Reports are fire-and-forget from workers; instead of a fixed sleep
    (which both undercounted still-in-flight reports and taxed idle calls),
    poll until THREE consecutive snapshots agree (~150 ms of quiet) — an
    idle actor converges after the first few re-reads, a draining one keeps
    resetting the stability counter. Still a heuristic (a report stuck in
    transit for longer than the quiet window is missed — a hard barrier
    would need sender-side sequence acks), but two equal reads 50 ms apart
    proved too weak on this ±30-40%-noise host."""
    actor = get_metrics_actor()
    rows = ray.get(actor.snapshot.remote())
    stable = 0
    for _ in range(40):
        time.sleep(0.05)
        again = ray.get(actor.snapshot.remote())
        if again == rows:
            stable += 1
            if stable >= 3:
                break
        else:
            stable = 0
            rows = again
    cols = ["stage", "partition_id", "rows", "bytes_in", "blocks", "errors", "captions", "wall_s"]
    return pd.DataFrame(rows, columns=cols)


def reset_metrics():
    ray.get(get_metrics_actor().reset.remote())


def write_metrics_parquet(out_dir: str) -> str:
    """Persist the per-stage/per-partition metrics snapshot next to the
    output (≙ the reference's monitoring plane being queryable after the
    fact). Returns the written path."""
    import os

    import pyarrow.parquet as pq

    df = metrics_snapshot_df()
    mdir = os.path.join(out_dir, "_metrics")
    os.makedirs(mdir, exist_ok=True)
    path = os.path.join(mdir, "metrics.parquet")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
    return path
