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

import pandas as pd
import pyarrow as pa
import ray

METRICS_ACTOR_NAME = "paddle_ray_metrics"


@ray.remote(num_cpus=0)
class MetricsActor:
    def __init__(self):
        self.counters: dict[tuple, dict] = {}

    def report(self, stage: str, partition_id: int, rows: int, bytes_in: int, blocks: int, errors: int, wall_s: float):
        key = (stage, partition_id)
        c = self.counters.setdefault(
            key, {"rows": 0, "bytes_in": 0, "blocks": 0, "errors": 0, "wall_s": 0.0}
        )
        c["rows"] += rows
        c["bytes_in"] += bytes_in
        c["blocks"] += blocks
        c["errors"] += errors
        c["wall_s"] += wall_s

    def snapshot(self) -> list[dict]:
        return [
            {"stage": k[0], "partition_id": k[1], **v} for k, v in sorted(self.counters.items())
        ]

    def reset(self):
        self.counters.clear()


def get_metrics_actor():
    """Get-or-create the named collector (idempotent across tasks)."""
    return MetricsActor.options(
        name=METRICS_ACTOR_NAME, get_if_exists=True, lifetime="detached"
    ).remote()


def wrap_with_metrics(stage_name: str, fn):
    """Wrap a pyarrow batch fn so each call reports counters. The handle is
    resolved lazily inside the worker (first batch) — cheap thereafter."""
    state = {}

    def wrapped(batch: pa.Table) -> pa.Table:
        actor = state.get("actor")
        if actor is None:
            actor = state["actor"] = get_metrics_actor()
        t0 = time.perf_counter()
        out = fn(batch)
        wall = time.perf_counter() - t0
        pid = int(out["partition_id"][0].as_py()) if "partition_id" in out.column_names and len(out) else -1
        bytes_in = int(pa.compute.sum(batch["n_bytes_in"]).as_py() or 0) if "n_bytes_in" in batch.column_names else 0
        blocks = int(pa.compute.sum(out["n_blocks"]).as_py() or 0) if "n_blocks" in out.column_names else 0
        errors = int(len(out) - out["error"].null_count) if "error" in out.column_names else 0
        actor.report.remote(stage_name, pid, len(out), bytes_in, blocks, errors, wall)
        return out

    return wrapped


def metrics_snapshot_df() -> pd.DataFrame:
    actor = get_metrics_actor()
    rows = ray.get(actor.snapshot.remote())
    cols = ["stage", "partition_id", "rows", "bytes_in", "blocks", "errors", "wall_s"]
    return pd.DataFrame(rows, columns=cols)


def reset_metrics():
    ray.get(get_metrics_actor().reset.remote())
