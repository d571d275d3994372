"""Byte-size-aware partition planning (explicit skew handling, north_rule).

Two strategies:

1. **Streaming (default, used by the flagship)** — implemented in
   stages/sniff.py: ``crc32(url) % P`` with payloads over a byte threshold
   diverted to dedicated outlier partitions. No global pass; scales to
   10^12 rows.

2. **Exact greedy byte-balancing (this module)** — when a size index
   ``(url, n_bytes)`` already exists (e.g. from a previous run's metrics
   Dataset), plan partitions so each holds ~equal total bytes: sort sizes
   descending, assign each to the currently-lightest bin (LPT greedy).
   The plan is a broadcastable ``{url_hash_bucket: partition_id}`` map —
   small enough to ``ray.put`` once and look up inside ``map_batches``
   (the plan is over B=4096 hash buckets, not individual urls, so its
   size is O(B) regardless of row count).
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

from .sniff import stable_hash

N_BUCKETS = 4096


def plan_partitions_from_sizes(bucket_bytes: np.ndarray, n_partitions: int) -> np.ndarray:
    """LPT greedy: bucket_bytes[b] = total payload bytes in hash bucket b.
    Returns int32 array mapping bucket -> partition_id."""
    order = np.argsort(bucket_bytes)[::-1]
    heap = [(0, p) for p in range(n_partitions)]
    heapq.heapify(heap)
    assign = np.zeros(len(bucket_bytes), dtype=np.int32)
    for b in order:
        load, p = heapq.heappop(heap)
        assign[b] = p
        heapq.heappush(heap, (load + int(bucket_bytes[b]), p))
    return assign


def bucket_sizes(ds, url_col: str = "url", bytes_col: str = "n_bytes_in") -> np.ndarray:
    """One cheap aggregation pass over a slim (url, n_bytes) projection:
    per-batch partial sums into N_BUCKETS, then a tiny driver-side merge —
    no shuffle of the full data."""
    def partial(batch: pa.Table) -> pa.Table:
        sizes = np.zeros(N_BUCKETS, dtype=np.int64)
        nb = batch[bytes_col].to_numpy(zero_copy_only=False)
        for u, n in zip(batch[url_col].to_pylist(), nb):
            sizes[stable_hash(u) % N_BUCKETS] += int(n)
        return pa.table({"bucket": np.arange(N_BUCKETS), "bytes": sizes})

    parts = ds.select_columns([url_col, bytes_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    total = np.zeros(N_BUCKETS, dtype=np.int64)
    for b in parts.iter_batches(batch_format="pyarrow"):
        # np.add.at: fancy-index += keeps only the LAST value per
        # duplicated bucket id — safe only while batches never repeat a
        # bucket, which a batch spanning two partial tables would break
        np.add.at(total, b["bucket"].to_numpy(), b["bytes"].to_numpy())
    return total


def make_planned_assigner(assign: np.ndarray):
    """Returns a batch fn adding partition_id from a broadcast LPT plan."""

    def assigner(batch: pa.Table) -> pa.Table:
        pids = np.array(
            [assign[stable_hash(u) % len(assign)] for u in batch["url"].to_pylist()],
            dtype=np.int32,
        )
        name = "partition_id"
        arr = pa.array(pids, pa.int32())
        if name in batch.column_names:
            return batch.set_column(batch.schema.get_field_index(name), name, arr)
        return batch.append_column(name, arr)

    return assigner
