"""Shared pipeline helpers (single definition — review finding: the read
helper had drifted into three identical copies)."""

from __future__ import annotations

import os

import ray.data as rd

# Sizing the read to the DATA, not to the cluster: Ray's default
# read_op_min_num_blocks=200 (floored in practice at ~2x CPUs) shatters a
# KB-scale parquet file into micro-blocks, and every downstream shuffle
# inherits that task count — measured 12.2s -> 1.7s on dedup_minhash_lsh
# at sf0.1 (64 blocks of ~80 rows -> 3 sort shuffles x ~130 tiny tasks of
# pure scheduling overhead). Below _SMALL_INPUT_BYTES we override to
# ceil(bytes / 4 MiB) blocks (floor 8 keeps enough parallelism for the
# CPU-bearing per-batch kernels); above it Ray's own bytes/128MiB
# heuristic is already right and we do not interfere — at 100 TB this
# helper is a no-op.
_TARGET_BLOCK_BYTES = 4 << 20
_SMALL_INPUT_BYTES = 1 << 30


def _path_bytes(path: str) -> int | None:
    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        if os.path.isdir(path):
            return sum(
                os.path.getsize(os.path.join(r, f))
                for r, _, fs in os.walk(path)
                for f in fs
            )
    except OSError:
        return None
    return None


def sized_read_parquet(path, columns=None, min_blocks: int = 8, **read_kwargs) -> rd.Dataset:
    """Column-pruned parquet read with a data-sized block count (see
    module comment). `path` may be a file, directory, or list of files."""
    size = None
    if isinstance(path, str):
        size = _path_bytes(path)
    elif isinstance(path, (list, tuple)):
        sizes = [_path_bytes(p) for p in path]
        size = None if any(s is None for s in sizes) else sum(sizes)
    kwargs = {}
    if (
        size is not None
        and size < _SMALL_INPUT_BYTES
        and "override_num_blocks" not in read_kwargs  # explicit caller wins
    ):
        kwargs["override_num_blocks"] = max(min_blocks, -(-size // _TARGET_BLOCK_BYTES))
    return rd.read_parquet(path, columns=columns, **kwargs, **read_kwargs)


def read_table(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    """Column-pruned, block-sized parquet read of one testdata table."""
    return sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def to_cents(values) -> "np.ndarray":
    """float money -> int64 cents, rounding half AWAY FROM ZERO — DuckDB
    ROUND's rule. numpy/arrow round() is half-to-even, which silently
    diverges from every money oracle on exact half cents (e.g. 0.125*100);
    all engine-side cent conversions go through this ONE helper."""
    import numpy as np

    v = np.asarray(values, dtype=np.float64)
    return (np.sign(v) * np.floor(np.abs(v) * 100.0 + 0.5)).astype(np.int64)


# Per-group worker-residency contract for the exact-pair ground-truth
# operators (VERDICT r2 #4): groupby(key).map_groups materializes ONE
# group in ONE worker's heap, so a hot key is an OOM waiting to happen.
# The production dedup paths (minhash-LSH / simhash / exact-hash) never
# hold a whole group; the exact operators exist as oracles/ground truth,
# so past this cap they fail LOUDLY with the scale path spelled out
# instead of taking down the worker.
GROUP_RESIDENCY_CAP_BYTES = 4 << 30


def enforce_group_residency(
    est_bytes: int,
    n_rows: int,
    group_desc: str,
    operator: str,
    scale_path: str,
    cap_bytes: int = GROUP_RESIDENCY_CAP_BYTES,
) -> None:
    """Raise an actionable error when one cogroup would exceed the worker
    residency cap, naming the group, the estimate, and the operator to
    use instead at scale."""
    if est_bytes > cap_bytes:
        raise ValueError(
            f"{operator}: group {group_desc} holds {n_rows} rows "
            f"(~{est_bytes / (1 << 30):.1f} GiB estimated in-worker) — over the "
            f"{cap_bytes / (1 << 30):.1f} GiB per-group residency cap. This exact "
            f"operator materializes one group per worker by design (it is the "
            f"oracle/ground-truth surface); for hot groups use {scale_path}, or "
            f"raise max_group_bytes explicitly if the worker really has the heap."
        )


def w_threshold_hex(w: float) -> str:
    """First-8-hex-digit md5 threshold such that P[md5(key) < thresh] ~ w
    (md5 hex is fixed-length lowercase, so lexicographic compare IS
    numeric compare; the 8-digit prefix + 24 zeros keeps literals short
    and exact). Shared by the deterministic-sampling operators
    (importance_resample, quality_tiers) and their SQL oracles. Only
    valid for w < 1.0 — w == 1.0 would format as 9 hex digits and break
    the fixed-width compare; callers special-case keep-all."""
    if not (0.0 <= w < 1.0):
        raise ValueError(f"w must be in [0, 1), got {w}")
    return f"{int(w * (1 << 32)):08x}" + "0" * 24
