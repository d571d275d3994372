"""Shared pipeline helpers (single definition — review finding: the read
helper had drifted into three identical copies)."""

from __future__ import annotations

import ray.data as rd


def read_table(sf_dir: str, table: str, columns=None) -> rd.Dataset:
    """Column-pruned parquet read of one testdata table."""
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
