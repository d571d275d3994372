"""Type-sniff + skew-aware partition assignment (stateless map_batches).

Reimplements the reference's file-type inference (`model.py:377-394`:
fileType knob, URL-extension sniff, magic bytes) for the pages table:
``html: binary`` rows are classified by magic bytes only — ``%PDF-`` =>
"pdf", leading image magics => "image", else "html".

Partition assignment handles MB-outlier skew WITHOUT a global pre-pass
(scale requirement, SURVEY.md §7.4): normal rows get
``crc32(url) % n_partitions``; rows whose payload exceeds
``outlier_bytes`` are diverted to a dedicated outlier partition range
``[n_partitions, n_partitions + n_outlier_partitions)`` so one 4 MB page
never co-locates with thousands of 5 KB pages in the same output
partition. crc32 (not Python ``hash``) keeps the assignment stable across
processes and runs. An exact greedy byte-balancing planner is available in
``stages/partition.py`` for when a size index already exists.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..core.config import ExtractConfig

_PDF_MAGIC = b"%PDF-"
_IMAGE_MAGICS = (b"\x89PNG", b"\xff\xd8\xff", b"GIF8", b"II*\x00", b"MM\x00*")


def sniff_type(payload: bytes) -> str:
    if payload.startswith(_PDF_MAGIC):
        return "pdf"
    for m in _IMAGE_MAGICS:
        if payload.startswith(m):
            return "image"
    return "html"


def stable_hash(s: str) -> int:
    return zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF


def make_sniff_batch(cfg: ExtractConfig):
    """Returns the batch fn: adds content_type, n_bytes_in, partition_id."""

    n_parts = cfg.n_partitions
    n_out = cfg.n_outlier_partitions
    outlier = cfg.outlier_bytes
    # validate at build time: numpy's `x % uint64(0)` is a silent 0 with a
    # RuntimeWarning, which would route every outlier to partition n_parts
    # (outside the configured range) instead of failing loudly
    if n_parts <= 0 or n_out <= 0:
        raise ValueError(
            f"n_partitions={n_parts} and n_outlier_partitions={n_out} must both be >= 1"
        )

    def sniff_batch(batch: pa.Table) -> pa.Table:
        html = batch["html"]
        n_bytes = pc.binary_length(html).cast(pa.int64())
        urls = batch["url"].to_pylist()
        nb = n_bytes.to_numpy(zero_copy_only=False)
        # per-row magic sniff on the first 8 bytes only (no full-payload copy)
        heads = pc.binary_slice(html, 0, 8).to_pylist()
        ctype = np.array([sniff_type(h or b"") for h in heads], dtype=object)
        # crc32 stays a C call per url; the branch/modulo arithmetic is
        # vectorized (the old per-row Python if/else boxed every int)
        # null url hashes as "" (crc32 0): null html is tolerated two
        # lines up, so a null url must flow to the error path downstream,
        # not AttributeError the whole batch here
        hs = np.fromiter(
            (zlib.crc32((u or "").encode("utf-8")) for u in urls), dtype=np.uint64, count=len(urls)
        )
        pids = (hs % np.uint64(n_parts)).astype(np.int32)
        out_mask = nb > outlier
        if out_mask.any():
            pids[out_mask] = (n_parts + (hs[out_mask] % np.uint64(n_out))).astype(np.int32)
        return (
            batch.append_column("content_type", pa.array(ctype, pa.string()))
            .append_column("n_bytes_in", n_bytes)
            .append_column("partition_id", pa.array(pids, pa.int32()))
        )

    return sniff_batch
