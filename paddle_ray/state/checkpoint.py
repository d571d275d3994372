"""Per-partition checkpoint manifests + exact resume (north_rule).

Output layout (resumable, FIXTURES.md §5):

    out_dir/
      part-00012/data.parquet        # one directory per partition
      _manifests/partition-00012.json

A manifest commits ONLY after its partition's parquet is fully written:
both the data file and the manifest are written to a temp path then
``os.replace``d (the reference's atomic heartbeat-write pattern,
`layout_status.py:78-81`). A half-written partition therefore has no
manifest and is recomputed on resume.

Resume = load the completed-partition id set (small — thousands of ids
even at 10^12 rows), broadcast it, and filter input rows by
``partition_id`` inside ``map_batches`` (a broadcast anti-join; no
shuffle — SURVEY.md §2.7).

The per-partition write itself runs as ``groupby(partition_id).map_groups``
so each partition is written exactly once by exactly one task.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifests"


def _atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def manifest_path(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"partition-{partition_id:05d}.json")


def completed_manifests(out_dir: str) -> list[dict]:
    """Parsed manifests of all COMPLETE partitions (torn/partial manifests
    are skipped — they mean the partition never committed)."""
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("partition-") and name.endswith(".json"):
            try:
                with open(os.path.join(mdir, name)) as f:
                    m = json.load(f)
                if m.get("status") == "complete":
                    m["partition_id"] = int(m["partition_id"])
                    out.append(m)
            except (ValueError, KeyError, json.JSONDecodeError):
                continue  # torn manifest == not complete
    return out


def completed_partitions(out_dir: str) -> set[int]:
    return {m["partition_id"] for m in completed_manifests(out_dir)}


def make_resume_filter(done: set[int]):
    """Batch fn dropping rows whose partition already completed (broadcast
    anti-join on the small completed set)."""
    done_arr = pa.array(sorted(done), pa.int32())

    def resume_filter(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.invert(pc.is_in(batch["partition_id"], value_set=done_arr))
        return batch.filter(mask)

    return resume_filter


def write_partition(group: pa.Table, out_dir: str, sort_cols=("url",)) -> pa.Table:
    """map_groups body: write one partition atomically, commit its manifest,
    return the manifest row. Rows are sorted by url inside the partition so
    output bytes are scheduling-independent. Pure pyarrow — the nested
    blocks column never converts to pandas objects (that conversion cost
    more than the parquet write itself)."""
    pid = int(group["partition_id"][0].as_py())
    order = pa.compute.sort_indices(group, sort_keys=[(c, "ascending") for c in sort_cols])
    g = group.take(order)
    part_dir = os.path.join(out_dir, f"part-{pid:05d}")
    os.makedirs(part_dir, exist_ok=True)
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)

    data_path = os.path.join(part_dir, "data.parquet")
    tmp = f"{data_path}.tmp.{os.getpid()}"
    pq.write_table(g, tmp)
    os.replace(tmp, data_path)

    urls = g["url"]
    hashes = g["content_hash"].to_pylist() if "content_hash" in g.column_names else []
    manifest = {
        "partition_id": pid,
        "url_min": str(urls[0].as_py()),
        "url_max": str(urls[-1].as_py()),
        "row_count": g.num_rows,
        "content_hashes": hashes,
        "status": "complete",
    }
    _atomic_write_bytes(
        manifest_path(out_dir, pid), json.dumps(manifest, sort_keys=True).encode()
    )
    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "url_min": pa.array([manifest["url_min"]], pa.string()),
            "url_max": pa.array([manifest["url_max"]], pa.string()),
            "row_count": pa.array([g.num_rows], pa.int64()),
            "status": pa.array(["complete"], pa.string()),
        }
    )


def checkpointed_write(ds, out_dir: str, resume: bool = True):
    """Write ds (must carry partition_id + url [+ content_hash]) to out_dir
    with per-partition manifests. Returns the manifest summary Dataset
    (small). On resume, completed partitions are filtered BEFORE extraction
    upstream (see pipelines/extract.py) — the filter here is a second
    guard for correctness."""
    done = completed_partitions(out_dir) if resume else set()
    if done:
        ds = ds.map_batches(make_resume_filter(done), batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    return ds.groupby("partition_id").map_groups(
        lambda g: write_partition(g, out_dir), batch_format="pyarrow"
    )


def read_output(out_dir: str):
    """Read back a checkpointed output directory as one Dataset."""
    import glob

    import ray.data as rd

    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "data.parquet")))
    return rd.read_parquet(files)


def verify_output(out_dir: str) -> tuple[list[int], list[int]]:
    """Deep lineage check: for every complete manifest, recompute
    sha256(extracted_text) per row from the written parquet and compare
    against the manifest's content_hashes (count, order, and values — the
    in-partition url sort makes the order deterministic). Returns
    (verified partition ids, corrupt partition ids)."""
    from ..stages.extract import sha256_hex  # the WRITER's hash fn — never fork it

    ok: list[int] = []
    bad: list[int] = []
    for m in completed_manifests(out_dir):
        pid = m["partition_id"]
        data_path = os.path.join(out_dir, f"part-{pid:05d}", "data.parquet")
        try:
            t = pq.read_table(data_path, columns=["extracted_text"])
            hashes = [sha256_hex(s or "") for s in t["extracted_text"].to_pylist()]
            if hashes == m.get("content_hashes") and t.num_rows == m.get("row_count"):
                ok.append(pid)
            else:
                bad.append(pid)
        except Exception:
            bad.append(pid)
    return ok, bad
