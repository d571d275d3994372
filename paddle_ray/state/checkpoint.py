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

Two write modes share the manifest/atomic-rename/in-partition-url-sort
contract byte for byte:

- ``mode="streaming"`` (default): partition-exchange write. A small pool
  of appender ACTORS each owns the partition ids with
  ``pid % n_writers == w``; a stateless ``map_batches`` router splits
  every extracted batch by owner and appends it (ack'd per batch, so the
  stream has backpressure), overlapping routing/buffering/spill with
  extraction instead of waiting for it to finish. ``finalize()`` then
  sorts + writes each owned partition in parallel across the pool. This
  replaces the old all-to-all ``groupby(partition_id)`` barrier, which
  serialized the whole sort+write tail after the last extract batch
  (measured as the dominant cause of the 0.745 < 0.8 scaling efficiency
  at 480k docs — VERDICT r3 #2; the reference's 1-slot producer/consumer
  overlap, `server/model_repo/layout-parsing/1/model.py:252-298`, is the
  same bounded-overlap idea at partition granularity).
- ``mode="barrier"``: the original ``groupby(partition_id).map_groups``
  write, kept as the zero-actor-state fallback/debug path.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_DIR = "_manifests"


def _tmp_name(path: str) -> str:
    # pid alone is NOT unique across nodes on shared storage — speculative
    # re-execution of the same partition on two nodes must never share a
    # tmp file
    return f"{path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"


def _fsync_file_and_dir(path: str) -> None:
    """fsync an already-written file and its directory so the subsequent
    os.replace commit ordering survives power loss (write-then-rename is
    only atomic on durable media if the data hits disk first)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)
    dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _atomic_write_bytes(path: str, data: bytes) -> None:
    tmp = _tmp_name(path)
    with open(tmp, "wb") as f:
        f.write(data)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _fsync_file_and_dir(path)


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
    tmp = _tmp_name(data_path)
    pq.write_table(g, tmp)
    _fsync_file_and_dir(tmp)
    os.replace(tmp, data_path)
    _fsync_file_and_dir(data_path)

    urls = g["url"]
    # manifests stay id-sized at any row count: per-row hashes roll up into
    # one digest (sha256 over the newline-joined row hashes, in url order) —
    # a 10^6-row partition must not produce a ~65 MB JSON that every resume
    # has to parse just to learn the partition id
    if "content_hash" in g.column_names:
        import hashlib

        row_hashes = g["content_hash"].to_pylist()
        digest = hashlib.sha256("\n".join(row_hashes).encode("ascii")).hexdigest()
    else:
        digest = None
    manifest = {
        "partition_id": pid,
        "url_min": str(urls[0].as_py()),
        "url_max": str(urls[-1].as_py()),
        "row_count": g.num_rows,
        "content_digest": digest,
        "status": "complete",
    }
    _atomic_write_bytes(
        manifest_path(out_dir, pid), json.dumps(manifest, sort_keys=True).encode()
    )
    from ..core.schema import MANIFEST_SCHEMA

    return pa.table(
        {
            "partition_id": pa.array([pid], pa.int32()),
            "url_min": pa.array([manifest["url_min"]], pa.string()),
            "url_max": pa.array([manifest["url_max"]], pa.string()),
            "row_count": pa.array([g.num_rows], pa.int64()),
            "content_digest": pa.array([digest], pa.string()),
            "status": pa.array(["complete"], pa.string()),
        },
        schema=MANIFEST_SCHEMA,
    )


class _PartitionAppender:
    """Streaming-write actor: owns the partitions with
    ``pid % n_writers == writer_index`` and buffers their rows as batches
    arrive (overlapped with upstream extraction). Buffers above
    ``spill_bytes`` per partition spill to a run file inside the partition
    directory, so streaming-phase memory is bounded regardless of
    partition size; ``finalize()`` is still partition-sized (same residency
    as the barrier path's ``map_groups`` group) — partition count is the
    knob that bounds it.

    Exactly-once under Ray Data task retries: every append carries an
    idempotency key derived from the slice's url column (urls are the
    engine's row identity — the manifest/resume contract is url-keyed), so
    a retried router task re-sending an already-acked slice is a no-op.
    A writer-actor LOSS is not patched here: the job's recovery unit for
    writer state is the checkpoint itself (rerun resumes from completed
    manifests, exactly like any other mid-job crash)."""

    def __init__(self, out_dir: str, sort_cols=("url",), spill_bytes: int = 128 << 20):
        self.out_dir = out_dir
        self.sort_cols = tuple(sort_cols)
        self.spill_bytes = spill_bytes
        self._buf: dict[int, list[pa.Table]] = {}
        self._buf_bytes: dict[int, int] = {}
        self._runs: dict[int, list[str]] = {}
        self._seen: set[str] = set()

    def append(self, part: pa.Table, key: str) -> int:
        if key in self._seen:
            return 0
        self._seen.add(key)
        import numpy as np

        pids = part.column("partition_id").to_numpy(zero_copy_only=False)
        order = np.argsort(pids, kind="stable")
        sorted_t = part.take(pa.array(order))
        sorted_pids = pids[order]
        bounds = np.flatnonzero(np.diff(sorted_pids)) + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [len(pids)]])
        for s, e in zip(starts, ends):
            pid = int(sorted_pids[s])
            sl = sorted_t.slice(int(s), int(e - s))
            self._buf.setdefault(pid, []).append(sl)
            nb = self._buf_bytes.get(pid, 0) + sl.nbytes
            if nb >= self.spill_bytes:
                self._spill(pid)
                nb = 0
            self._buf_bytes[pid] = nb
        return part.num_rows

    def _spill(self, pid: int) -> None:
        # run files are unsorted (finalize re-sorts the whole partition
        # anyway) and tracked ONLY in memory: a crashed attempt's stale
        # runs are never globbed into a later attempt's output
        t = pa.concat_tables(self._buf.pop(pid))
        part_dir = os.path.join(self.out_dir, f"part-{pid:05d}")
        os.makedirs(part_dir, exist_ok=True)
        run = os.path.join(part_dir, f"run-{uuid.uuid4().hex}.parquet")
        pq.write_table(t, run)
        self._runs.setdefault(pid, []).append(run)

    def finalize(self) -> pa.Table:
        from ..core.schema import MANIFEST_SCHEMA

        rows = []
        for pid in sorted(set(self._buf) | set(self._runs)):
            tables = [pq.read_table(p) for p in self._runs.get(pid, [])]
            tables += self._buf.pop(pid, [])
            g = pa.concat_tables(tables)
            rows.append(write_partition(g, self.out_dir, self.sort_cols))
            for p in self._runs.pop(pid, []):
                os.unlink(p)
        self._buf_bytes.clear()
        if not rows:
            return MANIFEST_SCHEMA.empty_table()
        return pa.concat_tables(rows)


def _slice_key(t: pa.Table) -> str:
    """Idempotency key for one routed slice: blake2b over the url column
    (+ row count). Assumes urls identify rows — the same assumption the
    manifest digest / resume contract already makes."""
    import hashlib

    h = hashlib.blake2b(digest_size=16)
    h.update(str(t.num_rows).encode())
    for chunk in t.column("url").chunks:
        for u in chunk:
            h.update(b"\x00")
            h.update(str(u).encode("utf-8", "surrogatepass"))
    return h.hexdigest()


def make_router(writers):
    """Stateless map_batches fn: split each batch by owning writer
    (pid % n_writers) and append, blocking on the acks so the streaming
    executor's backpressure extends through the write."""
    n = len(writers)

    def route(batch: pa.Table) -> pa.Table:
        out = pa.table({"routed_rows": pa.array([batch.num_rows], pa.int64())})
        if batch.num_rows == 0:
            return out
        import numpy as np
        import ray

        w = batch.column("partition_id").to_numpy(zero_copy_only=False) % n
        refs = []
        for i in np.unique(w):
            sl = batch.filter(pa.array(w == i))
            refs.append(writers[int(i)].append.remote(sl, _slice_key(sl)))
        ray.get(refs)
        return out

    return route


def streaming_write(
    ds,
    out_dir: str,
    n_writers: int | None = None,
    writer_num_cpus: float = 0.25,
    spill_bytes: int = 128 << 20,
    appender_cls: type | None = None,
):
    """Partition-exchange write (module docstring). Executes the stream
    EAGERLY (routing must drain before finalize) and returns the manifest
    summary Dataset. Writer pool defaults to half the session CPUs at a
    quarter CPU each — enough reservation to spread writers across nodes
    on a real cluster, small enough not to starve the extract pools.

    Crash consistency: on ANY failure the writer pool is killed only
    after every in-flight finalize has settled (a healthy writer's
    finalize must never be force-killed mid-write_partition just because
    a sibling died — its partitions commit or they don't, atomically),
    and the first failure is re-raised. Partitions without a committed
    manifest are recomputed by the next resume; stale spill runs are
    never globbed (finalize only reads runs it tracked in memory).
    `appender_cls` is a test seam for fault injection (a subclass of
    _PartitionAppender)."""
    import ray
    import ray.data as rd

    if n_writers is None:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_writers = max(2, cpus // 2)
    Appender = ray.remote(appender_cls or _PartitionAppender)
    writers = [
        Appender.options(num_cpus=writer_num_cpus).remote(out_dir, spill_bytes=spill_bytes)
        for _ in range(n_writers)
    ]
    try:
        ds.map_batches(make_router(writers), batch_format="pyarrow").materialize()
        manifests, errs = [], []
        for ref in [w.finalize.remote() for w in writers]:
            try:
                manifests.append(ray.get(ref))
            except Exception as e:  # noqa: BLE001 — settle ALL finalizes first
                errs.append(e)
        if errs:
            raise errs[0]
        return rd.from_arrow(pa.concat_tables(manifests))
    finally:
        # also runs on router failure (writer pool used to leak there)
        for w in writers:
            ray.kill(w)


def checkpointed_write(ds, out_dir: str, resume: bool = True, mode: str = "streaming", **kw):
    """Write ds (must carry partition_id + url [+ content_hash]) to out_dir
    with per-partition manifests. Returns the manifest summary Dataset
    (small). On resume, completed partitions are filtered BEFORE extraction
    upstream (see pipelines/extract.py) — the filter here is a second
    guard for correctness. mode: "streaming" (partition-exchange, default)
    or "barrier" (groupby map_groups) — see module docstring."""
    done = completed_partitions(out_dir) if resume else set()
    if done:
        ds = ds.map_batches(make_resume_filter(done), batch_format="pyarrow")
    os.makedirs(out_dir, exist_ok=True)
    if mode == "streaming":
        return streaming_write(ds, out_dir, **kw)
    if mode != "barrier":
        raise ValueError(f"unknown write mode {mode!r} (streaming|barrier)")
    return ds.groupby("partition_id").map_groups(
        lambda g: write_partition(g, out_dir), batch_format="pyarrow"
    )


def read_output(out_dir: str):
    """Read back a checkpointed output directory as one Dataset (block
    count sized to the data — raw read_parquet's 200-block floor shatters
    KB-scale outputs into micro-blocks, commit 1ea3812)."""
    import glob

    from ..pipelines.common import sized_read_parquet

    files = sorted(glob.glob(os.path.join(out_dir, "part-*", "data.parquet")))
    return sized_read_parquet(files)


def verify_output(out_dir: str) -> tuple[list[int], list[int]]:
    """Deep lineage check: for every complete manifest, recompute
    sha256(extracted_text) per row from the written parquet, roll up the
    same digest the writer computed, and compare (plus row counts; the
    in-partition url sort makes the order deterministic). Partitions
    written without a content_hash column (digest null) verify row_count
    only. Returns (verified partition ids, corrupt partition ids)."""
    import hashlib

    from ..stages.extract import sha256_hex  # the WRITER's hash fn — never fork it

    ok: list[int] = []
    bad: list[int] = []
    for m in completed_manifests(out_dir):
        pid = m["partition_id"]
        data_path = os.path.join(out_dir, f"part-{pid:05d}", "data.parquet")
        try:
            want = m.get("content_digest")
            if want is None:
                t = pq.read_table(data_path, columns=[])
                good = t.num_rows == m.get("row_count")
            else:
                t = pq.read_table(data_path, columns=["extracted_text"])
                hashes = [sha256_hex(s or "") for s in t["extracted_text"].to_pylist()]
                digest = hashlib.sha256("\n".join(hashes).encode("ascii")).hexdigest()
                good = digest == want and t.num_rows == m.get("row_count")
            (ok if good else bad).append(pid)
        except Exception:
            bad.append(pid)
    return ok, bad


def reset_output_dir(out_dir: str) -> None:
    """resume=False semantics: wipe prior checkpoint state (manifest dir,
    partitioning stamp, part-*/ data) so the fresh run cannot inherit stale
    manifests or a stamp describing an older partitioning config. Only the
    engine's own artifacts are touched — anything else in out_dir stays."""
    import re
    import shutil

    if not os.path.isdir(out_dir):
        return
    part_re = re.compile(r"^part-\d+$")
    for name in os.listdir(out_dir):
        path = os.path.join(out_dir, name)
        # _metrics is engine state too: a stale metrics.parquet from the
        # previous run must not be attributed to the fresh run's output
        if name == MANIFEST_DIR or name == "_metrics" or part_re.match(name):
            shutil.rmtree(path, ignore_errors=True)


PARTITIONING_STAMP = "_PARTITIONING.json"


def write_partitioning_stamp(out_dir: str, fingerprint: dict) -> None:
    """Record how rows were assigned to partitions. Resume REFUSES to mix
    manifests produced under a different assignment — partition ids are
    only meaningful relative to their partitioning config, and silently
    filtering new ids against old manifests drops never-written rows."""
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    path = os.path.join(out_dir, MANIFEST_DIR, PARTITIONING_STAMP)
    payload = json.dumps(fingerprint, sort_keys=True).encode()
    # Exclusive PUBLISH of a complete file: write the payload to a private
    # temp file, then os.link() it to the stamp path — link is atomic and
    # fails if the path exists, so exactly ONE writer wins a race AND any
    # reader that sees the stamp sees the full payload. The previous
    # O_EXCL-create-then-write left a window where the loser could
    # json.load a still-empty file and crash with JSONDecodeError instead
    # of the intended mismatch/accept path (ADVICE r2).
    tmp = f"{path}.tmp-{os.getpid()}-{os.urandom(4).hex()}"
    with open(tmp, "wb") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError:
        with open(path) as f:
            existing = json.load(f)
        if existing != fingerprint:
            raise ValueError(
                f"checkpoint dir {out_dir} is already stamped with "
                f"partitioning {existing}, current config is {fingerprint}: "
                "another run owns this directory"
            )
    finally:
        os.unlink(tmp)


def check_partitioning_stamp(out_dir: str, fingerprint: dict) -> None:
    """Raise if out_dir was checkpointed under a DIFFERENT partitioning."""
    path = os.path.join(out_dir, MANIFEST_DIR, PARTITIONING_STAMP)
    if not os.path.exists(path):
        return
    with open(path) as f:
        existing = json.load(f)
    if existing != fingerprint:
        raise ValueError(
            f"checkpoint dir {out_dir} was written with partitioning "
            f"{existing}, current config is {fingerprint}: resuming would "
            "silently drop rows whose new partition_id collides with a "
            "completed old one. Use a fresh out_dir or resume=False."
        )
