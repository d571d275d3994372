"""Fault-injection: a mid-run actor crash must not lose or corrupt rows.

At 100 TB on a real cluster, worker loss is routine; the engine leans on
Ray's lineage-based task retry + actor restart. This locks the behavior
for our actual extraction stage (actor pool, pyarrow batches): one actor
hard-kills its worker process (os._exit — no Python-level cleanup) after
claiming an exclusive marker, Ray restarts the actor and retries the
task, and the output is byte-identical to an uninjected run.

Operational note discovered while building this test: a RESTARTED actor
re-imports its class's defining module in a fresh worker. If that module
is not importable from the worker's environment (here: a pytest test
module; at cluster scale: a driver-only script never shipped via
runtime_env/working_dir), the restart loop fails SILENTLY and the
pipeline hangs instead of erroring. The crashy class below is therefore
defined in function scope so cloudpickle serializes it by value — and
deployments must keep every UDF module importable on workers."""

import os

import pyarrow as pa

from paddle_ray.core.config import ExtractConfig
from paddle_ray.sources.pages import synth_pages
from paddle_ray.stages.extract import DocumentExtractor
from paddle_ray.stages.sniff import make_sniff_batch


def test_actor_crash_mid_run_is_retried_lossless(tmp_path, ray_session):
    import ray.data as rd

    class CrashOnceExtractor(DocumentExtractor):
        """First __call__ to win the O_EXCL marker hard-kills its worker.
        Function-scoped: see module docstring (restart importability)."""

        def __init__(self, cfg, marker):
            super().__init__(cfg)
            self.marker = marker

        def __call__(self, batch: pa.Table) -> pa.Table:
            try:
                fd = os.open(self.marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
            except FileExistsError:
                return super().__call__(batch)
            os._exit(1)

    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    pages, _ = synth_pages(200, pdf_every=0, outlier_every=0)
    sniff = make_sniff_batch(cfg)
    step = max(1, pages.num_rows // 8)
    slices = [pages.slice(i, step) for i in range(0, pages.num_rows, step)]

    def run(extractor_cls, **extra_kwargs):
        return (
            rd.from_arrow(slices)
            .map_batches(sniff, batch_format="pyarrow", batch_size=64)
            .map_batches(
                extractor_cls,
                batch_format="pyarrow",
                batch_size=16,
                concurrency=(1, 2),
                num_cpus=1,
                fn_constructor_kwargs={"cfg": cfg, **extra_kwargs},
            )
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )

    marker = str(tmp_path / "crash_marker")
    crashed = run(CrashOnceExtractor, marker=marker)
    assert os.path.exists(marker), "the fault was never injected"
    clean = run(DocumentExtractor)
    assert len(crashed) == len(clean) == 200
    assert list(crashed.url) == list(clean.url)
    assert list(crashed.content_hash) == list(clean.content_hash)


# ---------------------------------------------------------------------------
# streaming-appender fault injection (VERDICT r4 #5): manifests commit only
# for fully-written partitions; resume recomputes exactly the uncommitted
# ones (state/checkpoint.py contract)
# ---------------------------------------------------------------------------


def _synth_checkpoint_rows(n=200, nparts=8):
    import pandas as pd

    from paddle_ray.stages.extract import sha256_hex

    texts = [f"document body {i} " * 4 for i in range(n)]
    return pd.DataFrame(
        {
            "partition_id": [i % nparts for i in range(n)],
            "url": [f"https://x.test/{i:05d}" for i in range(n)],
            "extracted_text": texts,
            "content_hash": [sha256_hex(t) for t in texts],
        }
    )


def _read_back(out_dir):
    from paddle_ray.state import checkpoint as ckpt

    df = ckpt.read_output(out_dir).to_pandas().sort_values("url").reset_index(drop=True)
    return list(zip(df.url, df.content_hash))


def test_appender_killed_mid_stream_commits_nothing_resume_recomputes_all(
    tmp_path, ray_session
):
    """Hard-kill ONE appender actor while batches are still being routed:
    the run fails loudly, NO manifest commits (finalize never ran), the
    writer pool does not leak, and a resume run over the same input
    produces byte-identical output to an uninjected run."""
    import pytest
    import ray.data as rd

    from paddle_ray.state import checkpoint as ckpt
    from paddle_ray.state.checkpoint import _PartitionAppender

    marker = str(tmp_path / "appender_crash")

    class CrashOnSecondAppend(_PartitionAppender):
        MARKER = marker  # class attr: cloudpickle ships it by value

        def append(self, part, key):
            self._n_appends = getattr(self, "_n_appends", 0) + 1
            if self._n_appends == 2:
                try:
                    fd = os.open(self.MARKER, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.close(fd)
                    os._exit(1)  # exactly one writer dies, no cleanup
                except FileExistsError:
                    pass
            return super().append(part, key)

    df = _synth_checkpoint_rows()
    out = str(tmp_path / "out")

    def ds():
        # small blocks so every writer sees >= 2 appends
        return rd.from_pandas(df).repartition(10)

    with pytest.raises(Exception):
        ckpt.checkpointed_write(
            ds(), out, resume=False, mode="streaming",
            n_writers=2, appender_cls=CrashOnSecondAppend,
        )
    assert os.path.exists(marker), "the fault was never injected"
    assert ckpt.completed_partitions(out) == set(), "no finalize => no manifests"

    ckpt.checkpointed_write(ds(), out, resume=True, mode="streaming", n_writers=2)
    assert ckpt.completed_partitions(out) == set(range(8))
    ok, bad = ckpt.verify_output(out)
    assert sorted(ok) == list(range(8)) and not bad

    clean = str(tmp_path / "clean")
    ckpt.checkpointed_write(ds(), clean, resume=False, mode="streaming", n_writers=2)
    assert _read_back(out) == _read_back(clean)


def test_appender_killed_during_finalize_partial_commit_exact_resume(
    tmp_path, ray_session
):
    """Hard-kill ONE appender actor DURING finalize(), after it committed
    exactly one of its owned partitions: only fully-written partitions
    carry manifests (healthy writers' finalizes settle before the pool is
    torn down), every committed manifest deep-verifies, and the resume
    run recomputes EXACTLY the uncommitted partitions."""
    import pytest
    import ray.data as rd

    from paddle_ray.state import checkpoint as ckpt
    from paddle_ray.state.checkpoint import _PartitionAppender, write_partition

    marker = str(tmp_path / "finalize_crash")

    class CrashInFinalize(_PartitionAppender):
        MARKER = marker

        def finalize(self):
            try:
                fd = os.open(self.MARKER, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
            except FileExistsError:
                return super().finalize()
            # commit exactly one owned partition, then die mid-finalize
            import pyarrow as _pa
            import pyarrow.parquet as _pq

            pids = sorted(set(self._buf) | set(self._runs))
            if pids:
                pid = pids[0]
                tables = [_pq.read_table(p) for p in self._runs.get(pid, [])]
                tables += self._buf.pop(pid, [])
                write_partition(_pa.concat_tables(tables), self.out_dir, self.sort_cols)
            os._exit(1)

    df = _synth_checkpoint_rows()
    out = str(tmp_path / "out")

    def ds():
        return rd.from_pandas(df).repartition(10)

    with pytest.raises(Exception):
        ckpt.checkpointed_write(
            ds(), out, resume=False, mode="streaming",
            n_writers=2, appender_cls=CrashInFinalize,
        )
    assert os.path.exists(marker), "the fault was never injected"
    committed = ckpt.completed_partitions(out)
    # one writer owns pids with pid % 2 == w (4 each); the crasher
    # committed exactly 1 of its 4, the healthy writer all 4
    assert len(committed) == 5, committed
    ok, bad = ckpt.verify_output(out)
    assert sorted(ok) == sorted(committed) and not bad

    summary = ckpt.checkpointed_write(
        ds(), out, resume=True, mode="streaming", n_writers=2
    ).to_pandas()
    # resume recomputed EXACTLY the uncommitted partitions
    assert sorted(summary.partition_id) == sorted(set(range(8)) - committed)
    assert ckpt.completed_partitions(out) == set(range(8))
    ok, bad = ckpt.verify_output(out)
    assert sorted(ok) == list(range(8)) and not bad

    clean = str(tmp_path / "clean")
    ckpt.checkpointed_write(ds(), clean, resume=False, mode="streaming", n_writers=2)
    assert _read_back(out) == _read_back(clean)
