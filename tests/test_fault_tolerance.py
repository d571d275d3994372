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
