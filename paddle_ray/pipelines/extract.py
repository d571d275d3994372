"""Flagship extraction pipeline (SURVEY.md §7.1-7.2).

    read pages parquet (columns pruned)
      -> sniff content_type + n_bytes_in + skew-aware partition_id   [stateless tasks]
      -> [resume] drop rows of completed partitions                  [broadcast anti-join]
      -> DocumentExtractor actor pool (html DOM extract | pdf mock   [actor pool]
         layout model), drops the heavy `html` column
      -> Captioner actor pool (in-row bbox join + merge)             [actor pool]
      -> deterministic output: either
           a) checkpointed_write: streaming partition-exchange (appender
              actors overlapped with extraction; state/checkpoint.py) —
              one-file-per-partition parquet + manifests (url-sorted
              in-partition), or
           b) sort("url") for an in-memory deterministic Dataset.

The only shuffle is the per-partition write groupby (or the final sort),
both over the slim extracted projection — the MB-scale html payload never
crosses a shuffle boundary.
"""

from __future__ import annotations

import ray.data as rd

from ..core.config import ExtractConfig
from ..sources.pages import pages_from_documents, synth_pages
from ..stages.caption import Captioner
from ..stages.extract import DocumentExtractor
from ..stages.sniff import make_sniff_batch
from ..state import checkpoint as ckpt
from ..state.metrics import wrap_with_metrics


def resolve_layout_pool(cfg: ExtractConfig) -> tuple:
    """Size the extractor actor pool to the session unless pinned in cfg.

    Max = 3/4 of the session's CPUs (floor 6, cap 32): the extractor is
    the pipeline's dominant CPU consumer, and the remaining quarter keeps
    the captioner pool + stateless read/sort tasks schedulable (a pool
    reserving every CPU deadlocks the stream — see ExtractConfig note).
    Min stays 1 so tiny inputs/small hosts never over-reserve."""
    if cfg.layout_pool_size is not None:
        return cfg.layout_pool_size
    import ray

    n = 8
    if ray.is_initialized():
        n = int(ray.cluster_resources().get("CPU", 8))
    return (1, max(6, min(32, (n * 3) // 4)))


def resolve_write_mode(cfg: ExtractConfig, pages_ds: rd.Dataset) -> str:
    """Pick the checkpointed-write mode for "auto" (see ExtractConfig):
    the appender pool's fixed spin-up + ack cost only amortizes past
    ~cfg.write_streaming_min_rows input rows; below it the barrier
    groupby is strictly faster and byte-identical. The count is cheap
    where it matters: parquet reads answer from footer metadata and
    from_arrow datasets know their length — no data pass."""
    if cfg.write_mode != "auto":
        return cfg.write_mode
    return "streaming" if pages_ds.count() >= cfg.write_streaming_min_rows else "barrier"


def read_pages(source, columns=None) -> rd.Dataset:
    """source: parquet path(s) | pyarrow Table | Dataset.

    In-memory tables are split into byte-balanced slices before
    ``from_arrow`` — a single table would become ONE block and starve
    every downstream stage of parallelism (sources/pages.py).
    """
    if isinstance(source, rd.Dataset):
        return source
    if isinstance(source, (str, list)):
        return rd.read_parquet(source, columns=columns)
    from ..sources.pages import slice_table_by_bytes

    return rd.from_arrow(slice_table_by_bytes(source))


def extract_pipeline(
    source,
    cfg: ExtractConfig | None = None,
    out_dir: str | None = None,
    resume: bool = True,
    with_metrics: bool = False,
    partitioning: str = "streaming",
):
    """Build the lazy extraction Dataset. If out_dir is given, performs the
    checkpointed per-partition write and returns the manifest Dataset;
    otherwise returns the deterministic (url-sorted) extracted Dataset.

    partitioning:
      - "streaming" (default): single-pass crc32(url) + outlier diversion
        (stages/sniff.py) — no pre-pass, scales to 10^12 rows.
      - "planned": exact LPT byte-balancing (stages/partition.py) — one
        cheap extra pass over (url, byte-length) builds a bucket size
        index, the greedy plan broadcasts, and partition_id is
        reassigned so each output partition holds ~equal payload bytes.
        Use when partition-size uniformity matters more than the
        pre-pass (e.g. fixed-size downstream consumers).
    """
    cfg = cfg or ExtractConfig()
    pages_ds = read_pages(source, columns=["url", "warc_ts", "html", "lang"])

    sniff = make_sniff_batch(cfg)
    assign = None
    if partitioning == "planned":
        from ..stages.partition import bucket_sizes, make_planned_assigner, plan_partitions_from_sizes

        # pre-pass on a separate UNMETERED branch of the lazy dataset (the
        # metered main pass below would otherwise report sniff twice):
        # slim (url, n_bytes_in) projection only
        pre = pages_ds.map_batches(sniff, batch_format="pyarrow", batch_size=cfg.html_batch_size)
        assign = plan_partitions_from_sizes(bucket_sizes(pre), cfg.n_partitions)

    extractor_cls, captioner_cls = DocumentExtractor, Captioner
    if with_metrics:
        # create the collector driver-side (so the driver owns its
        # lifetime) and zero it: metrics are per-job, not cumulative
        from dataclasses import replace

        from ..state.metrics import reset_metrics, wrap_class_with_metrics

        reset_metrics()
        sniff = wrap_with_metrics("sniff", sniff)
        # every stage reports (A1-A4); the Captioner additionally emits the
        # caption-merge count (A5) via cfg.emit_metrics
        extractor_cls = wrap_class_with_metrics("extract", DocumentExtractor)
        captioner_cls = wrap_class_with_metrics("caption", Captioner)
        cfg = replace(cfg, emit_metrics=True)
    ds = pages_ds.map_batches(sniff, batch_format="pyarrow", batch_size=cfg.html_batch_size)
    if assign is not None:
        from ..stages.partition import make_planned_assigner

        ds = ds.map_batches(make_planned_assigner(assign), batch_format="pyarrow")

    # partition ids are only meaningful relative to the assignment config:
    # stamp it on first write, refuse to resume under a different one
    fingerprint = {
        "mode": partitioning,
        "n_partitions": cfg.n_partitions,
        "outlier_bytes": cfg.outlier_bytes,
        "n_outlier_partitions": cfg.n_outlier_partitions,
    }
    if out_dir:
        if resume:
            ckpt.check_partitioning_stamp(out_dir, fingerprint)
        else:
            # fresh run into an existing dir: stale manifests/part data from
            # a previous (possibly differently-partitioned) run must not
            # survive — a later resume=True would pass the stamp check yet
            # mix old partitions with new ones
            ckpt.reset_output_dir(out_dir)
        ckpt.write_partitioning_stamp(out_dir, fingerprint)
    if out_dir and resume:
        done = ckpt.completed_partitions(out_dir)
        if done:
            ds = ds.map_batches(ckpt.make_resume_filter(done), batch_format="pyarrow")

    ds = ds.map_batches(
        extractor_cls,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.layout_batch_size,
        concurrency=resolve_layout_pool(cfg),
        num_cpus=cfg.layout_num_cpus,
        **({"num_gpus": cfg.layout_num_gpus} if cfg.layout_num_gpus else {}),
    )
    if cfg.captioning_enabled:
        ds = ds.map_batches(
            captioner_cls,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.caption_batch_size,
            concurrency=cfg.caption_pool_size,
            num_cpus=cfg.caption_num_cpus,
            **({"num_gpus": cfg.caption_num_gpus} if cfg.caption_num_gpus else {}),
        )

    if out_dir:
        mode = resolve_write_mode(cfg, pages_ds)
        return ckpt.checkpointed_write(
            ds,
            out_dir,
            resume=resume,
            mode=mode,
            **({"spill_bytes": cfg.write_spill_bytes} if mode == "streaming" else {}),
        )
    if cfg.deterministic_sort:
        ds = ds.sort("url")
    return ds


def extract_from_documents(sf_dir: str, cfg: ExtractConfig | None = None):
    """Flagship over a pages table derived from {sf_dir}/documents.parquet.
    Oracle: SELECT 'https://fixtures.local/doc/' || doc_id AS url, text AS
    extracted_text FROM documents — extraction must recover the ground
    truth byte-identically through the full boilerplate shell."""
    pages = pages_from_documents(sf_dir)
    return extract_pipeline(pages, cfg=cfg)


def extract_resume_equivalence(sf_dir: str):
    """North-rule resume contract under the VALUE oracle (VERDICT r2 #6 —
    checkpointed_write/resume was pytest-locked only): run the
    checkpointed flagship, crash-simulate by deleting HALF the partition
    manifests (part data left on disk; a manifest-less partition is
    incomplete by definition), resume, deep-verify every manifest's
    content digest against the rewritten parquet, and return the
    read-back corpus. A resume that drops, duplicates, or re-orders rows
    fails the row-count/value-hash against the plain ground-truth oracle
    (same SQL as extract_roundtrip)."""
    import glob
    import os
    import shutil
    import tempfile

    import pandas as pd

    from ..state import checkpoint as ckpt

    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    out_dir = tempfile.mkdtemp(prefix="paddle_resume_eq_")
    try:
        extract_pipeline(
            pages_from_documents(sf_dir), cfg=cfg, out_dir=out_dir, resume=False
        ).materialize()
        manifests = sorted(
            glob.glob(os.path.join(out_dir, ckpt.MANIFEST_DIR, "partition-*.json"))
        )
        if len(manifests) < 2:
            raise RuntimeError(
                f"resume-equivalence needs >=2 partitions to delete half, got "
                f"{len(manifests)} — partitioning config changed?"
            )
        for m in manifests[::2]:
            os.remove(m)
        extract_pipeline(
            pages_from_documents(sf_dir), cfg=cfg, out_dir=out_dir, resume=True
        ).materialize()
        ok, bad = ckpt.verify_output(out_dir)
        if bad:
            raise RuntimeError(f"resume left corrupt partitions: {bad}")
        out = ckpt.read_output(out_dir).to_pandas()[["url", "extracted_text"]]
        return out.sort_values("url").reset_index(drop=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def extract_synth(n: int, seed: int = 42, cfg: ExtractConfig | None = None, **kw):
    """Flagship over the full-grammar synthetic pages table; returns
    (result_ds, expected url->text map)."""
    pages, expected = synth_pages(n, seed, **kw)
    return extract_pipeline(pages, cfg=cfg), expected
