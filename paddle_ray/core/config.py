"""ExtractConfig — the engine's knob surface.

Replaces the reference's three config layers (pipeline YAML, ~30 per-request
JSON knobs `model.py:400-431`, env-var overrides `model.py:36-42,125-134`)
with one dataclass threaded through stage constructors. Precedence:
defaults < from_env() < explicit kwargs — mirroring the reference's
defaults < file < env < request order (SURVEY.md §2.10).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace


def _env_bool(name: str, default: bool) -> bool:
    # reference `_read_bool_env` semantics (model.py:63-73)
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


def _env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    return int(v) if v else default


@dataclass(frozen=True)
class ExtractConfig:
    # --- page limits (≙ max_num_input_imgs default 10, hard cap 200; model.py:29,35)
    max_pages_per_doc: int = 200
    # --- caption enrichment (≙ IMAGE_CAPTIONING_ENABLED, caption_config.yaml)
    captioning_enabled: bool = True
    caption_max_length: int = 512        # layout_captioning.py:169 truncation
    min_caption_w: int = 100             # caption_config.yaml:8-11 size gate
    min_caption_h: int = 100
    min_caption_area: int = 10_000
    # conditional captioning (M12+M14): feed the image's relevant text as
    # the caption prompt (`bbox_text_matcher.py:85-125` find_relevant_text,
    # prompt gate/truncate `blip_conditional_caption_e2e.py:144-147`)
    conditional_captioning: bool = True
    caption_context_min_len: int = 10    # len > 10 gate before using context
    caption_context_max: int = 200       # context truncated to 200 chars
    # captioner variant from stages.caption.CAPTION_MODELS ("blip" | "git",
    # ≙ caption_config.yaml provider swap / OFA-GIT experiments T5)
    caption_model: str = "blip"
    # --- actor-pool sizing (≙ instance_group count 6 layout / 4 blip,
    #     dynamic batch 8/16; config_gpu_paddlex.pbtxt:20, config_gpu_blip.pbtxt:21-31)
    # min pool size 1: a min of 2+ can deadlock small CPU budgets (both
    # pools reserve every CPU and the read/sort stages starve); pinned
    # pools (min==max) must likewise leave >=1 CPU unreserved on the node
    # or ReadParquet/shuffle tasks never schedule (bench._flagship_cfg).
    # None (default) sizes the max to 3/4 of the session's CPUs at
    # pipeline-build time (extract.py::resolve_layout_pool): the fixed
    # (1, 6) default left a 32-CPU host 2.5x slower than the same host
    # with a right-sized pool (measured 8.1s -> 3.3s at sf0.1), while 6
    # remains the floor so small hosts/test sessions are unchanged.
    layout_pool_size: tuple | None = None
    layout_batch_size: int = 16
    # --- per-actor resource requests (≙ instance_group KIND_GPU,
    # config_gpu_paddlex.pbtxt:18-23 / config_gpu_blip.pbtxt): the sandbox
    # runs CPU-only mocks, but a real layout/caption model drops in by
    # setting num_gpus (fractional allowed — e.g. 0.5 packs two actors per
    # device) with no pipeline surgery. 0.0 means "don't request GPUs"
    # (the kwarg is omitted entirely so CPU-only clusters schedule).
    layout_num_cpus: float = 1.0
    layout_num_gpus: float = 0.0
    # caption actors reserve HALF a CPU by default: the captioner does ~5%
    # of the flagship's cpu-work, and integer-CPU actors pinned N/4 of a
    # 4-CPU session for that 5% (the r3 480k decomposition's cause 1 of
    # the 0.745 scaling read) — fractional reservation returns the slack
    # to the extractor pool / task operators at every session size
    caption_num_cpus: float = 0.5
    caption_num_gpus: float = 0.0
    # caption pool mirrors the reference's 4 instances but may scale wider
    # (the mock captioner is CPU-cheap; a fixed 4 bottlenecked the stream);
    # batch > the reference's dynamic-batch 16 because one __call__ handles
    # a whole request batch, not one GPU inference
    caption_pool_size: tuple = (1, 8)
    caption_batch_size: int = 128
    # --- checkpointed write (state/checkpoint.py): "streaming" overlaps
    # the per-partition sort+write with extraction via appender actors;
    # "barrier" is the original groupby(partition_id) all-to-all;
    # "auto" (default) picks by input size — the appender pool costs a
    # fixed ~1.5-2.5 s (N/2 actor spin-ups + per-slice acks) that a
    # seconds-scale job never amortizes (measured at sf0.1/32 cpus:
    # barrier 3.4 s vs streaming 4.4-5.9 s), while at 480k docs the
    # overlap is worth ~19 s at 16 cpus (BASELINE.md §480k r4). Both
    # modes are byte-identical by contract (test_pipeline).
    write_mode: str = "auto"
    write_streaming_min_rows: int = 50_000
    write_spill_bytes: int = 128 << 20
    # --- seal / formula recognition sub-pipelines (≙ use_seal_recognition
    # / use_formula_recognition, pipeline_config.yaml:5,7 — the reference
    # ships them DISABLED in prod; per-request knobs model.py:404-406 +
    # sub-pipeline configs pipeline_config.yaml:1209-1429). Disabled =>
    # seal/formula regions are NOT recognized: their blocks are dropped
    # from the layout result, exactly as the reference's pipeline skips
    # those sub-models. Enabled => emitted as typed blocks in reading
    # order like any other label.
    use_seal_recognition: bool = False
    use_formula_recognition: bool = False
    # --- stateless stage batching
    html_batch_size: int = 256
    # --- skew handling
    n_partitions: int = 64
    outlier_bytes: int = 1 << 20         # rows larger than this get singleton partitions
    n_outlier_partitions: int = 16
    # --- output
    deterministic_sort: bool = True
    visualize: bool = False              # ≙ request `visualize` knob (model.py:515-533)
    # extracted-image payloads (≙ markdown.images map model.py:536-552);
    # postprocess cap ≙ max_output_img_size (2000, 2000) (model.py:96-119)
    carry_images: bool = True
    max_output_img_size: int = 2000
    # --- metrics plane (set by extract_pipeline(with_metrics=True)): actor
    # stages report per-partition counters incl. caption merges (A5)
    emit_metrics: bool = False

    @staticmethod
    def from_env(**overrides) -> "ExtractConfig":
        cfg = ExtractConfig(
            captioning_enabled=_env_bool("IMAGE_CAPTIONING_ENABLED", True),
            max_pages_per_doc=min(_env_int("MAX_NUM_INPUT_IMGS", 200), 200),
        )
        return replace(cfg, **overrides) if overrides else cfg
