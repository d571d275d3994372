"""Captioner — enrichment actor pool + the in-row bbox equi-join.

Replaces the reference's cross-container caption RPC
(`layout_captioning.py:61-172` TritonCaptionClient + thread-per-image
fan-out `:309-317`) with a pure dataflow stage: the BLIP model becomes a
deterministic mock loaded once per actor (≙ `blip-caption/1/model.py:99-145`),
the per-image threads become batched calls, and the shared-dict caption
staging (`_pending_caption`, `:305,322-343`) becomes an in-place block
update inside the same batch — no shared mutable state.

The join (J1, the reference's only join — `layout_captioning.py:236-265`):
build side = image blocks keyed by normalized bbox (``"x1_y1_x2_y2"``),
probe side = ``img_in_image_box_*`` keys found in the row's markdown.
Both sides live in the same row, so this is an **in-row hash join** inside
``map_batches`` — no shuffle. The caption size gate (w,h >= 100, area >=
10 000 — `caption_config.yaml:8-11`) filters the build side; captions are
truncated to 512 chars (`layout_captioning.py:169`) and appended to
``block.content`` with a space join (M15, `:322-343`).
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa

from ..core.config import ExtractConfig
from ..core.schema import BLOCK_TYPE

# the bbox key grammar has ONE owner — functions/bbox.py
from ..functions.bbox import BOX_KEY_RE as _MD_IMG_KEY
from ..functions.bbox import (
    DEFAULT_CAPTION_PROMPT,
    build_caption_prompt,
    clean_caption_context,
    find_caption_context,
)

_CAPTION_VOCAB = (
    "a photo of diagram chart figure showing table screenshot rendering of the "
    "document page region detail view illustration"
).split()


class MockCaptionModel:
    """Deterministic BLIP stand-in: seeded embedding table as 'weights',
    caption = words picked by hashing (bbox key, prompt) through the
    weights — a conditional prompt changes the caption, mirroring BLIP's
    conditional generation (`blip_conditional_caption_e2e.py:176-190`)."""

    def __init__(self, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.weights = rng.integers(0, len(_CAPTION_VOCAB), size=32768).astype(np.int32)

    def generate(self, keys: list[str], prompts: list[str], max_length: int) -> list[str]:
        out = []
        for k, p in zip(keys, prompts):
            h = sum((i + 1) * ord(c) for i, c in enumerate(k)) & 0x7FFF
            if p != DEFAULT_CAPTION_PROMPT:
                # conditional path: the prompt text steers generation
                h ^= sum((i + 3) * ord(c) for i, c in enumerate(p)) & 0x7FFF
            words = [_CAPTION_VOCAB[int(self.weights[(h + j) % len(self.weights)])] for j in range(6)]
            out.append(" ".join(words)[:max_length])
        return out


class GitStyleCaptionModel:
    """Second captioner variant behind the same interface (≙ the reference's
    OFA / microsoft-git experiment models swapped behind one JSON contract,
    `exp1.py:29-31`, `blip/git_parse_caption.py:12-15`, caption_config.yaml
    provider knob). Different 'architecture': an affine hash chain over a
    differently-seeded table, captions prefixed in the GIT textcaps style."""

    def __init__(self, seed: int = 23):
        rng = np.random.default_rng(seed)
        self.weights = rng.integers(0, len(_CAPTION_VOCAB), size=16384).astype(np.int32)

    def generate(self, keys: list[str], prompts: list[str], max_length: int) -> list[str]:
        out = []
        for k, p in zip(keys, prompts):
            h = 1469598103934665603
            for c in k + "\x1f" + (p if p != DEFAULT_CAPTION_PROMPT else ""):
                h = ((h ^ ord(c)) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
            words = [
                _CAPTION_VOCAB[int(self.weights[(h >> (7 * j)) % len(self.weights)])]
                for j in range(5)
            ]
            out.append(("an image of " + " ".join(words))[:max_length])
        return out


# stage registry (≙ caption_config.yaml provider/model selection): any
# class with generate(keys, prompts, max_length) -> list[str] plugs in
CAPTION_MODELS = {
    "blip": MockCaptionModel,
    "git": GitStyleCaptionModel,
}


class Captioner:
    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()
        try:
            model_cls = CAPTION_MODELS[self.cfg.caption_model]
        except KeyError:
            raise ValueError(
                f"unknown caption_model {self.cfg.caption_model!r}; "
                f"registered: {sorted(CAPTION_MODELS)}"
            ) from None
        self.model = model_cls()  # once per actor
        self._metrics_actor = None

    def _report_captions(self, batch: pa.Table, rows: np.ndarray, n_by_row: np.ndarray):
        """A5 caption-merge count, attributed per partition (fire-and-forget
        to the metrics actor; never on the data path)."""
        try:
            if self._metrics_actor is None:
                import ray

                if not ray.is_initialized():
                    return  # request-surface path: must not auto-init Ray
                from ..state.metrics import get_metrics_actor

                self._metrics_actor = get_metrics_actor()
            if "partition_id" in batch.column_names:
                pids = batch["partition_id"].take(pa.array(rows)).to_pylist()
            else:
                pids = [-1] * len(rows)
            from ..state.metrics import batch_report_key

            key = batch_report_key("caption", batch)
            agg: dict[int, int] = {}
            for pid, n in zip(pids, n_by_row):
                agg[int(pid)] = agg.get(int(pid), 0) + int(n)
            for pid, n in agg.items():
                # content key dedups re-reports from at-least-once retries
                self._metrics_actor.report_captions.remote("caption", pid, n, key=key)
        except Exception:
            pass  # metrics must never fail the data path

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.cfg.captioning_enabled:
            return batch
        import pyarrow.compute as pc

        # fast path: only rows whose markdown mentions an image key can
        # receive captions — if none, the batch passes through zero-copy
        mask = pc.fill_null(pc.match_substring(batch["markdown"], "img_in_"), False)
        mask_np = mask.to_numpy(zero_copy_only=False)
        if not mask_np.any():
            return batch

        # Arrow-native build side: operate on the list<struct> FLAT child
        # arrays — the nested blocks column never round-trips to Python
        # dicts (that conversion dominated this stage's cost).
        blocks = batch["blocks"]
        if isinstance(blocks, pa.ChunkedArray):
            blocks = blocks.combine_chunks()
        if blocks.null_count:
            # rebuilding via from_arrays would silently turn null rows into
            # [] (validity is not carried); our extractor never emits null
            # blocks, so just pass such external batches through unpatched
            return batch
        if blocks.offset:
            # a zero-copy slice (offset > 0) would break the absolute-flat-
            # index bookkeeping below (combine_chunks compacts on this
            # pyarrow version, but that's version behavior, not contract)
            blocks = pa.concat_arrays([blocks])
        offsets = np.asarray(blocks.offsets)  # absolute into blocks.values
        vals = blocks.values  # raw struct child; flat indices are absolute
        labels = vals.field("label")
        bbox_fsl = vals.field("bbox")
        contents = vals.field("content")
        paths = vals.field("path")

        img_np = pc.fill_null(pc.equal(labels, pa.scalar("image")), False).to_numpy(
            zero_copy_only=False
        )
        raw = np.asarray(bbox_fsl.values, dtype=np.int64)
        start = bbox_fsl.offset * 4
        bb = raw[start : start + 4 * len(bbox_fsl)].reshape(-1, 4)
        w = bb[:, 2] - bb[:, 0]
        h = bb[:, 3] - bb[:, 1]
        gate = (w >= self.cfg.min_caption_w) & (h >= self.cfg.min_caption_h) & (
            w * h >= self.cfg.min_caption_area
        )
        cand_idx = np.flatnonzero(img_np & gate)
        # child elements outside [offsets[0], offsets[-1]) belong to no row
        # (shifted-offsets layouts are legal Arrow even at array offset 0) —
        # drop them before searchsorted maps them to row -1 / n_rows
        cand_idx = cand_idx[(cand_idx >= offsets[0]) & (cand_idx < offsets[-1])]

        if cand_idx.size == 0:
            return batch
        # group candidate flat blocks by row; last write wins on duplicate
        # bbox keys (reference dict-build semantics layout_captioning.py:249)
        rows_of_cand = np.searchsorted(offsets, cand_idx, side="right") - 1
        by_row: dict[int, dict[str, int]] = {}
        for fi, r in zip(cand_idx, rows_of_cand):
            if not mask_np[r]:
                continue
            key = f"{bb[fi, 0]}_{bb[fi, 1]}_{bb[fi, 2]}_{bb[fi, 3]}"
            by_row.setdefault(int(r), {})[key] = int(fi)
        if not by_row:
            return batch

        # probe side: markdown image keys of the affected rows only.
        # Per match, the conditional path (M12+M14) resolves the caption
        # context from the SAME row's block span — the image block's own
        # content, else the nearest text block above / overlapping it
        # (functions/bbox.py::find_caption_context) — cleaned (M13) and
        # gated/truncated into the prompt (M14).
        affected_rows = sorted(by_row)
        md_sub = batch["markdown"].take(pa.array(affected_rows)).to_pylist()
        targets: list[int] = []
        keys: list[str] = []
        prompts: list[str] = []
        tgt_rows: list[int] = []
        cond = self.cfg.conditional_captioning
        for r, md in zip(affected_rows, md_sub):
            d = by_row[r]
            lo, hi = int(offsets[r]), int(offsets[r + 1])
            row_labels = row_contents = None  # materialized lazily, once per row
            for m in _MD_IMG_KEY.finditer(md or ""):
                key = "_".join(m.groups())
                fi = d.pop(key, None)
                if fi is None:
                    continue
                targets.append(fi)
                keys.append(key)
                tgt_rows.append(r)
                if cond:
                    if row_labels is None:
                        row_labels = labels.slice(lo, hi - lo).to_pylist()
                        row_contents = contents.slice(lo, hi - lo).to_pylist()
                    ctx = find_caption_context(
                        fi - lo, 0, hi - lo, row_labels, bb[lo:hi], row_contents
                    )
                    prompts.append(
                        build_caption_prompt(
                            clean_caption_context(ctx),
                            self.cfg.caption_context_min_len,
                            self.cfg.caption_context_max,
                        )
                    )
                else:
                    prompts.append(DEFAULT_CAPTION_PROMPT)
        if not keys:
            return batch

        captions = self.model.generate(keys, prompts, self.cfg.caption_max_length)
        if self.cfg.emit_metrics:
            u_rows, n_by_row = np.unique(np.asarray(tgt_rows, dtype=np.int64), return_counts=True)
            self._report_captions(batch, u_rows, n_by_row)
        # merge (M15): patch ONLY the affected flat-content slots via
        # replace_with_mask — cost proportional to captions applied, not to
        # batch size (a full to_pylist of every block content re-created
        # the Python round-trip this stage exists to avoid)
        t_np = np.asarray(targets, dtype=np.int64)
        order = np.argsort(t_np)
        t_sorted = t_np[order]
        cur = contents.take(pa.array(t_sorted)).to_pylist()
        repl = pa.array(
            [f"{(c or '')} {captions[i]}".strip() for c, i in zip(cur, order)],
            pa.string(),
        )
        mask_flat = np.zeros(len(contents), dtype=bool)
        mask_flat[t_sorted] = True
        new_contents = pc.replace_with_mask(contents, pa.array(mask_flat), repl)
        new_vals = pa.StructArray.from_arrays(
            [labels, bbox_fsl, new_contents, paths],
            fields=list(BLOCK_TYPE),
        )
        new_blocks = pa.ListArray.from_arrays(blocks.offsets, new_vals)
        return batch.set_column(
            batch.schema.get_field_index("blocks"), "blocks", new_blocks
        )
