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

import re

import numpy as np
import pyarrow as pa

from ..core.config import ExtractConfig
from ..core.schema import BLOCK_TYPE
from ..functions.bbox import normalize_bbox_key, should_caption

_MD_IMG_KEY = re.compile(r"img_in_(?:image|table|chart)_box_(\d+)_(\d+)_(\d+)_(\d+)")

_CAPTION_VOCAB = (
    "a photo of diagram chart figure showing table screenshot rendering of the "
    "document page region detail view illustration"
).split()


class MockCaptionModel:
    """Deterministic BLIP stand-in: seeded embedding table as 'weights',
    caption = words picked by hashing the bbox key through the weights."""

    def __init__(self, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.weights = rng.integers(0, len(_CAPTION_VOCAB), size=32768).astype(np.int32)

    def generate(self, keys: list[str], max_length: int) -> list[str]:
        out = []
        for k in keys:
            h = sum((i + 1) * ord(c) for i, c in enumerate(k)) & 0x7FFF
            words = [_CAPTION_VOCAB[int(self.weights[(h + j) % len(self.weights)])] for j in range(6)]
            out.append(" ".join(words)[:max_length])
        return out


class Captioner:
    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()
        self.model = MockCaptionModel()  # once per actor

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.cfg.captioning_enabled:
            return batch
        import pyarrow.compute as pc

        # fast path: only rows whose markdown mentions an image key can
        # receive captions — leave every other row zero-copy untouched
        # (round-tripping the nested `blocks` column through Python is the
        # expensive part of this stage)
        mask = pc.fill_null(pc.match_substring(batch["markdown"], "img_in_"), False)
        mask_np = mask.to_numpy(zero_copy_only=False)
        if not mask_np.any():
            return batch
        idx = np.flatnonzero(mask_np)
        affected = batch.filter(mask)
        blocks_col = affected["blocks"].to_pylist()
        mds = affected["markdown"].to_pylist()

        # collect caption requests across the whole batch (dynamic batching
        # ≙ config_gpu_blip.pbtxt:27-31), remembering (row, block) targets
        targets: list[tuple[int, int]] = []
        keys: list[str] = []
        for ri, (blocks, md) in enumerate(zip(blocks_col, mds)):
            if not blocks:
                continue
            by_bbox = {}  # build side: image blocks passing the size gate
            for bi, b in enumerate(blocks):
                if b["label"] == "image" and should_caption(b["bbox"]):
                    by_bbox[normalize_bbox_key(b["bbox"])] = bi
            if not by_bbox:
                continue
            for m in _MD_IMG_KEY.finditer(md or ""):  # probe side
                key = "_".join(m.groups())
                bi = by_bbox.pop(key, None)
                if bi is not None:
                    targets.append((ri, bi))
                    keys.append(key)

        if not keys:
            return batch
        captions = self.model.generate(keys, self.cfg.caption_max_length)
        for (ri, bi), cap in zip(targets, captions):  # merge (M15)
            blk = blocks_col[ri][bi]
            blk["content"] = f"{blk['content']} {cap}".strip()

        # scatter the patched rows back in original order: concat the
        # untouched and patched row sets, then restore positions by take()
        affected = affected.set_column(
            affected.schema.get_field_index("blocks"),
            "blocks",
            pa.array(blocks_col, pa.list_(BLOCK_TYPE)),
        )
        untouched = batch.filter(pc.invert(mask))
        merged = pa.concat_tables([untouched, affected], promote_options="default")
        order = np.concatenate([np.flatnonzero(~mask_np), idx])
        inv = np.argsort(order, kind="stable")
        return merged.take(pa.array(inv))
