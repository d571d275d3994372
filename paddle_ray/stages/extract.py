"""DocumentExtractor — the flagship actor-pool map_batches stage.

Ray-Data analogue of the reference's per-instance request loop
(`model.py:374-618`): one actor ≙ one Triton instance process (weights
loaded once in ``__init__`` ≙ `model.py:240-244` pipeline init; the
reference runs ``instance_group count: 6`` such processes,
`config_gpu_paddlex.pbtxt:18-23`), one batch ≙ a set of documents, and
per document the content_type dispatch:

- ``html``  -> stdlib DOM + two-pass boilerplate extraction
  (functions/boilerplate.py) — stateless math, colocated here so a single
  pass over the input handles both payload kinds without branching the
  Dataset (branching would re-read the 100 TB input once per branch).
- ``pdf``/``image`` -> the mock layout model: iterate pages
  (≙ `_iterate_pdf_pages` `model.py:300-337`), cap at
  ``cfg.max_pages_per_doc`` (≙ `_HARD_MAX_NUM_INPUT_IMGS` `model.py:35`),
  run block detection per page (≙ `self.pipeline([img])` `model.py:469`),
  assemble pages with ``=== PAGE N ===`` separators (the reference's
  client-side contract `client/testScript.py:138-158`, moved engine-side).

Failures never drop rows: a per-document try/except emits an ``error``
column (≙ the 422 envelope path `model.py:569-589`).

Output columns (EXTRACTED_SCHEMA + error): url, warc_ts, lang,
extracted_text, blocks, markdown, n_blocks, n_bytes_in, content_hash,
partition_id, error. The MB-scale ``html`` payload column is DROPPED here,
before any shuffle.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from ..core.config import ExtractConfig
from ..core.schema import BLOCK_TYPE
from ..functions.bbox import _INT32_MAX, box_key_name
from ..functions.boilerplate import extract_document


class MockLayoutModel:
    """Deterministic in-sandbox stand-in for the PP-StructureV3 pipeline.

    Real model shape without GPUs: genuine one-time init cost (builds a
    64k-entry "weight" table) and per-page batched "inference" that parses
    the pseudo-PDF block payload (sources/pages.py format) — so the actor
    pool exercises the same execution pattern (init amortization, batch
    calls) as a real OCR model.
    """

    def __init__(self, seed: int = 42):
        rng = np.random.default_rng(seed)
        self.weights = rng.standard_normal(65536).astype(np.float32)  # init cost

    def iterate_pages(self, payload: bytes, max_pages: int):
        """payload -> [(page_index, page_blocks_spec)] (≙ model.py:300-337)."""
        try:
            body = payload.split(b"\n", 1)[1]
            doc = json.loads(body)
            pages = doc.get("pages", [])
        except Exception:
            pages = []
        return list(enumerate(pages[:max_pages]))

    def render_image(self, bbox: list[int], max_out: int = 2000) -> tuple[bytes, int, int]:
        """Deterministic extracted-image payload for an image block
        (≙ the per-page image crops the reference ships in markdown.images,
        model.py:536-552). Applies the postprocess size cap — output dims
        scaled so max(w, h) <= max_out (≙ app_common.postprocess_images
        max_img_size=(2000, 2000), model.py:96-119). The payload is the
        repo's self-describing fake image container (sources/media.py) with
        a bounded pseudo-pixel body: real codecs don't ship in this
        sandbox, but the dims/cap/bytes plumbing is real and hash-stable."""
        from ..sources.media import _bytes_for, pack_media

        w = max(1, int(bbox[2]) - int(bbox[0]))
        h = max(1, int(bbox[3]) - int(bbox[1]))
        if max(w, h) > max_out:
            scale = max_out / max(w, h)
            w = max(1, round(w * scale))
            h = max(1, round(h * scale))
        seed = (bbox[0] * 73_856_093) ^ (bbox[1] * 19_349_663) ^ (bbox[2] * 83_492_791) ^ bbox[3]
        body = _bytes_for(seed & 0x7FFFFFFF, min(w * h * 3, 4096))
        return (
            pack_media("image", {"width": w, "height": h, "channels": 3}, body),
            w,
            h,
        )

    def detect_blocks(self, page_spec) -> list[dict]:
        """Per-page "inference": emit (label, bbox, content, path) blocks in
        reading order (top-to-bottom by bbox y1 — deterministic)."""
        blocks = []
        def _bbox4(spec) -> list[int]:
            # pad/truncate to EXACTLY 4 and clamp into [0, int32 max] — a
            # short bbox or one out-of-range/negative coordinate would
            # otherwise blow up the fixed_size_list(4) int32 Arrow
            # conversion outside the per-doc try/except and poison the
            # whole batch (never-drop-rows), and a negative value would
            # emit a box key BOX_KEY_RE (\d+ only) can never parse (same
            # clamp as functions/bbox.py::parse_bbox_from_name)
            raw = spec.get("bbox") or []
            vals = ([int(v) for v in raw[:4]] + [0, 0, 0, 0])[:4]
            return [min(max(v, 0), _INT32_MAX) for v in vals]

        # decorate-sort: one _bbox4 per spec (it ran 3x per block before)
        entries = [(_bbox4(spec), spec) for spec in page_spec]
        entries.sort(key=lambda t: (t[0][1], t[0][0]))
        for bbox, spec in entries:
            # touch the weights so inference has real compute shape
            _ = float(self.weights[(bbox[0] * 31 + bbox[1]) % len(self.weights)])
            blocks.append(
                {
                    "label": str(spec.get("label", "text")),
                    "bbox": bbox,
                    "content": str(spec.get("content", "")),
                    "path": f"page/block[{len(blocks) + 1}]",
                }
            )
        return blocks


PAGE_SEP = "=== PAGE {n} ==="


def assemble_pdf_pages(page_blocks: list[tuple[int, list[dict]]]) -> tuple[str, list[dict], str]:
    """pages -> (extracted_text, flat blocks, markdown) with page separators
    (≙ client/testScript.py:138-206). Pages are sorted by page_index."""
    parts: list[str] = []
    all_blocks: list[dict] = []
    md: list[str] = []
    for page_index, blocks in sorted(page_blocks, key=lambda t: t[0]):
        parts.append(PAGE_SEP.format(n=page_index + 1))
        md.append(f"# Page {page_index + 1}")
        for b in blocks:
            if b["content"]:
                parts.append(b["content"])
                md.append(f"# {b['content']}" if b["label"] == "title" else b["content"])
            if b["label"] == "image" and b["bbox"]:
                # markdown image ref with the bbox key (≙ markdown.images
                # keys, model.py:541) — the Captioner's probe side; ONE
                # grammar owner (functions/bbox.py::box_key_name)
                md.append(f"![{b['content']}]({box_key_name(b['bbox'])})")
            all_blocks.append(b)
    return "\n\n".join(parts), all_blocks, "\n\n".join(md)


def sha256_hex(s: str) -> str:
    return hashlib.sha256(s.encode("utf-8")).hexdigest()


_VIS_COLORS = {
    "title": "#7b3ff2",
    "text": "#1f6fd6",
    "list": "#1a9850",
    "table": "#d67c1f",
    "image": "#d62e4e",
}


def render_blocks_svg(blocks: list[dict]) -> str:
    """Deterministic SVG overlay of block bboxes (≙ the reference's
    `visualize` knob returning annotated images, model.py:515-533 — here a
    vector annotation instead of a raster, no image libs needed)."""
    if not blocks:
        return '<svg xmlns="http://www.w3.org/2000/svg" width="0" height="0"/>'
    max_x = max(b["bbox"][2] for b in blocks if b["bbox"]) if blocks else 0
    max_y = max(b["bbox"][3] for b in blocks if b["bbox"]) if blocks else 0
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{max_x}" height="{max_y}">'
    ]
    from xml.sax.saxutils import escape

    for b in blocks:
        x1, y1, x2, y2 = b["bbox"] or [0, 0, 0, 0]
        color = _VIS_COLORS.get(b["label"], "#666666")
        # labels are payload-controlled: escape or 'R&D <x>' yields
        # non-well-formed SVG and '</title>...' injects markup
        parts.append(
            f'<rect x="{x1}" y="{y1}" width="{max(0, x2 - x1)}" height="{max(0, y2 - y1)}" '
            f'fill="none" stroke="{color}" stroke-width="2"><title>{escape(b["label"])}</title></rect>'
        )
    parts.append("</svg>")
    return "".join(parts)


class DocumentExtractor:
    def __init__(self, cfg: ExtractConfig | None = None):
        self.cfg = cfg or ExtractConfig()
        self.model = MockLayoutModel()  # once per actor

    def _one(self, url: str, ctype: str, payload: bytes) -> dict:
        if ctype == "html":
            r = extract_document(payload)
            # dataInfo for the html path: one logical page, no raster dims
            # (page_dims rows are (width, height) tuples; the Arrow struct
            # column is assembled vectorized in __call__)
            r.update(images=[], num_pages=1, page_dims=[(0, 0)], doc_type="html")
            return r
        page_iter = self.model.iterate_pages(payload, self.cfg.max_pages_per_doc)
        page_blocks = [(pi, self.model.detect_blocks(spec)) for pi, spec in page_iter]
        if not page_blocks:
            raise ValueError("no pages decoded")  # ≙ zero-pages 422, model.py:583-589
        # seal/formula sub-pipelines (pipeline_config.yaml:5,7 +
        # model.py:404-406): when a recognizer is disabled — the
        # reference's prod default — its regions are not recognized, so
        # their blocks never reach the layout result
        unrecognized = set()
        if not self.cfg.use_seal_recognition:
            unrecognized.add("seal")
        if not self.cfg.use_formula_recognition:
            unrecognized.add("formula")
        if unrecognized:
            page_blocks = [
                (pi, [b for b in bl if b["label"] not in unrecognized])
                for pi, bl in page_blocks
            ]
        page_blocks.sort(key=lambda t: t[0])  # sort ONCE for assembly + dims
        text, blocks, md = assemble_pdf_pages(page_blocks)
        # dataInfo (model.py:591-606): per-page dims = rendered extent
        page_dims = [
            (
                max((b["bbox"][2] for b in bl), default=0),
                max((b["bbox"][3] for b in bl), default=0),
            )
            for _, bl in page_blocks
        ]
        # extracted-image payloads keyed by the markdown ref (model.py:541)
        images = []
        if self.cfg.carry_images:
            for b in blocks:
                if b["label"] == "image" and b["bbox"]:
                    img, _, _ = self.model.render_image(b["bbox"], self.cfg.max_output_img_size)
                    images.append((box_key_name(b["bbox"]), img))
        return {
            "extracted_text": text,
            "blocks": blocks,
            "markdown": md,
            "n_blocks": len(blocks),
            "images": images,
            "num_pages": len(page_blocks),
            "page_dims": page_dims,
            "doc_type": ctype,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..core.schema import PAGE_DIM_TYPE

        urls = batch["url"].to_pylist()
        ctypes = batch["content_type"].to_pylist()
        payloads = batch["html"].to_pylist()
        texts, blocks_col, mds, n_blocks, hashes, errors = [], [], [], [], [], []
        num_pages_col, doc_types = [], []
        # images / page_dims accumulate FLAT (values + per-row counts) so the
        # Arrow map / list<struct> columns assemble from typed arrays +
        # offsets, not per-row Python object trees (that conversion cost
        # ~3% of the whole extraction kernel)
        img_counts, img_keys, img_vals = [], [], []
        pd_counts, pd_w, pd_h = [], [], []
        for url, ctype, payload in zip(urls, ctypes, payloads):
            try:
                r = self._one(url, ctype, payload or b"")
                texts.append(r["extracted_text"])
                blocks_col.append(r["blocks"])
                mds.append(r["markdown"])
                n_blocks.append(r["n_blocks"])
                hashes.append(sha256_hex(r["extracted_text"]))
                imgs = r["images"]
                img_counts.append(len(imgs))
                for k, v in imgs:
                    img_keys.append(k)
                    img_vals.append(v)
                dims = r["page_dims"]
                pd_counts.append(len(dims))
                for w, h in dims:
                    pd_w.append(w)
                    pd_h.append(h)
                num_pages_col.append(r["num_pages"])
                doc_types.append(r["doc_type"])
                errors.append(None)
            except Exception as e:  # never drop a row (≙ 422 path)
                texts.append("")
                blocks_col.append([])
                mds.append("")
                n_blocks.append(0)
                hashes.append(sha256_hex(""))
                img_counts.append(0)
                pd_counts.append(0)
                num_pages_col.append(0)
                doc_types.append(ctype)
                errors.append(f"{type(e).__name__}: {e}")
        img_offsets = pa.array(np.concatenate([[0], np.cumsum(img_counts)]).astype(np.int32))
        images_arr = pa.MapArray.from_arrays(
            img_offsets, pa.array(img_keys, pa.string()), pa.array(img_vals, pa.binary())
        ).cast(pa.map_(pa.string(), pa.binary()))
        pd_offsets = pa.array(np.concatenate([[0], np.cumsum(pd_counts)]).astype(np.int32))
        dims_struct = pa.StructArray.from_arrays(
            [pa.array(pd_w, pa.int32()), pa.array(pd_h, pa.int32())],
            fields=list(PAGE_DIM_TYPE),
        )
        page_dims_arr = pa.ListArray.from_arrays(pd_offsets, dims_struct).cast(
            pa.list_(PAGE_DIM_TYPE)
        )
        cols = {
            "url": batch["url"],
            "warc_ts": batch["warc_ts"],
            "lang": batch["lang"],
            "extracted_text": pa.array(texts, pa.string()),
            "blocks": pa.array(blocks_col, pa.list_(BLOCK_TYPE)),
            "markdown": pa.array(mds, pa.string()),
            "images": images_arr,
            "num_pages": pa.array(num_pages_col, pa.int32()),
            "page_dims": page_dims_arr,
            "doc_type": pa.array(doc_types, pa.string()),
            "n_blocks": pa.array(n_blocks, pa.int32()),
            "n_bytes_in": batch["n_bytes_in"],
            "content_hash": pa.array(hashes, pa.string()),
            "partition_id": batch["partition_id"],
            "error": pa.array(errors, pa.string()),
        }
        if self.cfg.visualize:  # ≙ request `visualize` knob (model.py:515-533)
            cols["visualization"] = pa.array(
                [render_blocks_svg(b) for b in blocks_col], pa.string()
            )
        return pa.table(cols)
