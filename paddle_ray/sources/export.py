"""Output exporters beyond the canonical checkpointed Parquet.

- ``export_doc_tree`` ≙ the reference's client-side writer (S6,
  `client/client.py:32-45` + `client/testScript.py:120-206`): one directory
  per document with ``doc.md``; an index.md listing docs in url order.
- ``write_csv`` / ``write_jsonl`` ≙ the experiment CSV sink (S7,
  `imageCaptioningExperiments/blip/parse_caption.py:49-53`), as thin
  Ray-native sinks.

All exporters consume the slim extracted projection (never the html
payload column) and write deterministically (url-sorted)."""

from __future__ import annotations

import os
import re

_SAFE = re.compile(r"[^A-Za-z0-9._-]+")


def _slug(url: str) -> str:
    """Filesystem-safe, COLLISION-FREE directory name: readable prefix +
    a crc32 of the exact url — distinct urls that sanitize/truncate to the
    same prefix must not overwrite each other's exports."""
    import zlib

    return f"{_SAFE.sub('_', url)[:140]}-{zlib.crc32(url.encode('utf-8')):08x}"


def export_doc_tree(ds, out_dir: str, limit: int | None = None) -> int:
    """Write one dir per document: <slug>/doc.md (markdown) + meta.txt +
    extracted image payloads next to doc.md under their markdown ref names
    (≙ the reference client writing markdown.images beside the document,
    client/testScript.py:160-190). Returns the number of documents written.
    Driver-side writer over an iter_batches stream (no full
    materialization); use only for human inspection/small exports — the
    scale path is checkpointed parquet."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    seen_urls: set[str] = set()
    index: list[str] = []
    cols = ["url", "markdown", "extracted_text", "content_hash"]
    has_images = "images" in ds.schema().names
    if has_images:
        cols.append("images")
    for batch in ds.select_columns(cols).iter_batches(batch_format="pyarrow"):
        imgs_col = batch["images"].to_pylist() if has_images else [None] * len(batch)
        for url, md, text, h, imgs in zip(
            batch["url"].to_pylist(),
            batch["markdown"].to_pylist(),
            batch["extracted_text"].to_pylist(),
            batch["content_hash"].to_pylist(),
            imgs_col,
        ):
            if url in seen_urls:
                # duplicate url rows (e.g. un-deduped extraction output)
                # would silently overwrite the first tree and over-report
                # the written count — first wins, count stays accurate
                continue
            seen_urls.add(url)
            d = os.path.join(out_dir, _slug(url))
            os.makedirs(d, exist_ok=True)
            with open(os.path.join(d, "doc.md"), "w", encoding="utf-8") as f:
                f.write(md or "")
            with open(os.path.join(d, "doc.txt"), "w", encoding="utf-8") as f:
                f.write(text or "")
            with open(os.path.join(d, "meta.txt"), "w", encoding="utf-8") as f:
                f.write(f"url: {url}\ncontent_hash: {h}\n")
            imgs_d = dict(imgs or {})
            if imgs_d:
                # payloads live under images/ (never beside doc.md — a ref
                # named "doc.md" must not clobber the document) and carry a
                # crc of the ORIGINAL ref name, so distinct refs that
                # sanitize identically cannot overwrite each other
                import zlib

                img_dir = os.path.join(d, "images")
                os.makedirs(img_dir, exist_ok=True)
                for name, payload in imgs_d.items():
                    stem = _SAFE.sub("_", name)[:140]
                    safe = f"{zlib.crc32(name.encode('utf-8')):08x}-{stem}"
                    with open(os.path.join(img_dir, safe), "wb") as f:
                        f.write(payload or b"")
            index.append(f"- [{url}]({_slug(url)}/doc.md)")
            n += 1
            if limit is not None and n >= limit:
                break
        if limit is not None and n >= limit:
            break
    with open(os.path.join(out_dir, "index.md"), "w", encoding="utf-8") as f:
        f.write("\n".join(sorted(index)) + "\n")
    return n


def write_csv(ds, out_dir: str) -> None:
    """Distributed CSV sink (one file per block)."""
    ds.write_csv(out_dir)


def write_jsonl(ds, out_dir: str) -> None:
    """Distributed JSONL sink (one file per block)."""
    ds.write_json(out_dir)


def read_jsonl(path: str):
    import ray.data as rd

    return rd.read_json(path)


def read_csv(path: str):
    import ray.data as rd

    return rd.read_csv(path)


def write_orc(ds, out_dir: str) -> None:
    """Distributed ORC sink (one file per block; Ray 2.49 has no native
    ORC sink, so this is a map_batches writer over pyarrow.orc — each
    task writes its own file, no driver materialization)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.orc as orc

    def write_block(batch: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"block-{uuid.uuid4().hex}.orc")
        orc.write_table(batch, path)
        return pa.table({"path": pa.array([path]), "rows": pa.array([batch.num_rows])})

    # consume the manifest (small: one row per block) to drive the write
    ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).materialize()


def read_orc(path: str):
    """Distributed ORC source: one read task per file (the file list is
    driver-side but #files-sized, never row-sized)."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.orc as orc
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.orc")))
    if not files:
        raise FileNotFoundError(f"no .orc files under {path}")

    def load(batch: pa.Table) -> pa.Table:
        return pa.concat_tables([orc.read_table(p) for p in batch["item"].to_pylist()])

    return rd.from_items(files).map_batches(load, batch_format="pyarrow", batch_size=1)


def write_arrow_ipc(ds, out_dir: str) -> None:
    """Distributed Arrow IPC (Feather v2) sink — one stream file per
    block via map_batches (Ray 2.49 has no IPC sink). IPC is the
    ZERO-COPY interchange format: the on-disk layout IS the in-memory
    Arrow layout, so a reader memory-maps blocks without decode — the
    format a multi-stage 100 TB pipeline uses for intermediate spills
    when parquet's encode/decode tax outweighs its compression."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.ipc as ipc

    def write_block(batch: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"block-{uuid.uuid4().hex}.arrow")
        with ipc.new_file(path, batch.schema) as w:
            w.write_table(batch)
        return pa.table({"path": pa.array([path]), "rows": pa.array([batch.num_rows])})

    ds.map_batches(write_block, batch_format="pyarrow", batch_size=None).materialize()


def read_arrow_ipc(path: str):
    """Distributed Arrow IPC source: one read task per file (driver sees
    only the #files-sized listing); memory_map=True so each task reads
    zero-copy."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.ipc as ipc
    import ray.data as rd

    files = sorted(glob.glob(os.path.join(path, "*.arrow")))
    if not files:
        raise FileNotFoundError(f"no .arrow files under {path}")

    def load(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch["item"].to_pylist():
            with ipc.open_file(pa.memory_map(p, "r")) as r:
                out.append(r.read_all())
        return pa.concat_tables(out)

    return rd.from_items(files).map_batches(load, batch_format="pyarrow", batch_size=1)
