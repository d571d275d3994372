"""Extracted-image payloads (VERDICT r1 #4) + dataInfo parity (#8).

Reference: per-page records carry markdown.images map<path -> b64> plus
outputImages/inputImage (`model.py:536-552`), postprocessed to <= 2000 px
(`model.py:96-119`); the client writes them next to doc.md
(`client/testScript.py:160-190`); the document envelope reports
dataInfo {numPages, pages: [{width, height}], type} (`model.py:591-606`).
"""

import hashlib
import json
import os

import pyarrow as pa

from paddle_ray.core.config import ExtractConfig
from paddle_ray.sources.media import unpack_media
from paddle_ray.stages.extract import MockLayoutModel

# golden payload hashes: the image payload for a given bbox/cap is part of
# the engine's contract — regenerating it must stay byte-stable
GOLDEN_BBOXES = {
    (60, 470, 900, 870): "fcf9c4d952949be1",
    (0, 0, 4000, 3000): "04b8144aaed04aed",
}


def _pdf(pages):
    return b"%PDF-\n" + json.dumps({"pages": pages}, sort_keys=True).encode()


def _extract_one(payload: bytes, cfg=None):
    from paddle_ray.api import extract_document_request

    return extract_document_request(payload, cfg=cfg)


def test_render_image_cap_and_determinism():
    m = MockLayoutModel()
    # small image: dims preserved
    p1, w1, h1 = m.render_image([60, 470, 900, 870])
    kind, hdr, _ = unpack_media(p1)
    assert kind == "image" and (w1, h1) == (840, 400) and hdr["width"] == 840
    # oversized image: capped so max dim == 2000, aspect preserved
    p2, w2, h2 = m.render_image([0, 0, 4000, 3000])
    assert (w2, h2) == (2000, 1500)
    # byte-stable across instances (golden)
    m2 = MockLayoutModel()
    assert m2.render_image([60, 470, 900, 870])[0] == p1
    for bbox, want in GOLDEN_BBOXES.items():
        got = hashlib.sha256(m.render_image(list(bbox))[0]).hexdigest()[:16]
        assert got == want, (bbox, got)


def test_pdf_extraction_carries_images_and_datainfo():
    pages = [
        [
            {"label": "title", "bbox": [50, 100, 1100, 250], "content": "t"},
            {"label": "image", "bbox": [60, 470, 900, 870], "content": ""},
        ],
        [{"label": "text", "bbox": [50, 100, 1100, 250], "content": "p2"}],
    ]
    resp = _extract_one(_pdf(pages))
    assert resp["errorCode"] == 0
    r = resp["result"]
    assert r["dataInfo"]["numPages"] == 2
    assert r["dataInfo"]["type"] == "pdf"
    assert r["dataInfo"]["pages"] == [
        {"width": 1100, "height": 870},
        {"width": 1100, "height": 250},
    ]
    assert list(r["images"]) == ["img_in_image_box_60_470_900_870.jpg"]
    kind, hdr, _ = unpack_media(r["images"]["img_in_image_box_60_470_900_870.jpg"])
    assert kind == "image" and hdr == {"width": 840, "height": 400, "channels": 3}
    # carry_images=False drops payloads but keeps the markdown refs
    off = _extract_one(_pdf(pages), cfg=ExtractConfig(carry_images=False))
    assert off["result"]["images"] == {}
    assert "img_in_image_box_60_470_900_870.jpg" in off["result"]["markdown"]


def test_html_datainfo_shape():
    resp = _extract_one(b"<main><p>hello world text</p></main>")
    r = resp["result"]
    assert r["dataInfo"] == {
        "numPages": 1,
        "pages": [{"width": 0, "height": 0}],
        "type": "html",
    }
    assert r["images"] == {}


def test_pipeline_images_roundtrip_parquet_and_export(ray_session, tmp_path):
    """images survive the checkpointed parquet write byte-identically and
    export lands them next to doc.md."""
    import datetime

    import pyarrow.parquet as pq

    from paddle_ray.core.schema import PAGES_SCHEMA
    from paddle_ray.pipelines.extract import extract_pipeline
    from paddle_ray.sources.export import export_doc_tree
    from paddle_ray.state.checkpoint import read_output

    pages = [
        [
            {"label": "text", "bbox": [50, 100, 1100, 450], "content": "above text words"},
            {"label": "image", "bbox": [60, 470, 900, 870], "content": ""},
        ]
    ]
    t = pa.table(
        {
            "url": ["https://x/imgdoc"],
            "warc_ts": [datetime.datetime(2025, 1, 1)],
            "html": [_pdf(pages)],
            "text": [""],
            "lang": ["en"],
        },
        schema=PAGES_SCHEMA,
    )
    out = str(tmp_path / "o")
    extract_pipeline(t, out_dir=out, resume=False).materialize()
    ds = read_output(out)
    row = ds.to_pandas().iloc[0]
    imgs = dict(row.images)
    want = MockLayoutModel().render_image([60, 470, 900, 870])[0]
    assert imgs["img_in_image_box_60_470_900_870.jpg"] == want
    assert row.num_pages == 1 and row.doc_type == "pdf"

    exp = str(tmp_path / "tree")
    export_doc_tree(ds, exp)
    # payloads land under images/ with a crc-prefixed sanitized ref name
    # (collision-proof; can never clobber doc.md)
    img_files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(exp)
        for f in fs
        if "img_in_image_box" in f
    ]
    assert len(img_files) == 1
    assert os.path.basename(os.path.dirname(img_files[0])) == "images"
    assert img_files[0].endswith("-img_in_image_box_60_470_900_870.jpg")
    with open(img_files[0], "rb") as fh:
        assert fh.read() == want


def test_request_surface_applies_captioning():
    """The api envelope must match the pipeline's caption enrichment
    (review r2: extract_document_request silently skipped the Captioner,
    returning un-captioned image blocks for caption-eligible pdfs)."""
    from dataclasses import replace

    from paddle_ray.api import extract_document_request
    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.sources.pages import synth_pages

    pages, _ = synth_pages(40, pdf_every=2, outlier_every=0)
    d = pages.to_pydict()
    saw_caption = False
    for html in d["html"]:
        on = extract_document_request(html)
        if on["errorCode"] != 0 or on["result"]["dataInfo"]["type"] != "pdf":
            continue
        off = extract_document_request(
            html, cfg=ExtractConfig(captioning_enabled=False)
        )
        imgs_on = [b["content"] for b in on["result"]["blocks"] if b["label"] == "image"]
        imgs_off = [b["content"] for b in off["result"]["blocks"] if b["label"] == "image"]
        for c_on, c_off in zip(imgs_on, imgs_off):
            assert c_on.startswith(c_off)
            if len(c_on) > len(c_off):
                saw_caption = True
        if saw_caption:
            break
    assert saw_caption, "no caption-eligible pdf image found in 40 synth docs"
