"""Conditional captioning (M12+M14) tests.

Reference dataflow: per caption candidate, find the image's relevant text
(`bbox_text_matcher.py:85-125` — the image block's own content, with the
spatial predicates `:40-83` as fallback), clean it (`:127-146`), gate
len>10 + truncate 200 into the prompt (`blip_conditional_caption_e2e.py:
144-147`), and let the prompt steer generation. The golden contract here:
the caption is a deterministic function of (bbox key, context text) — same
context -> same caption, different context -> different caption.
"""

import datetime

import pyarrow as pa

from paddle_ray.core.config import ExtractConfig
from paddle_ray.core.schema import BLOCK_TYPE, PAGES_SCHEMA
from paddle_ray.functions.bbox import (
    DEFAULT_CAPTION_PROMPT,
    build_caption_prompt,
    clean_caption_context,
    find_caption_context,
)
from paddle_ray.pipelines.extract import extract_pipeline

TS = datetime.datetime(2025, 1, 1)


def _page(url: str, html: bytes) -> pa.Table:
    return pa.table(
        {"url": [url], "warc_ts": [TS], "html": [html], "text": [""], "lang": ["en"]},
        schema=PAGES_SCHEMA,
    )


def _image_caption(df, url: str) -> str:
    row = df[df.url == url].iloc[0]
    caps = [b["content"] for b in row.blocks if b["label"] == "image"]
    assert len(caps) == 1
    return caps[0]


# --- unit: M13 cleaner + M14 prompt builder -------------------------------

def test_clean_caption_context_reference_semantics():
    assert clean_caption_context("") == ""
    assert clean_caption_context("  \n ") == ""
    assert clean_caption_context('<div class="x"> <img src="a.jpg"> </div>rest') == "rest"
    assert clean_caption_context('before <img src="a.jpg"> after') == "before after"
    assert clean_caption_context("<b>bold</b>\n\n  text") == "bold text"


def test_build_caption_prompt_gate_and_truncate():
    # len <= 10 -> generic prompt (reference gate is strict >)
    assert build_caption_prompt("") == DEFAULT_CAPTION_PROMPT
    assert build_caption_prompt("exactly10c") == DEFAULT_CAPTION_PROMPT
    assert build_caption_prompt("elevenchars") == (
        "Based on this context: 'elevenchars', describe this image in detail"
    )
    long = "x" * 500
    p = build_caption_prompt(long)
    assert "x" * 200 in p and "x" * 201 not in p


# --- unit: M12 relevant-text lookup with M10/M11 fallback -----------------

def test_find_caption_context_own_content_wins():
    labels = ["text", "image"]
    bboxes = [[0, 0, 100, 50], [0, 60, 200, 260]]
    contents = ["above text", "the image's own ocr text"]
    assert find_caption_context(1, 0, 2, labels, bboxes, contents) == "the image's own ocr text"


def test_find_caption_context_above_fallback_nearest():
    # two text blocks above; nearest (smallest vertical gap) wins
    labels = ["text", "text", "image", "text"]
    bboxes = [
        [0, 0, 100, 50],      # gap 150
        [0, 100, 100, 180],   # gap 20 -> nearest
        [0, 200, 200, 400],
        [0, 420, 100, 460],   # below, not a candidate
    ]
    contents = ["far", "near", "", "under"]
    assert find_caption_context(2, 0, 4, labels, bboxes, contents) == "near"


def test_find_caption_context_overlap_fallback():
    # nothing above within gap; the overlapping block is the fallback
    labels = ["text", "image"]
    bboxes = [[0, 250, 100, 350], [0, 200, 200, 400]]  # text inside image span
    contents = ["overlapping legend", ""]
    assert find_caption_context(1, 0, 2, labels, bboxes, contents) == "overlapping legend"
    # and no candidates at all -> empty
    assert find_caption_context(1, 0, 2, ["list", "image"], bboxes, ["", ""]) == ""


# --- golden: caption depends on context (HTML path, own-alt context) ------

def test_caption_depends_on_context_html(ray_session):
    mk = (
        '<main><p>intro paragraph long enough to matter here</p>'
        '<p><img src="img_in_image_box_10_20_310_340.jpg" alt="{alt}"></p></main>'
    )
    base = extract_pipeline(
        _page("https://t/ctx-a", mk.format(alt="a revenue chart for fiscal 2025").encode())
    ).to_pandas()
    other = extract_pipeline(
        _page("https://t/ctx-b", mk.format(alt="an architecture diagram of the system").encode())
    ).to_pandas()
    again = extract_pipeline(
        _page("https://t/ctx-a2", mk.format(alt="a revenue chart for fiscal 2025").encode())
    ).to_pandas()

    cap_a = _image_caption(base, "https://t/ctx-a")
    cap_b = _image_caption(other, "https://t/ctx-b")
    cap_a2 = _image_caption(again, "https://t/ctx-a2")
    # caption = alt context + generated words; same context -> same caption
    assert cap_a != cap_b
    assert cap_a.split(" ", 7)[:7] == cap_a2.split(" ", 7)[:7]  # same generated tail
    # conditional off -> context no longer steers generation
    off = ExtractConfig(conditional_captioning=False)
    u1 = extract_pipeline(
        _page("https://t/u1", mk.format(alt="a revenue chart for fiscal 2025").encode()), cfg=off
    ).to_pandas()
    u2 = extract_pipeline(
        _page("https://t/u2", mk.format(alt="an architecture diagram of the system").encode()),
        cfg=off,
    ).to_pandas()
    # strip the differing alt prefix: generated words are identical when
    # unconditional (caption is appended to the existing content)
    g1 = _image_caption(u1, "https://t/u1").replace("a revenue chart for fiscal 2025", "").strip()
    g2 = (
        _image_caption(u2, "https://t/u2")
        .replace("an architecture diagram of the system", "")
        .strip()
    )
    assert g1 == g2


# --- golden: PDF path, neighbor-text context via M11 fallback -------------

def _pdf_payload(caption_context: str) -> bytes:
    import json

    pages = [
        [
            {"label": "title", "bbox": [50, 100, 1100, 250], "content": "report title words"},
            {"label": "text", "bbox": [50, 300, 1100, 450], "content": caption_context},
            {"label": "image", "bbox": [60, 470, 900, 870], "content": ""},
        ]
    ]
    return b"%PDF-\n" + json.dumps({"pages": pages}, sort_keys=True).encode()


def test_caption_depends_on_neighbor_text_pdf(ray_session):
    a = extract_pipeline(
        _page("https://t/pdf-a", _pdf_payload("quarterly revenue grew twelve percent"))
    ).to_pandas()
    b = extract_pipeline(
        _page("https://t/pdf-b", _pdf_payload("the deployment topology spans three regions"))
    ).to_pandas()
    a2 = extract_pipeline(
        _page("https://t/pdf-a2", _pdf_payload("quarterly revenue grew twelve percent"))
    ).to_pandas()
    cap_a = _image_caption(a, "https://t/pdf-a")
    cap_b = _image_caption(b, "https://t/pdf-b")
    cap_a2 = _image_caption(a2, "https://t/pdf-a2")
    assert cap_a and cap_b
    assert cap_a != cap_b  # the text block ABOVE the image steers the caption
    assert cap_a == cap_a2  # deterministic
    # extracted_text is untouched by captioning (text contract unchanged)
    assert "quarterly revenue grew twelve percent" in a[a.url == "https://t/pdf-a"].iloc[0].extracted_text


def test_caption_model_registry_swap(ray_session):
    """T5: a second captioner variant plugs in behind the same stage
    interface via cfg.caption_model; unknown names are rejected."""
    import pytest

    from paddle_ray.stages.caption import Captioner

    html = (
        '<main><p>intro paragraph long enough to matter here</p>'
        '<p><img src="img_in_image_box_10_20_310_340.jpg" alt="a chart of numbers"></p></main>'
    ).encode()
    blip = extract_pipeline(_page("https://t/m1", html)).to_pandas()
    git = extract_pipeline(
        _page("https://t/m2", html), cfg=ExtractConfig(caption_model="git")
    ).to_pandas()
    cap_blip = _image_caption(blip, "https://t/m1")
    cap_git = _image_caption(git, "https://t/m2")
    assert cap_blip != cap_git
    assert "an image of" in cap_git  # GIT-style prefix
    # deterministic per model
    git2 = extract_pipeline(
        _page("https://t/m3", html), cfg=ExtractConfig(caption_model="git")
    ).to_pandas()
    assert cap_git.split(" ", 4)[-1] == _image_caption(git2, "https://t/m3").split(" ", 4)[-1]

    with pytest.raises(ValueError, match="unknown caption_model"):
        Captioner(ExtractConfig(caption_model="nope"))


def test_captioner_sliced_and_overhanging_blocks():
    """Flat-index bookkeeping must survive non-canonical Arrow layouts:
    (a) a blocks child with TRAILING elements past the last list window
    (offsets don't cover the full child) and (b) a zero-copy slice with
    offset > 0. Both occur for arrays Ray slices out of larger blocks."""
    from paddle_ray.stages.caption import Captioner

    def blk(label, bbox, content):
        return {"label": label, "bbox": bbox, "content": content, "path": ""}

    # child has 3 blocks; offsets [0, 2] reference only the first two —
    # the third (an image that WOULD pass the gate) overhangs and must
    # be ignored, not mapped to row n_rows by searchsorted
    child = pa.array(
        [
            blk("text", [0, 0, 500, 100], "intro"),
            blk("image", [10, 20, 310, 340], ""),
            blk("image", [10, 20, 310, 340], "overhang"),
        ],
        BLOCK_TYPE,
    )
    blocks = pa.ListArray.from_arrays(pa.array([0, 2], pa.int32()), child)
    md = "x ![](img_in_image_box_10_20_310_340.jpg) y"
    batch = pa.table({"markdown": pa.array([md]), "blocks": blocks})
    out = Captioner(ExtractConfig())(batch)
    rows = out["blocks"].to_pylist()
    assert len(rows) == 1 and len(rows[0]) == 2
    assert rows[0][1]["content"]  # in-window image captioned
    assert "overhang" not in str(rows)  # overhang never leaks into a row

    # sliced two-row table: row 0 has the image, slice keeps only row 1
    child2 = pa.array(
        [blk("image", [10, 20, 310, 340], ""), blk("text", [0, 0, 9, 9], "tail")],
        BLOCK_TYPE,
    )
    blocks2 = pa.ListArray.from_arrays(pa.array([0, 1, 2], pa.int32()), child2)
    t2 = pa.table({"markdown": pa.array([md, md]), "blocks": blocks2}).slice(1, 1)
    out2 = Captioner(ExtractConfig())(t2)
    rows2 = out2["blocks"].to_pylist()
    # the sliced-away image block must NOT leak a caption into row 1
    assert len(rows2) == 1 and rows2[0][0]["content"] == "tail"

    # (c) shifted offsets at array offset 0: a LEADING orphan child element
    # before offsets[0] belongs to no row — without the lower-bound filter
    # searchsorted maps it to row -1 (python-wraps to the LAST row) and
    # corrupts its captions
    child3 = pa.array(
        [
            blk("image", [10, 20, 310, 340], "lead_orphan"),
            blk("text", [0, 0, 9, 9], "only"),
            blk("image", [10, 20, 310, 340], ""),
        ],
        BLOCK_TYPE,
    )
    blocks3 = pa.ListArray.from_arrays(pa.array([1, 3], pa.int32()), child3)
    assert blocks3.offset == 0  # shifted offsets, NOT a sliced array
    t3 = pa.table({"markdown": pa.array([md]), "blocks": blocks3})
    out3 = Captioner(ExtractConfig())(t3)
    rows3 = out3["blocks"].to_pylist()
    assert len(rows3) == 1 and len(rows3[0]) == 2
    assert rows3[0][1]["content"]  # the IN-row image still gets a caption
    assert rows3[0][0]["content"] == "only"
    assert "lead_orphan" not in str(rows3)
