"""Unit tests: boilerplate extraction heuristics + bbox functions."""

import random

from paddle_ray.functions.bbox import (
    boxes_overlap,
    normalize_bbox_key,
    parse_bbox_from_name,
    should_caption,
    text_above_image,
)
from paddle_ray.functions.boilerplate import extract_document, norm_ws
from paddle_ray.sources.pages import wrap_text_as_html


def test_norm_ws():
    assert norm_ws("  a\t b\n\nc ") == "a b c"


def test_main_content_extracted_boiler_stripped():
    html = (
        "<html><head><title>t</title><script>bad()</script></head><body>"
        "<nav><a href='/'>home</a><a href='/x'>about</a></nav>"
        "<div class='ad banner'>BUY NOW</div>"
        "<main><article><h1>Title Here</h1><p>real content one</p>"
        "<p>real content two</p></article></main>"
        "<aside>related junk</aside>"
        "<footer>&copy; corp</footer></body></html>"
    )
    r = extract_document(html)
    assert r["extracted_text"] == "Title Here\n\nreal content one\n\nreal content two"
    assert "BUY NOW" not in r["extracted_text"]
    assert "home" not in r["extracted_text"]
    assert "corp" not in r["extracted_text"]


def test_fallback_without_semantic_root():
    html = (
        "<html><body>"
        "<div id='menu'><a href='/a'>a</a><a href='/b'>b</a><a href='/c'>c</a></div>"
        "<div class='content'><p>long enough paragraph of actual body text here</p>"
        "<p>and another paragraph with more words in it</p></div>"
        "</body></html>"
    )
    r = extract_document(html)
    assert "actual body text" in r["extracted_text"]
    # link-only menu div must lose to the content div
    assert r["extracted_text"].count("\n\n") == 1


def test_table_and_list_rendering():
    html = (
        "<main><ul><li>alpha beta</li><li>gamma</li></ul>"
        "<table><tr><th>h1</th><th>h2</th></tr><tr><td>a</td><td>b</td></tr></table></main>"
    )
    r = extract_document(html)
    assert r["extracted_text"] == "alpha beta\n\ngamma\n\nh1 | h2\na | b"
    labels = [b["label"] for b in r["blocks"]]
    assert labels == ["list", "list", "table"]


def test_char_span_bboxes_cover_text():
    html = "<main><p>abcde</p><p>fgh</p></main>"
    r = extract_document(html)
    b0, b1 = r["blocks"]
    t = r["extracted_text"]
    assert t[b0["bbox"][0] : b0["bbox"][2]] == "abcde"
    assert t[b1["bbox"][0] : b1["bbox"][2]] == "fgh"


def test_image_block_with_bbox_key():
    html = '<main><p>text</p><p><img src="img_in_image_box_10_20_210_240.jpg" alt="pic"></p></main>'
    r = extract_document(html)
    imgs = [b for b in r["blocks"] if b["label"] == "image"]
    assert len(imgs) == 1
    assert imgs[0]["bbox"] == [10, 20, 210, 240]
    assert imgs[0]["content"] == "pic"
    assert "img_in_image_box_10_20_210_240.jpg" in r["markdown"]
    assert "pic" not in r["extracted_text"]  # images excluded from text


def test_roundtrip_wrap():
    rng = random.Random("t")
    text = "plain single spaced words only"
    html = wrap_text_as_html(text, "t", rng)
    assert extract_document(html)["extracted_text"] == text
    html_soup = wrap_text_as_html(text, "t", rng, soup=True)
    assert extract_document(html_soup)["extracted_text"] == text


def test_empty_and_garbage_input():
    assert extract_document("")["extracted_text"] == ""
    assert extract_document("no tags at all")["n_blocks"] >= 0
    r = extract_document(b"\x00\xff garbage <p>x" * 3)
    assert isinstance(r["extracted_text"], str)


# --- bbox functions (reference semantics, bbox_text_matcher.py) -----------

def test_parse_bbox_from_name():
    assert parse_bbox_from_name("img_in_image_box_1172_347_2200_1238.jpg") == [1172, 347, 2200, 1238]
    assert parse_bbox_from_name("page_7_4_img_in_image_box_10_20_30_40.jpg") == [10, 20, 30, 40]
    assert parse_bbox_from_name("figure_10_20_30_40.png") == [10, 20, 30, 40]
    assert parse_bbox_from_name("noboxhere.png") is None
    assert parse_bbox_from_name("") is None


def test_normalize_bbox_key():
    assert normalize_bbox_key([10.4, 19.6, 30.0, 40.49]) == "10_20_30_40"


def test_should_caption_size_gate():
    assert should_caption([0, 0, 100, 100])
    assert not should_caption([0, 0, 99, 500])   # w < 100
    assert not should_caption([0, 0, 500, 99])   # h < 100
    assert not should_caption(None)


def test_overlap_and_above():
    assert boxes_overlap([50, 50, 150, 150], [90, 90, 200, 200])
    # corner graze WITH margin contact counts as overlap (reference: any
    # contact of the margin-expanded box)
    assert boxes_overlap([0, 0, 100, 100], [99, 99, 300, 300])
    assert not boxes_overlap([0, 0, 50, 50], [500, 500, 600, 600])
    assert text_above_image([0, 0, 100, 90], [0, 100, 100, 300])
    assert not text_above_image([0, 0, 100, 90], [0, 300, 100, 500])  # gap > 100
    assert not text_above_image([0, 200, 100, 290], [0, 100, 100, 180])  # below


def test_inline_tags_do_not_split_words():
    """Review regression: ' '.join over text fragments fabricated spaces
    at inline-element boundaries (un<b>believ</b>able -> 'un believ able')."""
    from paddle_ray.functions.boilerplate import extract_document

    html = b"<html><body><main><p>un<b>believ</b>able and <i>real</i> words</p></main></body></html>"
    r = extract_document(html)
    assert r["extracted_text"] == "unbelievable and real words"


def test_footer_div_cannot_win_root_election():
    """Review regression: a text-heavy div inside <footer> must not be
    elected content root over the real body content."""
    from paddle_ray.functions.boilerplate import extract_document

    html = (
        b"<html><body><p>the real content sentence</p>"
        b"<footer><div>" + b"legal boilerplate " * 40 + b"</div></footer></body></html>"
    )
    r = extract_document(html)
    assert "the real content sentence" in r["extracted_text"]
    assert "legal boilerplate" not in r["extracted_text"]


def test_adversarial_bbox_filename_does_not_overflow():
    """Review regression: huge ints in an img src must clamp to int32, not
    poison the Arrow batch."""
    import pyarrow as pa

    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.functions.bbox import parse_bbox_from_name
    from paddle_ray.stages.extract import DocumentExtractor
    from paddle_ray.stages.sniff import make_sniff_batch

    bbox = parse_bbox_from_name("img_in_image_box_3000000000_0_4000000000_10.jpg")
    assert max(bbox) <= (1 << 31) - 1

    html = (
        b'<html><body><main><p>text</p>'
        b'<img src="img_in_image_box_3000000000_0_4000000000_10.jpg" alt="big">'
        b"</main></body></html>"
    )
    t = pa.table(
        {
            "url": ["https://x.example/1"],
            "warc_ts": pa.array([0], pa.timestamp("us")),
            "html": [html],
            "text": [""],
            "lang": ["en"],
        }
    )
    out = DocumentExtractor(ExtractConfig())(make_sniff_batch(ExtractConfig())(t))
    assert out.num_rows == 1 and out["error"][0].as_py() is None


def test_boxes_overlap_reference_semantics():
    """Reference bbox_text_matcher.py:40-68: a 10px gap bridged by the 10%
    margin of a 100px-tall box counts as overlap; symmetric."""
    from paddle_ray.functions.bbox import boxes_overlap

    text = [0, 110, 500, 160]
    img = [0, 0, 500, 100]
    assert boxes_overlap(img, text)  # margin_y = 0.1*100 = 10 bridges the gap
    assert boxes_overlap(text, img)  # symmetric
    assert not boxes_overlap([0, 0, 10, 10], [500, 500, 600, 600])
