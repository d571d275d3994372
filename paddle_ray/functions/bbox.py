"""bbox scalar functions — key parsing, normalization, geometry predicates.

From-scratch reimplementation of the reference's bbox semantics:
- key grammar ``img_in_image_box_{x1}_{y1}_{x2}_{y2}`` and the
  generalized last-4-numbers rule (`layout_captioning.py:193-200`,
  `imageCaptioningExperiments/bbox_text_matcher.py:10-26`);
- normalized string key ``"x1_y1_x2_y2"`` with int rounding
  (`bbox_text_matcher.py:28-38`);
- margin-expanded overlap predicate, threshold 0.1
  (`bbox_text_matcher.py:40-68`);
- "text above image" predicate: text bottom above image top, vertical gap
  <= 100 px, horizontal ranges overlap (`bbox_text_matcher.py:70-83`);
- caption size gate: w >= 100, h >= 100, area >= 10_000
  (`caption_config.yaml:8-11`, `layout_captioning.py:203-221`).
"""

from __future__ import annotations

import re

BOX_KEY_RE = re.compile(r"img_in_(?:image|table|chart)_box_(\d+)_(\d+)_(\d+)_(\d+)")
_LAST4 = re.compile(r"(\d+)_(\d+)_(\d+)_(\d+)(?:\D[^_]*)?$")

MIN_W = 100
MIN_H = 100
MIN_AREA = 10_000
OVERLAP_THRESHOLD = 0.1
ABOVE_MAX_GAP = 100

_INT32_MAX = (1 << 31) - 1


def parse_bbox_from_name(name: str) -> list[int] | None:
    """Extract ``[x1, y1, x2, y2]`` from an image key/filename.

    Tries the explicit ``img_in_*_box`` grammar first, then the
    last-4-underscore-separated-numbers fallback. Returns None if neither
    matches. Values are clamped to int32 — an adversarial filename like
    ``img_in_image_box_3000000000_..`` must not overflow the Arrow
    fixed_size_list<int32> bbox column and poison the whole batch.
    """
    if not name:
        return None
    m = BOX_KEY_RE.search(name)
    if m is None:
        stem = name.rsplit("/", 1)[-1]
        stem = stem.rsplit(".", 1)[0]
        m = _LAST4.search(stem)
    if m is None:
        return None
    return [min(int(g), _INT32_MAX) for g in m.groups()]


def box_key_name(bbox, kind: str = "image") -> str:
    """``img_in_{kind}_box_{x1}_{y1}_{x2}_{y2}.jpg`` — the ONE writer of
    the key grammar ``BOX_KEY_RE`` parses. Values must already be clamped
    non-negative ints (the regex matches \\d+ only; a negative coordinate
    would emit a key no consumer can parse)."""
    return f"img_in_{kind}_box_" + "_".join(str(int(v)) for v in bbox[:4]) + ".jpg"


def normalize_bbox_key(bbox) -> str:
    """``[floats] -> "x1_y1_x2_y2"`` rounded-int join key."""
    return "_".join(str(int(round(float(v)))) for v in bbox[:4])


def bbox_wh(bbox) -> tuple[float, float]:
    return float(bbox[2]) - float(bbox[0]), float(bbox[3]) - float(bbox[1])


def should_caption(bbox, min_w: int = MIN_W, min_h: int = MIN_H, min_area: int = MIN_AREA) -> bool:
    """Caption size gate (drop tiny images). Thresholds default to the
    reference's caption_config.yaml values; pass ExtractConfig's
    ``min_caption_*`` to stay in sync with the Captioner's vectorized gate
    (stages/caption.py applies the same three comparisons on arrays)."""
    if bbox is None or len(bbox) != 4:
        return False
    w, h = bbox_wh(bbox)
    return w >= min_w and h >= min_h and w * h >= min_area


def boxes_overlap(a, b, threshold: float = OVERLAP_THRESHOLD) -> bool:
    """Reference semantics (`bbox_text_matcher.py:40-68`): expand box ``a``
    by ``threshold`` x the LARGER box's dimensions per axis, return True on
    any contact with ``b`` (symmetric by construction — the margin uses
    max(w_a, w_b) / max(h_a, h_b))."""
    if len(a) != 4 or len(b) != 4:
        return False
    ax1, ay1, ax2, ay2 = (float(v) for v in a)
    bx1, by1, bx2, by2 = (float(v) for v in b)
    margin_x = max(ax2 - ax1, bx2 - bx1) * threshold
    margin_y = max(ay2 - ay1, by2 - by1) * threshold
    return not (
        ax2 + margin_x < bx1
        or ax1 - margin_x > bx2
        or ay2 + margin_y < by1
        or ay1 - margin_y > by2
    )


def text_above_image(text_bbox, img_bbox, max_gap: int = ABOVE_MAX_GAP) -> bool:
    """True when the text block sits directly above the image."""
    tx1, _, tx2, ty2 = (float(v) for v in text_bbox)
    ix1, iy1, ix2, _ = (float(v) for v in img_bbox)
    if ty2 > iy1:
        return False
    if iy1 - ty2 > max_gap:
        return False
    return min(tx2, ix2) > max(tx1, ix1)


# --- conditional-captioning context (M12/M13/M14) -------------------------

_IMG_DIV_RE = re.compile(r"<div[^>]*>\s*<img[^>]*>\s*</div>", re.IGNORECASE | re.DOTALL)
_IMG_TAG_RE = re.compile(r"<img[^>]*>", re.IGNORECASE)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")

DEFAULT_CAPTION_PROMPT = (
    "Describe this image in detail, focusing on key elements and their relationships"
)


def clean_caption_context(text: str) -> str:
    """M13 cleaner, reference semantics (`bbox_text_matcher.py:127-146`):
    strip ``<div><img></div>`` wrappers, bare ``<img>`` tags, any remaining
    HTML tags, then collapse whitespace runs to single spaces."""
    if not text or not text.strip():
        return ""
    text = _IMG_DIV_RE.sub("", text)
    text = _IMG_TAG_RE.sub("", text)
    text = _ANY_TAG_RE.sub("", text)
    return _WS_RE.sub(" ", text).strip()


def build_caption_prompt(context: str, min_len: int = 10, max_len: int = 200) -> str:
    """M14 prompt builder (`blip_conditional_caption_e2e.py:144-147`): use
    the cleaned context only when meaningful (len > 10), truncated to 200
    chars; otherwise the generic unconditional prompt."""
    if context and len(context) > min_len:
        return f"Based on this context: '{context[:max_len]}', describe this image in detail"
    return DEFAULT_CAPTION_PROMPT


def find_caption_context(
    img_idx: int,
    row_lo: int,
    row_hi: int,
    labels: list,
    bboxes,
    contents: list,
    text_labels=("text", "title", "list"),
) -> str:
    """M12 relevant-text lookup over one row's block span ``[row_lo, row_hi)``.

    Reference primary path (`bbox_text_matcher.py:85-125`
    ``find_relevant_text_for_image``): the matched image block's own
    ``block_content`` IS the relevant text. When that is empty, fall back to
    the spatial predicates the reference ships alongside it (M11
    ``is_text_above_image`` `:70-83`, then M10 ``boxes_overlap`` `:40-68`):
    nearest text block directly above the image (smallest vertical gap,
    document order breaking ties), else the first text block overlapping it.

    ``bboxes`` is indexable as ``bboxes[i] -> [x1, y1, x2, y2]``.
    """
    own = (contents[img_idx] or "").strip()
    if own:
        return own
    ib = bboxes[img_idx]
    best_gap, best_txt = None, ""
    for i in range(row_lo, row_hi):
        if i == img_idx or labels[i] not in text_labels:
            continue
        txt = (contents[i] or "").strip()
        if not txt:
            continue
        tb = bboxes[i]
        if text_above_image(tb, ib):
            gap = float(ib[1]) - float(tb[3])
            if best_gap is None or gap < best_gap:
                best_gap, best_txt = gap, txt
    if best_txt:
        return best_txt
    for i in range(row_lo, row_hi):
        if i == img_idx or labels[i] not in text_labels:
            continue
        txt = (contents[i] or "").strip()
        if txt and boxes_overlap(bboxes[i], ib):
            return txt
    return ""
