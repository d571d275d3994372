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

_BOX_KEY = re.compile(r"img_in_(?:image|table|chart)_box_(\d+)_(\d+)_(\d+)_(\d+)")
_LAST4 = re.compile(r"(\d+)_(\d+)_(\d+)_(\d+)(?:\D[^_]*)?$")

MIN_W = 100
MIN_H = 100
MIN_AREA = 10_000
OVERLAP_MARGIN = 10
OVERLAP_THRESHOLD = 0.1
ABOVE_MAX_GAP = 100


def parse_bbox_from_name(name: str) -> list[int] | None:
    """Extract ``[x1, y1, x2, y2]`` from an image key/filename.

    Tries the explicit ``img_in_*_box`` grammar first, then the
    last-4-underscore-separated-numbers fallback. Returns None if neither
    matches.
    """
    if not name:
        return None
    m = _BOX_KEY.search(name)
    if m is None:
        stem = name.rsplit("/", 1)[-1]
        stem = stem.rsplit(".", 1)[0]
        m = _LAST4.search(stem)
    if m is None:
        return None
    return [int(g) for g in m.groups()]


def normalize_bbox_key(bbox) -> str:
    """``[floats] -> "x1_y1_x2_y2"`` rounded-int join key."""
    return "_".join(str(int(round(float(v)))) for v in bbox[:4])


def bbox_wh(bbox) -> tuple[float, float]:
    return float(bbox[2]) - float(bbox[0]), float(bbox[3]) - float(bbox[1])


def should_caption(bbox) -> bool:
    """Caption size gate (drop tiny images)."""
    if bbox is None or len(bbox) != 4:
        return False
    w, h = bbox_wh(bbox)
    return w >= MIN_W and h >= MIN_H and w * h >= MIN_AREA


def boxes_overlap(a, b, margin: int = OVERLAP_MARGIN, threshold: float = OVERLAP_THRESHOLD) -> bool:
    """Margin-expanded intersection-over-smaller-area overlap test."""
    ax1, ay1, ax2, ay2 = (float(v) for v in a)
    bx1, by1, bx2, by2 = (float(v) for v in b)
    ax1 -= margin; ay1 -= margin; ax2 += margin; ay2 += margin
    ix = max(0.0, min(ax2, bx2) - max(ax1, bx1))
    iy = max(0.0, min(ay2, by2) - max(ay1, by1))
    inter = ix * iy
    if inter <= 0:
        return False
    area_a = max(1.0, (ax2 - ax1) * (ay2 - ay1))
    area_b = max(1.0, (bx2 - bx1) * (by2 - by1))
    return inter / min(area_a, area_b) >= threshold


def text_above_image(text_bbox, img_bbox, max_gap: int = ABOVE_MAX_GAP) -> bool:
    """True when the text block sits directly above the image."""
    tx1, _, tx2, ty2 = (float(v) for v in text_bbox)
    ix1, iy1, ix2, _ = (float(v) for v in img_bbox)
    if ty2 > iy1:
        return False
    if iy1 - ty2 > max_gap:
        return False
    return min(tx2, ix2) > max(tx1, ix1)
