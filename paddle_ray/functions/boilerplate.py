"""Two-pass main-content extraction over the stdlib DOM.

From-scratch analogue of the reference's layout-parsing semantics
(`/root/reference/server/model_repo/layout-parsing/1/model.py:469-552`):
where the reference turns a rendered page into layout blocks
``(block_label, block_bbox, block_content)`` via detection models, we turn
an HTML DOM into the same shape via readability/trafilatura-style
text-density + link-density heuristics (public-domain technique; no code
copied from anywhere).

Pass 1 (bottom-up): per element accumulate ``text_len``, ``link_text_len``,
``n_block_tags``, ``n_p``.
Pass 2 (top-down): pick the content root — prefer semantic containers
(``<main>``, ``<article>``), else best-scoring block container by
``text_len * (1 - link_density)`` with class/id boilerplate penalties —
then walk it in document order emitting typed blocks.

Block labels mirror the reference's label set (text / title / list / table
/ image / chart — `layout_captioning.py:240`, fixtures `blip/captions.csv`).
Block "bbox" is the char-offset span ``[start, 0, end, 0]`` in the
assembled text (the HTML analogue of a layout bbox), except image blocks,
whose bbox comes from ``img_in_image_box_x1_y1_x2_y2`` filenames when
present (reference key grammar `layout_captioning.py:193-200`).

All rules are deterministic: fixed tag sets, fixed traversal order, a
whitespace-collapse normalization (runs of ``\\s`` -> single space, strip)
matching the reference cleaner `bbox_text_matcher.py:144`.
"""

from __future__ import annotations

import re

from .bbox import box_key_name, parse_bbox_from_name
from .dom import Node, decode_html_bytes, parse_html

_WS = re.compile(r"\s+")

# containers that are boilerplate by construction
_STRIP_TAGS = frozenset(("head", "nav", "header", "footer", "aside", "form", "script", "style", "noscript", "iframe", "button", "select", "template"))
_BOILER_HINT = re.compile(
    r"(?:^|[\s_-])(?:ad|ads|advert\w*|banner|nav\w*|menu|sidebar|footer|header|"
    r"breadcrumb|social|share|comment\w*|related|promo|popup|cookie|subscribe)(?:$|[\s_-])"
)
_SEMANTIC_ROOTS = ("main", "article")
_HEADINGS = frozenset(("h1", "h2", "h3", "h4", "h5", "h6"))
# elements that directly yield one block each
_TEXT_BLOCKS = frozenset(("p", "pre", "blockquote", "figcaption", "caption", "dt", "dd"))


def norm_ws(s: str) -> str:
    """Collapse whitespace runs to single spaces and strip (M13 semantics)."""
    return _WS.sub(" ", s).strip()


def _ws_len(s: str) -> int:
    """len(norm_ws(s)) without building the normalized string — str.split
    is a C whitespace scan. Used only for SCORING lengths; emitted text
    always goes through norm_ws itself."""
    parts = s.split()
    return sum(map(len, parts)) + len(parts) - 1 if parts else 0


def _collect_stats(root: Node) -> dict:
    """Pass 1: bottom-up text/link accumulation (iterative post-order).
    stats[id(node)] = (text_len, link_text_len, n_p)."""
    stats: dict[int, tuple] = {}
    order: list[Node] = list(root.iter_nodes())
    for node in reversed(order):  # children appear after parents in pre-order
        tl = ll = np_ = 0
        for c in node.children:
            if isinstance(c, Node):
                ctl, cll, cnp = stats[id(c)]
                tl += ctl
                ll += cll
                np_ += cnp
            else:
                tl += _ws_len(c)
        tag = node.tag
        if tag == "a":
            ll = tl
        elif tag == "p":
            np_ += 1
        if tag in _STRIP_TAGS:
            # boilerplate subtrees contribute nothing upward
            tl = ll = np_ = 0
        stats[id(node)] = (tl, ll, np_)
    return stats


def _is_boiler(node: Node) -> bool:
    if node.tag in _STRIP_TAGS:
        return True
    hint = f"{node.attr('class')} {node.attr('id')}".lower()
    return bool(hint.strip()) and bool(_BOILER_HINT.search(hint))


def _score(node: Node, stats: dict) -> float:
    text_len, link_text_len, _n_p = stats[id(node)]
    if text_len == 0:
        return 0.0
    link_density = link_text_len / text_len
    score = text_len * (1.0 - link_density)
    if node.tag in _SEMANTIC_ROOTS:
        score *= 4.0
    elif node.tag == "body":
        score *= 0.8  # prefer a tighter container when one exists
    if _is_boiler(node):
        score *= 0.05
    return score


def select_content_root(root: Node, stats: dict) -> Node | None:
    """Pass 2a: choose the main-content container deterministically.

    Semantic containers win outright; ties and fallbacks resolve by
    (score, -depth, document order) so the choice never depends on dict
    ordering.
    """
    best: Node | None = None
    best_score = -1.0
    # manual pre-order DFS that NEVER descends into boilerplate subtrees —
    # a text-heavy div inside <footer>/<nav> must not be able to win the
    # root election (its stats are nonzero even though pass 1 zeroed its
    # ancestors' upward contribution)
    stack: list[Node] = [root]
    while stack:
        node = stack.pop()
        boiler = _is_boiler(node) and node.tag not in _SEMANTIC_ROOTS
        if boiler:
            continue  # skip node AND subtree
        stack.extend(c for c in reversed(node.children) if isinstance(c, Node))
        if node.tag not in _SEMANTIC_ROOTS and node.tag not in ("body", "div", "section", "td"):
            continue
        s = _score(node, stats)
        if s > best_score + 1e-9:  # strictly better; first-in-doc wins ties
            best, best_score = node, s
    if best is None and stats[id(root)][0] > 0:
        # HTML5-legal implicit body (no body/div/section container at all):
        # fall back to the document root rather than silently extracting
        # nothing — <head> content never leaks (head is a _STRIP_TAG)
        return root
    return best


def _emit_table(node: Node) -> str:
    """Render a table row-per-line, cells joined by ' | ' (deterministic)."""
    rows: list[str] = []
    for tr in node.iter_nodes():
        if tr.tag != "tr":
            continue
        cells = [
            norm_ws("".join(td.text_parts()))
            for td in tr.children
            if isinstance(td, Node) and td.tag in ("td", "th")
        ]
        cells = [c for c in cells if c]
        if cells:
            rows.append(" | ".join(cells))
    return "\n".join(rows)


def extract_blocks(content_root: Node, stats: dict) -> list[dict]:
    """Pass 2b: walk the content root in document order, emit typed blocks.

    Returns dicts ``{label, content, path, bbox}`` with char-span bboxes
    assigned afterwards by :func:`assemble_text`.
    """
    blocks: list[dict] = []

    def emit(label: str, content: str, node: Node, bbox=None):
        if content or label == "image":
            blocks.append({"label": label, "content": content, "path": node.path(), "bbox": bbox})

    def walk(node: Node):
        for c in node.children:
            if not isinstance(c, Node):
                # bare text directly under a walked container
                t = norm_ws(c)
                if t:
                    emit("text", t, node)
                continue
            if c.tag in _STRIP_TAGS or _is_boiler(c):
                continue
            if c.tag in _HEADINGS:
                emit("title", norm_ws("".join(c.text_parts())), c)
            elif c.tag in _TEXT_BLOCKS:
                txt = norm_ws("".join(c.text_parts()))
                emit("text", txt, c)
                for img in c.iter_nodes():
                    if img.tag == "img":
                        emit("image", norm_ws(img.attr("alt")), img, parse_bbox_from_name(img.attr("src")))
            elif c.tag in ("ul", "ol", "dl", "menu"):
                for li in c.children:
                    if isinstance(li, Node) and li.tag in ("li", "dt", "dd"):
                        emit("list", norm_ws("".join(li.text_parts())), li)
            elif c.tag == "table":
                emit("table", _emit_table(c), c)
            elif c.tag == "img":
                emit("image", norm_ws(c.attr("alt")), c, parse_bbox_from_name(c.attr("src")))
            elif c.tag == "a":
                # standalone anchor inside content: inline text, no block
                continue
            else:
                walk(c)

    walk(content_root)
    return blocks


# labels whose content joins into extracted_text
TEXT_LABELS = frozenset(("text", "title", "list", "table"))
SEP = "\n\n"


def assemble_text(blocks: list[dict]) -> str:
    """Join text-bearing block contents with blank lines; fill char-span
    bboxes ``[start, 0, end, 0]`` in place (image blocks keep layout bboxes)."""
    parts: list[str] = []
    pos = 0
    for b in blocks:
        if b["label"] in TEXT_LABELS and b["content"]:
            start = pos + (len(SEP) if parts else 0)
            parts.append(b["content"])
            pos = start + len(b["content"])
            if b["bbox"] is None:
                b["bbox"] = [start, 0, pos, 0]
        elif b["bbox"] is None:
            b["bbox"] = [pos, 0, pos, 0]
    return SEP.join(parts)


def render_markdown(blocks: list[dict]) -> str:
    """Deterministic markdown rendering of the block list (reference
    markdown assembly analogue, `model.py:483-485` + client rewrite
    `client/testScript.py:151-179`)."""
    out: list[str] = []
    for b in blocks:
        label, content = b["label"], b["content"]
        if label == "title":
            out.append(f"# {content}")
        elif label == "list":
            out.append(f"- {content}")
        elif label == "table":
            lines = content.split("\n")
            out.append("\n".join(f"| {ln} |" for ln in lines))
        elif label == "image":
            bbox = b["bbox"]  # box_key_name: the ONE owner of the key grammar
            out.append(f"![{content}]({box_key_name(bbox)})" if bbox else f"![{content}]()")
        elif content:
            out.append(content)
    return "\n\n".join(out)


def extract_document(html: bytes | str) -> dict:
    """Full single-document extraction: html -> text/blocks/markdown.

    Returns ``{extracted_text, blocks, markdown, n_blocks}`` where blocks is
    a list of ``{label, bbox[4], content, path}``.
    """
    text = html if isinstance(html, str) else decode_html_bytes(html)
    root = parse_html(text)
    stats = _collect_stats(root)
    content_root = select_content_root(root, stats)
    if content_root is None:
        return {"extracted_text": "", "blocks": [], "markdown": "", "n_blocks": 0}
    blocks = extract_blocks(content_root, stats)
    extracted = assemble_text(blocks)
    md = render_markdown(blocks)
    return {
        "extracted_text": extracted,
        "blocks": blocks,
        "markdown": md,
        "n_blocks": len(blocks),
    }
