"""Lightweight deterministic DOM built on stdlib ``html.parser``.

The reference (xynehq/paddle) never parses HTML — its unit of work is a
rendered page image scored by layout models.  Our HTML path replaces that
with an element tree + heuristics, so the tree must be:

- tolerant of tag soup (unclosed ``<p>``, stray end tags, void elements)
  with **deterministic** recovery rules, and
- cheap: one pass, no regex backtracking, plain Python objects.

Recovery rules (fixed, documented so output is reproducible):
- void elements (img/br/hr/meta/link/input/...) never open a scope;
- ``<p>`` auto-closes on any new block-level start tag;
- ``<li>`` auto-closes on ``<li>``; ``<tr>`` on ``<tr>``; ``<td>/<th>`` on
  ``<td>/<th>``; ``<option>`` on ``<option>``;
- an end tag closes the nearest matching open element, implicitly closing
  everything above it; with no match it is ignored;
- character references are decoded by the parser (convert_charrefs=True).
"""

from __future__ import annotations

from html.parser import HTMLParser

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

BLOCK_ELEMENTS = frozenset(
    (
        "address article aside blockquote body caption center dd details dir div dl dt "
        "fieldset figcaption figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr html "
        "li main menu nav ol p pre section summary table tbody td tfoot th thead tr ul"
    ).split()
)

# start of key => elements it implicitly closes (nearest-first)
_AUTO_CLOSE = {
    "li": ("li",),
    "tr": ("tr", "td", "th"),
    "td": ("td", "th"),
    "th": ("td", "th"),
    "option": ("option",),
    "dt": ("dt", "dd"),
    "dd": ("dt", "dd"),
}

_RAWTEXT = frozenset(("script", "style"))


class Node:
    """One element. ``children`` holds Node or str (text) in document order."""

    __slots__ = ("tag", "attrs", "children", "parent", "index")

    def __init__(self, tag: str, attrs=None, parent=None, index: int = 0):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []
        self.parent = parent
        self.index = index  # 1-based position among same-tag siblings

    # -- convenience -------------------------------------------------------
    def attr(self, name: str, default: str = "") -> str:
        return self.attrs.get(name, default)

    def iter_nodes(self):
        """Depth-first pre-order over element nodes (self included)."""
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def text_parts(self) -> list[str]:
        """All text fragments under this node, document order."""
        out: list[str] = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if isinstance(c, Node):
                if c.tag not in _RAWTEXT:
                    stack.extend(reversed(c.children))
            else:
                out.append(c)
        return out

    def path(self) -> str:
        """Tag path from the root, e.g. ``html/body/main/article/p[3]``."""
        parts: list[str] = []
        n = self
        while n is not None and n.tag != "#root":
            parts.append(f"{n.tag}[{n.index}]" if n.index > 1 else n.tag)
            n = n.parent
        return "/".join(reversed(parts))

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]
        self._tag_counts: list[dict] = [{}]

    # -- helpers -----------------------------------------------------------
    def _open(self, tag: str, attrs) -> Node:
        parent = self.stack[-1]
        counts = self._tag_counts[-1]
        counts[tag] = counts.get(tag, 0) + 1
        node = Node(tag, dict(attrs), parent, counts[tag])
        parent.children.append(node)
        return node

    def _close_to(self, tag: str) -> bool:
        """Close nearest open ``tag``; return False if not open."""
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                del self._tag_counts[i:]
                return True
        return False

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _RAWTEXT:
            node = self._open(tag, attrs)
            self.stack.append(node)
            self._tag_counts.append({})
            return
        auto = _AUTO_CLOSE.get(tag)
        if auto:
            for victim in auto:
                if self._close_to(victim):
                    break
        elif tag in BLOCK_ELEMENTS and self.stack[-1].tag == "p":
            self._close_to("p")
        node = self._open(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)
            self._tag_counts.append({})

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        self._close_to(tag)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    """Parse HTML text into a Node tree rooted at ``#root``."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


def decode_html_bytes(raw: bytes) -> str:
    """bytes -> str with deterministic fallback (utf-8, then latin-1)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")
