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

import re
from html import unescape as _unescape
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

# start of key => (elements it implicitly closes, scope boundary tags) —
# the close NEVER crosses a boundary, so nested lists/tables keep their
# structure (HTML5: li scope is bounded by ul/ol, td/tr by table)
_LIST_SCOPE = frozenset(("ul", "ol", "menu", "dl"))
_TABLE_SCOPE = frozenset(("table",))
_AUTO_CLOSE = {
    "li": (("li",), _LIST_SCOPE),
    "tr": (("tr", "td", "th"), _TABLE_SCOPE),
    "td": (("td", "th"), _TABLE_SCOPE),
    "th": (("td", "th"), _TABLE_SCOPE),
    "option": (("option",), frozenset(("select",))),
    "dt": (("dt", "dd"), _LIST_SCOPE),
    "dd": (("dt", "dd"), _LIST_SCOPE),
}

_RAWTEXT = frozenset(("script", "style"))


class Node:
    """One element. ``children`` holds Node or str (text) in document order."""

    __slots__ = ("tag", "attrs", "children", "parent", "_sib_cache")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list = []
        self.parent = parent
        self._sib_cache = None  # (len(children) at build, {id(child): idx})

    @property
    def index(self) -> int:
        """1-based position among same-tag siblings, computed lazily —
        paid only by the few emitted blocks whose path() is rendered, not
        by every node at parse time. The sibling map is memoized per
        PARENT (one pass over its children), so rendering path() for
        every block of a flat 10^4-sibling document is O(n) aggregate —
        the per-call linear scan was O(n^2) and cost seconds on MB-scale
        outlier pages."""
        parent = self.parent
        if parent is None:
            return 0
        cache = parent._sib_cache
        if cache is None or cache[0] != len(parent.children):
            counts: dict[str, int] = {}
            m: dict[int, int] = {}
            for c in parent.children:
                if isinstance(c, Node):
                    k = counts.get(c.tag, 0) + 1
                    counts[c.tag] = k
                    m[id(c)] = k
            cache = (len(parent.children), m)
            parent._sib_cache = cache
        return cache[1].get(id(self), 0)

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
            idx = n.index
            parts.append(f"{n.tag}[{idx}]" if idx > 1 else n.tag)
            n = n.parent
        return "/".join(reversed(parts))

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"<Node {self.tag} children={len(self.children)}>"


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.stack = [self.root]

    # -- helpers -----------------------------------------------------------
    def _open(self, tag: str, attrs) -> Node:
        parent = self.stack[-1]
        # skip dict() for the (majority) attribute-less tags
        node = Node(tag, dict(attrs) if attrs else None, parent)
        parent.children.append(node)
        return node

    def _close_to(self, tag: str, stop: frozenset = frozenset()) -> bool:
        """Close nearest open ``tag`` WITHOUT crossing a ``stop`` boundary;
        return False if not open within scope."""
        for i in range(len(self.stack) - 1, 0, -1):
            t = self.stack[i].tag
            if t == tag:
                del self.stack[i:]
                return True
            if t in stop:
                return False
        return False

    # -- HTMLParser hooks --------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _RAWTEXT:
            self.stack.append(self._open(tag, attrs))
            return
        auto = _AUTO_CLOSE.get(tag)
        if auto:
            victims, stop = auto
            for victim in victims:
                if self._close_to(victim, stop):
                    break
        elif tag in BLOCK_ELEMENTS:
            # HTML5 p-scope: an open <p> closes on any block start even
            # through inline wrappers (<p>a<span>b<div> closes the p), but
            # never across another block/rawtext boundary
            for i in range(len(self.stack) - 1, 0, -1):
                t = self.stack[i].tag
                if t == "p":
                    del self.stack[i:]
                    break
                if t in BLOCK_ELEMENTS or t in _RAWTEXT:
                    break
        node = self._open(tag, attrs)
        if tag not in VOID_ELEMENTS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return
        self._close_to(tag)

    def handle_data(self, data):
        if data:
            self.stack[-1].children.append(data)


def parse_html_stdlib(html: str) -> Node:
    """Reference parser: stdlib ``html.parser`` driving the tree builder.
    Kept for differential testing of the fast tokenizer below."""
    b = _TreeBuilder()
    b.feed(html)
    b.close()
    return b.root


# ---------------------------------------------------------------------------
# Fast tokenizer (default): one compiled-regex scan replacing html.parser's
# per-construct regex machinery — 1.7x faster on the synthetic corpus and
# tree-identical to parse_html_stdlib on it (tests/test_dom_differential.py).
# The parse is the flagship's dominant cost (~60% of the extraction kernel),
# so at 100 TB this is the hot loop. On exotic tag soup outside the stdlib
# parser's documented behavior the tokenizer's (deterministic) reading is
# canonical for this engine.
# ---------------------------------------------------------------------------

_TAG_RE = re.compile(
    r"<(?:"
    r"!--(?P<comment>.*?)(?:-->|$)"  # comments (unterminated swallows rest)
    r"|!\[CDATA\[(?P<cdata>.*?)(?:\]\]>|$)"  # marked sections scan to ]]> (stdlib parity)
    r"|!(?P<decl>[^>]*)>?"  # <!doctype ...> (skipped)
    r"|\?(?P<pi>[^>]*)>?"  # processing instructions (skipped)
    r"|/(?P<end>[a-zA-Z][-a-zA-Z0-9:_.]*)\s*[^>]*>"  # end tags
    # quoted sections only count as such directly after '=' (value
    # position) — a stray quote elsewhere is ordinary soup, matching the
    # stdlib parser's tolerant reading of e.g. <div class=a"b>. ALL
    # quantifiers here are POSSESSIVE (*+): the alternation is ambiguous
    # ([^>] also matches '=') and a truncated tag at EOF would otherwise
    # backtrack exponentially (2^n_attrs) and wedge the actor forever.
    r"|(?P<start>[a-zA-Z][-a-zA-Z0-9:_.]*)(?P<attrs>(?:=\s*+\"[^\"]*+\"|=\s*+'[^']*+'|[^>])*+)>"
    r")",
    re.DOTALL,
)
# name = first char anything but space//>/, then no '=' — a LEADING '='
# is part of the name (stdlib/HTML5: <p =bare> carries attr "=bare")
_ATTR_RE = re.compile(r"([^\s/>][^\s/>=]*)(?:\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]*)))?")


class _FastBuilder(_TreeBuilder):
    """Same tree-building hooks, regex-scan tokenizer instead of HTMLParser."""

    def feed(self, html: str) -> None:  # type: ignore[override]
        pos, n = 0, len(html)
        handle_data = self.handle_data
        handle_starttag = self.handle_starttag
        handle_endtag = self.handle_endtag
        tag_match = _TAG_RE.match
        find = html.find
        no_more_tags = False  # set once find('>') fails — every later '<' is text
        while pos < n:
            lt = find("<", pos)
            if lt < 0:
                text = html[pos:]
                if text:
                    handle_data(_unescape(text) if "&" in text else text)
                break
            if lt > pos:
                text = html[pos:lt]
                handle_data(_unescape(text) if "&" in text else text)
            if no_more_tags and html[lt + 1 : lt + 2] not in ("!", "?"):
                # start/end tags need a '>' and none remains — but '<!'/'<?'
                # constructs (comment, CDATA, decl, PI) terminate at EOF via
                # their $ / optional-'>' alternatives and must still be
                # matched, or an unterminated <!-- appearing after a bare
                # '<' would leak its payload into extracted text. Each such
                # construct consumes the whole remaining tail, so this costs
                # at most one extra regex match.
                handle_data("<")
                pos = lt + 1
                continue
            m = tag_match(html, lt)
            if not m:
                if html[lt + 1 : lt + 2] == "/" and not html[lt + 2 : lt + 3].isalpha():
                    # HTML5 "bogus comment": '</' followed by a non-letter
                    # swallows everything to the next '>' (stdlib parity:
                    # '</ p>' produces no tree content)
                    gt = find(">", lt)
                    pos = gt + 1 if gt >= 0 else n
                    continue
                if not no_more_tags and find(">", lt) == -1:
                    # no tag can complete anymore (e.g. crawl-truncated
                    # page) — remember it so the tail costs one find()
                    # total, not one rescan per remaining '<'
                    no_more_tags = True
                handle_data("<")  # bare '<' is text (stdlib 'invalid' path)
                pos = lt + 1
                continue
            pos = m.end()
            start = m.group("start")
            if start is not None:
                tag = start.lower()
                raw_attrs = m.group("attrs")
                # a trailing '/' is self-closing ONLY when it cannot be part
                # of an unquoted attribute value (stdlib semantics:
                # <img src=http://x/> keeps the '/' in the value; <br/>,
                # <img src="x"/> self-close)
                selfclose = raw_attrs.endswith("/") and (
                    len(raw_attrs) == 1 or raw_attrs[-2] in " \t\r\n\"'"
                )
                attrs = []
                if raw_attrs and raw_attrs.strip("/ \t\r\n"):
                    if selfclose:
                        raw_attrs = raw_attrs[:-1]
                    for am in _ATTR_RE.finditer(raw_attrs):
                        name = am.group(1).lower()
                        v = am.group(2)
                        if v is None:
                            v = am.group(3)
                        if v is None:
                            v = am.group(4)
                        if v is not None and "&" in v:
                            v = _unescape(v)
                        attrs.append((name, v))
                if selfclose:
                    self.handle_startendtag(tag, attrs)
                elif tag in _RAWTEXT:
                    self.handle_starttag(tag, attrs)
                    cm = _rawtext_close(tag).search(html, pos)
                    raw = html[pos : cm.start()] if cm else html[pos:]
                    if raw:
                        handle_data(raw)  # raw: no charref decode in script/style
                    self.handle_endtag(tag)
                    pos = cm.end() if cm else n
                else:
                    handle_starttag(tag, attrs)
                continue
            end = m.group("end")
            if end is not None:
                handle_endtag(end.lower())
            # comment / declaration / PI tokens produce no tree content

    def close(self) -> None:  # type: ignore[override]
        pass


def _rawtext_close(tag: str) -> "re.Pattern[str]":
    pat = _RAWTEXT_CLOSE.get(tag)
    if pat is None:
        pat = _RAWTEXT_CLOSE[tag] = re.compile(rf"</{tag}(?:\s[^>]*)?>", re.IGNORECASE)
    return pat


_RAWTEXT_CLOSE: dict = {}


def parse_html(html: str) -> Node:
    """Parse HTML text into a Node tree rooted at ``#root`` (fast path)."""
    b = _FastBuilder()
    b.feed(html)
    return b.root


def decode_html_bytes(raw: bytes) -> str:
    """bytes -> str with deterministic fallback (utf-8, then latin-1)."""
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")
