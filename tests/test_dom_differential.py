"""Differential tests: the fast regex tokenizer (default parse_html) must
build trees identical to the stdlib-html.parser reference builder on the
whole synthetic grammar and on representative tag soup. On exotic soup
outside these classes the fast tokenizer's deterministic reading is
canonical (functions/dom.py docstring)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from paddle_ray.functions.dom import parse_html, parse_html_stdlib


def tree_sig(node):
    if isinstance(node, str):
        return node
    return (
        node.tag,
        tuple(sorted((k, v) for k, v in node.attrs.items())),
        node.index,
        tuple(tree_sig(c) for c in node.children),
    )


def assert_same(html: str):
    assert tree_sig(parse_html(html)) == tree_sig(parse_html_stdlib(html)), html


def test_differential_full_grammar():
    from paddle_ray.sources.pages import synth_pages

    pages, _ = synth_pages(400, pdf_every=0, outlier_every=50)
    for h in pages["html"].to_pylist():
        assert_same(h.decode("utf-8"))


def test_differential_soup_cases():
    cases = [
        "",
        "plain text only",
        "a < b and a <3 c",
        "<p>unclosed paragraph<p>another",
        "<ul><li>one<li>two</ul>",
        "<table><tr><td>a<td>b<tr><td>c</table>",
        "<div><b>bold <i>both</b> italic?</i></div>",
        "<script>if (a < b) { x = '</div>'; }</script>after",
        "<style>p > a { color: red }</style>",
        "<p>&amp; &lt;tag&gt; &#65; &bogus; &</p>",
        '<a href="x?a=1&amp;b=2" title=\'t\' checked>link</a>',
        "<img src=a.png><br><hr>",
        "<p>self closing <br/> here</p>",
        "</bogus>text</p>",
        "<!-- comment --><p>x</p>",
        "<!doctype html><html><body><p>y</p></body></html>",
        "<P CLASS=BIG>upper</P>",
        "<dl><dt>term<dd>def<dt>term2</dl>",
        "<select><option>a<option>b</select>",
        "text &amp still decodes? <p>end",
        # trailing-slash disambiguation (review finding): unquoted value
        # keeps its '/', real self-closers still close
        '<a href=http://example.com/>link</a>',
        "<img src=x/>",
        '<img src="x"/>',
        "<br />",
        "<a href=/>slash value</a>",
        # stray quotes in soup must not degrade the tag to text
        '<div class=a"b>t</div>',
        "<p title=\"x>y\">quoted gt</p>",
    ]
    for c in cases:
        assert_same(c)


def test_documented_divergence_unterminated_comment():
    """The one known divergence: an unterminated trailing comment is
    swallowed to EOF by the fast tokenizer (HTML5 behavior); stdlib leaks
    '<' + the comment text as data. The fast reading is canonical."""
    html = "<p>x</p><!-- unterminated"
    fast = tree_sig(parse_html(html))
    assert fast == ("#root", (), 0, (("p", (), 1, ("x",)),))
    assert tree_sig(parse_html_stdlib(html)) != fast  # stdlib leaks it


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            [
                "<div>", "</div>", "<p>", "</p>", "<li>", "<ul>", "</ul>",
                "<table>", "<tr>", "<td>", "</table>", "</x>", "<b>", "</b>",
                "<img src=x>", "<br/>", "text ", "more words ", "&amp;",
                "&#65;", "<!-- c -->", "<script>a<b</script>", "<style>x</style>",
                '<a href="u">', "</a>", "<P>", "<EM>", "</EM>",
                '<div class="x y" id=z>', "<span data-a='1' hidden>", "</span>",
                '<a href=http://e.com/>', '<img src="a.png" alt="t w"/>',
                "<td colspan=2>", "<ol>", "</ol>", "<dl>", "<dt>", "<dd>",
            ]
        ),
        max_size=50,
    )
)
def test_differential_generated_soup(parts):
    assert_same("".join(parts))


def test_adversarial_truncated_tag_parses_fast():
    """Review regression: ambiguous attrs alternation backtracked
    exponentially on crawl-truncated tags (k=24 quoted attrs took >20 s);
    possessive quantifiers + the no-'>'-left early exit must keep it
    linear."""
    import time

    doc = "<div " + '="aaaa" ' * 60
    t0 = time.perf_counter()
    parse_html(doc)
    assert time.perf_counter() - t0 < 0.5
    t0 = time.perf_counter()
    parse_html("<a " * 100_000)  # 300 KB of truncated tags
    assert time.perf_counter() - t0 < 2.0


def test_nested_list_and_table_scopes():
    """li/td/tr auto-close is bounded by its list/table scope — nested
    structures keep their shape."""
    t = parse_html("<ul><li>A<ul><li>B</li><li>C</li></ul></li></ul>")
    li_a = t.children[0].children[0]
    inner = [c for c in li_a.children if not isinstance(c, str)]
    assert len(inner) == 1 and inner[0].tag == "ul" and len(inner[0].children) == 2

    t2 = parse_html("<table><tr><td>x<table><tr><td>y</td></tr></table></td></tr></table>")
    outer_td = t2.children[0].children[0].children[0]
    assert outer_td.tag == "td"
    inner_tables = [c for c in outer_td.children if not isinstance(c, str) and c.tag == "table"]
    assert len(inner_tables) == 1  # inner table stays inside the outer cell


def test_cdata_matches_stdlib():
    assert_same("<p>x<![CDATA[a>b]]>y</p>")


def test_p_closes_through_inline_wrapper():
    t = parse_html("<p>a<span>b<div>c")
    assert [c.tag for c in t.children if not isinstance(c, str)] == ["p", "div"]


def test_unterminated_comment_after_bare_lt_swallowed():
    """ADVICE r1: an unterminated <!-- appearing AFTER a bare '<' (which
    sets the no-more-tags shortcut) must still be swallowed to EOF, not
    leak '!-- secret' into extracted text."""
    fast = tree_sig(parse_html("a < b <!-- secret"))
    assert fast == ("#root", (), 0, ("a ", "<", " b "))
    # same for an unterminated CDATA marked section
    fast2 = tree_sig(parse_html("a < b <![CDATA[ hidden"))
    assert fast2 == ("#root", (), 0, ("a ", "<", " b "))


def test_differential_soup_cases_round2():
    """Second adversarial wave: CDATA-ish text, processing instructions,
    deep nesting, attribute edge shapes, numeric entity extremes,
    whitespace-heavy markup, nested tables/lists, and boundary '<'s."""
    cases = [
        "<?xml version='1.0'?><p>pi then content</p>",
        "<?php echo '</p>'; ?>text",
        "<p>a<![CDATA[ not < real ]]>b</p>",
        "<div>" * 40 + "deep" + "</div>" * 40,
        "<p  class = 'spaced'   id=x >attr spacing</p>",
        "<p class>valueless attr</p>",
        "<p =bare>odd attr</p>",
        "<p class=''>empty quoted</p>",
        "<p>&#x41;&#X41;&#65;&#xZZ; &#;</p>",
        "<p>&#1114111; &#1114112;</p>",  # max codepoint and beyond
        "<p>tab\tand\nnewline\r\nand\fformfeed</p>",
        "<ol><li><ol><li>nested<li>list</ol><li>outer</ol>",
        "<table><thead><tr><th>h</thead><tbody><tr><td>c</tbody></table>",
        "<em><strong><em>nested inline</em></strong></em>",
        "<p><span>span across <div>block?</div> end</span></p>",
        "< p>not a tag</ p>",
        "<p>< /p></p>",
        "<p>end with lt <",
        "<p>end with amp &",
        "<textarea><p>not parsed?</p></textarea>",
        "<pre>  spaced\n  lines  </pre>",
        "<a><b><c><d>unknown tags</d></c></b></a>",
        "<p title='multi\nline'>newline in attr</p>",
        "<input type=checkbox checked disabled>",
        "x" * 5000 + "<p>after long text</p>",
        "<p>" + "&amp;" * 200 + "</p>",
    ]
    for c in cases:
        assert_same(c)


# --- generative differential (random well-formed-ish soup) -----------------
# Constrained to constructs where stdlib behavior is the contract (no
# unterminated comments / stray '<' / exotic attr names, which have
# documented canonical divergences): random interleavings of text,
# balanced-ish tags, attributes, entities, comments.

_TAGS = ["p", "div", "span", "b", "i", "ul", "li", "table", "tr", "td", "a"]
_frag_text = st.text(alphabet="abc xyz.,!?", min_size=0, max_size=12)
_frag_entity = st.sampled_from(["&amp;", "&lt;", "&gt;", "&#65;", "&quot;"])
_frag_comment = st.text(alphabet="abc -", min_size=0, max_size=8).map(
    lambda s: f"<!--{s.replace('--', '-')}-->"
)
_frag_attr = st.sampled_from(
    ["", " id=x", ' class="a b"', " href='u?a=1&amp;b=2'", " checked", " a=1 b=2"]
)


@st.composite
def _soup(draw):
    parts = []
    open_stack = []
    for _ in range(draw(st.integers(0, 18))):
        kind = draw(st.integers(0, 5))
        if kind == 0:
            parts.append(draw(_frag_text))
        elif kind == 1:
            parts.append(draw(_frag_entity))
        elif kind == 2:
            parts.append(draw(_frag_comment))
        elif kind == 3:
            t = draw(st.sampled_from(_TAGS))
            parts.append(f"<{t}{draw(_frag_attr)}>")
            open_stack.append(t)
        elif kind == 4 and open_stack:
            parts.append(f"</{open_stack.pop()}>")
        elif kind == 5:
            # mismatched/unopened end tag — stdlib handles deterministically
            parts.append(f"</{draw(st.sampled_from(_TAGS))}>")
    return "".join(parts)


@given(_soup())
@settings(max_examples=300, deadline=None)
def test_differential_generative_soup(html):
    assert_same(html)


def test_differential_rawtext_cases():
    for c in [
        "<SCRIPT>if(a<b)</SCRIPT>x",
        "<script></script >after",
        "<script>a</script><script>b</script>",
        "<script src=x></script>tail",
        "<style>/* </div> */</style>ok",
    ]:
        assert_same(c)


def test_documented_divergence_unterminated_rawtext():
    """<script>/<style> with no closing tag: the fast tokenizer keeps the
    tail as the element's text (HTML5: script data runs to EOF); stdlib
    silently DROPS it at close(). Inert for extraction (script/style
    content is boilerplate-stripped either way); the fast reading is
    canonical for this engine."""
    fast = tree_sig(parse_html("<script>no close"))
    assert fast == ("#root", (), 0, (("script", (), 1, ("no close",)),))
    assert tree_sig(parse_html_stdlib("<script>no close")) == (
        "#root", (), 0, (("script", (), 1, ()),),
    )
