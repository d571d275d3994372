"""Unit tests: stdlib DOM builder (paddle_ray/functions/dom.py)."""

from paddle_ray.functions.dom import Node, decode_html_bytes, parse_html


def _first(root: Node, tag: str) -> Node | None:
    return next((n for n in root.iter_nodes() if n.tag == tag), None)


def test_basic_tree_and_text_order():
    root = parse_html("<html><body><p>a <b>b</b> c</p></body></html>")
    p = _first(root, "p")
    assert p is not None
    assert "".join(p.text_parts()) == "a b c"


def test_mixed_text_and_inline_order():
    # regression: text before/after inline elements must stay in doc order
    root = parse_html("<p>x<b>y</b>z<i>w</i>q</p>")
    assert "".join(_first(root, "p").text_parts()) == "xyzwq"


def test_void_elements_do_not_nest():
    root = parse_html("<p>a<br>b<img src='x.png'>c</p>")
    p = _first(root, "p")
    assert "".join(p.text_parts()) == "abc"
    assert _first(root, "img").parent is p


def test_p_autoclose_on_block():
    root = parse_html("<body><p>one<div>two</div></body>")
    p = _first(root, "p")
    div = _first(root, "div")
    assert div.parent.tag == "body"  # p was auto-closed
    assert "".join(p.text_parts()) == "one"


def test_li_autoclose():
    root = parse_html("<ul><li>a<li>b<li>c</ul>")
    ul = _first(root, "ul")
    lis = [c for c in ul.children if isinstance(c, Node) and c.tag == "li"]
    assert [("".join(li.text_parts())) for li in lis] == ["a", "b", "c"]


def test_stray_end_tag_ignored():
    root = parse_html("<body></div><p>ok</p></body>")
    assert "".join(_first(root, "p").text_parts()) == "ok"


def test_unclosed_tags_recovered():
    root = parse_html("<div><p>a<p>b")
    ps = [n for n in root.iter_nodes() if n.tag == "p"]
    assert ["".join(p.text_parts()) for p in ps] == ["a", "b"]


def test_script_style_excluded_from_text():
    root = parse_html("<body><script>var x=1;</script><style>p{}</style><p>t</p></body>")
    body = _first(root, "body")
    assert "".join(body.text_parts()).strip() == "t"


def test_entities_decoded():
    root = parse_html("<p>a &amp; b &#8212; c</p>")
    assert "".join(_first(root, "p").text_parts()) == "a & b — c"


def test_tag_path_with_sibling_index():
    root = parse_html("<html><body><main><p>x</p><p>y</p></main></body></html>")
    ps = [n for n in root.iter_nodes() if n.tag == "p"]
    assert ps[0].path() == "html/body/main/p"
    assert ps[1].path() == "html/body/main/p[2]"


def test_table_cell_autoclose():
    root = parse_html("<table><tr><td>a<td>b<tr><td>c</table>")
    trs = [n for n in root.iter_nodes() if n.tag == "tr"]
    assert len(trs) == 2
    assert ["".join(td.text_parts()) for td in trs[0].children if isinstance(td, Node)] == ["a", "b"]


def test_decode_html_bytes_fallback():
    assert decode_html_bytes("héllo".encode("utf-8")) == "héllo"
    assert decode_html_bytes(b"h\xe9llo") == "héllo"  # latin-1 fallback


def test_sibling_index_memo_survives_mutation():
    """index memoizes a per-parent sibling map (O(n) aggregate for flat
    docs); the cache must rebuild when children are appended afterwards."""
    root = parse_html("<html><body><p>a</p><span>s</span><p>b</p></body></html>")
    body = _first(root, "body")
    ps = [n for n in body.children if isinstance(n, Node) and n.tag == "p"]
    assert [p.index for p in ps] == [1, 2]  # builds + uses the memo
    late = Node("p", parent=body)
    body.children.append(late)
    assert late.index == 3  # len(children) changed -> memo rebuilt
    assert ps[0].index == 1 and ps[1].index == 2
    assert _first(root, "span").index == 1
    assert root.index == 0  # parentless
