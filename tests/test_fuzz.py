"""Property-based robustness tests (hypothesis): the extraction kernels
must never crash on arbitrary input and must be deterministic — at 10^12
documents every representable tag soup WILL occur."""

from hypothesis import given, settings
from hypothesis import strategies as st

from paddle_ray.api import extract_document_request
from paddle_ray.functions.boilerplate import extract_document, norm_ws
from paddle_ray.functions.dom import parse_html

MAX_EXAMPLES = 60


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.binary(max_size=4096))
def test_extract_never_crashes_on_bytes(payload):
    r = extract_document_request(payload)  # must not raise
    assert r["errorCode"] in (0, 422)


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.text(max_size=2048))
def test_dom_parse_total_on_text(soup):
    tree = parse_html(soup)  # must not raise
    assert tree is not None


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(
    st.lists(
        st.sampled_from(
            ["<div>", "</div>", "<p>", "</p>", "<li>", "<table>", "<td>", "</x>",
             "<script>var a=1;</script>", "<b", "text ", "&amp;", "&bogus;", "<!-- c -->"]
        ),
        max_size=40,
    )
)
def test_extract_deterministic_on_tag_soup(parts):
    html = "".join(parts).encode()
    a = extract_document(html)
    b = extract_document(html)
    assert a["extracted_text"] == b["extracted_text"]
    assert a["n_blocks"] == b["n_blocks"]


@settings(max_examples=MAX_EXAMPLES, deadline=None)
@given(st.text(max_size=512))
def test_norm_ws_idempotent(s):
    once = norm_ws(s)
    assert norm_ws(once) == once
