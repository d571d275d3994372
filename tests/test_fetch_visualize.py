"""UrlFetcher (S1 URL variant) and visualize-knob (S5 analogue) tests."""

import pyarrow as pa

from paddle_ray.core.config import ExtractConfig
from paddle_ray.sources.fetch import UrlFetcher
from paddle_ray.sources.pages import synth_pages
from paddle_ray.stages.extract import DocumentExtractor, render_blocks_svg
from paddle_ray.stages.sniff import make_sniff_batch


def _url_batch(urls, payloads):
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "html": pa.array(payloads, pa.binary()),
        }
    )


def test_url_fetcher_fills_and_passes_through():
    store = {"https://x/1": b"<p>one</p>", "https://x/2": b"<p>two</p>"}
    f = UrlFetcher(fetch_fn=lambda u, t: store[u])
    out = f(_url_batch(["https://x/1", "https://x/2", "https://x/3"], [None, b"already", None]))
    assert out["html"].to_pylist() == [b"<p>one</p>", b"already", b""]
    errs = out["error"].to_pylist()
    assert errs[0] is None and errs[1] is None and "KeyError" in errs[2]


def test_url_fetcher_default_is_stubbed():
    out = UrlFetcher()(_url_batch(["https://x/1"], [None]))
    assert "NotImplementedError" in out["error"][0].as_py()


def test_visualize_knob_emits_svg():
    pages, _ = synth_pages(5, pdf_every=0, outlier_every=0)
    cfg = ExtractConfig(visualize=True)
    out = DocumentExtractor(cfg)(make_sniff_batch(cfg)(pages))
    svgs = out["visualization"].to_pylist()
    assert all(s.startswith("<svg") and s.endswith("</svg>") for s in svgs)
    assert any("<rect" in s for s in svgs)
    # deterministic
    out2 = DocumentExtractor(cfg)(make_sniff_batch(cfg)(pages))
    assert svgs == out2["visualization"].to_pylist()
    # off by default — schema unchanged
    out_off = DocumentExtractor(ExtractConfig())(make_sniff_batch(ExtractConfig())(pages))
    assert "visualization" not in out_off.column_names


def test_render_blocks_svg_empty():
    assert render_blocks_svg([]).startswith("<svg")
