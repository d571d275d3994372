"""Deterministic synthetic `pages` table generation (FIXTURES.md §1).

Two generators, both seeded and byte-stable across runs:

- :func:`pages_from_documents` — wraps each `/root/testdata/sf*/documents`
  row's ``text`` in a full boilerplate HTML shell with the ground truth
  recoverable **byte-identically** (the DuckDB oracle for the flagship
  pipeline is then simply ``SELECT url, text AS extracted_text FROM
  documents``).
- :func:`synth_pages` — standalone grammar exercising every extraction
  feature: headings, multi-paragraph articles, lists, tables, bbox-keyed
  images, entities, tag soup, MB-scale outliers, and ~5% pseudo-PDF binary
  payloads for the actor-pool path. Returns both the pages Arrow table and
  the expected extraction per url (generator ground truth).

The pseudo-PDF payload format (in-sandbox stand-in for real PDFs, since no
PDF renderer ships here): ``b"%PDF-" + b"\\n" + json`` where json =
``{"pages": [[{label, bbox, content}, ...], ...]}``. The PayloadExtractor
stage (stages/payload.py) "renders" and "detects" these deterministically,
mirroring the reference's page-iterate -> model -> blocks dataflow
(`model.py:300-337,469-552`).
"""

from __future__ import annotations

import datetime as _dt
import html as _html
import json
import random

import pyarrow as pa

from ..core.schema import PAGES_SCHEMA

EPOCH = _dt.datetime(2025, 1, 1)
LANGS = ["en", "de", "fr", "hi", "zh"]

_WORDS = (
    "stream batch vector query table index shard merge scan filter join order "
    "group window partition schema column row byte block actor task cluster "
    "object store spill lineage manifest checkpoint replica quorum gossip"
).split()

_NAV_WORDS = "home about products pricing blog careers contact login signup docs".split()


def _rng(seed: int, i: int) -> random.Random:
    return random.Random(f"pages:{seed}:{i}")


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def _boiler_shell(rng: random.Random, title: str, body_inner: str, soup: bool) -> str:
    """Wrap content in the standard boilerplate shell (nav/aside/footer/etc)."""
    nav_items = "".join(
        f'<li><a href="/{w}">{w}</a></li>' for w in rng.sample(_NAV_WORDS, rng.randint(5, 9))
    )
    ad = f'<div class="ad banner">buy {rng.choice(_WORDS)} now limited offer</div>'
    aside = f"<aside><h3>related</h3><ul>{nav_items}</ul></aside>"
    footer_links = " ".join(f'<a href="/{w}">{w}</a>' for w in rng.sample(_NAV_WORDS, 4))
    soup_frag = "</div><p>stray" if soup else ""
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>{title}</title>"
        '<meta charset="utf-8"><style>body{color:#222}.ad{display:none}</style>'
        "<script>var t=Date.now();console.log(t);</script>"
        "</head><body>"
        f'<header><nav><ul>{nav_items}</ul></nav></header>'
        f"{ad}{soup_frag}"
        f"<main><article>{body_inner}</article></main>"
        f"{aside}"
        f'<footer><p>&copy; 2025 example corp</p>{footer_links}</footer>'
        "</body></html>"
    )


def wrap_text_as_html(text: str, title: str, rng: random.Random, soup: bool = False) -> str:
    """One-paragraph wrap: expected extraction == ``text`` byte-identically.

    Note the shell's footer/nav/ads contain text that must be provably
    stripped; ``<main>`` semantics guarantee root selection.
    """
    return _boiler_shell(rng, title, f"<p>{_html.escape(text)}</p>", soup)


def pages_from_documents(sf_dir: str) -> pa.Table:
    """Derive a `pages` table from ``{sf_dir}/documents.parquet`` (on the fly,
    no files written). url = https://fixtures.local/doc/{doc_id}."""
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    urls, tss, htmls, texts, langs = [], [], [], [], []
    for doc_id, text, lang in zip(
        docs["doc_id"].to_pylist(), docs["text"].to_pylist(), docs["lang"].to_pylist()
    ):
        rng = _rng(42, doc_id)
        soup = doc_id % 10 == 7  # deterministic tag-soup subset
        html = wrap_text_as_html(text, f"doc {doc_id}", rng, soup=soup)
        urls.append(f"https://fixtures.local/doc/{doc_id}")
        tss.append(EPOCH + _dt.timedelta(seconds=int(doc_id) * 137))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)
    return pa.table(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
        schema=PAGES_SCHEMA,
    )


# ---------------------------------------------------------------------------
# full-grammar generator (golden fixtures + bench input)
# ---------------------------------------------------------------------------

def _gen_article(rng: random.Random, n_paras: int, with_extras: bool):
    """Generate article inner HTML + the expected extraction blocks.

    Returns (inner_html, expected_parts) where expected_parts joined by
    "\\n\\n" is the expected extracted_text.
    """
    inner: list[str] = []
    expected: list[str] = []

    title = _sentence(rng, rng.randint(3, 6))
    inner.append(f"<h1>{title}</h1>")
    expected.append(title)

    for p in range(n_paras):
        if with_extras and p == 1:
            h = _sentence(rng, 4)
            inner.append(f"<h2>{h}</h2>")
            expected.append(h)
        sent = _sentence(rng, rng.randint(15, 40))
        roll = rng.random()
        if roll < 0.3:
            # entity + inline markup case: decoded/flattened deterministically
            sent = sent.replace(" ", " &amp; ", 1)
            decoded = sent.replace("&amp;", "&")
            inner.append(f"<p>{sent.split(' ', 1)[0]} <b>{sent.split(' ', 1)[1]}</b></p>")
            expected.append(decoded)
        elif roll < 0.45:
            # MID-WORD inline tag: extraction must not fabricate a space
            # (un<b>believ</b>able -> unbelievable)
            first, rest = sent.split(" ", 1)
            cut = max(1, len(first) // 2)
            inner.append(f"<p>{first[:cut]}<i>{first[cut:]}</i> {rest}</p>")
            expected.append(sent)
        else:
            inner.append(f"<p>{sent}</p>")
            expected.append(sent)

    if with_extras:
        items = [_sentence(rng, rng.randint(2, 5)) for _ in range(rng.randint(2, 5))]
        inner.append("<ul>" + "".join(f"<li>{i}</li>" for i in items) + "</ul>")
        expected.extend(items)

        rows = [[_sentence(rng, 2) for _ in range(3)] for _ in range(rng.randint(2, 4))]
        inner.append(
            "<table>"
            + "".join("<tr>" + "".join(f"<td>{c}</td>" for c in r) + "</tr>" for r in rows)
            + "</table>"
        )
        expected.append("\n".join(" | ".join(r) for r in rows))

        x1, y1 = rng.randint(0, 800), rng.randint(0, 1200)
        w, h = rng.randint(50, 1200), rng.randint(50, 900)
        alt = _sentence(rng, 3)
        inner.append(f'<p><img src="img_in_image_box_{x1}_{y1}_{x1+w}_{y1+h}.jpg" alt="{alt}"></p>')
        # image contributes no text; caption enrichment happens downstream

    return "".join(inner), expected


def _gen_pdf_payload(rng: random.Random, n_pages: int) -> tuple[bytes, str]:
    """Pseudo-PDF binary + its expected assembled text (per-page blocks,
    `=== PAGE N ===` separators per the reference client contract
    `client/testScript.py:138-158`)."""
    pages = []
    parts: list[str] = []
    for pi in range(n_pages):
        blocks = []
        for bi in range(rng.randint(2, 5)):
            content = _sentence(rng, rng.randint(8, 20))
            y = 100 + 200 * bi
            blocks.append(
                {"label": "title" if bi == 0 else "text", "bbox": [50, y, 1100, y + 150], "content": content}
            )
        if rng.random() < 0.5:
            # figure block: empty content (no OCR text inside the image), so
            # expected text is unchanged; sits right under the last text
            # block -> the conditional Captioner finds that block as context
            # (M11 text-above-image) and captions it via the markdown ref
            y = 100 + 200 * len(blocks)
            blocks.append({"label": "image", "bbox": [60, y, 900, y + 400], "content": ""})
        pages.append(blocks)
        parts.append(f"=== PAGE {pi + 1} ===")
        parts.extend(b["content"] for b in blocks if b["content"])
    payload = b"%PDF-\n" + json.dumps({"pages": pages}, sort_keys=True).encode()
    return payload, "\n\n".join(parts)


def synth_pages(n: int, seed: int = 42, outlier_every: int = 200, pdf_every: int = 20):
    """Generate n synthetic pages. Returns (pa.Table pages, dict url->expected_text)."""
    urls, tss, htmls, texts, langs = [], [], [], [], []
    expected: dict[str, str] = {}
    for i in range(n):
        rng = _rng(seed, i)
        url = f"https://site{i % 50}.example/cat{i % 7}/{i:08d}"
        ts = EPOCH + _dt.timedelta(seconds=i * 137)
        lang = LANGS[i % len(LANGS)]
        if pdf_every and i % pdf_every == 13 % pdf_every:
            payload, exp = _gen_pdf_payload(rng, rng.randint(1, 4))
            html_bytes, text = payload, exp
        else:
            n_paras = rng.randint(3, 12)
            if outlier_every and i % outlier_every == outlier_every - 1:
                n_paras = 8000  # MB-scale outlier for skew handling
            inner, parts = _gen_article(rng, n_paras, with_extras=(i % 3 == 0))
            soup = i % 10 == 9
            html_s = _boiler_shell(rng, f"page {i}", inner, soup)
            html_bytes, text = html_s.encode("utf-8"), "\n\n".join(parts)
        urls.append(url)
        tss.append(ts)
        htmls.append(html_bytes)
        texts.append(text)
        langs.append(lang)
        expected[url] = text
    table = pa.table(
        {"url": urls, "warc_ts": tss, "html": htmls, "text": texts, "lang": langs},
        schema=PAGES_SCHEMA,
    )
    return table, expected


def slice_table_by_bytes(
    table: pa.Table,
    payload_col: str = "html",
    target_bytes: int = 512 << 10,
    max_rows: int = 128,
) -> list[pa.Table]:
    """Split an in-memory pages table into zero-copy slices bounded by BOTH
    payload bytes and row count, so `ray.data.from_arrow` gets byte-balanced
    blocks: without this, one MB-scale outlier row serializes hundreds of
    small rows behind it in the same block (the skew the north_rule calls
    out), and a single-table `from_arrow` yields ONE block = no parallelism.
    """
    import pyarrow.compute as pc

    if table.num_rows == 0:
        return [table]
    sizes = pc.binary_length(table[payload_col]).to_numpy(zero_copy_only=False)
    slices: list[pa.Table] = []
    start, acc = 0, 0
    for i, s in enumerate(sizes):
        acc += int(s)
        if (acc >= target_bytes or (i - start + 1) >= max_rows) and i + 1 > start:
            slices.append(table.slice(start, i + 1 - start))
            start, acc = i + 1, 0
    if start < table.num_rows:
        slices.append(table.slice(start))
    return slices


def write_pages_parquet(path: str, n: int, seed: int = 42, **kw) -> dict[str, str]:
    """Materialize a synth pages table to one parquet file; returns expected map."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    table, expected = synth_pages(n, seed, **kw)
    pq.write_table(table, path)
    return expected
