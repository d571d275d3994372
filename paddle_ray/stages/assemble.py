"""Page -> document reassembly as a keyed shuffle operator.

The reference assembles pages client-side by list order
(`client/testScript.py:132-179`); here it is an engine-side operator for
exploded per-page datasets: ``groupby(url).map_groups`` with an explicit
in-group sort on ``page_index`` (Ray's parallel execution does NOT
preserve page order for free — SURVEY.md §2.6 O1). Used when a payload
stage emits one row per page; single-page HTML rows should take the
fast path (skip this shuffle entirely, they are already assembled).
"""

from __future__ import annotations

import pandas as pd

from .extract import PAGE_SEP


def assemble_pages_ds(pages_ds):
    """pages_ds rows: (url, page_index, page_text, ...). Returns one row per
    url: (url, extracted_text, n_pages) with deterministic page order and
    ``=== PAGE N ===`` separators."""

    def _assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("page_index")
        parts = []
        # zip over the two needed columns — iterrows built a full Series
        # per page in the per-document hot loop
        for pi, txt in zip(g["page_index"], g["page_text"]):
            parts.append(PAGE_SEP.format(n=int(pi) + 1))
            if txt:
                parts.append(txt)
        return pd.DataFrame(
            {
                "url": [g["url"].iloc[0]],
                "extracted_text": ["\n\n".join(parts)],
                "n_pages": [len(g)],
            }
        )

    return pages_ds.groupby("url").map_groups(_assemble, batch_format="pandas")
