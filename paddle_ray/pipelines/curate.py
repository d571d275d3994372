"""End-to-end corpus curation: the canonical training-data composition.

    pages -> extraction (DocumentExtractor actor pool)
          -> length quality gate (vectorized)
          -> exact dedup by content hash (hash shuffle, first-by-url wins)
          -> per-lang corpus stats

Because extraction is byte-identical per url to the ground-truth text
(extract_roundtrip oracle), the WHOLE composition is SQL-checkable
against the `documents` table — the oracle reproduces the gate, the
window-function dedup, and the rollup over the same text.

Scale notes: the heavy html column never reaches the first shuffle (the
extractor drops it); dedup shuffles only (content_hash, url, lang,
n_chars_ext) — ~100 bytes/row at any corpus size; the deterministic
output sort is skipped (aggregate consumers don't need it).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..core.config import ExtractConfig
from ..sources.pages import pages_from_documents
from .extract import extract_pipeline

MIN_CHARS = 200


def curate_corpus(sf_dir: str) -> pd.DataFrame:
    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    ds = extract_pipeline(pages_from_documents(sf_dir), cfg=cfg)

    def gate(batch: pa.Table) -> pa.Table:
        n = pc.utf8_length(batch["extracted_text"])
        t = batch.append_column("n_chars_ext", pc.cast(n, pa.int64()))
        t = t.filter(pc.greater_equal(n, pa.scalar(MIN_CHARS)))
        return t.select(["url", "lang", "content_hash", "n_chars_ext"])

    slim = ds.map_batches(gate, batch_format="pyarrow", batch_size=None)

    def first_by_url(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values("url", kind="mergesort").head(1)

    kept = slim.groupby("content_hash").map_groups(first_by_url, batch_format="pandas")

    out = (
        kept.to_pandas()
        .groupby("lang", as_index=False)
        .agg(n_docs=("url", "size"), sum_chars=("n_chars_ext", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "sum_chars": "int64"})


CURATE_SQL = f"""
WITH kept AS (
  SELECT lang, length(text) AS n_chars_ext,
         ROW_NUMBER() OVER (PARTITION BY text
                            ORDER BY 'https://fixtures.local/doc/' || CAST(doc_id AS VARCHAR)) AS rn
  FROM documents
  WHERE length(text) >= {MIN_CHARS}
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars_ext) AS BIGINT) AS sum_chars
FROM kept WHERE rn = 1
GROUP BY lang ORDER BY lang
"""
