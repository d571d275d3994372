"""Text-analysis pipelines over `documents`: token counting, quality
scoring, language ID, fingerprinting, extraction-side stats.

All hot paths are map_batches with per-batch vectorized/linear kernels
from functions/textstats.py; aggregates pre-reduce per batch before any
groupby. SQL-expressible ops carry DuckDB oracles in __ray_entry__.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.textstats import (
    bpe_token_count,
    detect_lang,
    quality_features,
    token_count,
    winnow_fingerprint,
)


def _docs(sf_dir: str, columns=("doc_id", "text")) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def token_counts(sf_dir: str) -> pd.DataFrame:
    """Per-doc whitespace + BPE-ish token counts (oracled)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
                "n_bpe_tokens": pa.array([bpe_token_count(t) for t in texts], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


TOKEN_COUNTS_SQL = """
SELECT doc_id,
       len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\\sA-Za-z0-9]+')) AS n_bpe_tokens
FROM documents ORDER BY doc_id
"""


def quality_scores(sf_dir: str) -> pd.DataFrame:
    """Per-doc quality features (stop_ratio oracled via list_filter)."""

    def f(batch: pa.Table) -> pa.Table:
        rows = [quality_features(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
                "stop_ratio": pa.array([r["stop_ratio"] for r in rows], pa.float64()),
                "mean_word_len": pa.array([r["mean_word_len"] for r in rows], pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


QUALITY_SQL = """
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts FROM documents
)
SELECT doc_id,
       len(ts) AS n_tokens,
       ROUND(len(list_filter(ts, t -> lower(t) IN
         ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
         * 1.0 / len(ts), 6) AS stop_ratio,
       ROUND(list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts), 6) AS mean_word_len
FROM toks ORDER BY doc_id
"""


def lang_id(sf_dir: str) -> pd.DataFrame:
    """Heuristic language ID per doc (non-SQL; rows-only driver check).
    Deterministic n-gram/script scoring."""

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pred_lang": pa.array([detect_lang(t) for t in batch["text"].to_pylist()], pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


def content_hashes(sf_dir: str) -> pd.DataFrame:
    """sha256 per doc (oracled — the lineage hash used by manifests)."""
    import hashlib

    def f(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "content_hash": pa.array(
                    [hashlib.sha256(t.encode()).hexdigest() for t in batch["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


CONTENT_HASHES_SQL = """
SELECT doc_id, sha256(text) AS content_hash FROM documents ORDER BY doc_id
"""


def fingerprints(sf_dir: str) -> pd.DataFrame:
    """Winnowing fingerprints (rolling k-gram hashes, min per window).
    Non-SQL; rows-only check. Returns doc_id + fingerprint size + first
    fingerprint value (stable summary columns)."""

    def f(batch: pa.Table) -> pa.Table:
        fps = [winnow_fingerprint(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fp": pa.array([len(fp) for fp in fps], pa.int64()),
                "fp_head": pa.array([(fp[0] if fp else 0) - (1 << 60) for fp in fps], pa.int64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


def lang_doc_stats(sf_dir: str) -> pd.DataFrame:
    """groupby(lang): doc count + char sum (partial agg per batch first)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        g = df.groupby("lang", as_index=False).agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "sum_chars": "int64"})


LANG_DOC_STATS_SQL = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
"""
