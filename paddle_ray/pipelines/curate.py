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

    # per-lang rollup stays distributed: partial (lang, n, chars) per block
    # inside map_batches, then a #langs-sized groupby — the driver sees one
    # row per language, never one per surviving document (VERDICT r2 #2:
    # the previous kept.to_pandas() pulled a corpus-sized frame).
    from ray.data.aggregate import Sum

    def lang_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        g = pa.TableGroupBy(batch.select(["lang", "n_chars_ext"]), "lang").aggregate(
            [("n_chars_ext", "count"), ("n_chars_ext", "sum")]
        )
        return pa.table(
            {
                "lang": g["lang"],
                "n_docs": _pc.cast(g["n_chars_ext_count"], pa.int64()),
                "sum_chars": _pc.cast(g["n_chars_ext_sum"], pa.int64()),
            }
        )

    rolled = (
        kept.map_batches(lang_partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars")
        )
    )
    out = rolled.to_pandas().sort_values("lang").reset_index(drop=True)
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


# --------------------------------------------------------------------------
# curation v2: extraction -> Gopher gate -> decontaminate -> stratified
# sample -> per-lang stats (the full webtext-hygiene composition, one oracle)
# --------------------------------------------------------------------------

V2_SAMPLE_K = 10


class _CleanRanker:
    """Actor-pool stage: drop contaminated docs (any word-k-gram shared
    with the broadcast benchmark set, fetched ONCE per actor in
    __init__) and emit the local per-lang k-smallest md5 ranks — the
    shuffle then moves <= k rows per (lang, block)."""

    def __init__(self, bench_ref, k: int):
        import ray

        self.bench: frozenset = ray.get(bench_ref)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .webtext import DECON_K, _words, md5_rank

        rows = []
        for doc_id, lang, text, n_chars in zip(
            batch["doc_id"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
            batch["n_chars_ext"].to_pylist(),
        ):
            ws = _words(text)
            grams = {
                " ".join(ws[i : i + DECON_K]) for i in range(len(ws) - DECON_K + 1)
            }
            if grams & self.bench:
                continue
            rows.append((doc_id, lang, n_chars, md5_rank(doc_id)))
        df = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars_ext", "rank"])
        local = (
            df.sort_values(["rank", "doc_id"], kind="mergesort")
            .groupby("lang", as_index=False, sort=False)
            .head(self.k)
        )
        return pa.table(
            {
                "doc_id": pa.array(local.doc_id, pa.int64()),
                "lang": pa.array(local.lang, pa.string()),
                "n_chars_ext": pa.array(local.n_chars_ext, pa.int64()),
                "rank": pa.array(local["rank"], pa.string()),
            }
        )


def curate_corpus_v2(sf_dir: str, k: int = V2_SAMPLE_K) -> pd.DataFrame:
    """The full training-data curation chain over EXTRACTED text:

        pages -> extraction (actor pool)
              -> Gopher quality gate (word count / dup fraction /
                 stopword ratio / mean word length, webtext.py thresholds)
              -> benchmark decontamination (broadcast 3-gram set,
                 benchmark slice doc_id % 97 == 0 excluded + any doc
                 sharing a shingle with it dropped)
              -> stratified md5-rank sample (k per lang)
              -> per-lang rollup

    Extraction is byte-identical per url (extract_roundtrip oracle), so
    the whole five-stage composition is value-checked by one SQL oracle
    over `documents`. Scale notes: the quality gate + flagger are
    stateless per-batch kernels on the extraction stream (no shuffle);
    the benchmark shingle set is built from a masked slim read and
    broadcast once; the only shuffle after extraction carries <= k rows
    per (lang, block) (the sample's local top-k partials)."""
    from .webtext import DECON_BENCH_MOD, _words, build_bench_shingles, quality_gate

    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    ds = extract_pipeline(pages_from_documents(sf_dir), cfg=cfg)

    def qualify(batch: pa.Table) -> pa.Table:
        ids, langs, texts, chars = [], [], [], []
        for url, lang, text in zip(
            batch["url"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            doc_id = int(url.rsplit("/", 1)[1])
            if doc_id % DECON_BENCH_MOD == 0:
                continue  # benchmark slice never enters the corpus
            if not quality_gate(_words(text))[0]:
                continue
            ids.append(doc_id)
            langs.append(lang)
            texts.append(text)
            chars.append(len(text))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
                "n_chars_ext": pa.array(chars, pa.int64()),
            }
        )

    qualified = ds.map_batches(qualify, batch_format="pyarrow", batch_size=None)

    # benchmark shingles from a slim masked read of the source table
    # (extraction is byte-identical, so this equals shingling the
    # benchmark docs' extracted text without a second extraction pass)
    bench_ref = build_bench_shingles(sf_dir)

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["rank", "doc_id"], kind="mergesort").head(k)[
            ["doc_id", "lang", "n_chars_ext"]
        ]

    sampled = (
        qualified.map_batches(
            _CleanRanker,
            batch_format="pyarrow",
            concurrency=(1, 4),
            fn_constructor_kwargs={"bench_ref": bench_ref, "k": k},
        )
        .groupby("lang")
        .map_groups(global_topk)
        .to_pandas()
    )
    out = (
        sampled.groupby("lang", as_index=False)
        .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars_ext", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "sum_chars": "int64"})


def _curate_v2_sql() -> str:
    from .webtext import (
        DECON_BENCH_MOD,
        DECON_K,
        QF_MAX_DUP_FRAC,
        QF_MIN_MEAN_WL,
        QF_MAX_MEAN_WL,
        QF_MIN_STOP_RATIO,
        QF_MIN_WORDS,
        _gram_sql,
    )

    return f"""
WITH toks AS (
  SELECT doc_id, lang, length(text) AS n_chars_ext,
         regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(text) != ''
),
qual AS (
  SELECT doc_id, lang, n_chars_ext FROM toks
  WHERE len(ts) >= {QF_MIN_WORDS}
    AND 1.0 - len(list_distinct(ts)) * 1.0 / len(ts) <= {QF_MAX_DUP_FRAC}
    AND len(list_filter(ts, t -> lower(t) IN
      ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
      * 1.0 / len(ts) >= {QF_MIN_STOP_RATIO}
    AND list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts)
        BETWEEN {QF_MIN_MEAN_WL} AND {QF_MAX_MEAN_WL}
    AND doc_id % {DECON_BENCH_MOD} != 0
),
g AS (
  SELECT doc_id, {_gram_sql(DECON_K)} AS s
  FROM toks, LATERAL unnest(generate_series(1, len(ts) - {DECON_K - 1})) AS gs(i)
),
bench AS (SELECT DISTINCT s FROM g WHERE doc_id % {DECON_BENCH_MOD} = 0),
contaminated AS (
  SELECT DISTINCT doc_id FROM g
  WHERE doc_id % {DECON_BENCH_MOD} != 0 AND s IN (SELECT s FROM bench)
),
clean AS (
  SELECT * FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
sampled AS (
  SELECT lang, n_chars_ext,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM clean
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars_ext) AS BIGINT) AS sum_chars
FROM sampled WHERE rn <= {V2_SAMPLE_K}
GROUP BY lang ORDER BY lang
"""


CURATE_V2_SQL = _curate_v2_sql()
