"""Webtext curation operators over `documents`: Gopher-style repetition
metrics, a composed quality filter, CCNet-style unigram-LM scoring, and
benchmark decontamination.

These are the corpus-hygiene stages a large-scale training-data pipeline
runs between extraction and dedup (public recipes: Gopher/MassiveText
repetition filters, CCNet LM-perplexity bucketing, n-gram benchmark
decontamination as in GPT-3/PaLM appendices). The reference
(xynehq/paddle) stops at per-document extraction; these extend the
engine downstream of it. All four are value-oracled in DuckDB.

Scale contracts
---------------
- `repetition_metrics` / `quality_filter`: stateless per-batch kernels,
  no shuffle at all — embarrassingly parallel at any scale.
- `lm_perplexity`: pass 1 is a counts groupby whose shuffle moves one
  (word, count) row per distinct word per block (partial Counter per
  batch first); the model is broadcast once via `ray.put` and read once
  per actor in `__init__`. At webtext scale the vocabulary must be
  pruned to top-V words before broadcast (V ~ 1e6 => ~20 MB); the
  smoothing already accounts for out-of-vocabulary mass.
- `decontaminate`: the benchmark is a deterministic 1/97 corpus slice
  (a stand-in for a separate held-out eval table); extracting it costs
  one streaming pass with an Arrow-level mask, then its shingle set is
  broadcast once and the corpus side streams through the flagger — no
  shuffle. Real deployments read the benchmark table directly and hash
  shingles into int64s to bound broadcast size; here the literal
  strings are broadcast so the DuckDB oracle can reproduce membership
  exactly (no hash collisions).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .common import sized_read_parquet

# Gopher-ish thresholds tuned to the synthetic word-soup corpus so the
# filter is non-degenerate at every test sf (~1/3 of docs survive);
# real-webtext values are n_words in [50, 100k], dup_frac < 0.3 etc.
QF_MIN_WORDS = 25
QF_MAX_DUP_FRAC = 0.55
QF_MIN_STOP_RATIO = 0.02
QF_MIN_MEAN_WL = 3.0
QF_MAX_MEAN_WL = 8.0

# decontamination shingle size: public recipes use 8-13-gram collisions;
# the synthetic corpus has a ~40-word vocabulary, so k=3 is the size at
# which cross-document collisions are rare-but-present (the same
# signal-to-noise regime 13-grams give real webtext)
DECON_K = 3
DECON_BENCH_MOD = 97  # doc_id % mod == 0 -> held-out "benchmark" doc


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


def _words(text: str) -> list[str]:
    """Whitespace tokens. Matches regexp_split_to_array(trim(text),
    '\\s+') on ASCII whitespace; Python's str.split additionally treats
    Unicode whitespace (NBSP etc.) as separators where DuckDB's \\s does
    not. The test corpus is ASCII (the fingerprints oracle fails loudly
    otherwise), so the kernels and oracles agree; document-processing at
    webtext scale should normalize Unicode spaces upstream."""
    return text.split()


# --------------------------------------------------------------------------
# repetition metrics (Gopher/MassiveText-style duplicate-fraction signals)
# --------------------------------------------------------------------------

def repetition_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-doc repetition signals: duplicate-word fraction, most-frequent-
    word fraction, duplicate word-2-gram fraction. Stateless map_batches,
    no shuffle; oracled by REPETITION_SQL."""

    def f(batch: pa.Table) -> pa.Table:
        n_words, dup_f, top_f, dup2_f = [], [], [], []
        for t in batch["text"].to_pylist():
            ws = _words(t)
            n = len(ws)
            n_words.append(n)
            if n == 0:
                dup_f.append(0.0)
                top_f.append(0.0)
                dup2_f.append(0.0)
                continue
            c = Counter(ws)
            dup_f.append(round(1.0 - len(c) / n, 6))
            top_f.append(round(max(c.values()) / n, 6))
            n2 = n - 1
            if n2 <= 0:
                dup2_f.append(0.0)
            else:
                g2 = {(ws[i], ws[i + 1]) for i in range(n2)}
                dup2_f.append(round(1.0 - len(g2) / n2, 6))
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, pa.int64()),
                "dup_word_frac": pa.array(dup_f, pa.float64()),
                "top_word_frac": pa.array(top_f, pa.float64()),
                "dup_2gram_frac": pa.array(dup2_f, pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


REPETITION_SQL = """
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(ts) AS w FROM toks) GROUP BY doc_id, w
),
tops AS (SELECT doc_id, MAX(c) AS max_c, SUM(c) AS n FROM wc GROUP BY doc_id),
g2 AS (
  SELECT t.doc_id, COUNT(DISTINCT ts[i] || chr(10) || ts[i + 1]) AS d2,
         COUNT(*) AS n2
  FROM toks t, LATERAL unnest(generate_series(1, len(ts) - 1)) AS gs(i)
  GROUP BY t.doc_id
)
SELECT t.doc_id,
       len(t.ts) AS n_words,
       ROUND(CASE WHEN len(t.ts) = 0 THEN 0.0
                  ELSE 1.0 - len(list_distinct(t.ts)) * 1.0 / len(t.ts) END, 6) AS dup_word_frac,
       ROUND(COALESCE(tp.max_c * 1.0 / tp.n, 0.0), 6) AS top_word_frac,
       ROUND(COALESCE(1.0 - g2.d2 * 1.0 / g2.n2, 0.0), 6) AS dup_2gram_frac
FROM toks t
LEFT JOIN tops tp USING (doc_id)
LEFT JOIN g2 USING (doc_id)
ORDER BY t.doc_id
"""


# --------------------------------------------------------------------------
# composed quality filter (Gopher rules over the repetition + stop signals)
# --------------------------------------------------------------------------

def quality_gate(ws: list[str]) -> tuple[bool, float, float, float]:
    """The shared Gopher-gate predicate over a token list: returns
    (passes, dup_word_frac, stop_ratio, mean_word_len). Single source of
    truth for quality_filter AND curate.curate_corpus_v2 so the two
    Python sides cannot drift from each other or their SQL oracles."""
    from ..functions.textstats import STOPWORDS

    n = len(ws)
    if n < QF_MIN_WORDS:
        return (False, 0.0, 0.0, 0.0)
    c = Counter(ws)
    dup = 1.0 - len(c) / n
    stop = sum(v for w, v in c.items() if w.lower() in STOPWORDS) / n
    mwl = sum(len(w) for w in ws) / n
    ok = (
        dup <= QF_MAX_DUP_FRAC
        and stop >= QF_MIN_STOP_RATIO
        and QF_MIN_MEAN_WL <= mwl <= QF_MAX_MEAN_WL
    )
    return (ok, dup, stop, mwl)


def quality_filter(sf_dir: str) -> pd.DataFrame:
    """Docs surviving the composed Gopher-style gate (word count, dup
    fraction, stopword ratio, mean word length). One stateless pass
    computing all four signals per batch; survivors stream out — the
    filter itself never materializes the corpus. Oracle: QUALITY_FILTER_SQL."""

    def f(batch: pa.Table) -> pa.Table:
        keep_ids, n_words_o, dup_o, stop_o, mwl_o = [], [], [], [], []
        ids = batch["doc_id"].to_pylist()
        for did, t in zip(ids, batch["text"].to_pylist()):
            ws = _words(t)
            ok, dup, stop, mwl = quality_gate(ws)
            if ok:
                keep_ids.append(did)
                n_words_o.append(len(ws))
                dup_o.append(round(dup, 6))
                stop_o.append(round(stop, 6))
                mwl_o.append(round(mwl, 6))
        return pa.table(
            {
                "doc_id": pa.array(keep_ids, pa.int64()),
                "n_words": pa.array(n_words_o, pa.int64()),
                "dup_word_frac": pa.array(dup_o, pa.float64()),
                "stop_ratio": pa.array(stop_o, pa.float64()),
                "mean_word_len": pa.array(mwl_o, pa.float64()),
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


QUALITY_FILTER_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
m AS (
  SELECT doc_id, len(ts) AS n_words,
         1.0 - len(list_distinct(ts)) * 1.0 / len(ts) AS dup,
         len(list_filter(ts, t -> lower(t) IN
           ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
           * 1.0 / len(ts) AS stop,
         list_sum(list_transform(ts, t -> len(t))) * 1.0 / len(ts) AS mwl
  FROM toks WHERE len(ts) >= {QF_MIN_WORDS}
)
SELECT doc_id, n_words, ROUND(dup, 6) AS dup_word_frac,
       ROUND(stop, 6) AS stop_ratio, ROUND(mwl, 6) AS mean_word_len
FROM m
WHERE dup <= {QF_MAX_DUP_FRAC} AND stop >= {QF_MIN_STOP_RATIO}
  AND mwl BETWEEN {QF_MIN_MEAN_WL} AND {QF_MAX_MEAN_WL}
ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# CCNet-style unigram LM scoring (two-pass: counts shuffle -> broadcast model
# -> stateless scoring)
# --------------------------------------------------------------------------

class _LMScorer:
    """Actor-pool scorer: fetches the broadcast model ONCE per actor in
    __init__ (not per batch), then scores batches vectorized over the
    doc's distinct-word counts."""

    def __init__(self, model_ref):
        logp, self.n_total, self.vocab = ray.get(model_ref)
        self.logp = logp  # dict word -> ln p(word), add-one smoothed
        self.default = float(np.log(1.0 / (self.n_total + self.vocab + 1)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        xents = []
        lp = self.logp
        d = self.default
        for t in batch["text"].to_pylist():
            ws = _words(t)
            if not ws:
                xents.append(0.0)
                continue
            s = 0.0
            for w, c in sorted(Counter(ws).items()):
                s += c * lp.get(w, d)
            xents.append(round(-s / len(ws), 6))
        # pass through every non-payload column (doc_id, and lang when the
        # caller asked for it) so composed stages keep their keys
        out = batch.drop_columns(["text"])
        return out.append_column("xent", pa.array(xents, pa.float64()))


def lm_scores_ds(sf_dir: str, top_v: int = 1 << 16, columns=("doc_id", "text")):
    """The lm_perplexity pipeline WITHOUT the final sort/collect — a
    Dataset of per-doc cross-entropies with every non-text input column
    passed through, so downstream stages (perplexity_buckets) compose
    on the stream instead of a driver frame. See lm_perplexity for the
    model-building scale contract.

    Pass 1 (model): per-batch Counter partials -> groupby(word).sum —
    the shuffle moves one row per distinct word per block, never tokens.
    The (n_total, vocab) scalars come from O(#blocks) partials over the
    FULL distribution; the broadcast dict is pruned to the `top_v` most
    frequent words via per-block top-V partials (the driver never holds
    the whole vocabulary — CCNet practice: pruned words score at the OOV
    default, a deliberate approximation that never binds at test scale
    where vocab << top_v, keeping the oracle exact). Pass 2 (score):
    actor-pool map_batches reading the model ref in __init__. Oracled by
    LM_PERPLEXITY_SQL (identical smoothing)."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        c = Counter()
        for t in batch["text"].to_pylist():
            c.update(_words(t))
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "c": pa.array(list(c.values()), pa.int64()),
            }
        )

    # materialized once: two consumers (totals + top-V) must not re-scan
    # the corpus; the grouped result is vocabulary-sized, object-store
    # resident, never driver-collected in full
    counts_ds = (
        _docs(sf_dir)
        .map_batches(partial_counts, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .aggregate(Sum("c", alias_name="c"))
        .materialize()
    )

    def totals_part(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "s": pa.array([pc.sum(b["c"]).as_py() or 0], pa.int64()),
                "v": pa.array([len(b)], pa.int64()),
            }
        )

    def topv_part(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        if len(df) > top_v:
            df = df.sort_values(["c", "word"], ascending=[False, True], kind="mergesort").head(top_v)
        return pa.Table.from_pandas(df, preserve_index=False)

    totals = counts_ds.map_batches(totals_part, batch_format="pyarrow", batch_size=None).to_pandas()
    n_total = int(totals.s.sum())
    vocab = int(totals.v.sum())
    counts = (
        counts_ds.map_batches(topv_part, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["c", "word"], ascending=[False, True], kind="mergesort")
        .head(top_v)
    )
    denom = float(n_total + vocab + 1)
    logp = {
        w: float(np.log((c + 1.0) / denom)) for w, c in zip(counts.word, counts.c)
    }
    model_ref = ray.put((logp, n_total, vocab))

    return _docs(sf_dir, columns=columns).map_batches(
        _LMScorer,
        batch_format="pyarrow",
        concurrency=4,
        fn_constructor_kwargs={"model_ref": model_ref},
    )


def lm_perplexity(sf_dir: str, top_v: int = 1 << 16) -> pd.DataFrame:
    """Per-doc cross-entropy under the corpus-trained unigram LM — the
    driver-contract collect of lm_scores_ds (scale contract there)."""
    return lm_scores_ds(sf_dir, top_v=top_v).sort("doc_id").to_pandas()


PPL_N_BUCKETS = 3


def perplexity_buckets(sf_dir: str) -> pd.DataFrame:
    """CCNet head/middle/tail bucketing: per lang, rank docs by LM
    cross-entropy and split into {PPL_N_BUCKETS} NTILE buckets (ties
    broken by doc_id — the SQL NTILE order), reporting per-(lang,
    bucket) doc counts and mean cross-entropy. The bucket assignment
    runs as a groupby(lang).map_groups over slim (doc_id, xent) rows
    (~16 B/doc in-worker; at 10^12-doc scale swap the exact NTILE for
    thresholds from the mergeable log-histogram quantile sketch in
    functions/sketch.py — same output contract, bounded memory)."""

    def ntile(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["xent", "doc_id"], kind="mergesort")
        n = len(df)
        base, rem = divmod(n, PPL_N_BUCKETS)
        sizes = [base + 1] * rem + [base] * (PPL_N_BUCKETS - rem)
        buckets = np.repeat(np.arange(1, PPL_N_BUCKETS + 1), sizes)
        out = pd.DataFrame(
            {"lang": df.lang.to_numpy(), "bucket": buckets, "xent": df.xent.to_numpy()}
        )
        g = out.groupby("bucket", as_index=False).agg(
            lang=("lang", "first"), n_docs=("xent", "size"), avg_xent=("xent", "mean")
        )
        g["avg_xent"] = g.avg_xent.round(6)
        return g[["lang", "bucket", "n_docs", "avg_xent"]]

    out = (
        lm_scores_ds(sf_dir, columns=("doc_id", "lang", "text"))
        .groupby("lang")
        .map_groups(ntile, batch_format="pandas")
        .to_pandas()
        .sort_values(["lang", "bucket"])
        .reset_index(drop=True)
    )
    return out.astype({"bucket": "int64", "n_docs": "int64"})


PPL_BUCKETS_SQL = f"""
WITH ppl AS ({{lm_sql}})
SELECT lang, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(xent), 6) AS avg_xent
FROM (
  SELECT d.lang,
         ntile({PPL_N_BUCKETS}) OVER (PARTITION BY d.lang ORDER BY p.xent, p.doc_id) AS bucket,
         p.xent
  FROM ppl p JOIN documents d USING (doc_id)
)
GROUP BY 1, 2 ORDER BY 1, 2
"""


LM_PERPLEXITY_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) != ''
),
model AS (SELECT w, COUNT(*) AS c FROM toks GROUP BY w),
tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM model),
dw AS (SELECT doc_id, w, COUNT(*) AS cw FROM toks GROUP BY doc_id, w)
SELECT d.doc_id,
       COALESCE(x.xent, 0.0) AS xent
FROM documents d LEFT JOIN (
  SELECT dw.doc_id,
         ROUND(-SUM(dw.cw * ln((m.c + 1.0) / (t.n + t.v + 1))) / SUM(dw.cw), 6) AS xent
  FROM dw JOIN model m USING (w) CROSS JOIN tot t
  GROUP BY dw.doc_id
) x USING (doc_id)
ORDER BY d.doc_id
"""

# the bucket oracle nests the FULL perplexity oracle, so any LM/smoothing
# drift breaks both checks at once instead of silently diverging
PPL_BUCKETS_SQL_FULL = PPL_BUCKETS_SQL.format(lm_sql=LM_PERPLEXITY_SQL)


# --------------------------------------------------------------------------
# benchmark decontamination (Bloom prefilter + exact distributed verify join)
# --------------------------------------------------------------------------

# Broadcast-size ceiling for the driver-collected shingle-SET mode used by
# curate_corpus_v2 (any-hit drop needs the set in-process). A real
# benchmark is small by definition; a derived slice that outgrows this is
# a misconfiguration, not a workload — fail loudly and name the scale
# path (decontaminate's fixed-size Bloom + distributed verify join).
BENCH_SET_MAX_BYTES = 256 << 20
# Bloom sizing for decontaminate's prefilter: the packed broadcast is
# m_bits/8 bytes REGARDLESS of corpus or benchmark size (the scale
# contract); at 2^23 bits / 7 hashes the false-positive rate stays <1%
# up to ~800k bench shingles, and every positive is verified by the
# exact join anyway — fp only costs shuffle bytes, never correctness.
DECON_BLOOM_BITS = 1 << 23


def _shingle_digests(ws: list[str], k: int) -> set[str]:
    """Distinct blake2b-128 hex digests of a doc's word k-grams — the
    unit that crosses the decontamination shuffle (32 B fixed vs
    unbounded gram strings; collision ~1e-20, same contract as
    traindata.duplicate_ngram_spans hashed path)."""
    import hashlib

    return {
        hashlib.blake2b(" ".join(ws[i : i + k]).encode(), digest_size=16).hexdigest()
        for i in range(len(ws) - k + 1)
    }


def _digest_bloom_keys(digests) -> "np.ndarray":
    """First 8 bytes of each hex digest as uint64 Bloom keys."""
    import numpy as np

    return np.array([int(s[:16], 16) for s in digests], np.uint64)


def bench_shingles_ds(sf_dir: str, k: int = DECON_K, bench_dir: str | None = None):
    """DISTINCT benchmark shingle digests as a Dataset — never collected
    to the driver (VERDICT r3 #5: the old frozenset broadcast grew with
    the corpus in derived-slice mode). Two sources:

    - bench_dir: a separate small documents.parquet — the real
      deployment contract (the benchmark is its own table).
    - derived (default): the deterministic held-out corpus slice
      doc_id % DECON_BENCH_MOD == 0, masked at Arrow level so 96/97 of
      rows drop before any Python.
    """

    def bench_shingles(batch: pa.Table) -> pa.Table:
        if bench_dir is None:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            batch = batch.filter(pa.array(ids % DECON_BENCH_MOD == 0))
        grams: set[str] = set()
        for t in batch["text"].to_pylist():
            grams.update(_shingle_digests(_words(t), k))
        return pa.table({"s": pa.array(sorted(grams), pa.string())})

    from ray.data.aggregate import Count

    src = _docs(bench_dir if bench_dir is not None else sf_dir)
    # global distinct via a slim digest-only groupby (per-batch distinct
    # first, so the shuffle moves each digest once per source block max)
    return (
        src.map_batches(bench_shingles, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Count(alias_name="_n"))
        .select_columns(["s"])
    )


def build_bench_shingles(sf_dir: str, k: int = DECON_K):
    """Driver-collected benchmark shingle SET (plain word-gram strings),
    broadcast once via ray.put — used by curate_corpus_v2, whose
    any-hit-drops semantics intersects per-doc gram sets in-process.
    BOUNDED: raises past BENCH_SET_MAX_BYTES with the scale path named
    (a real benchmark table is KB-MB scale; decontaminate itself uses
    the fixed-size Bloom + distributed verify join and has no such cap).
    Returns the ObjectRef of a frozenset of shingle strings."""

    def bench_shingles(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        mask = pa.array(ids % DECON_BENCH_MOD == 0)
        grams: set[str] = set()
        for t in batch.filter(mask)["text"].to_pylist():
            ws = _words(t)
            grams.update(" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1))
        return pa.table({"s": pa.array(sorted(grams), pa.string())})

    bench_parts = (
        _docs(sf_dir).map_batches(bench_shingles, batch_format="pyarrow").to_pandas()
    )
    n_bytes = int(bench_parts.s.str.len().sum())
    if n_bytes > BENCH_SET_MAX_BYTES:
        raise RuntimeError(
            f"benchmark shingle set is {n_bytes >> 20} MiB "
            f"(cap {BENCH_SET_MAX_BYTES >> 20} MiB): a broadcast this size "
            "means the 'benchmark' is a corpus-scale slice. Point the "
            "pipeline at a real (small) benchmark table, or use "
            "decontaminate()'s Bloom-prefilter + distributed-join path."
        )
    return ray.put(frozenset(bench_parts.s))


class _BloomGramFilter:
    """Actor-pool stage holding the FIXED-SIZE packed Bloom filter over
    benchmark shingle digests (fetched once per actor). Emits one
    (doc_id, s) row per distinct per-doc gram digest that the Bloom
    admits — almost all clean grams drop here, so the verify join's
    probe side is ~(contaminated grams + fp) rows, not corpus-gram-
    sized."""

    def __init__(self, bloom_ref, k: int, skip_bench_slice: bool):
        self.bloom = ray.get(bloom_ref)
        self.k = k
        self.skip = skip_bench_slice

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.sketch import bloom_contains

        ids_out: list[int] = []
        s_out: list[str] = []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            if self.skip and did % DECON_BENCH_MOD == 0:
                continue  # benchmark docs are not corpus candidates
            digests = sorted(_shingle_digests(_words(t), self.k))
            if not digests:
                continue
            keep = bloom_contains(self.bloom, _digest_bloom_keys(digests))
            for s, kp in zip(digests, keep):
                if kp:
                    ids_out.append(did)
                    s_out.append(s)
        return pa.table(
            {"doc_id": pa.array(ids_out, pa.int64()), "s": pa.array(s_out, pa.string())}
        )


def decontaminate(sf_dir: str, k: int = DECON_K, bench_dir: str | None = None) -> pd.DataFrame:
    """Flag corpus docs sharing any word k-gram with a held-out
    benchmark — the GPT-3/PaLM-style n-gram decontamination pass.
    Benchmark source: an explicit separate table (`bench_dir`, the real
    deployment contract) or the deterministic corpus slice
    doc_id % 97 == 0 (default; what the SQL oracle mirrors).

    100 TB contract (VERDICT r3 #5 — nothing here grows with the corpus
    on the driver or in a broadcast):
      1. benchmark shingle digests stay a distributed Dataset
         (bench_shingles_ds), distinct'd by a slim digest groupby;
      2. the only broadcast is a FIXED-SIZE packed Bloom filter
         (DECON_BLOOM_BITS/8 bytes) OR-merged from O(#bench-blocks)
         partials;
      3. corpus docs emit (doc_id, digest) rows only for Bloom-admitted
         grams, which an exact native inner join against the bench
         Dataset verifies — Bloom false positives cost shuffle bytes,
         never wrong rows;
      4. n_hits = per-doc join-row count (per-doc digests are distinct
         by construction, bench side is distinct, so rows == distinct
         contaminated shingles).

    Returns (doc_id, n_hits) for contaminated docs, oracled by
    DECONTAMINATE_SQL."""
    import numpy as np

    from ..functions.sketch import bloom_merge, bloom_partial

    bench = bench_shingles_ds(sf_dir, k, bench_dir)

    def bloom_block(batch: pa.Table) -> pa.Table:
        keys = _digest_bloom_keys(batch["s"].to_pylist())
        packed = bloom_partial(keys, DECON_BLOOM_BITS)
        return pa.table({"bloom": pa.array([packed.tobytes()], pa.binary())})

    parts = bench.map_batches(bloom_block, batch_format="pyarrow", batch_size=None).to_pandas()
    merged = bloom_merge(np.stack([np.frombuffer(b, dtype=np.uint8) for b in parts.bloom]))
    bloom_ref = ray.put(merged)

    candidates = _docs(sf_dir).map_batches(
        _BloomGramFilter,
        batch_format="pyarrow",
        concurrency=4,
        fn_constructor_kwargs={
            "bloom_ref": bloom_ref,
            "k": k,
            "skip_bench_slice": bench_dir is None,
        },
    )

    from ray.data.aggregate import Count

    out = (
        candidates.join(bench, join_type="inner", num_partitions=8, on=("s",))
        .groupby("doc_id")
        .aggregate(Count(alias_name="n_hits"))
        .to_pandas()
    )
    if out.empty:  # typed-empty guard: all-filtered collects are column-less
        return pd.DataFrame(
            {"doc_id": pd.Series([], dtype="int64"), "n_hits": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64", "n_hits": "int64"})
    )


# --------------------------------------------------------------------------
# stratified deterministic downsampling (corpus rebalancing / data mixing)
# --------------------------------------------------------------------------

SAMPLE_PER_LANG = 25


def md5_rank(doc_id) -> str:
    """The ONE owner of the deterministic sampling rank: hex md5 of the
    decimal doc id, shared verbatim with the DuckDB oracles
    (md5(CAST(doc_id AS VARCHAR))). Used by stratified_sample AND
    curate.curate_corpus_v2 so the two Python sides cannot drift."""
    import hashlib

    return hashlib.md5(str(doc_id).encode()).hexdigest()


def stratified_sample(sf_dir: str, k: int = SAMPLE_PER_LANG) -> pd.DataFrame:
    """Keep the k hash-smallest docs per language — the deterministic
    per-group downsampling used to rebalance over-represented slices when
    mixing training corpora. Rank = md5(doc_id) (shared verbatim with the
    DuckDB oracle; no RNG, so reruns and retries pick identical docs).

    Scale contract: each batch pre-selects its LOCAL k-smallest per lang
    (one C-speed md5 digest per row + a pandas sort), so the groupby
    shuffle moves at most k rows per (lang, block) — never the corpus.
    The global k-of-union step runs once per language group on
    ≤ k×#blocks rows."""

    def local_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df["rank"] = [md5_rank(i) for i in df.doc_id]
        keep = (
            df.sort_values(["rank", "doc_id"], kind="mergesort")
            .groupby("lang", as_index=False, sort=False)
            .head(k)
        )
        # explicit types: an empty pandas frame would otherwise infer
        # (lang: null, rank: double) and diverge from non-empty blocks
        return pa.table(
            {
                "lang": pa.array(keep.lang, pa.string()),
                "doc_id": pa.array(keep.doc_id, pa.int64()),
                "rank": pa.array(keep["rank"], pa.string()),
            }
        )

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        keep = g.sort_values(["rank", "doc_id"], kind="mergesort").head(k)
        return keep[["lang", "doc_id"]]

    out = (
        _docs(sf_dir, columns=("doc_id", "lang"))
        .map_batches(local_topk, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(global_topk)
        .to_pandas()
        .sort_values(["lang", "doc_id"])
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64"})


STRATIFIED_SAMPLE_SQL_T = """
SELECT lang, doc_id FROM (
  SELECT lang, doc_id,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
) WHERE rn <= {k} ORDER BY lang, doc_id
"""


def _gram_sql(k: int) -> str:
    return " || ' ' || ".join(f"ts[i + {j}]" for j in range(k))


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(text) != ''
),
g AS (
  SELECT doc_id, {_gram_sql(DECON_K)} AS s
  FROM toks, LATERAL unnest(generate_series(1, len(ts) - {DECON_K - 1})) AS gs(i)
),
bench AS (SELECT DISTINCT s FROM g WHERE doc_id % {DECON_BENCH_MOD} = 0)
SELECT doc_id, COUNT(DISTINCT s) AS n_hits
FROM g
WHERE doc_id % {DECON_BENCH_MOD} != 0 AND s IN (SELECT s FROM bench)
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# text normalization + regex matching (cleaning-stage function coverage)
# --------------------------------------------------------------------------

def normalize_texts(sf_dir: str) -> pd.DataFrame:
    """Canonical text normalization (lowercase, collapse whitespace runs,
    strip non-alphanumerics-except-space) — the pre-dedup canonicalization
    stage. Stateless map; output hashed so the driver value-checks the
    full normalized payload without shipping it. Oracle mirrors the exact
    chain in SQL (lower -> regexp_replace x2 -> trim -> md5)."""
    import hashlib
    import re

    strip_re = re.compile(r"[^a-z0-9 ]+")
    ws_re = re.compile(r" +")

    def f(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch["text"].to_pylist():
            n = ws_re.sub(" ", strip_re.sub("", t.lower())).strip()
            out.append(hashlib.md5(n.encode()).hexdigest())
        return pa.table(
            {"doc_id": batch["doc_id"], "norm_hash": pa.array(out, pa.string())}
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


NORMALIZE_SQL = """
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]+', '', 'g'),
                               ' +', ' ', 'g'))) AS norm_hash
FROM documents ORDER BY doc_id
"""


REGEX_DEFAULT_PATTERN = r"\b(spark|hash)\s+(join|scan)\b"


def regex_match_stats(sf_dir: str, pattern: str = REGEX_DEFAULT_PATTERN) -> pd.DataFrame:
    """Per-lang counts of docs matching a regex + total match count — the
    compiled-pattern scan stage (patterns compiled once per actor via the
    callable-class path would be the production form; the pattern here is
    module-level-compiled once per worker process). Oracle mirrors with
    DuckDB regexp_matches/regexp_extract_all."""
    import re

    rx = re.compile(pattern)

    def f(batch: pa.Table) -> pa.Table:
        langs, matched, n_matches = [], [], []
        for lang, t in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
            hits = rx.findall(t)
            langs.append(lang)
            matched.append(1 if hits else 0)
            n_matches.append(len(hits))
        t2 = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "matched": pa.array(matched, pa.int64()),
                "n_matches": pa.array(n_matches, pa.int64()),
            }
        )
        g = t2.group_by("lang").aggregate([("matched", "sum"), ("n_matches", "sum")])
        return pa.table(
            {"lang": g["lang"], "n_docs_matched": g["matched_sum"], "n_matches": g["n_matches_sum"]}
        )

    from ray.data.aggregate import Sum

    out = (
        _docs(sf_dir, columns=("lang", "text"))
        .map_batches(f, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n_docs_matched", alias_name="n_docs_matched"), Sum("n_matches", alias_name="n_matches"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs_matched": "int64", "n_matches": "int64"})


# ONE pattern constant formatted into the template — a second literal in a
# different escaping dialect silently desynchronized query and oracle
REGEX_MATCH_SQL_T = r"""
SELECT lang,
       CAST(SUM(CASE WHEN regexp_matches(text, '{pattern}') THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_matched,
       CAST(SUM(len(regexp_extract_all(text, '{pattern}'))) AS BIGINT) AS n_matches
FROM documents GROUP BY lang ORDER BY lang
"""
REGEX_MATCH_SQL = REGEX_MATCH_SQL_T.format(pattern=REGEX_DEFAULT_PATTERN)


# --------------------------------------------------------------------------
# TF-IDF top terms (search/IR shape: two corpus statistics joined)
# --------------------------------------------------------------------------

TFIDF_TOP_K = 5


def tfidf_top_terms(sf_dir: str, k: int = TFIDF_TOP_K) -> pd.DataFrame:
    """Top-k terms per lang by tf-idf (tf = term count within the lang
    slice, idf = ln(N / docs-containing-term) corpus-wide) — the IR
    scoring shape needing TWO distributed statistics:

      tf: per-batch (lang, word) Counter partials -> one groupby (the
          shuffle moves distinct pairs per block, never tokens);
      df: per-batch distinct (doc, word) pairs -> global distinct ->
          per-word doc counts (events_distinct_users' two-level pattern).

    The tf and df statistics stay DISTRIBUTED: they meet in a native
    shuffle join on the word key, scoring + per-lang top-k run as
    per-block partials on the joined stream, and the driver merges
    <= k x #langs x #blocks candidate rows — the full vocabulary never
    lands on the driver. Ranking happens on the UNROUNDED double on
    both sides; output rounds to 6dp. Oracled by TFIDF_SQL."""
    from ray.data.aggregate import Sum

    def tf_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for lang, t in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
            for w in _words(t):
                c[(lang, w)] += 1
        return pa.table(
            {
                "lang": pa.array([k_[0] for k_ in c], pa.string()),
                "w": pa.array([k_[1] for k_ in c], pa.string()),
                "tf": pa.array(list(c.values()), pa.int64()),
            }
        )

    tf_ds = (
        _docs(sf_dir, columns=("lang", "text"))
        .map_batches(tf_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "w"])
        .aggregate(Sum("tf", alias_name="tf"))
    )

    def doc_words(batch: pa.Table) -> pa.Table:
        ids, ws = [], []
        for did, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for w in set(_words(t)):
                ids.append(did)
                ws.append(w)
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "w": pa.array(ws, pa.string())}
        )

    def word_df_partial(b: pa.Table) -> pa.Table:
        # doc_words' output is ALREADY globally distinct — each document
        # lives in exactly one row/batch and set(_words) dedups within
        # it — so per-block word counts sum exactly to the document
        # frequency with no (doc, word) dedup shuffle in between
        g = b.group_by("w").aggregate([("w", "count")])
        return pa.table({"w": g["w"], "df": g["w_count"]})

    df_ds = (
        _docs(sf_dir)
        .map_batches(doc_words, batch_format="pyarrow", batch_size=None)
        .map_batches(word_df_partial, batch_format="pyarrow", batch_size=None)
        .groupby("w")
        .aggregate(Sum("df", alias_name="df"))
    )
    n_docs = _docs(sf_dir, columns=("doc_id",)).count()

    def topk_part(batch: pa.Table) -> pa.Table:
        # score + local per-lang top-k on the joined stream: the shuffle
        # join's output never concentrates on the driver
        df = batch.to_pandas()
        df["score"] = df.tf * np.log(n_docs / df.df)
        local = (
            df.sort_values(["lang", "score", "w"], ascending=[True, False, True], kind="mergesort")
            .groupby("lang", as_index=False, sort=False)
            .head(k)
        )
        return pa.table(
            {
                "lang": pa.array(local.lang, pa.string()),
                "w": pa.array(local.w, pa.string()),
                "score": pa.array(local.score, pa.float64()),
            }
        )

    cand = (
        tf_ds.join(df_ds, join_type="inner", num_partitions=8, on=("w",), right_on=("w",))
        .map_batches(topk_part, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    top = (
        cand.sort_values(["lang", "score", "w"], ascending=[True, False, True], kind="mergesort")
        .groupby("lang", as_index=False)
        .head(k)
        .rename(columns={"w": "term"})
    )
    top["tfidf"] = top.score.round(6)
    return (
        top[["lang", "term", "tfidf"]]
        .sort_values(["lang", "term"])
        .reset_index(drop=True)
    )


TFIDF_SQL_T = """
WITH toks AS (
  SELECT doc_id, lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) != ''
),
tf AS (SELECT lang, w, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfc AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1),
n AS (SELECT COUNT(*) AS n FROM documents),
scored AS (
  SELECT tf.lang, tf.w AS term,
         tf.tf * ln(n.n * 1.0 / dfc.df) AS score,
         row_number() OVER (
           PARTITION BY tf.lang
           ORDER BY tf.tf * ln(n.n * 1.0 / dfc.df) DESC, tf.w) AS rn
  FROM tf JOIN dfc ON tf.w = dfc.w CROSS JOIN n
)
SELECT lang, term, ROUND(score, 6) AS tfidf
FROM scored WHERE rn <= {k} ORDER BY lang, term
"""

TFIDF_SQL = TFIDF_SQL_T.format(k=TFIDF_TOP_K)


# --------------------------------------------------------------------------
# quality-tier extraction (FineWeb/DataComp-style tiered corpus split)
# --------------------------------------------------------------------------

# head = comfortably above the Gopher gate (higher stopword bar, lower
# duplicate-word bar); mid = passes the gate; tail = fails it. Thresholds
# tuned so all three tiers are populated at every test sf (~13% / 19% /
# 67% on the synthetic corpus); real-webtext deployments calibrate them
# per extraction recipe (FineWeb keeps ~10% as "head").
TIER_HEAD_MIN_STOP = 0.06
TIER_HEAD_MAX_DUP = 0.50
# per-tier deterministic keep rates (md5(doc_id) threshold — the same
# cluster-size-invariant sampling importance_resample uses): keep all of
# head, half of mid, a 10% audit slice of tail
TIER_KEEP = {"head": 1.0, "mid": 0.5, "tail": 0.1}


def tier_of(ws: list[str]) -> str:
    """head/mid/tail tier of a token list — single source of truth shared
    by quality_tiers and curate.extract_tiered so the tier rule cannot
    drift between the raw-text and extraction-composed surfaces (both SQL
    oracles restate it from the same constants)."""
    ok, dup, stop, _ = quality_gate(ws)
    if ok and stop >= TIER_HEAD_MIN_STOP and dup <= TIER_HEAD_MAX_DUP:
        return "head"
    return "mid" if ok else "tail"


def quality_tiers(sf_dir: str) -> pd.DataFrame:
    """Tier extraction: split the corpus into head/mid/tail quality
    tiers from the Gopher-gate signals (token count, duplicate-word
    fraction, stopword ratio, mean word length — `quality_gate` is the
    shared single source of truth) and apply a per-tier deterministic
    keep rate. Output: per-tier doc counts, kept-doc counts, token
    mass, and kept token mass — the numbers a tiered training-mix plan
    is built from (FineWeb-style: train mostly on head, sample mid,
    audit tail).

    Scale contract: one stateless pass; per-(tier, block) integer
    partials -> a 3-row groupby. Nothing row-sized crosses the shuffle,
    and the md5 keep decision is independent of parallelism, so the
    kept set is identical at any cluster size (the resumability
    property a 100 TB sampling pass needs). Oracle: QUALITY_TIERS_SQL
    reproduces signals, tier rule and md5 threshold exactly."""
    import hashlib

    from ray.data.aggregate import Sum

    from .common import w_threshold_hex

    th = {t: w_threshold_hex(w) for t, w in TIER_KEEP.items() if w < 1.0}

    def partial(batch: pa.Table) -> pa.Table:
        tiers, kept, toks = [], [], []
        for did, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            ws = _words(text)
            tier = tier_of(ws)
            tiers.append(tier)
            toks.append(len(ws))
            kp = tier not in th or hashlib.md5(str(did).encode()).hexdigest() < th[tier]
            kept.append(kp)
        t = pa.table(
            {
                "tier": pa.array(tiers, pa.string()),
                "n_docs": pa.array([1] * len(tiers), pa.int64()),
                "n_kept": pa.array([1 if k else 0 for k in kept], pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "kept_tokens": pa.array(
                    [n if k else 0 for k, n in zip(kept, toks)], pa.int64()
                ),
            }
        )
        g = t.group_by("tier").aggregate(
            [("n_docs", "sum"), ("n_kept", "sum"), ("n_tokens", "sum"), ("kept_tokens", "sum")]
        )
        return g.rename_columns(["tier", "n_docs", "n_kept", "n_tokens", "kept_tokens"])

    out = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("tier")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_kept", alias_name="n_kept"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("kept_tokens", alias_name="kept_tokens"),
        )
        .to_pandas()
        .sort_values("tier")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_docs": "int64", "n_kept": "int64", "n_tokens": "int64", "kept_tokens": "int64"}
    )


def _quality_tiers_sql() -> str:
    from .common import w_threshold_hex

    mid_th = w_threshold_hex(TIER_KEEP["mid"])
    tail_th = w_threshold_hex(TIER_KEEP["tail"])
    return f"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
m AS (
  SELECT doc_id, len(ts) AS n,
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
  SELECT doc_id, n,
         CASE WHEN n >= {QF_MIN_WORDS} AND dup <= {QF_MAX_DUP_FRAC}
                   AND stop >= {QF_MIN_STOP_RATIO}
                   AND mwl BETWEEN {QF_MIN_MEAN_WL} AND {QF_MAX_MEAN_WL}
              THEN CASE WHEN stop >= {TIER_HEAD_MIN_STOP} AND dup <= {TIER_HEAD_MAX_DUP}
                        THEN 'head' ELSE 'mid' END
              ELSE 'tail' END AS tier
  FROM m
),
k AS (
  SELECT tier, n,
         CASE WHEN tier = 'head' THEN TRUE
              WHEN tier = 'mid' THEN md5(CAST(doc_id AS VARCHAR)) < '{mid_th}'
              ELSE md5(CAST(doc_id AS VARCHAR)) < '{tail_th}' END AS kept
  FROM t
)
SELECT tier,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN kept THEN n ELSE 0 END) AS BIGINT) AS kept_tokens
FROM k GROUP BY tier ORDER BY tier
"""


QUALITY_TIERS_SQL = _quality_tiers_sql()


# --------------------------------------------------------------------------
# per-domain document cap (anti domain-dominance)
# --------------------------------------------------------------------------

DOMCAP_K = 10  # max docs kept per source domain


def domain_cap(sf_dir: str, k: int = DOMCAP_K) -> pd.DataFrame:
    """Cap the corpus at `k` documents per source domain (earliest
    doc_id first — "first crawled wins"), the FineWeb/DataComp guard
    against a single domain dominating the training mix. Output = the
    kept (doc_id, source) set.

    Distributed top-k-per-group with local prune: each block contributes
    at most k candidate doc_ids per source (vectorized pandas
    groupby.head inside the batch fn), so the shuffle carries
    <= k x #sources x #blocks slim 16 B rows regardless of corpus size;
    the winners are resolved per source group. A hot domain with 10^9
    docs still ships only k rows per block. Oracle: row_number() over
    (partition by source order by doc_id) <= k."""

    def prune(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].to_numpy(zero_copy_only=False),
                "source": batch["source"].to_pylist(),
            }
        )
        top = df.sort_values("doc_id", kind="mergesort").groupby("source").head(k)
        return pa.Table.from_pandas(top, preserve_index=False)

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "source": pd.Series([], dtype="str"),
                }
            )
        return g.sort_values("doc_id", kind="mergesort").head(k)[["doc_id", "source"]]

    out = (
        _docs(sf_dir, columns=("doc_id", "source"))
        .map_batches(prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(resolve, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64"})


DOMAIN_CAP_SQL_T = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
) WHERE rn <= {k} ORDER BY doc_id
"""

DOMAIN_CAP_SQL = DOMAIN_CAP_SQL_T.format(k=DOMCAP_K)


# --------------------------------------------------------------------------
# DoReMi-style domain-weight optimization (multiplicative weights)
# --------------------------------------------------------------------------

DOREMI_ROUNDS = 3
DOREMI_ETA = 100.0  # loss spread on the synthetic corpora is ~0.02 nats; eta scales it to O(1) exponents


def doremi_weights(sf_dir: str, rounds: int = DOREMI_ROUNDS, eta: float = DOREMI_ETA) -> pd.DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429)
    in its static-proxy form: per-source excess loss drives multiplicative
    weight updates — w_d <- normalize(w_d * exp(eta * (L_d - m_t))) where
    L_d is the source's mean per-doc unigram-LM cross-entropy (the
    lm_perplexity scorer, machinery nested here) and m_t = sum_d w_d L_d
    is the CURRENT MIXTURE's expected loss, so rounds genuinely interact
    (high-loss domains upweight until the mixture average catches up).
    The full paper loop retrains the proxy between rounds; with a fixed
    proxy this is one mirror-ascent run on the excess-loss objective —
    documented simplification, same update rule.

    Exactness contract: per-doc xents are the rounded-6 values the
    lm_perplexity oracle already locks; every derived scalar (L_d, m_t,
    each round's weights) is ROUNDED TO 6 DECIMALS before reuse ON BOTH
    SIDES, so cross-engine libm ulp skew (exp, ln) is crushed at every
    step instead of compounding across rounds — the kmeans_train
    chained-CTE discipline applied to floats.

    Scale contract: one corpus pass for the LM (lm_scores_ds's two-pass
    vocabulary contract) + one scoring pass emitting per-block
    (source, sum_xent, n) partials; every round after that runs on the
    O(#sources) driver table. Output: (source, loss, weight)."""
    from ray.data.aggregate import Sum

    if rounds < 1:
        raise ValueError("rounds must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "source": batch["source"],
                "sum_xent": batch["xent"],
                "n": pa.array(np.ones(len(batch), np.int64)),
            }
        )
        g = t.group_by("source").aggregate([("sum_xent", "sum"), ("n", "sum")])
        return g.rename_columns(["source", "sum_xent", "n"])

    agg = (
        lm_scores_ds(sf_dir, columns=("doc_id", "source", "text"))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("source")
        .aggregate(Sum("sum_xent", alias_name="sum_xent"), Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    import math

    L = [round(s / int(n), 6) for s, n in zip(agg.sum_xent, agg.n)]
    D = len(L)
    w = [round(1.0 / D, 6)] * D
    for _ in range(rounds):
        m = round(sum(wi * li for wi, li in zip(w, L)), 6)
        raw = [wi * math.exp(eta * (li - m)) for wi, li in zip(w, L)]
        z = sum(raw)
        w = [round(r / z, 6) for r in raw]
    return pd.DataFrame(
        {"source": agg.source, "loss": L, "weight": w}
    )


def doremi_sql(rounds: int = DOREMI_ROUNDS, eta: float = DOREMI_ETA) -> str:
    """Chained-CTE oracle: the FULL lm_perplexity oracle feeds per-source
    losses; one (mixture-mean, update, normalize, round) CTE block per
    round — every scalar rounded to 6 before reuse, same as the engine."""
    ctes = [
        f"ppl AS ({LM_PERPLEXITY_SQL.replace('ORDER BY d.doc_id', '')})",
        """l AS (
  SELECT d.source, ROUND(SUM(p.xent) / COUNT(*), 6) AS loss
  FROM ppl p JOIN documents d USING (doc_id) GROUP BY d.source)""",
        "d0 AS (SELECT COUNT(*) AS nd FROM l)",
        "w0 AS (SELECT source, loss, ROUND(1.0 / d0.nd, 6) AS w FROM l, d0)",
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        ctes.append(
            f"""m{r} AS (SELECT ROUND(SUM(w * loss), 6) AS m FROM w{p}),
r{r} AS (SELECT source, loss, w * exp({eta} * (loss - m{r}.m)) AS raw
         FROM w{p}, m{r}),
z{r} AS (SELECT SUM(raw) AS z FROM r{r}),
w{r} AS (SELECT source, loss, ROUND(raw / z{r}.z, 6) AS w FROM r{r}, z{r})"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT source, loss, w AS weight FROM w{rounds} ORDER BY source
"""
    )


# --------------------------------------------------------------------------
# corpus-relative percentile normalization (global rank, no global sort)
# --------------------------------------------------------------------------

def percentile_normalize(sf_dir: str) -> pd.DataFrame:
    """Per-doc corpus-relative percentile of token count:
    pct_ppm = (#docs with strictly smaller n_tok) * 1e6 // N — the
    feature normalization a corpus-relative quality gate wants ("is
    this doc long FOR THIS CORPUS?") where raw thresholds drift across
    corpora. The global rank is computed WITHOUT a global sort: pass 1
    collapses the corpus to a value histogram (per-block value-count
    partials, distinct n_tok values bounded by the max document length
    in tokens — thousands, not corpus-sized), the driver prefix-sums it
    into a strictly-smaller table broadcast once, and pass 2 is a
    stateless per-doc lookup. Exact integers end-to-end (ties share a
    percentile by the strict-rank definition, mirrored by the oracle's
    windowed SUM-minus-self)."""
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        n = pd.Series([len(t.split()) for t in batch["text"].to_pylist()])
        vc = n.value_counts()
        return pa.table(
            {
                "n_tok": pa.array(vc.index.astype("int64"), pa.int64()),
                "c": pa.array(vc.to_numpy().astype("int64"), pa.int64()),
            }
        )

    hist = (
        _docs(sf_dir, columns=("text",))
        .map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_tok")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("n_tok")
        .reset_index(drop=True)
    )
    total = int(hist.c.sum())
    lt = dict(zip(hist.n_tok.astype(int), (hist.c.cumsum() - hist.c).astype(int)))

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ns = [len(t.split()) for t in batch["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok": pa.array(ns, pa.int64()),
                "pct_ppm": pa.array(
                    [lt[n] * 1_000_000 // total for n in ns], pa.int64()
                ),
            }
        )

    out = (
        _docs(sf_dir)
        .map_batches(assign, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "n_tok": "int64", "pct_ppm": "int64"})


PERCENTILE_NORMALIZE_SQL = r"""
WITH dt AS (
  SELECT doc_id, CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
                      THEN len(regexp_split_to_array(trim(text), '\s+'))
                      ELSE 0 END AS n_tok
  FROM documents),
h AS (SELECT n_tok, COUNT(*) AS c FROM dt GROUP BY n_tok),
cum AS (SELECT n_tok,
               SUM(c) OVER (ORDER BY n_tok ROWS UNBOUNDED PRECEDING) - c AS lt
        FROM h),
n AS (SELECT COUNT(*) AS nn FROM dt)
SELECT dt.doc_id, CAST(dt.n_tok AS BIGINT) AS n_tok,
       CAST(cum.lt * 1000000 // n.nn AS BIGINT) AS pct_ppm
FROM dt JOIN cum USING (n_tok), n
ORDER BY dt.doc_id
"""


# --------------------------------------------------------------------------
# PSI distribution drift between two corpus sides (ML-ops drift monitor)
# --------------------------------------------------------------------------

PSI_EPS = 1e-6  # proportion floor (the standard zero-bin guard)


def distribution_drift(sf_dir: str) -> pd.DataFrame:
    """Population Stability Index between the even-numbered sources
    (reference) and the odd-numbered sources (production) over the
    doc-length distribution — the drift monitor an ingest pipeline runs
    per batch before trusting thresholds tuned on the reference
    (PSI > 0.25 conventionally means recalibrate). Decile bins are
    fixed FROM THE REFERENCE side (the standard recipe), bucket(x) =
    #(boundaries < x), and each bucket row reports exact counts plus
    term6 = round((p - q) * ln(p / q), 6) with both proportions
    rounded-6 then floored at {PSI_EPS} — the doremi chained-float
    discipline, one division + one ln per bucket mirrored by the
    oracle. Per-bucket rows only (no order-dependent float total).

    Scale contract: pass 1 collapses the reference side to a value
    histogram (per-block partials, distinct-value bounded) and the
    driver picks the 9 decile boundaries by integer rank
    ((i*n + 9) // 10 — the quantile_disc contract); pass 2 buckets each
    doc with one vectorized searchsorted and emits (bucket, side, n)
    partials into a 20-row groupby."""
    import math

    from ray.data.aggregate import Sum

    def side_of(sources):
        return [int(s[3:]) % 2 for s in sources]

    def hist_partial(batch: pa.Table) -> pa.Table:
        sides = side_of(batch["source"].to_pylist())
        ns = [len(t.split()) for t, sd in zip(batch["text"].to_pylist(), sides) if sd == 0]
        vc = pd.Series(ns).value_counts() if ns else pd.Series([], dtype="int64")
        return pa.table(
            {
                "n_tok": pa.array(vc.index.astype("int64") if len(vc) else [], pa.int64()),
                "c": pa.array(vc.to_numpy().astype("int64") if len(vc) else [], pa.int64()),
            }
        )

    docs = _docs(sf_dir, columns=("text", "source"))
    hist = (
        docs.map_batches(hist_partial, batch_format="pyarrow")
        .groupby("n_tok")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()
        .sort_values("n_tok")
        .reset_index(drop=True)
    )
    n_ref = int(hist.c.sum())
    cum = hist.c.cumsum()
    bnds = []
    for i in range(1, 10):
        rank = (i * n_ref + 9) // 10
        bnds.append(int(hist.n_tok[cum.searchsorted(rank, side="left")]))
    bnds_arr = np.asarray(bnds, dtype=np.int64)

    def bucket_partial(batch: pa.Table) -> pa.Table:
        sides = np.asarray(side_of(batch["source"].to_pylist()), dtype=np.int64)
        ns = np.asarray([len(t.split()) for t in batch["text"].to_pylist()], dtype=np.int64)
        bk = np.searchsorted(bnds_arr, ns, side="left")  # == #(boundaries < x)
        df = (
            pd.DataFrame({"bucket": bk, "side": sides})
            .groupby(["bucket", "side"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    cnt = (
        docs.map_batches(bucket_partial, batch_format="pyarrow")
        .groupby(["bucket", "side"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    piv = cnt.pivot_table(index="bucket", columns="side", values="n", fill_value=0)
    cr = piv.get(0, pd.Series(0, index=piv.index)).astype(int)
    cp = piv.get(1, pd.Series(0, index=piv.index)).astype(int)
    nr, npp = int(cr.sum()), int(cp.sum())
    rows = []
    for b in sorted(piv.index):
        p = max(round(int(cr[b]) / nr, 6), PSI_EPS)
        q = max(round(int(cp[b]) / npp, 6), PSI_EPS)
        rows.append((int(b), int(cr[b]), int(cp[b]), round((p - q) * math.log(p / q), 6)))
    return pd.DataFrame(rows, columns=["bucket", "cnt_ref", "cnt_prod", "term6"]).astype(
        {"bucket": "int64", "cnt_ref": "int64", "cnt_prod": "int64", "term6": "float64"}
    )


DISTRIBUTION_DRIFT_SQL = rf"""
WITH dt AS (
  SELECT doc_id, CAST(substr(source, 4) AS BIGINT) % 2 AS side,
         CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
              THEN len(regexp_split_to_array(trim(text), '\s+'))
              ELSE 0 END AS n_tok
  FROM documents),
refs AS (SELECT n_tok FROM dt WHERE side = 0),
o AS (SELECT n_tok, row_number() OVER (ORDER BY n_tok) AS rk FROM refs),
nn AS (SELECT COUNT(*) AS n FROM refs),
b AS (SELECT t.i, MIN(o.n_tok) AS bnd
      FROM o, nn, range(1, 10) t(i)
      WHERE o.rk >= (t.i * nn.n + 9) // 10 GROUP BY t.i),
bkt AS (SELECT d.doc_id, d.side,
               SUM(CASE WHEN d.n_tok > b.bnd THEN 1 ELSE 0 END) AS bucket
        FROM dt d CROSS JOIN b GROUP BY d.doc_id, d.side),
c AS (SELECT bucket,
             SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS cr,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS cp
      FROM bkt GROUP BY bucket),
tot AS (SELECT SUM(cr) AS nr, SUM(cp) AS np FROM c)
SELECT CAST(c.bucket AS BIGINT) AS bucket,
       CAST(c.cr AS BIGINT) AS cnt_ref, CAST(c.cp AS BIGINT) AS cnt_prod,
       ROUND((GREATEST(ROUND(c.cr / tot.nr, 6), {PSI_EPS})
              - GREATEST(ROUND(c.cp / tot.np, 6), {PSI_EPS}))
             * ln(GREATEST(ROUND(c.cr / tot.nr, 6), {PSI_EPS})
                  / GREATEST(ROUND(c.cp / tot.np, 6), {PSI_EPS})), 6) AS term6
FROM c, tot ORDER BY c.bucket
"""


# --------------------------------------------------------------------------
# exact-k uniform global sample (partial-top-k, no global sort)
# --------------------------------------------------------------------------

SAMPLE_K = 200


def uniform_sample_exact_k(sf_dir: str, k: int = SAMPLE_K) -> pd.DataFrame:
    """A uniform random sample of EXACTLY k documents, deterministic and
    parallelism-invariant: rank every doc by md5('samp:' || doc_id) (an
    independent key prefix, so composing with the other md5-keyed
    sampling ops stays unbiased) and keep the k smallest. Rate-based
    keeps (importance_resample, stratified_sample) give binomial sizes;
    training-data budgets frequently need exactly k. The global top-k
    is the bm25/knn partial-top-k pattern — each block ships at most k
    (key, doc_id, n_tok) rows, the driver merges #blocks x k rows, and
    no global sort ever materializes. Output: the selected docs
    (doc_id, n_tok) ordered by doc_id, so the gate value-locks the
    exact selected set."""
    import hashlib

    def cand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ns = [len(t.split()) for t in batch["text"].to_pylist()]
        df = pd.DataFrame(
            {
                "key": [hashlib.md5(f"samp:{d}".encode()).hexdigest() for d in ids],
                "doc_id": ids,
                "n_tok": ns,
            }
        )
        return pa.Table.from_pandas(
            df.sort_values(["key", "doc_id"]).head(k), preserve_index=False
        )

    cands = (
        _docs(sf_dir)
        .map_batches(cand, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["key", "doc_id"])
        .head(k)
    )
    out = cands[["doc_id", "n_tok"]].sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "n_tok": "int64"})


def uniform_sample_sql(k: int = SAMPLE_K) -> str:
    return rf"""
SELECT doc_id,
       CAST(CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
                 THEN len(regexp_split_to_array(trim(text), '\s+'))
                 ELSE 0 END AS BIGINT) AS n_tok
FROM documents
ORDER BY md5('samp:' || CAST(doc_id AS VARCHAR)), doc_id
LIMIT {k}
"""


# --------------------------------------------------------------------------
# k-anonymity audit (privacy-release gate over quasi-identifier cells)
# --------------------------------------------------------------------------

K_ANON = 5


def k_anonymity_audit(sf_dir: str, k: int = K_ANON) -> pd.DataFrame:
    """k-anonymity audit before releasing per-document metadata: with
    the quasi-identifier tuple (lang, source, n_tok decile-of-10-token
    bucket), a cell with fewer than k members re-identifies its docs by
    metadata alone. Reports, per lang: the number of QI cells, the
    cells below k, and the documents at risk (the release gate a
    privacy review runs; pii_redact handles content, this handles the
    aggregate side-channel).

    Scale contract: one stateless pass emits per-block (lang, source,
    bucket, n) integer partials into a QI-space-bounded groupby
    (#langs x #sources x #buckets); the threshold rollup is cell-sized.
    Exact integers throughout."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "source": batch["source"].to_pylist(),
                "bucket": [len(t.split()) // 10 for t in batch["text"].to_pylist()],
            }
        )
        g = df.groupby(["lang", "source", "bucket"], as_index=False).size()
        return pa.Table.from_pandas(g.rename(columns={"size": "n"}), preserve_index=False)

    cells = (
        _docs(sf_dir, columns=("text", "lang", "source"))
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "source", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    out = (
        cells.assign(viol=(cells.n < k).astype(int), at_risk=cells.n.where(cells.n < k, 0))
        .groupby("lang", as_index=False)
        .agg(n_cells=("n", "size"), cells_below_k=("viol", "sum"), docs_at_risk=("at_risk", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype(
        {"lang": "str", "n_cells": "int64", "cells_below_k": "int64", "docs_at_risk": "int64"}
    )


def k_anonymity_sql(k: int = K_ANON) -> str:
    return rf"""
WITH dt AS (
  SELECT lang, source,
         CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
              THEN len(regexp_split_to_array(trim(text), '\s+'))
              ELSE 0 END // 10 AS bucket
  FROM documents),
c AS (SELECT lang, source, bucket, COUNT(*) AS n FROM dt GROUP BY 1, 2, 3)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(CASE WHEN n < {k} THEN 1 ELSE 0 END) AS BIGINT) AS cells_below_k,
       CAST(SUM(CASE WHEN n < {k} THEN n ELSE 0 END) AS BIGINT) AS docs_at_risk
FROM c GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis-Spirakis A-Res)
# --------------------------------------------------------------------------

WS_K = 64


def weighted_sample_ares(sf_dir: str, k: int = WS_K) -> pd.DataFrame:
    """Weighted sample of exactly k docs WITHOUT replacement, inclusion
    probability proportional to size (weight = n_chars + 1) — the
    Efraimidis-Spirakis A-Res rule: key(d) = u_d^(1/w_d) with u_d the
    seeded uniform md5('ws:' || doc_id)[:12] / 2^48, keep the k largest
    keys. Completes the sampling family's missing member (uniform
    exact-k / rate-based importance / stratified / Neyman are all
    equal-weight within strata; this is the PPS draw a corpus builder
    uses to sample bytes, not documents).

    Scale contract: the uniform_sample_exact_k top-k shape — each block
    ships at most k (key, doc_id, n_chars) rows, the driver merges
    #blocks x k, no global sort. Float contract: u is exact in double
    (48-bit int / 2^48), one glibc pow per doc on both sides (numpy and
    DuckDB call the same correctly-rounded libm; key ordering is as
    robust as every other float-argmax op here). Output value-locks the
    exact selected set (doc_id, n_chars), ordered by doc_id.
    """
    import hashlib

    def cand(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ws = batch["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.array(
            [
                int(hashlib.md5(f"ws:{d}".encode()).hexdigest()[:12], 16) / float(1 << 48)
                for d in ids
            ]
        )
        key = u ** (1.0 / (ws + 1))
        df = pd.DataFrame({"key": key, "doc_id": ids, "n_chars": ws})
        return pa.Table.from_pandas(
            df.sort_values(["key", "doc_id"], ascending=[False, True]).head(k),
            preserve_index=False,
        )

    cands = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
        .map_batches(cand, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["key", "doc_id"], ascending=[False, True])
        .head(k)
    )
    out = cands[["doc_id", "n_chars"]].sort_values("doc_id").reset_index(drop=True)
    return out.astype({"doc_id": "int64", "n_chars": "int64"})


def weighted_sample_sql(k: int = WS_K) -> str:
    return f"""
SELECT doc_id, n_chars FROM (
  SELECT doc_id, n_chars,
         pow(CAST(CONCAT('0x', substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
             1, 12)) AS BIGINT) / 281474976710656.0,
             1.0 / (n_chars + 1)) AS key
  FROM documents
  ORDER BY key DESC, doc_id LIMIT {k}
) ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# exact two-sample Kolmogorov-Smirnov distance (un-binned drift test)
# --------------------------------------------------------------------------


def ks_two_sample(sf_dir: str) -> pd.DataFrame:
    """EXACT Kolmogorov-Smirnov distance between the even-numbered
    sources (reference) and odd-numbered sources (production) over the
    doc token-count distribution — the un-binned complement of
    distribution_drift's PSI (PSI needs bins and an epsilon floor; KS
    is sup |F_a - F_b| over the raw empirical CDFs and needs neither).
    Zero float anywhere: with prefix counts c_a, c_b at each distinct
    value and sample sizes n_a, n_b, the statistic is
    max |c_a * n_b - c_b * n_a| held as exact int64, reported as
    ks_e6 = max_diff * 1e6 // (n_a * n_b) with the achieving value
    (smallest on ties — both sides break ties the same way).

    Scale contract: one streaming pass emits per-block
    (side, n_tok, cnt) partials — the exchange is distinct-value x
    #blocks bounded (the percentile_normalize value-histogram shape),
    and the CDF walk runs on the merged histogram driver-side
    (distinct token counts grow with text-length diversity, not corpus
    size)."""
    from ray.data.aggregate import Sum

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        side = np.fromiter(
            (int(s[3:]) % 2 for s in batch["source"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        nt = np.fromiter(
            (len(t.split()) for t in batch["text"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        df = pd.DataFrame({"side": side, "n_tok": nt})
        g = df.groupby(["side", "n_tok"], as_index=False).size()
        return pa.Table.from_pandas(
            g.rename(columns={"size": "cnt"}), preserve_index=False
        )

    hist = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["side", "n_tok"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    piv = (
        hist.pivot_table(index="n_tok", columns="side", values="cnt", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    ca = piv[0].cumsum().to_numpy(dtype=object)  # python ints — exact
    cb = piv[1].cumsum().to_numpy(dtype=object)
    na, nb = int(piv[0].sum()), int(piv[1].sum())
    diffs = np.array([abs(int(a) * nb - int(b) * na) for a, b in zip(ca, cb)], dtype=object)
    best = max(range(len(diffs)), key=lambda i: (diffs[i], -piv.index[i]))
    return pd.DataFrame(
        {
            "n_a": [na],
            "n_b": [nb],
            "ks_e6": [int(diffs[best]) * 1_000_000 // (na * nb)],
            "at_value": [int(piv.index[best])],
        }
    ).astype({"n_a": "int64", "n_b": "int64", "ks_e6": "int64", "at_value": "int64"})


KS_TWO_SAMPLE_SQL = """
WITH d AS (
  SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS side,
         CASE WHEN regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
              THEN len(regexp_split_to_array(trim(text), '\\s+'))
              ELSE 0 END AS n_tok
  FROM documents
),
vals AS (
  SELECT n_tok,
         SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS b
  FROM d GROUP BY n_tok
),
c AS (
  SELECT n_tok,
         SUM(a) OVER (ORDER BY n_tok) AS ca,
         SUM(b) OVER (ORDER BY n_tok) AS cb
  FROM vals
),
tot AS (SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb FROM vals),
best AS (
  SELECT c.n_tok, abs(CAST(c.ca * tot.nb - c.cb * tot.na AS HUGEINT)) AS diff
  FROM c CROSS JOIN tot
  ORDER BY diff DESC, c.n_tok ASC LIMIT 1
)
SELECT tot.na AS n_a, tot.nb AS n_b,
       CAST(best.diff * 1000000 // (CAST(tot.na AS HUGEINT) * tot.nb) AS BIGINT)
         AS ks_e6,
       CAST(best.n_tok AS BIGINT) AS at_value
FROM best CROSS JOIN tot
"""


def welch_ttest(sf_dir: str) -> pd.DataFrame:
    """Welch's unequal-variance two-sample t-test on mean doc length
    (n_chars) between the even-/odd-numbered source cohorts — the
    PARAMETRIC drift companion of ks_two_sample (KS asks "same
    distribution?", Welch asks "same mean?" with a size-aware standard
    error; an A/B corpus comparison wants both). Sides share
    ks_two_sample's cohort derivation.

    Distributed as exact integer sufficient statistics (the
    regression_by_lang pattern): each block ships ONE (side, n, Σx,
    Σxx) int64 moment row, the 2-row fold closes the test driver-side.
    Float contract: every divide/sqrt is spelled as the IDENTICAL IEEE
    expression over exact-int casts on both sides (engine float64 ≙
    oracle CAST(... AS DOUBLE), same parenthesization, one libm sqrt),
    then round-6 — the regression_by_lang / dp_group_counts margin."""
    from ray.data.aggregate import Sum

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["source", "n_chars"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        side = np.fromiter(
            (int(s[3:]) % 2 for s in batch["source"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        x = batch["n_chars"].to_numpy()
        df = pd.DataFrame({"side": side, "n": 1, "sx": x, "sxx": x * x})
        g = df.groupby("side", as_index=False).sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    m = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("side")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sxx", alias_name="sxx"))
        .to_pandas()
        .set_index("side")
    )
    na, sxa, sxxa = (int(m.loc[0, c]) for c in ("n", "sx", "sxx"))
    nb, sxb, sxxb = (int(m.loc[1, c]) for c in ("n", "sx", "sxx"))
    # IEEE mirror of the oracle: exact-int casts, identical op order
    ma = float(sxa) / float(na)
    mb = float(sxb) / float(nb)
    va = float(na * sxxa - sxa * sxa) / float(na * na * (na - 1))
    vb = float(nb * sxxb - sxb * sxb) / float(nb * nb * (nb - 1))
    import math

    t = (ma - mb) / math.sqrt(va + vb)
    df_w = ((va + vb) * (va + vb)) / (va * va / float(na - 1) + vb * vb / float(nb - 1))
    return pd.DataFrame(
        {
            "n_a": [na],
            "n_b": [nb],
            "mean_a": [round(ma, 6)],
            "mean_b": [round(mb, 6)],
            "t_stat": [round(t, 6)],
            "df": [round(df_w, 6)],
        }
    ).astype({"n_a": "int64", "n_b": "int64"})


WELCH_TTEST_SQL = """
WITH d AS (
  SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS side,
         CAST(n_chars AS HUGEINT) AS x
  FROM documents
),
m AS (
  SELECT side, CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(x * x) AS sxx
  FROM d GROUP BY side
),
w AS (
  SELECT
    (SELECT CAST(n AS BIGINT) FROM m WHERE side = 0) AS na,
    (SELECT CAST(n AS BIGINT) FROM m WHERE side = 1) AS nb,
    (SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) FROM m WHERE side = 0) AS ma,
    (SELECT CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) FROM m WHERE side = 1) AS mb,
    (SELECT CAST(n * sxx - sx * sx AS DOUBLE)
            / CAST(n * n * (n - 1) AS DOUBLE) FROM m WHERE side = 0) AS va,
    (SELECT CAST(n * sxx - sx * sx AS DOUBLE)
            / CAST(n * n * (n - 1) AS DOUBLE) FROM m WHERE side = 1) AS vb
)
SELECT na AS n_a, nb AS n_b,
       ROUND(ma, 6) AS mean_a, ROUND(mb, 6) AS mean_b,
       ROUND((ma - mb) / sqrt(va + vb), 6) AS t_stat,
       ROUND(((va + vb) * (va + vb))
             / (va * va / CAST(na - 1 AS DOUBLE) + vb * vb / CAST(nb - 1 AS DOUBLE)),
             6) AS df
FROM w
"""


def chi2_independence(sf_dir: str) -> pd.DataFrame:
    """Pearson chi-square test of INDEPENDENCE between doc language and
    the even/odd source cohort — the contingency-table complement of
    benford_audit's goodness-of-fit (Benford tests observed counts
    against a FIXED law; this tests two data-derived marginals against
    each other: is the language mix the same in both cohorts?). The
    audit a corpus A/B split runs to prove the split didn't skew
    composition.

    One streaming pass folds to (lang, side, cnt) integer partials
    bounded by #langs x 2 x #blocks; the pivot, expected counts
    e = row_total * col_total / n and the (o - e)^2 / e terms run on
    the #langs-sized table driver-side. Per-lang contribution rows plus
    an 'ALL' total row with dof = (#langs - 1) x 1. Float contract:
    exact-int casts + identical IEEE expressions both sides, round-6
    (cross-lang sum-order drift is ~1e-13 relative, 7 orders under the
    gate margin)."""
    from ray.data.aggregate import Sum

    docs = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        side = np.fromiter(
            (int(s[3:]) % 2 for s in batch["source"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        df = pd.DataFrame({"lang": batch["lang"].to_pylist(), "side": side})
        g = df.groupby(["lang", "side"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    cells = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "side"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    piv = (
        cells.pivot_table(index="lang", columns="side", values="cnt", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    n = int(piv.to_numpy().sum())
    col = [int(piv[0].sum()), int(piv[1].sum())]
    rows = []
    total = 0.0
    for lang, r in piv.iterrows():
        rt = int(r[0]) + int(r[1])
        contrib = 0.0
        for j in (0, 1):
            e = float(rt) * float(col[j]) / float(n)
            o = float(int(r[j]))
            contrib = contrib + (o - e) * (o - e) / e
        total += contrib
        rows.append({"lang": lang, "n_even": int(r[0]), "n_odd": int(r[1]),
                     "chi2_contrib": round(contrib, 6), "dof": 0})
    rows.append({"lang": "ALL", "n_even": col[0], "n_odd": col[1],
                 "chi2_contrib": round(total, 6), "dof": len(piv) - 1})
    return pd.DataFrame(rows).astype(
        {"lang": "str", "n_even": "int64", "n_odd": "int64", "dof": "int64"}
    )[["lang", "n_even", "n_odd", "chi2_contrib", "dof"]]


CHI2_INDEPENDENCE_SQL = """
WITH d AS (
  SELECT lang, CAST(substr(source, 4) AS BIGINT) % 2 AS side FROM documents
),
cell AS (
  SELECT lang,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd
  FROM d GROUP BY lang
),
tot AS (
  SELECT CAST(SUM(n_even) AS BIGINT) AS c0, CAST(SUM(n_odd) AS BIGINT) AS c1,
         CAST(SUM(n_even + n_odd) AS BIGINT) AS n, COUNT(*) AS n_langs
  FROM cell
),
contrib AS (
  SELECT cell.lang, cell.n_even, cell.n_odd,
         (CAST(cell.n_even AS DOUBLE)
            - CAST(cell.n_even + cell.n_odd AS DOUBLE) * CAST(tot.c0 AS DOUBLE) / CAST(tot.n AS DOUBLE))
         * (CAST(cell.n_even AS DOUBLE)
            - CAST(cell.n_even + cell.n_odd AS DOUBLE) * CAST(tot.c0 AS DOUBLE) / CAST(tot.n AS DOUBLE))
         / (CAST(cell.n_even + cell.n_odd AS DOUBLE) * CAST(tot.c0 AS DOUBLE) / CAST(tot.n AS DOUBLE))
         +
         (CAST(cell.n_odd AS DOUBLE)
            - CAST(cell.n_even + cell.n_odd AS DOUBLE) * CAST(tot.c1 AS DOUBLE) / CAST(tot.n AS DOUBLE))
         * (CAST(cell.n_odd AS DOUBLE)
            - CAST(cell.n_even + cell.n_odd AS DOUBLE) * CAST(tot.c1 AS DOUBLE) / CAST(tot.n AS DOUBLE))
         / (CAST(cell.n_even + cell.n_odd AS DOUBLE) * CAST(tot.c1 AS DOUBLE) / CAST(tot.n AS DOUBLE))
           AS chi2
  FROM cell CROSS JOIN tot
)
SELECT lang, n_even, n_odd, ROUND(chi2, 6) AS chi2_contrib, CAST(0 AS BIGINT) AS dof
FROM contrib
UNION ALL
SELECT 'ALL', tot.c0, tot.c1,
       ROUND((SELECT SUM(chi2) FROM contrib), 6),
       CAST(tot.n_langs - 1 AS BIGINT)
FROM tot
"""


def mannwhitney_u(sf_dir: str) -> pd.DataFrame:
    """Exact Mann-Whitney U (Wilcoxon rank-sum) between the even/odd
    source cohorts over doc length — the NONPARAMETRIC mean-shift test
    completing the drift family (PSI needs bins, KS tests the whole
    CDF, Welch assumes means matter; MWU asks "does one cohort
    stochastically dominate?" and is the standard A/B test under heavy
    tails). Cohorts share ks_two_sample's derivation; the machinery is
    the same value histogram.

    Exact integers: with per-value counts ca/cb and prefix sums, U_a =
    sum_v ca_v * (cumb_<v + cb_v/2); we carry u2 = 2*U_a so ties never
    leave the integers. The tie-corrected normal z closes from exact
    big-int numerators (var_num = na*nb*((N^3-N) - sum(t^3-t)),
    den = 12*N*(N-1)) with IDENTICAL IEEE casts/divides on both sides
    (the welch_ttest contract), round-6.

    Scale: the ks_two_sample single-pass (side, value, cnt) histogram —
    distinct-values x #blocks bounded exchange, rank walk driver-side."""
    from ray.data.aggregate import Sum

    docs = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])

    def partial(batch: pa.Table) -> pa.Table:
        side = np.fromiter(
            (int(s[3:]) % 2 for s in batch["source"].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        df = pd.DataFrame({"side": side, "v": batch["n_chars"].to_numpy()})
        g = df.groupby(["side", "v"], as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["side", "v"])
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    piv = (
        hist.pivot_table(index="v", columns="side", values="cnt", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
        .sort_index()
    )
    ca = piv[0].to_numpy()
    cb = piv[1].to_numpy()
    na, nb = int(ca.sum()), int(cb.sum())
    cumb_less = np.concatenate([[0], np.cumsum(cb)[:-1]])
    u2 = int(sum(int(a) * (2 * int(bl) + int(b)) for a, bl, b in zip(ca, cumb_less, cb)))
    N = na + nb
    t = ca + cb
    tie_term = int(sum(int(x) ** 3 - int(x) for x in t))
    var_num = na * nb * ((N**3 - N) - tie_term)
    den = 12 * N * (N - 1)
    import math

    ua = float(u2) / 2.0
    mu = float(na * nb) / 2.0
    s2 = float(var_num) / float(den)
    z = (ua - mu) / math.sqrt(s2)
    return pd.DataFrame(
        {
            "n_a": pd.Series([na], dtype="int64"),
            "n_b": pd.Series([nb], dtype="int64"),
            "u2": pd.Series([u2], dtype="int64"),
            "z_stat": [round(z, 6)],
        }
    )


MANNWHITNEY_SQL = """
WITH d AS (
  SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS side, n_chars AS v FROM documents
),
vals AS (
  SELECT v,
         CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS HUGEINT) AS ca,
         CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS HUGEINT) AS cb
  FROM d GROUP BY v
),
pre AS (
  SELECT v, ca, cb,
         COALESCE(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS cumb_less
  FROM vals
),
agg AS (
  SELECT SUM(ca * (2 * cumb_less + cb)) AS u2,
         SUM(ca) AS na, SUM(cb) AS nb,
         SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS tie_term
  FROM pre
),
fin AS (
  SELECT na, nb, u2,
         na * nb * (((na + nb) * (na + nb) * (na + nb) - (na + nb)) - tie_term) AS var_num,
         12 * (na + nb) * (na + nb - 1) AS den
  FROM agg
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       CAST(u2 AS BIGINT) AS u2,
       ROUND((CAST(u2 AS DOUBLE) / 2.0 - CAST(na * nb AS DOUBLE) / 2.0)
             / sqrt(CAST(var_num AS DOUBLE) / CAST(den AS DOUBLE)), 6) AS z_stat
FROM fin
"""
