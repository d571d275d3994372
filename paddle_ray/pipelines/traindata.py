"""Training-data preparation operators over `documents`: duplicated
n-gram span detection (substring-dedup diagnostics), deterministic
importance resampling, and token-budget sequence packing.

These are the stages between corpus hygiene and the training loader
(public recipes: Lee et al. 2021 "Deduplicating Training Data Makes
Language Models Better" finds duplicated substrings across the corpus;
DoReMi/Pile-style per-source importance weights resample the mixture;
GPT-2-style loaders concatenate documents and chunk at a fixed token
budget). All three are value-oracled in DuckDB.

Scale contracts
---------------
- `duplicate_ngram_spans`: pass 1 shuffles pre-counted (gram, count)
  rows per block to elect globally-duplicated grams; pass 2 re-derives
  grams and hash-joins the duplicated set back (native shuffle join —
  the dup-gram table is unbounded, so it is NEVER broadcast or
  collected). Grams cross the shuffles as blake2b-128 digests by
  default (the 100 TB path; ~10x smaller rows than real-webtext gram
  strings); hashed=False shuffles the exact strings for debugging.
- `importance_resample`: stateless md5-threshold keep decision per row
  + per-(lang) count/char partials per block — one tiny groupby, no
  payload shuffle. Deterministic: the same doc set survives at any
  parallelism.
- `pack_sequences`: the distributed prefix-scan pattern
  (events_running_value): per-shard token totals -> driver computes
  O(#shards) offsets -> broadcast -> per-shard vectorized cumsum
  assigns each doc its [seq_first, seq_last] window. Concat-and-chunk
  packing (documents split across sequence boundaries), NOT bin
  packing — the GPT-style loader contract.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .common import sized_read_parquet


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# --------------------------------------------------------------------------
# duplicated n-gram spans (Lee et al. substring-dedup at fixed granularity)
# --------------------------------------------------------------------------

NGRAM_K = 4  # 11.6% of spans duplicated on the test corpus — non-vacuous


def _grams(text: str, k: int) -> list[str]:
    ws = text.split()
    return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]


def duplicate_ngram_spans(sf_dir: str, k: int = NGRAM_K, hashed: bool = True) -> pd.DataFrame:
    """Per-doc duplicated-span stats: how many of a document's k-gram
    positions carry a gram that occurs more than once ACROSS THE WHOLE
    CORPUS (counting positions, so within-doc repeats count too). The
    per-doc dup_frac is the signal Lee et al. threshold to drop or trim
    documents made of copied text.

    hashed=True (the DEFAULT — VERDICT r3 #4) is the 100 TB path: grams
    shuffle as 32-hex-char blake2b-128 digests instead of raw strings (a
    real-webtext 50-token gram is ~300 B; the digest is 32 B) —
    identical output up to a ~1e-20 collision probability, asserted
    equal to the exact path in test_traindata. hashed=False keeps the
    exact-string shuffle as the debug option; the oracle compares final
    per-doc outputs, so it holds for both."""
    from ray.data.aggregate import Sum

    def gkey(g: str) -> str:
        if not hashed:
            return g
        return hashlib.blake2b(g.encode(), digest_size=16).hexdigest()

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(gkey(g) for g in _grams(t, k))
        return pa.table(
            {"g": pa.array(list(c.keys()), pa.string()),
             "c": pa.array(list(c.values()), pa.int64())}
        )

    dup = (
        _docs(sf_dir)
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("c", alias_name="c"))
        .filter(expr="c > 1")
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids, gs = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for gram in _grams(t, k):
                ids.append(d)
                gs.append(gkey(gram))
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "g": pa.array(gs, pa.string())})

    joined = (
        _docs(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .join(dup, join_type="inner", num_partitions=8, on=("g",))
    )

    def dup_partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["doc_id"]).group_by("doc_id").aggregate([([], "count_all")])
        return g.rename_columns(["doc_id", "n_dup_spans"])

    dup_counts = (
        joined.map_batches(dup_partial, batch_format="pyarrow", batch_size=None)
        .groupby("doc_id")
        .aggregate(Sum("n_dup_spans", alias_name="n_dup_spans"))
        .to_pandas()
    )

    def totals(batch: pa.Table) -> pa.Table:
        n = [max(len(t.split()) - k + 1, 0) for t in batch["text"].to_pylist()]
        return pa.table({"doc_id": batch["doc_id"], "n_grams": pa.array(n, pa.int64())})

    per_doc = _docs(sf_dir).map_batches(totals, batch_format="pyarrow").to_pandas()
    out = per_doc[per_doc.n_grams > 0].merge(dup_counts, on="doc_id", how="left")
    out["n_dup_spans"] = out.n_dup_spans.fillna(0).astype("int64")
    out["dup_frac"] = (out.n_dup_spans / out.n_grams).round(6)
    return (
        out.sort_values("doc_id").reset_index(drop=True).astype({"doc_id": "int64", "n_grams": "int64"})
    )


# ONE owner of the gram-SQL builder (webtext.py) — a second copy here
# could silently desynchronize the two oracle generators
from .webtext import _gram_sql

DUP_NGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ts
  FROM documents WHERE trim(text) != ''
),
g AS (
  SELECT doc_id, {_gram_sql(NGRAM_K)} AS s
  FROM toks, LATERAL unnest(generate_series(1, len(ts) - {NGRAM_K - 1})) AS gs(i)
),
cnt AS (SELECT s, COUNT(*) AS c FROM g GROUP BY s)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       ROUND(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS dup_frac
FROM g JOIN cnt USING (s)
GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# BPE pair election (the inner step of byte-pair-encoding vocab training)
# --------------------------------------------------------------------------

BPE_TOP_K = 50


def bpe_pair_counts(sf_dir: str, k: int = BPE_TOP_K) -> pd.DataFrame:
    """Global adjacent character-pair frequencies within words — the
    corpus statistic one BPE merge round elects its next symbol from
    (Sennrich et al. 2016; a full tokenizer trainer iterates this with
    merged symbols). Returns the top-k pairs by (count desc, pair asc) —
    a deterministic total order, so a tie straddling the k boundary cuts
    identically on both sides.

    Scale contract: per-block Counter partials shuffle as (pair, count)
    rows — the distinct-pair space is bounded by |charset|^2, so both
    the shuffle and the final collect are alphabet-sized, never
    corpus-sized. Oracled by BPE_PAIR_SQL."""
    from collections import Counter

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            for w in t.split():
                c.update(w[i : i + 2] for i in range(len(w) - 1))
        return pa.table(
            {
                "pair": pa.array(list(c.keys()), pa.string()),
                "cnt": pa.array(list(c.values()), pa.int64()),
            }
        )

    out = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("pair")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(
            {"pair": pd.Series([], dtype="object"), "cnt": pd.Series([], dtype="int64")}
        )
    return (
        out.sort_values(["cnt", "pair"], ascending=[False, True], kind="mergesort")
        .head(k)
        .reset_index(drop=True)
        .astype({"cnt": "int64"})
    )


BPE_PAIR_SQL = f"""
WITH w AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'), x -> x != '')) AS word
  FROM documents
),
p AS (
  SELECT substr(word, i, 2) AS pair
  FROM w, LATERAL unnest(generate_series(1, len(word) - 1)) AS gs(i)
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt
FROM p GROUP BY pair ORDER BY cnt DESC, pair LIMIT {BPE_TOP_K}
"""


# --------------------------------------------------------------------------
# deterministic importance resampling (mixture reweighting)
# --------------------------------------------------------------------------

# per-lang keep probabilities (a DoReMi-style mixture reweight: upsample
# is out of scope for a keep/drop pass, so weights are <= 1)
RESAMPLE_WEIGHTS = {"en": 0.9, "de": 0.7, "es": 0.5, "fr": 0.5, "zh": 0.3}
RESAMPLE_DEFAULT_W = 0.5


def _w_threshold_hex(w: float) -> str:
    """See common.w_threshold_hex (moved there so webtext can share it
    without a circular import)."""
    from .common import w_threshold_hex

    return w_threshold_hex(w)


def importance_resample(sf_dir: str) -> pd.DataFrame:
    """Keep each doc with per-lang probability w(lang), decided by a
    deterministic md5 rank of doc_id (same doc set at any parallelism,
    any cluster size — the property a resumable 100 TB sampling pass
    needs). Output: per-lang kept doc count and kept char mass."""
    from ray.data.aggregate import Sum

    thresh = {lang: _w_threshold_hex(w) for lang, w in RESAMPLE_WEIGHTS.items()}
    bcast = ray.put(thresh)

    default_th = _w_threshold_hex(RESAMPLE_DEFAULT_W)

    def partial(batch: pa.Table) -> pa.Table:
        th = ray.get(bcast)
        langs = batch["lang"].to_pylist()
        keep = [
            hashlib.md5(str(d).encode()).hexdigest() < th.get(lang, default_th)
            for d, lang in zip(batch["doc_id"].to_pylist(), langs)
        ]
        t = pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "n_docs": pa.array([1 if kp else 0 for kp in keep], pa.int64()),
                "n_chars": pa.array(
                    [c if kp else 0 for kp, c in zip(keep, batch["n_chars"].to_pylist())],
                    pa.int64(),
                ),
            }
        )
        g = t.group_by("lang").aggregate([("n_docs", "sum"), ("n_chars", "sum")])
        return g.rename_columns(["lang", "n_docs", "n_chars"])

    out = (
        _docs(sf_dir, columns=("doc_id", "lang", "n_chars"))
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype({"n_docs": "int64", "n_chars": "int64"})


def _resample_case_sql() -> str:
    arms = "\n    ".join(
        f"WHEN lang = '{lang}' THEN '{_w_threshold_hex(w)}'"
        for lang, w in sorted(RESAMPLE_WEIGHTS.items())
    )
    return f"CASE\n    {arms}\n    ELSE '{_w_threshold_hex(RESAMPLE_DEFAULT_W)}' END"


IMPORTANCE_RESAMPLE_SQL = f"""
SELECT lang,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS n_chars
FROM (
  SELECT lang, n_chars,
         md5(CAST(doc_id AS VARCHAR)) < ({_resample_case_sql()}) AS kept
  FROM documents
)
GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# token-budget sequence packing (concat-and-chunk loader contract)
# --------------------------------------------------------------------------

PACK_BUDGET = 512
PACK_SHARD = 1024  # docs per offset shard; #shards = #docs / 1024 drives the offset table


def pack_sequences(sf_dir: str, budget: int = PACK_BUDGET) -> pd.DataFrame:
    """Assign every document its training-sequence window under concat-
    and-chunk packing: documents concatenate in doc_id order and split
    into fixed `budget`-token sequences; a doc whose tokens straddle a
    boundary spans several sequences. seq_first/seq_last are the global
    sequence indices of the doc's first/last token. Zero-token docs
    (empty/whitespace-only) contribute nothing to the stream and are
    EXCLUDED from the output on both sides — their [seq_first,
    seq_last] window is undefined (the SQL arm mirrors this with an
    n_tokens > 0 filter; a bare regexp_split_to_array would count ''
    as one phantom token and shift every later doc). Distributed prefix
    scan: per-shard (doc_id // {PACK_SHARD}) token totals -> driver
    offset table (O(#shards) rows) -> broadcast -> per-shard vectorized
    cumsum. Nothing corpus-sized lands on the driver before the final
    per-doc collect (the driver contract)."""
    from ray.data.aggregate import Sum

    def tok_partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        toks = np.array([len(t.split()) for t in batch["text"].to_pylist()], np.int64)
        t = pa.table(
            {"shard": pa.array(ids // PACK_SHARD, pa.int64()), "toks": pa.array(toks, pa.int64())}
        )
        g = t.group_by("shard").aggregate([("toks", "sum")])
        return g.rename_columns(["shard", "toks"])

    shard_totals = (
        _docs(sf_dir)
        .map_batches(tok_partial, batch_format="pyarrow", batch_size=None)
        .groupby("shard")
        .aggregate(Sum("toks", alias_name="toks"))
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    offsets = dict(zip(shard_totals.shard, shard_totals.toks.cumsum().shift(1, fill_value=0)))
    off_ref = ray.put(offsets)

    def add_shard(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("shard", pa.array(ids // PACK_SHARD, pa.int64()))

    def scan_shard(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_tokens": pd.Series([], dtype="int64"),
                    "seq_first": pd.Series([], dtype="int64"),
                    "seq_last": pd.Series([], dtype="int64"),
                }
            )
        off = ray.get(off_ref)
        g = g.sort_values("doc_id", kind="mergesort")
        toks = g.text.map(lambda t: len(t.split())).to_numpy(dtype=np.int64)
        end = toks.cumsum() + int(off[int(g.shard.iloc[0])])
        start = end - toks
        # zero-token docs: no tokens in the stream (cumsum unaffected),
        # no output row — mirrors the oracle's n_tokens > 0 filter
        nz = toks > 0
        return pd.DataFrame(
            {
                "doc_id": g.doc_id.to_numpy()[nz],
                "n_tokens": toks[nz],
                "seq_first": start[nz] // budget,
                "seq_last": (end[nz] - 1) // budget,
            }
        )

    out = (
        _docs(sf_dir)
        .map_batches(add_shard, batch_format="pyarrow")
        .groupby("shard")
        .map_groups(scan_shard, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype(
        {"doc_id": "int64", "n_tokens": "int64", "seq_first": "int64", "seq_last": "int64"}
    )


PACK_SEQUENCES_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
              THEN len(regexp_split_to_array(trim(text), '\\s+'))
              ELSE 0 END AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
  FROM t
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(start // {PACK_BUDGET} AS BIGINT) AS seq_first,
       CAST((start + n_tokens - 1) // {PACK_BUDGET} AS BIGINT) AS seq_last
FROM c WHERE n_tokens > 0 ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# per-language token-budget selection (quality-ranked corpus-mix cut)
# --------------------------------------------------------------------------

TB_BUDGET = 1500  # tokens kept per language (constant => one SQL oracle at any sf)
TB_BUCKETS = 1000  # coarse stop-ratio buckets for the distributed threshold pass
TB_BOUNDARY_CAP = 2_000_000  # boundary residency above which the key refinement runs
TB_REFINE_BUCKETS = 1024  # buckets per refinement round (64-bit key => <= 7 rounds)
TB_REFINE_MAX_ROUNDS = 80  # safety rail (provably unreachable: width/1024 per round)


def token_budget_select(
    sf_dir: str,
    budget: int = TB_BUDGET,
    boundary_cap: int = TB_BOUNDARY_CAP,
) -> pd.DataFrame:
    """Select, per language, the highest-quality documents until a token
    budget is exhausted — the corpus-mix cut a tiered training plan
    makes after scoring ("take the best N billion tokens per lang").
    Quality rank = stopword ratio descending (the same stoplist/division
    the quality ops use, so the float is bit-identical to the oracle's),
    doc_id ascending as the tiebreak; a doc is kept iff the running
    token total up to and including it is <= `budget`. Zero-token docs
    are excluded on both sides.

    Distributed threshold ("top-k by weight") — NOT a per-lang sort:
    pass 1 histograms token mass into {TB_BUCKETS} coarse stop-ratio
    buckets per lang (shuffle is #langs x #buckets int64 partials);
    the driver walks each lang's buckets in descending order to find the
    boundary bucket where the budget lands. Pass 2 streams again:
    everything in a strictly-higher bucket is kept outright (floor() is
    monotone, so higher bucket => strictly higher stop ratio => earlier
    in the oracle's order, and the whole region fits the budget by
    construction); only the boundary bucket's docs — a ~1/{TB_BUCKETS}
    slice — are resolved exactly by (stop DESC, doc_id) prefix-sum,
    driver-side while the slice is under `boundary_cap` rows. Past the
    cap (VERDICT r4 #3 — the old code raised here) the slice is resolved
    by ITERATIVE HISTOGRAM REFINEMENT on the exact sort key, the
    events.exact_ts_quantiles machinery weighted by tokens: the key is
    (~bits(stop), doc_id) — IEEE bit patterns of non-negative floats are
    order-isomorphic, so complemented bits ascending == stop descending,
    exactly the oracle's ORDER BY. Phase A walks {TB_REFINE_BUCKETS}-way
    token-weighted histograms of the 64-bit inverted stop key down to a
    single exact value V per lang (<= 7 rounds, each one streaming pass
    over the boundary slice); phase B re-runs the same machinery on
    doc_id WITHIN the tied value V (which is what makes the pathological
    all-docs-one-stop-value pileup terminate: stop carries no
    information there, so the tiebreak key is refined instead). The
    driver only ever holds per-lang (lo, hi, used) states and the final
    kept rows. Oracle: TOKEN_BUDGET_SQL's window cumsum reproduces the
    kept set exactly."""
    from ..functions.textstats import STOPWORDS

    def signals(batch: pa.Table) -> pa.Table:
        stops, ntoks = [], []
        for text in batch["text"].to_pylist():
            ws = text.split()
            n = len(ws)
            ntoks.append(n)
            stops.append(
                sum(1 for w in ws if w.lower() in STOPWORDS) / n if n else 0.0
            )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang": batch["lang"],
                "n_tok": pa.array(ntoks, pa.int64()),
                "stop": pa.array(stops, pa.float64()),
            }
        )

    base = (
        _docs(sf_dir, columns=("doc_id", "lang", "text"))
        .map_batches(signals, batch_format="pyarrow")
        .filter(expr="n_tok > 0")
        .materialize()  # consumed twice (histogram pass + apply pass)
    )

    def bucket_partial(batch: pa.Table) -> pa.Table:
        b = np.minimum(
            (batch["stop"].to_numpy(zero_copy_only=False) * TB_BUCKETS).astype(np.int64),
            TB_BUCKETS,  # stop == 1.0 lands in its own top bucket
        )
        t = pa.table(
            {
                "lang": batch["lang"],
                "bucket": pa.array(b, pa.int64()),
                "toks": batch["n_tok"],
            }
        )
        g = t.group_by(["lang", "bucket"]).aggregate([("toks", "sum")])
        return g.rename_columns(["lang", "bucket", "toks"])

    from ray.data.aggregate import Sum

    hist = (
        base.map_batches(bucket_partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "bucket"])
        .aggregate(Sum("toks", alias_name="toks"))
        .to_pandas()
    )
    # boundary[lang] = (boundary_bucket, budget remaining inside it);
    # langs whose total fits the budget entirely have no boundary
    boundary: dict[str, tuple[int, int]] = {}
    for lang, g in hist.groupby("lang"):
        cum = 0
        for _, row in g.sort_values("bucket", ascending=False).iterrows():
            if cum + row.toks > budget:
                boundary[lang] = (int(row.bucket), int(budget - cum))
                break
            cum += int(row.toks)
    bref = ray.put(boundary)

    def classify(batch: pa.Table) -> pa.Table:
        bd = ray.get(bref)
        langs = batch["lang"].to_pylist()
        b = np.minimum(
            (batch["stop"].to_numpy(zero_copy_only=False) * TB_BUCKETS).astype(np.int64),
            TB_BUCKETS,
        )
        # 2 = kept outright, 1 = boundary bucket (resolve exactly), 0 = dropped
        cls = np.full(len(langs), 2, np.int8)
        for i, (lang, bk) in enumerate(zip(langs, b)):
            if lang in bd:
                bb = bd[lang][0]
                cls[i] = 2 if bk > bb else (1 if bk == bb else 0)
        return batch.append_column("cls", pa.array(cls, pa.int8()))

    tagged = base.map_batches(classify, batch_format="pyarrow")
    kept = tagged.filter(expr="cls == 2").to_pandas()
    bnd_ds = tagged.filter(expr="cls == 1").materialize()
    if bnd_ds.count() <= boundary_cap:
        # small boundary slice: one collect, exact prefix-sum per lang
        bnd = bnd_ds.to_pandas()
        picked = []
        for lang, g in bnd.groupby("lang"):
            rem = boundary[lang][1]
            g = g.sort_values(["stop", "doc_id"], ascending=[False, True])
            cum = g.n_tok.cumsum()
            picked.append(g[cum <= rem])
        out = pd.concat([kept, *picked], ignore_index=True) if picked else kept
    else:
        # oversized slice (VERDICT r4 #3): resolve the exact cut key by
        # iterative token-weighted histogram refinement — never collected
        cuts = _tb_refine_cuts(bnd_ds, {l: r for l, (_, r) in boundary.items()})
        cref = ray.put(cuts)

        def apply_cut(batch: pa.Table) -> pa.Table:
            cu = ray.get(cref)
            inv = ~batch["stop"].to_numpy(zero_copy_only=False).view(np.uint64)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            keepm = np.zeros(len(ids), bool)
            for i, lang in enumerate(batch["lang"].to_pylist()):
                V, D = cu[lang]
                keepm[i] = bool(inv[i] < V or (inv[i] == V and ids[i] < D))
            return batch.filter(pa.array(keepm))

        picked_pd = bnd_ds.map_batches(apply_cut, batch_format="pyarrow").to_pandas()
        out = (
            pd.concat([kept, picked_pd], ignore_index=True)
            if len(picked_pd)
            else kept
        )
    out["stop_ratio"] = out.stop.round(6)
    out = (
        out[["doc_id", "lang", "n_tok", "stop_ratio"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "n_tok": "int64"})


def _tb_refine_cuts(
    bnd_ds, rem_by_lang: dict[str, int], buckets: int = TB_REFINE_BUCKETS
) -> dict[str, tuple[int, int]]:
    """Resolve token_budget_select's exact per-lang cut key over an
    arbitrarily large boundary slice by iterative histogram refinement
    (the events.exact_ts_quantiles pattern, token-weighted and two-phase;
    see token_budget_select's docstring). Returns lang -> (V, D): keep a
    row iff inv_stop_bits < V, or == V and doc_id < D. Each round is one
    streaming pass over `bnd_ds`; the driver holds only per-lang interval
    states and #langs x #buckets histogram partials."""
    from ray.data.aggregate import Sum

    U64MAX = (1 << 64) - 1
    # state per lang: [phase, lo, hi (inclusive), used_below_lo, V]
    state: dict[str, list] = {lang: ["A", 0, U64MAX, 0, None] for lang in rem_by_lang}
    cuts: dict[str, tuple[int, int]] = {}

    for _ in range(TB_REFINE_MAX_ROUNDS):
        pend = {l: s for l, s in state.items() if l not in cuts}
        if not pend:
            break
        plan = {
            l: (s[0], s[1], s[2], max(1, (s[2] - s[1] + buckets) // buckets), s[4])
            for l, s in pend.items()
        }
        pref = ray.put(plan)

        def hist_partial(batch: pa.Table) -> pa.Table:
            pl = ray.get(pref)
            langs = np.asarray(batch["lang"].to_pylist(), dtype=object)
            inv = ~batch["stop"].to_numpy(zero_copy_only=False).view(np.uint64)
            ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            toks = batch["n_tok"].to_numpy(zero_copy_only=False)
            l_o: list = []
            b_o: list = []
            t_o: list = []
            for lang in sorted(pl):
                phase, lo, hi, step, V = pl[lang]
                x = inv if phase == "A" else ids
                m = langs == lang
                if phase == "B":
                    m &= inv == np.uint64(V)
                m &= (x >= np.uint64(lo)) & (x <= np.uint64(hi))
                if not m.any():
                    continue
                b = ((x[m] - np.uint64(lo)) // np.uint64(step)).astype(np.int64)
                acc = np.zeros(buckets, np.int64)
                np.add.at(acc, b, toks[m])
                nz = np.nonzero(acc)[0]
                l_o.extend([lang] * len(nz))
                b_o.extend(nz.tolist())
                t_o.extend(acc[nz].tolist())
            return pa.table(
                {
                    "lang": pa.array(l_o, pa.string()),
                    "bucket": pa.array(b_o, pa.int64()),
                    "toks": pa.array(t_o, pa.int64()),
                }
            )

        hist = (
            bnd_ds.map_batches(hist_partial, batch_format="pyarrow", batch_size=None)
            .groupby(["lang", "bucket"])
            .aggregate(Sum("toks", alias_name="toks"))
            .to_pandas()
        )
        for lang, (phase, lo, hi, step, V) in plan.items():
            used = int(state[lang][3])
            rem = int(rem_by_lang[lang])
            g = hist[hist.lang == lang].sort_values("bucket")
            narrowed = False
            for _, row in g.iterrows():
                if used + int(row.toks) > rem:
                    b = int(row.bucket)
                    new_lo = lo + b * step
                    new_hi = min(hi, lo + (b + 1) * step - 1)
                    if step == 1:
                        if phase == "A":
                            # exact tied stop value found — refine the
                            # doc_id tiebreak within it
                            state[lang] = ["B", 0, U64MAX, used, new_lo]
                        else:
                            cuts[lang] = (int(state[lang][4]), new_lo)
                    else:
                        state[lang] = [phase, new_lo, new_hi, used, V]
                    narrowed = True
                    break
                used += int(row.toks)
            if not narrowed:
                # a boundary lang's budget exhausts INSIDE its slice by
                # construction; reaching here means the invariant broke
                raise RuntimeError(
                    f"token-budget refinement invariant violated for lang "
                    f"{lang!r}: slice fits the remaining budget"
                )
    missing = set(rem_by_lang) - set(cuts)
    if missing:
        raise RuntimeError(
            f"token-budget refinement did not converge for {sorted(missing)} "
            f"within {TB_REFINE_MAX_ROUNDS} rounds"
        )
    return cuts


TOKEN_BUDGET_SQL_T = """
WITH toks AS (
  SELECT doc_id, lang,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS ts
  FROM documents
),
m AS (
  SELECT doc_id, lang, len(ts) AS n_tok,
         len(list_filter(ts, t -> lower(t) IN
           ('the','a','an','and','or','of','to','in','is','are','was','were','be','been','it','this','that','for','on','with','as','at','by','from')))
           * 1.0 / len(ts) AS stop
  FROM toks WHERE len(ts) > 0
),
r AS (
  SELECT doc_id, lang, n_tok, stop,
         SUM(n_tok) OVER (PARTITION BY lang ORDER BY stop DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum
  FROM m
)
SELECT doc_id, lang, n_tok, ROUND(stop, 6) AS stop_ratio
FROM r WHERE cum <= {budget} ORDER BY doc_id
"""

TOKEN_BUDGET_SQL = TOKEN_BUDGET_SQL_T.format(budget=TB_BUDGET)


# --------------------------------------------------------------------------
# deterministic training-order shuffle -> shard/position layout
# --------------------------------------------------------------------------

SHARD_SIZE = 100  # docs per output training shard
SHUF_BUCKETS = 256  # first-byte-of-md5 range partitions for the rank pass


def training_shards(sf_dir: str, shard_size: int = SHARD_SIZE) -> pd.DataFrame:
    """Deterministic global training-order shuffle + shard layout: order
    docs by md5(doc_id) (the cluster-size-invariant "random" permutation
    every run reproduces), then lay them out into fixed-size training
    shards — (shard, pos) is exactly the webdataset/packed-corpus layout
    a training job reads. The permutation is independent of block
    boundaries and parallelism, so a re-run (or a differently-sized
    cluster) writes byte-identical shards.

    Distributed rank WITHOUT a global sort materialize: md5 keys are
    uniform, so the first key byte range-partitions the order into
    {SHUF_BUCKETS} buckets. Pass 1 counts per bucket (<= {SHUF_BUCKETS}
    int64 partials per block); the driver prefix-sums the 256-row table
    into bucket offsets. Pass 2 shuffles ONLY (key16, doc_id) rows to
    their bucket, sorts within the bucket, and adds the broadcast offset
    — global rank = bucket offset + in-bucket position. Oracle:
    TRAINING_SHARDS_SQL's window row_number reproduces the permutation."""
    import hashlib

    from ray.data.aggregate import Sum

    def keyed(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ks = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "k": pa.array(ks, pa.string()),
                "bucket": pa.array([int(k[:2], 16) for k in ks], pa.int64()),
            }
        )

    base = _docs(sf_dir, columns=("doc_id",)).map_batches(
        keyed, batch_format="pyarrow"
    ).materialize()  # consumed twice: count pass + rank pass

    def count_partial(batch: pa.Table) -> pa.Table:
        g = pa.table(
            {"bucket": batch["bucket"], "n": pa.array(np.ones(len(batch), np.int64))}
        ).group_by("bucket").aggregate([("n", "sum")])
        return g.rename_columns(["bucket", "n"])

    counts = (
        base.map_batches(count_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    offsets = dict(zip(counts.bucket, counts.n.cumsum().shift(1, fill_value=0).astype(int)))
    off_ref = ray.put(offsets)

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "shard": pd.Series([], dtype="int64"),
                "pos": pd.Series([], dtype="int64"),
            }
        )
        if g.empty:
            return empty
        off = ray.get(off_ref)
        g = g.sort_values(["k", "doc_id"], kind="mergesort")
        rn = np.arange(len(g), dtype=np.int64) + int(off[int(g.bucket.iloc[0])])
        return pd.DataFrame(
            {
                "doc_id": g.doc_id.to_numpy(),
                "shard": rn // shard_size,
                "pos": rn % shard_size,
            }
        )

    out = (
        base.groupby("bucket")
        .map_groups(rank_bucket, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "shard": "int64", "pos": "int64"})


TRAINING_SHARDS_SQL_T = """
WITH r AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k FROM documents),
o AS (SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) - 1 AS rn FROM r)
SELECT doc_id, CAST(rn // {shard_size} AS BIGINT) AS shard,
       CAST(rn % {shard_size} AS BIGINT) AS pos
FROM o ORDER BY doc_id
"""

TRAINING_SHARDS_SQL = TRAINING_SHARDS_SQL_T.format(shard_size=SHARD_SIZE)


# --------------------------------------------------------------------------
# full BPE trainer (iterative merge elections over the distinct-word table)
# --------------------------------------------------------------------------

BPE_MERGES = 12


def bpe_synth_corpus() -> pd.DataFrame:
    """Deterministic sf-independent mini-corpus for the BPE-trainer golden
    oracle (same pattern as dedup.simhash_synth_corpus): a zipf-ish draw
    over a tiny morphology-rich vocabulary (the classic low/lower/lowest
    family) so successive merge rounds interact — early merges feed later
    ones, which a one-round pair count never exercises."""
    words = [
        "low", "lower", "lowest", "newer", "newest", "wider", "widest",
        "train", "trainer", "training", "data", "update",
    ]
    rows = []
    for i in range(240):
        a = words[(i * 7 + 3) % len(words)]
        b = words[(i * 13 + 5) % len(words)]
        c = words[(i * i + i // 3) % len(words)]
        rows.append({"doc_id": i, "text": f"{a} {b} {c}"})
    return pd.DataFrame(rows)


def bpe_train(sf_dir: str, n_merges: int = BPE_MERGES, docs=None) -> pd.DataFrame:
    """Full BPE tokenizer training (Sennrich et al. 2016): `n_merges`
    rounds of (count adjacent symbol pairs weighted by word frequency ->
    elect the max -> merge it everywhere), the loop bpe_pair_counts is
    one round of. Returns the learned merge table
    (round, left, right, merged, cnt) — the artifact a tokenizer ships.

    Scale contract: the corpus is collapsed ONCE into the distinct-WORD
    frequency table (a corpus-sized groupby whose shuffle rows are
    (word, count) partials — the standard trick: BPE statistics only
    depend on word frequencies), and every training round then runs over
    the vocab-sized symbolized table: per-block weighted pair Counters
    -> a pair-space-bounded groupby -> a driver argmax on (cnt desc,
    left, right) -> the elected pair broadcast in the next apply pass.
    materialize() per round snapshots the symbol state (the pagerank /
    dedup_clusters lesson: never iterate a lazy Dataset). Election ties
    break deterministically, so the merge chain is parallelism-
    invariant. Oracle: BPE_TRAIN_SQL pins the golden chain over the
    synthetic corpus; pytest locks engine == an independent single-
    process trainer on both corpora."""
    from collections import Counter

    import ray.data as rd
    from ray.data.aggregate import Sum

    if docs is None:
        docs = _docs(sf_dir)

    def word_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(t.split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "freq": pa.array(list(c.values()), pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(word_partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )

    def symbolize(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "syms": pa.array(
                    [list(w) for w in batch["word"].to_pylist()], pa.list_(pa.string())
                ),
                "freq": batch["freq"],
            }
        )

    state = vocab.map_batches(symbolize, batch_format="pyarrow").materialize()
    merges: list[tuple[int, str, str, str, int]] = []

    for rnd in range(1, n_merges + 1):

        def pair_partial(batch: pa.Table) -> pa.Table:
            c: Counter = Counter()
            for syms, freq in zip(batch["syms"].to_pylist(), batch["freq"].to_pylist()):
                for i in range(len(syms) - 1):
                    c[(syms[i], syms[i + 1])] += freq
            ks = list(c.keys())
            return pa.table(
                {
                    "left": pa.array([k[0] for k in ks], pa.string()),
                    "right": pa.array([k[1] for k in ks], pa.string()),
                    "cnt": pa.array(list(c.values()), pa.int64()),
                }
            )

        pairs = (
            state.map_batches(pair_partial, batch_format="pyarrow", batch_size=None)
            .groupby(["left", "right"])
            .aggregate(Sum("cnt", alias_name="cnt"))
            .to_pandas()
        )
        if pairs.empty:
            break
        best = pairs.sort_values(
            ["cnt", "left", "right"], ascending=[False, True, True], kind="mergesort"
        ).iloc[0]
        left, right, cnt = str(best.left), str(best.right), int(best.cnt)
        merges.append((rnd, left, right, left + right, cnt))
        mref = ray.put((left, right))

        def apply_merge(batch: pa.Table) -> pa.Table:
            a, b = ray.get(mref)
            out = []
            for syms in batch["syms"].to_pylist():
                merged, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        merged.append(a + b)
                        i += 2
                    else:
                        merged.append(syms[i])
                        i += 1
                out.append(merged)
            return pa.table({"syms": pa.array(out, pa.list_(pa.string())), "freq": batch["freq"]})

        state = state.map_batches(apply_merge, batch_format="pyarrow").materialize()

    return pd.DataFrame(
        merges, columns=["round", "left", "right", "merged", "cnt"]
    ).astype({"round": "int64", "cnt": "int64"})


# Golden merge chain over bpe_synth_corpus — generated by an INDEPENDENT
# single-process reference trainer (re-derived in
# tests/test_traindata.py::test_bpe_train_matches_reference, which also
# asserts engine == reference on the sf corpus), then pinned here so the
# driver gate locks the distributed chain's bytes. Non-circular: the SQL
# never ran through the engine.
BPE_TRAIN_SQL = """
SELECT * FROM (VALUES
  (CAST(1 AS BIGINT), 'w', 'e', 'we', CAST(241 AS BIGINT)),
  (2, 'i', 'n', 'in', 226),
  (3, 's', 't', 'st', 202),
  (4, 'l', 'o', 'lo', 186),
  (5, 'a', 'in', 'ain', 173),
  (6, 'r', 'ain', 'rain', 173),
  (7, 't', 'rain', 'train', 173),
  (8, 'we', 'st', 'west', 135),
  (9, 'd', 'e', 'de', 121),
  (10, 'i', 'de', 'ide', 121),
  (11, 'n', 'e', 'ne', 121),
  (12, 'w', 'ide', 'wide', 121)
) AS t(round, "left", "right", merged, cnt) ORDER BY round
"""


def bpe_encode(
    sf_dir: str, n_merges: int = BPE_MERGES, docs=None, merges: pd.DataFrame | None = None
) -> pd.DataFrame:
    """Apply a learned BPE merge table to segment the corpus vocabulary —
    the encode half of the tokenizer loop bpe_train is the train half of.
    Returns (word, pieces, n_pieces, freq) per distinct word, sorted by
    word; `pieces` is the space-joined subword segmentation.

    Merge-application contract (shared with the trainer and the pytest
    reference): merges apply exhaustively IN LEARNED ROUND ORDER, which
    for any training-vocab word reproduces exactly the trainer's final
    symbol state by induction on rounds.

    Scale contract: encoding runs over the DISTINCT-word table (the same
    vocab collapse as bpe_train — corpus-sized shuffle rows are (word,
    count) partials, everything after is vocab-sized), and the merge
    table is O(n_merges) rows broadcast ONCE via ray.put — never a
    shuffle side. Per-doc BPE token counts at 100 TB scale are this
    table hash-joined back on word (the tfidf join pattern), not a
    per-doc re-encode. Oracle: BPE_ENCODE_SQL pins every golden-corpus
    segmentation; pytest locks engine == the independent reference
    encoder on the sf corpus too."""
    from collections import Counter

    from ray.data.aggregate import Sum

    if docs is None:
        docs = _docs(sf_dir)
    if merges is None:
        merges = bpe_train(sf_dir, n_merges=n_merges, docs=docs)
    mref = ray.put(list(zip(merges["left"], merges["right"])))

    def word_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(t.split())
        return pa.table(
            {
                "word": pa.array(list(c.keys()), pa.string()),
                "freq": pa.array(list(c.values()), pa.int64()),
            }
        )

    vocab = (
        docs.map_batches(word_partial, batch_format="pyarrow", batch_size=None)
        .groupby("word")
        .aggregate(Sum("freq", alias_name="freq"))
    )

    def encode_batch(batch: pa.Table) -> pa.Table:
        prs = ray.get(mref)
        pieces, n_pieces = [], []
        for w in batch["word"].to_pylist():
            syms = list(w)
            for a, b in prs:
                if len(syms) < 2:
                    break
                m, i, n = [], 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        m.append(a + b)
                        i += 2
                    else:
                        m.append(syms[i])
                        i += 1
                syms = m
            pieces.append(" ".join(syms))
            n_pieces.append(len(syms))
        return pa.table(
            {
                "word": batch["word"],
                "pieces": pa.array(pieces, pa.string()),
                "n_pieces": pa.array(n_pieces, pa.int64()),
                "freq": batch["freq"],
            }
        )

    out = vocab.map_batches(encode_batch, batch_format="pyarrow").to_pandas()
    return out.sort_values("word", kind="mergesort").reset_index(drop=True)


# Golden segmentations of the full bpe_synth_corpus vocabulary under the
# 12-round BPE_TRAIN_SQL merge chain — derived by the same independent
# single-process reference as BPE_TRAIN_SQL (re-asserted in
# tests/test_traindata.py::test_bpe_encode_matches_reference). Non-circular.
BPE_ENCODE_SQL = """
SELECT * FROM (VALUES
  ('data', 'd a t a', CAST(4 AS BIGINT), CAST(66 AS BIGINT)),
  ('low', 'lo w', 2, 66),
  ('lower', 'lo we r', 3, 53),
  ('lowest', 'lo west', 2, 67),
  ('newer', 'ne we r', 3, 53),
  ('newest', 'ne west', 2, 68),
  ('train', 'train', 1, 54),
  ('trainer', 'train e r', 3, 66),
  ('training', 'train in g', 3, 53),
  ('update', 'u p d a t e', 6, 53),
  ('wider', 'wide r', 2, 54),
  ('widest', 'wide st', 2, 67)
) AS t(word, pieces, n_pieces, freq) ORDER BY word
"""


# --------------------------------------------------------------------------
# sliding-window document chunking (RAG / fixed-context pretraining prep)
# --------------------------------------------------------------------------

CHUNK_W = 32  # tokens per chunk window
CHUNK_S = 24  # stride (CHUNK_W - CHUNK_S tokens of overlap between chunks)


def chunk_documents(sf_dir: str, window: int = CHUNK_W, stride: int = CHUNK_S) -> pd.DataFrame:
    """Split every document into overlapping fixed-size token windows —
    the chunking stage in front of a RAG embedding index or a
    fixed-context pretraining loader (the per-doc sibling of
    pack_sequences' concat-and-chunk: here windows never cross document
    boundaries and overlap by `window - stride` tokens so no span is
    lost at a chunk edge).

    Chunk i of a doc covers tokens [i*stride, i*stride + window); starts
    enumerate 0, stride, 2*stride, ... while < n_tokens, so the final
    chunk may be short and every token appears in >= 1 chunk. Zero-token
    docs emit no chunks (both sides: the oracle's n > 0 arm mirrors
    split() -> []).

    Scale contract: stateless per-batch kernel, ZERO shuffle — chunks
    are emitted with the md5 of their reassembled text rather than the
    text itself, so the gate compares exact content bytes while the
    operator output stays O(rows), not O(corpus bytes). A production
    sink would emit the chunk text column straight to partitioned
    parquet from the same kernel (no extra pass)."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")

    def chunk(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_cid, out_n, out_md5 = [], [], [], []
        for did, text in zip(ids, batch["text"].to_pylist()):
            toks = text.split()
            for cid, start in enumerate(range(0, len(toks), stride)):
                piece = toks[start : start + window]
                out_id.append(int(did))
                out_cid.append(cid)
                out_n.append(len(piece))
                out_md5.append(hashlib.md5(" ".join(piece).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "chunk_id": pa.array(out_cid, pa.int64()),
                "n_tok": pa.array(out_n, pa.int64()),
                "chunk_md5": pa.array(out_md5, pa.string()),
            }
        )

    return (
        _docs(sf_dir)
        .map_batches(chunk, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"])
        .reset_index(drop=True)
    )


CHUNK_DOCUMENTS_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
         CASE WHEN regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
              THEN len(regexp_split_to_array(trim(text), '\\s+'))
              ELSE 0 END AS n
  FROM documents
)
SELECT doc_id, CAST(gs.i AS BIGINT) AS chunk_id,
       CAST(least(n - gs.i * {CHUNK_S}, {CHUNK_W}) AS BIGINT) AS n_tok,
       md5(array_to_string(
             toks[gs.i * {CHUNK_S} + 1 : least(gs.i * {CHUNK_S} + {CHUNK_W}, n)],
             ' ')) AS chunk_md5
FROM t, LATERAL unnest(generate_series(0, (n - 1) // {CHUNK_S})) AS gs(i)
WHERE n > 0
ORDER BY doc_id, chunk_id
"""


# --------------------------------------------------------------------------
# DSIR-style hashed-feature importance selection (target-domain data cut)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 1024  # hashed unigram feature space
DSIR_TARGET_LANG = "en"  # target-domain slice the weights are fit to
DSIR_SCALE = 1_000_000  # fixed-point weight scale (integer arithmetic)


def _dsir_bucket(tok: str) -> int:
    # int(md5[:8], 16) % B == the oracle's CAST('0x'||substr(md5,1,8) AS
    # BIGINT) % B (verified both ends)
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


def dsir_select(sf_dir: str, target_lang: str = DSIR_TARGET_LANG) -> pd.DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023, DSIR)
    over hashed unigram features: fit per-bucket importance weights
    p_target/p_raw on a B=1024 hashed feature space (target = the
    `target_lang` slice, raw = the whole corpus), score every document
    by its summed token weights, and select docs whose per-token average
    weight is >= 1 (more target-like than the corpus average).

    Exactness contract: weights are FIXED-POINT INTEGERS —
    w[b] = ((c_tgt[b]+1) * t_raw * SCALE) // ((c_raw[b]+1) * t_tgt)
    (add-1 smoothing, floor division, arbitrary-precision on the driver,
    HUGEINT in the oracle) — so per-doc scores are exact int64 sums with
    ZERO float drift between the engine and DuckDB; a log-space variant
    would hit cross-engine ln() ulp skew at the 6-decimal gate.

    Scale contract: pass 1 emits per-block (bucket, c_raw, c_tgt)
    partials — bucket-space-bounded (<= B rows per block) — into a
    B-sized groupby; the fitted weight table is O(B) ints, broadcast
    once via ray.put; pass 2 is a stateless per-batch score kernel.
    Corpus text never crosses a shuffle. Zero-token docs emit no row
    (undefined average weight; mirrored by the oracle's split guard)."""
    from ray.data.aggregate import Sum

    B, SCALE = DSIR_BUCKETS, DSIR_SCALE

    def bucket_partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        raw = np.zeros(B, np.int64)
        tgt = np.zeros(B, np.int64)
        cache: dict[str, int] = {}
        for lang, text in zip(langs, batch["text"].to_pylist()):
            is_tgt = lang == target_lang
            for tok in text.split():
                b = cache.get(tok)
                if b is None:
                    b = cache[tok] = _dsir_bucket(tok)
                raw[b] += 1
                if is_tgt:
                    tgt[b] += 1
        nz = np.flatnonzero(raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "c_raw": pa.array(raw[nz], pa.int64()),
                "c_tgt": pa.array(tgt[nz], pa.int64()),
            }
        )

    cnt = (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(bucket_partial, batch_format="pyarrow", batch_size=None)
        .groupby("bucket")
        .aggregate(Sum("c_raw", alias_name="c_raw"), Sum("c_tgt", alias_name="c_tgt"))
        .to_pandas()
    )
    t_raw = int(cnt.c_raw.sum())
    t_tgt = int(cnt.c_tgt.sum())
    if t_tgt == 0:
        raise ValueError(f"target slice lang={target_lang!r} has no tokens")
    w = np.zeros(B, np.int64)
    for b, c_raw, c_tgt in zip(cnt.bucket, cnt.c_raw, cnt.c_tgt):
        # python ints: arbitrary precision before the (int64-safe) floor
        w[int(b)] = (int(c_tgt) + 1) * t_raw * SCALE // ((int(c_raw) + 1) * t_tgt)
    w_ref = ray.put(w)

    def score(batch: pa.Table) -> pa.Table:
        wt = ray.get(w_ref)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        out_id, out_s, out_n = [], [], []
        cache: dict[str, int] = {}
        for did, text in zip(ids, batch["text"].to_pylist()):
            toks = text.split()
            if not toks:
                continue
            s = 0
            for tok in toks:
                b = cache.get(tok)
                if b is None:
                    b = cache[tok] = _dsir_bucket(tok)
                s += int(wt[b])
            out_id.append(int(did))
            out_s.append(s)
            out_n.append(len(toks))
        sc = np.asarray(out_s, np.int64)
        nt = np.asarray(out_n, np.int64)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "score": pa.array(sc, pa.int64()),
                "n_tok": pa.array(nt, pa.int64()),
                "selected": pa.array((sc >= nt * SCALE).astype(np.int64), pa.int64()),
            }
        )

    return (
        _docs(sf_dir, columns=("doc_id", "text"))
        .map_batches(score, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


DSIR_SELECT_SQL = f"""
WITH tok AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
),
b AS (
  SELECT doc_id, lang,
         CAST(CONCAT('0x', substr(md5(tok), 1, 8)) AS BIGINT) % {DSIR_BUCKETS} AS bucket
  FROM tok
),
cnt AS (
  SELECT bucket, COUNT(*) AS c_raw,
         COUNT(*) FILTER (WHERE lang = '{DSIR_TARGET_LANG}') AS c_tgt
  FROM b GROUP BY bucket
),
tot AS (SELECT SUM(c_raw) AS t_raw, SUM(c_tgt) AS t_tgt FROM cnt),
w AS (
  SELECT bucket,
         ((c_tgt + 1)::HUGEINT * t_raw * {DSIR_SCALE}) // ((c_raw + 1)::HUGEINT * t_tgt) AS w
  FROM cnt, tot
)
SELECT b.doc_id, CAST(SUM(w.w) AS BIGINT) AS score,
       CAST(COUNT(*) AS BIGINT) AS n_tok,
       CAST(SUM(w.w) >= COUNT(*) * {DSIR_SCALE} AS BIGINT) AS selected
FROM b JOIN w USING (bucket)
GROUP BY b.doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# temperature-scaled language mixture (mT5 / XLM-R alpha-sampling)
# --------------------------------------------------------------------------

MIXTURE_ALPHA_IS_HALF = True  # alpha fixed at 0.5: rate = sqrt(n_min/n_l)


def temperature_mixture(sf_dir: str) -> pd.DataFrame:
    """Temperature-scaled language mixing (mT5 / XLM-R alpha-sampling,
    Xue et al. 2021 §3.1) with alpha = 0.5, as a keep-only downsampling
    pass: per-lang keep rate r_l = sqrt(n_min / n_l) over whitespace
    token counts, so expected kept tokens are proportional to n_l^0.5
    and the smallest language keeps everything — the mixture an LLM
    pretraining loader actually applies, with rates DERIVED FROM THE
    DATA (importance_resample, whose md5-keep machinery this nests, uses
    fixed config weights).

    Exactness contract: alpha is fixed at 1/2 so the only float ops are
    one division and one IEEE-754 sqrt — both correctly rounded, hence
    bit-identical in numpy and DuckDB; the keep threshold is
    floor(r_l * 2^32) formatted as the md5-prefix hex of
    common.w_threshold_hex, so the per-doc decision is an exact string
    compare on both sides (r_l == 1.0 short-circuits to keep-all).

    Scale contract: pass 1 emits per-block (lang, n_tok) integer
    partials into a lang-sized groupby; the rate table is O(#langs),
    broadcast once; pass 2 re-scans the source (the kmeans_train
    contract — at 100 TB re-scanning beats pinning; a production run
    would checkpoint the slim (doc_id, lang, n_tok) table to parquet
    between passes, the curate_v4 spill_dir pattern) and emits per-block
    integer partials. Text never crosses a shuffle."""
    from ray.data.aggregate import Sum

    from .common import w_threshold_hex

    def tok_partial(batch: pa.Table) -> pa.Table:
        langs = batch["lang"].to_pylist()
        n = [len(t.split()) for t in batch["text"].to_pylist()]
        t = pa.table(
            {"lang": pa.array(langs, pa.string()), "n_tok": pa.array(n, pa.int64())}
        )
        g = t.group_by("lang").aggregate([("n_tok", "sum")])
        return g.rename_columns(["lang", "n_tok"])

    per_lang = (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(tok_partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n_tok", alias_name="n_tok"))
        .to_pandas()
    )
    if per_lang.empty or int(per_lang.n_tok.min()) == 0:
        raise ValueError("every language needs >= 1 token to fit a mixture")
    n_min = int(per_lang.n_tok.min())
    # rate = sqrt(n_min / n_l): one division + one sqrt, both correctly
    # rounded -> bit-identical to the oracle's sqrt(CAST/CAST)
    thresh = {
        lang: (
            None  # keep-all arm (w_threshold_hex rejects w == 1.0)
            if int(n_l) == n_min
            else w_threshold_hex(float(np.sqrt(n_min / int(n_l))))
        )
        for lang, n_l in zip(per_lang.lang, per_lang.n_tok)
    }
    bcast = ray.put(thresh)

    def keep_partial(batch: pa.Table) -> pa.Table:
        th = ray.get(bcast)
        langs = batch["lang"].to_pylist()
        rows = {"lang": [], "n_tok_in": [], "n_docs_kept": [], "n_tok_kept": []}
        agg: dict[str, list[int]] = {}
        for did, text, lang in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist(), langs
        ):
            t = th[lang]
            kept = t is None or hashlib.md5(str(did).encode()).hexdigest() < t
            n = len(text.split())
            a = agg.setdefault(lang, [0, 0, 0])
            a[0] += n
            if kept:
                a[1] += 1
                a[2] += n
        for lang, (ti, dk, tk) in agg.items():
            rows["lang"].append(lang)
            rows["n_tok_in"].append(ti)
            rows["n_docs_kept"].append(dk)
            rows["n_tok_kept"].append(tk)
        return pa.table(
            {
                "lang": pa.array(rows["lang"], pa.string()),
                "n_tok_in": pa.array(rows["n_tok_in"], pa.int64()),
                "n_docs_kept": pa.array(rows["n_docs_kept"], pa.int64()),
                "n_tok_kept": pa.array(rows["n_tok_kept"], pa.int64()),
            }
        )

    out = (
        _docs(sf_dir, columns=("doc_id", "text", "lang"))
        .map_batches(keep_partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n_tok_in", alias_name="n_tok_in"),
            Sum("n_docs_kept", alias_name="n_docs_kept"),
            Sum("n_tok_kept", alias_name="n_tok_kept"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype(
        {"n_tok_in": "int64", "n_docs_kept": "int64", "n_tok_kept": "int64"}
    )


TEMPERATURE_MIXTURE_SQL = r"""
WITH dt AS (
  SELECT doc_id, lang,
         CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
              THEN len(regexp_split_to_array(trim(text), '\s+')) ELSE 0 END AS n_tok
  FROM documents),
l AS (SELECT lang, SUM(n_tok) AS n_l FROM dt GROUP BY lang),
mn AS (SELECT MIN(n_l) AS n_min FROM l),
k AS (
  SELECT dt.lang, dt.n_tok,
         CASE WHEN l.n_l = mn.n_min THEN TRUE
              ELSE md5(CAST(dt.doc_id AS VARCHAR)) <
                   printf('%08x',
                          CAST(floor(sqrt(CAST(mn.n_min AS DOUBLE)
                                          / CAST(l.n_l AS DOUBLE))
                                     * 4294967296.0) AS BIGINT))
                   || repeat('0', 24)
         END AS kept
  FROM dt JOIN l USING (lang), mn)
SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS n_tok_in,
       CAST(COUNT(*) FILTER (WHERE kept) AS BIGINT) AS n_docs_kept,
       CAST(SUM(n_tok) FILTER (WHERE kept) AS BIGINT) AS n_tok_kept
FROM k GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Hamilton largest-remainder token-budget apportionment across sources
# --------------------------------------------------------------------------

BUDGET_TOKENS = 100_000


def source_budget_allocation(sf_dir: str, budget: int = BUDGET_TOKENS) -> pd.DataFrame:
    """Apportion an integer token budget across sources proportionally
    to their token mass using Hamilton's largest-remainder method (the
    exact-integer quota builder a mixture loader runs after
    temperature_mixture picks rates): quota_s = floor(B * w_s / W),
    then the L = B - sum(quotas) leftover tokens go one each to the
    largest remainders (B * w_s) mod W, ties broken by source asc.
    sum(quota) == B exactly — the property float rounding can't give.

    Exactness contract: ZERO float ops — B * w_s is arbitrary-precision
    on the driver and HUGEINT in the oracle; floor division and mod on
    both sides; the remainder ranking is an integer sort. Output is
    exact at any scale.

    Scale contract: one pass of per-block (source, n_tok) integer
    partials into a source-sized groupby; the apportionment runs on the
    O(#sources) driver table (at web scale #sources ~ thousands —
    driver-sized by construction)."""
    from ray.data.aggregate import Sum

    if budget < 0:
        raise ValueError("budget must be >= 0")

    def tok_partial(batch: pa.Table) -> pa.Table:
        src = batch["source"].to_pylist()
        n = [len(t.split()) for t in batch["text"].to_pylist()]
        t = pa.table(
            {"source": pa.array(src, pa.string()), "n_tok": pa.array(n, pa.int64())}
        )
        g = t.group_by("source").aggregate([("n_tok", "sum")])
        return g.rename_columns(["source", "n_tok"])

    per_src = (
        _docs(sf_dir, columns=("text", "source"))
        .map_batches(tok_partial, batch_format="pyarrow", batch_size=None)
        .groupby("source")
        .aggregate(Sum("n_tok", alias_name="n_tok"))
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    W = int(per_src.n_tok.sum())
    if W == 0:
        raise ValueError("corpus has no tokens to apportion against")
    base = [budget * int(w) // W for w in per_src.n_tok]
    rem = [budget * int(w) % W for w in per_src.n_tok]
    leftover = budget - sum(base)
    order = sorted(
        range(len(per_src)), key=lambda i: (-rem[i], per_src.source[i])
    )
    extra = set(order[:leftover])
    out = pd.DataFrame(
        {
            "source": per_src.source,
            "n_tok": per_src.n_tok.astype("int64"),
            "quota": pd.Series(
                [b + (1 if i in extra else 0) for i, b in enumerate(base)],
                dtype="int64",
            ),
        }
    )
    assert int(out.quota.sum()) == budget
    return out


SOURCE_BUDGET_SQL_T = r"""
WITH dt AS (
  SELECT source,
         CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
              THEN len(regexp_split_to_array(trim(text), '\s+')) ELSE 0 END AS n_tok
  FROM documents),
s AS (SELECT source, CAST(SUM(n_tok) AS HUGEINT) AS n_tok FROM dt GROUP BY source),
w AS (SELECT SUM(n_tok) AS total FROM s),
q AS (
  SELECT s.source, s.n_tok,
         ({budget} * s.n_tok) // w.total AS base,
         ({budget} * s.n_tok) % w.total AS rem
  FROM s, w),
l AS (SELECT {budget} - SUM(base) AS leftover FROM q),
r AS (SELECT source, n_tok, base,
             row_number() OVER (ORDER BY rem DESC, source) AS rk
      FROM q)
SELECT r.source, CAST(r.n_tok AS BIGINT) AS n_tok,
       CAST(r.base + CASE WHEN r.rk <= l.leftover THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM r, l ORDER BY r.source
"""


# --------------------------------------------------------------------------
# scrub_duplicate_spans: REMOVE corpus-duplicated k-gram spans (Lee et al.)
# --------------------------------------------------------------------------

def scrub_duplicate_spans(sf_dir: str, k: int = NGRAM_K) -> pd.DataFrame:
    """The removal half of duplicate_ngram_spans (Lee et al. 2021
    actually DELETE the repeated spans, they don't just score them):
    every token covered by any k-gram that occurs more than once across
    the corpus is removed; the survivors re-join with single spaces.
    Output per doc: token counts in/removed and the md5 of the SCRUBBED
    TEXT — the gate checks exact post-surgery bytes, not just counts
    (a fully-covered doc scrubs to the empty string, md5('') — mirrored
    by the oracle's COALESCE arm).

    Scale contract: grams shuffle as blake2b-128 digests (the
    duplicate_ngram_spans hashed default); flagged (doc_id, pos) rows —
    duplicated-span-mass-sized — regroup into per-doc position lists on
    64 coarse doc-hash partitions, then the TEXT crosses exactly ONE
    exchange (a native hash join of documents against the flagged-list
    table, the paragraph_dedup contract) and the surgery is a stateless
    per-row token mask. Nothing corpus-sized reaches the driver."""
    from ray.data.aggregate import Sum

    def gkey(g: str) -> str:
        return hashlib.blake2b(g.encode(), digest_size=16).hexdigest()

    def count_partial(batch: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for t in batch["text"].to_pylist():
            c.update(gkey(g) for g in _grams(t, k))
        return pa.table(
            {"g": pa.array(list(c.keys()), pa.string()),
             "c": pa.array(list(c.values()), pa.int64())}
        )

    dup = (
        _docs(sf_dir)
        .map_batches(count_partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("c", alias_name="c"))
        .filter(expr="c > 1")
    )

    def explode(batch: pa.Table) -> pa.Table:
        ids, poss, gs = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for i, gram in enumerate(_grams(t, k)):
                ids.append(d)
                poss.append(i)
                gs.append(gkey(gram))
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()),
             "pos": pa.array(poss, pa.int64()),
             "g": pa.array(gs, pa.string())}
        )

    flagged = (
        _docs(sf_dir)
        .map_batches(explode, batch_format="pyarrow")
        .join(dup, join_type="inner", num_partitions=8, on=("g",))
        .select_columns(["doc_id", "pos"])
    )

    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array((ids % n_parts).astype(np.int64), pa.int64())
        )

    def collect_lists(g: pd.DataFrame) -> pd.DataFrame:
        # positions ride the join as a csv STRING — Arrow's hash join
        # rejects list<> payload columns ("not supported in join non-key
        # field positions")
        if g.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "positions": pd.Series([], dtype=object)}
            )
        out = g.groupby("doc_id").pos.agg(
            lambda s: ",".join(map(str, s))
        ).reset_index()
        return out.rename(columns={"pos": "positions"})

    pos_lists = (
        flagged.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(collect_lists, batch_format="pandas")
    )

    joined = _docs(sf_dir).join(
        pos_lists, join_type="left_outer", num_partitions=8, on=("doc_id",)
    )

    def scrub(batch: pa.Table) -> pa.Table:
        ids, n_in, n_rm, md5s = [], [], [], []
        for d, t, ps in zip(
            batch["doc_id"].to_pylist(),
            batch["text"].to_pylist(),
            batch["positions"].to_pylist(),
        ):
            ws = t.split()
            mask = np.zeros(len(ws), bool)
            for p in (int(x) for x in ps.split(",")) if ps else ():
                mask[p : p + k] = True
            kept = [w for w, m in zip(ws, mask) if not m]
            ids.append(d)
            n_in.append(len(ws))
            n_rm.append(int(mask.sum()))
            md5s.append(hashlib.md5(" ".join(kept).encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tok_in": pa.array(n_in, pa.int64()),
                "n_removed": pa.array(n_rm, pa.int64()),
                "scrubbed_md5": pa.array(md5s, pa.string()),
            }
        )

    return (
        joined.map_batches(scrub, batch_format="pyarrow")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


SCRUB_SPANS_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
              THEN regexp_split_to_array(trim(text), '\s+')
              ELSE CAST([] AS VARCHAR[]) END AS ts
  FROM documents),
g AS (
  SELECT doc_id, gs.i AS pos, array_to_string(ts[gs.i : gs.i + {NGRAM_K} - 1], ' ') AS gram
  FROM toks, LATERAL unnest(generate_series(1, len(ts) - {NGRAM_K} + 1)) AS gs(i)
  WHERE len(ts) >= {NGRAM_K}),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) > 1),
cover AS (
  SELECT DISTINCT f.doc_id, c.i AS tokpos
  FROM (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gram)) f,
       LATERAL unnest(generate_series(f.pos, f.pos + {NGRAM_K} - 1)) AS c(i)),
kept AS (
  SELECT t.doc_id, p.i, t.ts[p.i] AS tok
  FROM toks t, LATERAL unnest(generate_series(1, len(t.ts))) AS p(i)
  WHERE NOT EXISTS (SELECT 1 FROM cover c
                    WHERE c.doc_id = t.doc_id AND c.tokpos = p.i)),
res AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         md5(string_agg(tok, ' ' ORDER BY i)) AS m
  FROM kept GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tok_in,
       CAST(len(t.ts) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(r.m, md5('')) AS scrubbed_md5
FROM toks t LEFT JOIN res r USING (doc_id)
ORDER BY t.doc_id
"""


# --------------------------------------------------------------------------
# rendezvous (highest-random-weight) shard assignment
# --------------------------------------------------------------------------

HRW_SHARDS = 12


def _hrw_shard(doc_id: int, n_shards: int) -> int:
    """Rendezvous / HRW hashing (Thaler & Ravishankar 1998): the shard
    for a key is argmax_s md5(f"{s}:{key}") — ties (practically
    impossible for md5) break to the smaller shard index. The property
    a mod-hash layout lacks: growing the shard count from S to S+1
    moves ONLY the keys whose new shard's score wins, ~1/(S+1) of the
    corpus, and every moved key lands on the NEW shard (mod-hashing
    reshuffles (S-1)/S of all keys). That is the reshard-stability
    contract a 100 TB corpus layout needs when capacity changes."""
    best_s, best_h = 0, ""
    for s in range(n_shards):
        h = hashlib.md5(f"{s}:{doc_id}".encode()).hexdigest()
        if h > best_h:
            best_s, best_h = s, h
    return best_s


def consistent_shard_map(sf_dir: str, n_shards: int = HRW_SHARDS) -> pd.DataFrame:
    """Per-shard rollup of the rendezvous-hash layout: (shard, n_docs,
    id_sum, n_chars_sum) — the placement plan for distributing a corpus
    across a fixed shard set such that later capacity changes move the
    theoretical minimum of data (see `_hrw_shard`).

    Scale contract: one stateless `map_batches` pass; the HRW argmax
    costs S md5s per key (the price of minimal movement — for very
    large S, Lamping & Veach's jump consistent hash is the O(log S)
    drop-in), each block emits at most `n_shards` partial rows, and the
    only shuffle is the `n_shards`-row groupby. Nothing row-sized ever
    leaves a block. Oracled by CONSISTENT_SHARD_SQL, which re-derives
    the identical argmax via a cross join + QUALIFY row_number()."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        ncs = [len(t) for t in batch["text"].to_pylist()]
        shards = np.fromiter(
            (_hrw_shard(d, n_shards) for d in ids), dtype=np.int64, count=len(ids)
        )
        idv = np.asarray(ids, dtype=np.int64)
        ncv = np.asarray(ncs, dtype=np.int64)
        n_docs = np.bincount(shards, minlength=n_shards)
        id_sum = np.bincount(shards, weights=idv, minlength=n_shards)
        nc_sum = np.bincount(shards, weights=ncv, minlength=n_shards)
        live = n_docs > 0
        return pa.table(
            {
                "shard": pa.array(np.arange(n_shards)[live], pa.int64()),
                "n_docs": pa.array(n_docs[live], pa.int64()),
                "id_sum": pa.array(id_sum[live].astype(np.int64), pa.int64()),
                "n_chars_sum": pa.array(nc_sum[live].astype(np.int64), pa.int64()),
            }
        )

    out = (
        _docs(sf_dir)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(Sum("n_docs"), Sum("id_sum"), Sum("n_chars_sum"))
        .to_pandas()
        .rename(
            columns={
                "sum(n_docs)": "n_docs",
                "sum(id_sum)": "id_sum",
                "sum(n_chars_sum)": "n_chars_sum",
            }
        )
        .sort_values("shard")
        .reset_index(drop=True)
    )
    return out.astype(
        {"shard": "int64", "n_docs": "int64", "id_sum": "int64", "n_chars_sum": "int64"}
    )


def consistent_shard_sql(n_shards: int = HRW_SHARDS) -> str:
    return f"""
WITH sh AS (SELECT shard FROM range({n_shards}) t(shard)),
sc AS (
  SELECT d.doc_id, sh.shard,
         md5(CAST(sh.shard AS VARCHAR) || ':' || CAST(d.doc_id AS VARCHAR)) AS h,
         length(d.text) AS nc
  FROM documents d CROSS JOIN sh),
a AS (
  SELECT doc_id, shard, nc FROM sc
  QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY h DESC, shard ASC) = 1)
SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum,
       CAST(SUM(nc) AS BIGINT) AS n_chars_sum
FROM a GROUP BY shard ORDER BY shard
"""


# --------------------------------------------------------------------------
# Z-order (Morton) multi-dimensional layout clustering
# --------------------------------------------------------------------------

ZORDER_GRID = 65535  # 16-bit grid per dimension -> 32-bit Morton code
ZORDER_BUCKET_SHIFT = 22  # keep the top 10 bits -> 1024 layout buckets


def _spread16(v: "np.ndarray") -> "np.ndarray":
    """Interleave a zero bit after each of the low 16 bits (the classic
    Morton bit-spreading ladder)."""
    v = v.astype(np.int64)
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


def _morton32(xi: "np.ndarray", yi: "np.ndarray") -> "np.ndarray":
    """32-bit Morton code: x occupies the ODD bits, y the EVEN bits —
    the oracle's explicit 32-term bit expression states the same
    convention."""
    return (_spread16(xi) << 1) | _spread16(yi)


def zorder_layout(sf_dir: str) -> pd.DataFrame:
    """Z-order / Morton space-filling-curve layout over orders on the
    (o_custkey, order-day) plane — the multi-dimensional clustering a
    lakehouse OPTIMIZE ZORDER performs so that range predicates on
    EITHER dimension prune most files: sorting by the interleaved code
    makes each contiguous bucket cover a tight rectangle in (x, y)
    space, which single-column sorting cannot give for the second
    column. Output per bucket (top 10 Morton bits): row count and the
    x/y bounding box — the min/max footprint a format's file statistics
    would store, and exactly what the pruning argument rests on.

    Scale contract: pass 1 is an O(#blocks) min/max-partial reduce
    (the embedding_quantize_error broadcast shape); pass 2 is stateless
    — vectorized bit-spread Morton codes per block, per-block bucket
    partials bounded by 1024 rows, one bucket-sized groupby. Integer
    arithmetic end-to-end ((x - x0) * {ZORDER_GRID} // (x1 - x0) grid
    normalization mirrored by the oracle; no float enters)."""
    from ray.data.aggregate import Max, Min, Sum

    DAY_US = 86_400_000_000
    src = sized_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    )

    def mm_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = batch["o_custkey"].to_numpy()
        y = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy() // DAY_US
        return pa.table(
            {
                "x0": pa.array([int(x.min())], pa.int64()),
                "x1": pa.array([int(x.max())], pa.int64()),
                "y0": pa.array([int(y.min())], pa.int64()),
                "y1": pa.array([int(y.max())], pa.int64()),
            }
        )

    mm = src.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    x0, x1 = int(mm.x0.min()), int(mm.x1.max())
    y0, y1 = int(mm.y0.min()), int(mm.y1.max())

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        x = batch["o_custkey"].to_numpy().astype(np.int64)
        y = (pc.cast(batch["o_orderdate"], pa.int64()).to_numpy() // DAY_US).astype(np.int64)
        xi = (x - x0) * ZORDER_GRID // (x1 - x0) if x1 > x0 else np.zeros(len(x), np.int64)
        yi = (y - y0) * ZORDER_GRID // (y1 - y0) if y1 > y0 else np.zeros(len(y), np.int64)
        bucket = _morton32(xi, yi) >> ZORDER_BUCKET_SHIFT
        df = pd.DataFrame({"bucket": bucket, "x": x, "y": y})
        g = df.groupby("bucket", as_index=False).agg(
            n=("x", "size"),
            x_min=("x", "min"),
            x_max=("x", "max"),
            y_min=("y", "min"),
            y_max=("y", "max"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    out = (
        src.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(
            Sum("n", alias_name="n"),
            Min("x_min", alias_name="x_min"),
            Max("x_max", alias_name="x_max"),
            Min("y_min", alias_name="y_min"),
            Max("y_max", alias_name="y_max"),
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    return out.astype(
        {c: "int64" for c in ["bucket", "n", "x_min", "x_max", "y_min", "y_max"]}
    )


def zorder_sql() -> str:
    zx = " + ".join(
        f"((xi >> {i}) & 1) * {1 << (2 * i + 1)}" for i in range(16)
    )
    zy = " + ".join(f"((yi >> {i}) & 1) * {1 << (2 * i)}" for i in range(16))
    return f"""
WITH raw AS (
  SELECT o_custkey AS x, epoch_us(o_orderdate) // 86400000000 AS y FROM orders),
mm AS (SELECT MIN(x) AS x0, MAX(x) AS x1, MIN(y) AS y0, MAX(y) AS y1 FROM raw),
norm AS (
  SELECT x, y,
         CASE WHEN x1 > x0 THEN (x - x0) * {ZORDER_GRID} // (x1 - x0) ELSE 0 END AS xi,
         CASE WHEN y1 > y0 THEN (y - y0) * {ZORDER_GRID} // (y1 - y0) ELSE 0 END AS yi
  FROM raw, mm),
z AS (SELECT x, y, ({zx} + {zy}) >> {ZORDER_BUCKET_SHIFT} AS bucket FROM norm)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       MIN(x) AS x_min, MAX(x) AS x_max, MIN(y) AS y_min, MAX(y) AS y_max
FROM z GROUP BY bucket ORDER BY bucket
"""


# --------------------------------------------------------------------------
# novelty curve: marginal new-distinct-grams per corpus increment
# --------------------------------------------------------------------------

NOVELTY_SHARDS = 16


def novelty_curve(sf_dir: str, k: int = NGRAM_K, n_shards: int = NOVELTY_SHARDS) -> pd.DataFrame:
    """Marginal-novelty curve: split the corpus into {n_shards}
    doc_id-range increments (crawl batches) and report, per increment,
    how many distinct k-grams appear in it at all (n_seen) and how many
    appear there FIRST (n_new — i.e. in no earlier increment). The
    n_new/n_seen decay is the corpus-growth ROI curve dedup planning
    reads: when marginal novelty flattens, additional crawl volume buys
    repetition, not data. A gram's first increment is a pure Min over
    its (gram, shard) occurrences, so the curve is exact, not sampled.

    Gram key contract: the key IS md5(gram) — both sides group by the
    digest (slim 32-char shuffle rows, the duplicate_ngram_spans hashed
    rationale; DuckDB has md5 natively, so the oracle states the same
    key). Scale contract: one metadata pass for the doc_id range; one
    pass emits block-distinct (digest, shard) rows; ONE gram-hash
    exchange into 64 coarse partitions where BOTH aggregates (min-shard
    election -> n_new, distinct-presence -> n_seen) reduce to <=
    {n_shards} partial rows per partition; final groupby is
    n_shards-sized."""
    from ray.data.aggregate import Sum

    docs = _docs(sf_dir)

    def mm(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy()
        return pa.table(
            {"lo": pa.array([int(d.min())], pa.int64()), "hi": pa.array([int(d.max())], pa.int64())}
        )

    bounds = docs.map_batches(mm, batch_format="pyarrow").to_pandas()
    lo, hi = int(bounds.lo.min()), int(bounds.hi.max())
    span = hi - lo + 1

    def gram_rows(batch: pa.Table) -> pa.Table:
        gs, sh = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            shard = (d - lo) * n_shards // span
            for g in set(_grams(t, k)):
                gs.append(hashlib.md5(g.encode()).hexdigest())
                sh.append(shard)
        df = pd.DataFrame({"g": gs, "shard": sh}).drop_duplicates()
        df["part"] = [int(h[:8], 16) % 64 for h in df.g]
        return pa.Table.from_pandas(df, preserve_index=False)

    def both_aggs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["g", "shard"])
        new = g.groupby("g").shard.min().value_counts().rename("n_new")
        seen = g.groupby("shard").size().rename("n_seen")
        out = pd.concat([new, seen], axis=1).fillna(0).reset_index(names="shard")
        return out.astype({"shard": "int64", "n_new": "int64", "n_seen": "int64"})

    out = (
        docs.map_batches(gram_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(both_aggs, batch_format="pandas")
        .groupby("shard")
        .aggregate(Sum("n_new", alias_name="n_new"), Sum("n_seen", alias_name="n_seen"))
        .to_pandas()
        .sort_values("shard")
        .reset_index(drop=True)
    )
    return out.astype({"shard": "int64", "n_new": "int64", "n_seen": "int64"})


def novelty_sql(k: int = NGRAM_K, n_shards: int = NOVELTY_SHARDS) -> str:
    return rf"""
WITH bounds AS (SELECT MIN(doc_id) AS lo, MAX(doc_id) AS hi FROM documents),
toks AS (
  SELECT doc_id, CASE WHEN regexp_matches(text, '[^ \t\n\r\f\v]')
                      THEN regexp_split_to_array(trim(text), '\s+')
                      ELSE CAST([] AS VARCHAR[]) END AS ts
  FROM documents),
g AS (
  SELECT DISTINCT t.doc_id,
         md5(array_to_string(t.ts[gs.i : gs.i + {k} - 1], ' ')) AS g
  FROM toks t, LATERAL unnest(generate_series(1, len(t.ts) - {k} + 1)) AS gs(i)
  WHERE len(t.ts) >= {k}),
gsh AS (
  SELECT DISTINCT g.g,
         (g.doc_id - b.lo) * {n_shards} // (b.hi - b.lo + 1) AS shard
  FROM g, bounds b),
new AS (SELECT shard, COUNT(*) AS cnt
        FROM (SELECT g, MIN(shard) AS shard FROM gsh GROUP BY g) GROUP BY shard),
seen AS (SELECT shard, COUNT(*) AS cnt FROM gsh GROUP BY shard)
SELECT s.shard, CAST(COALESCE(n.cnt, 0) AS BIGINT) AS n_new,
       CAST(s.cnt AS BIGINT) AS n_seen
FROM seen s LEFT JOIN new n USING (shard)
ORDER BY s.shard
"""


# --------------------------------------------------------------------------
# T5/UL2 span corruption (deterministic denoising-objective masking)
# --------------------------------------------------------------------------

SC_THR = int(0.1 * (1 << 32))  # ~10% of positions start a span
SC_SPAN = 3  # fixed span length (tokens)


def span_corruption(sf_dir: str) -> pd.DataFrame:
    """T5-style span-corruption preprocessing (Raffel et al. 2020; the
    UL2 R-denoiser): mask contiguous token SPANS and replace each run
    with ONE sentinel, producing the corrupted input stream a denoising
    LM trains on. Deterministic twin of the usual random draw: position
    i starts a span iff md5('sc:<doc_id>:<i>')[:8] < SC_THR (~10%), the
    span covers [i, i+SC_SPAN); overlapping spans merge into one run and
    one sentinel (exactly the T5 contract).

    Output: per-lang rollup — docs, tokens, masked tokens, emitted
    sentinel spans, and the sum of each doc's corrupted-text 48-bit md5
    prefix, so the oracle value-locks the corrupted BYTES of every doc
    (the extract_synth_digest contract), not just the mask rates.

    Scale contract: one stateless streaming pass; each block folds to
    <= #langs partial rows (ints only), the exchange is #langs x
    #blocks. The md5-per-position cost is the determinism price — a
    production run swaps in any seeded counter RNG per (doc, position)
    without touching the dataflow. Empty/whitespace docs are excluded
    on both sides (the ADVICE r3 zero-token guard class).
    """
    import hashlib

    from ray.data.aggregate import Sum

    from .common import sized_read_parquet

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        rows: dict[str, dict[str, int]] = {}
        for did, lang, text in zip(
            batch["doc_id"].to_pylist(),
            batch["lang"].to_pylist(),
            batch["text"].to_pylist(),
        ):
            toks = text.split()
            if not toks:
                continue
            n = len(toks)
            starts = np.fromiter(
                (
                    int(hashlib.md5(f"sc:{did}:{i}".encode()).hexdigest()[:8], 16)
                    < SC_THR
                    for i in range(n)
                ),
                dtype=bool,
                count=n,
            )
            m = starts.copy()
            for off in range(1, SC_SPAN):
                m[off:] |= starts[:-off]
            run_start = m & ~np.concatenate(([False], m[:-1]))
            corrupted = " ".join(
                "<X>" if run_start[i] else toks[i]
                for i in range(n)
                if run_start[i] or not m[i]
            )
            d48 = int(hashlib.md5(corrupted.encode()).hexdigest()[:12], 16)
            r = rows.setdefault(
                lang,
                {"n_docs": 0, "n_tokens": 0, "n_masked": 0, "n_spans": 0, "digest_sum": 0},
            )
            r["n_docs"] += 1
            r["n_tokens"] += n
            r["n_masked"] += int(m.sum())
            r["n_spans"] += int(run_start.sum())
            r["digest_sum"] += d48
        return pa.table(
            {
                "lang": pa.array(list(rows), pa.string()),
                "n_docs": pa.array([r["n_docs"] for r in rows.values()], pa.int64()),
                "n_tokens": pa.array([r["n_tokens"] for r in rows.values()], pa.int64()),
                "n_masked": pa.array([r["n_masked"] for r in rows.values()], pa.int64()),
                "n_spans": pa.array([r["n_spans"] for r in rows.values()], pa.int64()),
                "digest_sum": pa.array(
                    [r["digest_sum"] for r in rows.values()], pa.int64()
                ),
            }
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_tokens", alias_name="n_tokens"),
            Sum("n_masked", alias_name="n_masked"),
            Sum("n_spans", alias_name="n_spans"),
            Sum("digest_sum", alias_name="digest_sum"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype(
        {
            "lang": "str",
            "n_docs": "int64",
            "n_tokens": "int64",
            "n_masked": "int64",
            "n_spans": "int64",
            "digest_sum": "int64",
        }
    )


SPAN_CORRUPTION_SQL = f"""
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, gs.i AS i, arr[gs.i] AS tok, len(arr) AS n
  FROM (
    SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS arr
    FROM documents WHERE regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
  ), LATERAL unnest(generate_series(1, len(arr))) AS gs(i)
),
h AS (
  SELECT doc_id, lang, i, tok,
         CAST(CONCAT('0x', substr(md5('sc:' || CAST(doc_id AS VARCHAR) || ':'
              || CAST(i - 1 AS VARCHAR)), 1, 8)) AS BIGINT) < {SC_THR} AS is_start
  FROM toks
),
m AS (
  SELECT *, MAX(CASE WHEN is_start THEN 1 ELSE 0 END)
              OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN {SC_SPAN - 1} PRECEDING AND CURRENT ROW) = 1
              AS masked
  FROM h
),
r AS (
  SELECT *, masked AND NOT COALESCE(
              LAG(masked) OVER (PARTITION BY doc_id ORDER BY i), FALSE)
            AS run_start
  FROM m
),
per_doc AS (
  SELECT doc_id, lang,
         COUNT(*) AS n_tokens,
         SUM(CASE WHEN masked THEN 1 ELSE 0 END) AS n_masked,
         SUM(CASE WHEN run_start THEN 1 ELSE 0 END) AS n_spans,
         CAST(CONCAT('0x', substr(md5(string_agg(
           CASE WHEN NOT masked THEN tok
                WHEN run_start THEN '<X>' END, ' ' ORDER BY i)), 1, 12)) AS BIGINT)
           AS d48
  FROM r GROUP BY doc_id, lang
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_masked) AS BIGINT) AS n_masked,
       CAST(SUM(n_spans) AS BIGINT) AS n_spans,
       CAST(SUM(d48) AS BIGINT) AS digest_sum
FROM per_doc GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# Kneser-Ney n-gram count statistics (LM training-data profiling)
# --------------------------------------------------------------------------

KN_N = 3  # trigrams


def kn_ngram_stats(sf_dir: str) -> pd.DataFrame:
    """Per-lang trigram count statistics a Kneser-Ney / Katz LM trainer
    needs before smoothing: total and unique trigram counts, the
    count-of-count stats n1/n2 (singleton and doubleton gram types —
    they set the absolute discount D = n1 / (n1 + 2*n2), reported
    round-6), and the distinct left-context (bigram) type count that
    feeds KN continuation probabilities. The corpus-profiling sibling
    of pmi_bigrams (association) and bpe_pair_counts (merge election).

    Scale contract: trigrams cross the shuffle as blake2b-128 DIGESTS,
    never strings (the duplicate_ngram_spans default) — per block each
    doc's trigrams fold to deduped (lang, digest, cnt) partial rows plus
    deduped (lang, ctx_digest) context rows tagged in the same stream,
    so the exchange is gram-type x #blocks bounded; the groupby reduces
    to per-type totals and the count-of-count fold is #langs-sized.
    Digest equality stands in for string equality (2^-128 collision;
    the oracle counts the strings themselves, so a collision would fail
    the gate loudly rather than pass silently).

    Oracle: LEAD-window trigram assembly partitioned by doc (no grams
    bridge documents), GROUP BY gram, conditional count-of-count sums.
    """
    import hashlib

    from ray.data.aggregate import Sum

    from .common import sized_read_parquet

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        gram_cnt: dict[tuple[str, str], int] = {}
        ctxs: set[tuple[str, str]] = set()
        for lang, text in zip(batch["lang"].to_pylist(), batch["text"].to_pylist()):
            toks = text.split()
            for a, b, c in zip(toks, toks[1:], toks[2:]):
                g = hashlib.blake2b(
                    f"{a} {b} {c}".encode(), digest_size=16
                ).hexdigest()
                gram_cnt[(lang, g)] = gram_cnt.get((lang, g), 0) + 1
                ctxs.add(
                    (lang, hashlib.blake2b(f"{a} {b}".encode(), digest_size=16).hexdigest())
                )
        # one row stream, tagged: is_ctx=0 gram rows carry counts,
        # is_ctx=1 context rows carry cnt=0 (their multiplicity is
        # irrelevant — only type counts matter)
        langs = [k[0] for k in gram_cnt] + [k[0] for k in ctxs]
        digs = [k[1] for k in gram_cnt] + [k[1] for k in ctxs]
        cnts = list(gram_cnt.values()) + [0] * len(ctxs)
        tags = [0] * len(gram_cnt) + [1] * len(ctxs)
        return pa.table(
            {
                "lang": pa.array(langs, pa.string()),
                "dig": pa.array(digs, pa.string()),
                "is_ctx": pa.array(tags, pa.int64()),
                "cnt": pa.array(cnts, pa.int64()),
            }
        )

    folded = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["lang", "dig", "is_ctx"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def stats_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "is_ctx": batch["is_ctx"].to_numpy(zero_copy_only=False),
                "cnt": batch["cnt"].to_numpy(zero_copy_only=False),
            }
        )
        g = df[df.is_ctx == 0].groupby("lang")
        c = df[df.is_ctx == 1].groupby("lang").size()
        out = pd.DataFrame(
            {
                "total_trigrams": g.cnt.sum(),
                "unique_trigrams": g.size(),
                "n1": g.cnt.agg(lambda s: int((s == 1).sum())),
                "n2": g.cnt.agg(lambda s: int((s == 2).sum())),
            }
        )
        out["unique_contexts"] = c.reindex(out.index).fillna(0).astype(int)
        return pa.Table.from_pandas(out.reset_index(), preserve_index=False)

    out = (
        folded.map_batches(stats_partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("total_trigrams", alias_name="total_trigrams"),
            Sum("unique_trigrams", alias_name="unique_trigrams"),
            Sum("n1", alias_name="n1"),
            Sum("n2", alias_name="n2"),
            Sum("unique_contexts", alias_name="unique_contexts"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out["discount"] = (out.n1 / (out.n1 + 2 * out.n2)).round(6)
    return out.astype(
        {
            "lang": "str",
            "total_trigrams": "int64",
            "unique_trigrams": "int64",
            "n1": "int64",
            "n2": "int64",
            "unique_contexts": "int64",
        }
    )


KN_NGRAM_SQL = """
WITH toks AS MATERIALIZED (
  SELECT doc_id, lang, gs.i AS i, arr[gs.i] AS tok
  FROM (
    SELECT doc_id, lang, regexp_split_to_array(trim(text), '\\s+') AS arr
    FROM documents WHERE regexp_matches(text, '[^ \\t\\n\\r\\f\\v]')
  ), LATERAL unnest(generate_series(1, len(arr))) AS gs(i)
),
tri AS MATERIALIZED (
  SELECT lang,
         tok || ' ' || LEAD(tok, 1) OVER w || ' ' || LEAD(tok, 2) OVER w AS gram,
         tok || ' ' || LEAD(tok, 1) OVER w AS ctx
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY i)
  QUALIFY LEAD(tok, 2) OVER w IS NOT NULL
),
cnts AS MATERIALIZED (
  SELECT lang, gram, CAST(COUNT(*) AS BIGINT) AS c FROM tri GROUP BY lang, gram
),
gram_stats AS (
  SELECT lang,
         CAST(SUM(c) AS BIGINT) AS total_trigrams,
         CAST(COUNT(*) AS BIGINT) AS unique_trigrams,
         CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
  FROM cnts GROUP BY lang
),
ctx_stats AS (
  SELECT lang, CAST(COUNT(DISTINCT ctx) AS BIGINT) AS unique_contexts
  FROM tri GROUP BY lang
)
SELECT g.lang, g.total_trigrams, g.unique_trigrams, g.n1, g.n2,
       x.unique_contexts,
       ROUND(CAST(g.n1 AS DOUBLE) / (g.n1 + 2 * g.n2), 6) AS discount
FROM gram_stats g JOIN ctx_stats x ON x.lang = g.lang
ORDER BY g.lang
"""
