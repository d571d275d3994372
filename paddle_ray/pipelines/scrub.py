"""Corpus-scrubbing operators over `documents`: PII redaction, URL
canonicalization + host stats, and paragraph-level exact dedup.

These are the remaining corpus-hygiene stages a webtext training-data
pipeline runs that `webtext.py` doesn't cover (public recipes: C4/
RefinedWeb PII scrubbing, CCNet paragraph-hash dedup of boilerplate
lines repeated across pages, crawl-frontier URL canonicalization). The
reference (xynehq/paddle) is per-document serving and has none of these;
they extend the engine downstream of extraction like the rest of the
webtext family.

The sf `documents` corpus is single-line word-soup with no PII, URLs or
paragraph structure, so each operator DERIVES its input deterministically
from (doc_id, text) — the SQL oracle constructs the identical derived
column, so the value check covers the full kernel chain, not a planted
golden constant. The derivations are pure column expressions (no second
table, no randomness), so both sides agree byte-for-byte.

Regex dialect note: the engine's scrub kernels run on pyarrow.compute's
RE2 engine — the SAME regex engine DuckDB uses — so `\\b`, `(?:...)` and
class semantics agree by construction (Python `re` differs on corner
cases, e.g. unicode word boundaries).

Scale contracts
---------------
- `pii_redact`: stateless per-batch Arrow kernels (count/replace via
  RE2), no shuffle; md5 is the only per-row Python work. At 100 TB this
  is embarrassingly parallel.
- `url_host_stats`: stateless canonicalize kernels, then a slim
  (host, path) pre-aggregated groupby — the shuffle moves one row per
  distinct (host, path) per block, never a URL payload.
- `paragraph_dedup`: CCNet-shaped two-pass global first-occurrence
  dedup. Pass 1 shuffles only (para_md5, packed doc/idx key) — 40 B
  rows — to elect winners; pass 2 re-derives paragraphs from source and
  hash-joins the winner keys back on para_md5, so paragraph TEXT crosses
  exactly one join shuffle and the winner table is never collected to
  the driver. Reassembly is a per-doc groupby whose groups are
  output-sized (<= paras per doc).
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .common import sized_read_parquet


def _docs(sf_dir: str, columns=("doc_id", "text")):
    return sized_read_parquet(f"{sf_dir}/documents.parquet", columns=list(columns))


# --------------------------------------------------------------------------
# PII redaction (C4/RefinedWeb-style scrub: emails, phone numbers, IPs)
# --------------------------------------------------------------------------

# One pattern constant each, shared verbatim with the SQL template —
# two literals in different escaping dialects silently desynchronize
# query and oracle (webtext.py learned this the hard way).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IP_RE = r"\b[0-9]{1,3}(?:\.[0-9]{1,3}){3}\b"
PII_PHONE_RE = r"\b555-[0-9]{4}\b"


def _pii_inject(doc_ids, texts) -> list[str]:
    """Deterministic PII planting: the corpus has none, so both sides
    derive the same PII-bearing text from (doc_id, text). Mirrors
    PII_INJECT_SQL exactly."""
    return [
        f"{t} Contact user{d % 100}@mail{d % 7}.example.com or 555-{(d * 37) % 10000:04d} "
        f"from 10.{d % 256}.{(d * 3) % 256}.{(d * 7) % 256} today"
        for d, t in zip(doc_ids, texts)
    ]


PII_INJECT_SQL = (
    "text || ' Contact user' || (doc_id % 100) || '@mail' || (doc_id % 7) || "
    "'.example.com or 555-' || lpad(CAST((doc_id * 37) % 10000 AS VARCHAR), 4, '0') || "
    "' from 10.' || (doc_id % 256) || '.' || ((doc_id * 3) % 256) || '.' || "
    "((doc_id * 7) % 256) || ' today'"
)


def pii_redact(sf_dir: str) -> pd.DataFrame:
    """Per-doc PII scrub: count and redact emails -> <EMAIL>, IPv4s ->
    <IP>, phone numbers -> <PHONE> (in that order — the email pattern
    would otherwise eat nothing from the others, but order is part of
    the contract). Output carries the counts plus md5 of the redacted
    text so the driver value-checks the full payload without shipping
    it. Redaction order matters only when patterns overlap; the chain
    here is disjoint by construction but the oracle mirrors the exact
    order anyway."""

    def f(batch: pa.Table) -> pa.Table:
        injected = pa.array(
            _pii_inject(batch["doc_id"].to_pylist(), batch["text"].to_pylist()), pa.string()
        )
        n_emails = pc.count_substring_regex(injected, PII_EMAIL_RE)
        n_ips = pc.count_substring_regex(injected, PII_IP_RE)
        n_phones = pc.count_substring_regex(injected, PII_PHONE_RE)
        red = pc.replace_substring_regex(injected, PII_EMAIL_RE, "<EMAIL>")
        red = pc.replace_substring_regex(red, PII_IP_RE, "<IP>")
        red = pc.replace_substring_regex(red, PII_PHONE_RE, "<PHONE>")
        md5 = pa.array(
            [hashlib.md5(s.encode()).hexdigest() for s in red.to_pylist()], pa.string()
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_emails": pc.cast(n_emails, pa.int64()),
                "n_ips": pc.cast(n_ips, pa.int64()),
                "n_phones": pc.cast(n_phones, pa.int64()),
                "redacted_md5": md5,
            }
        )

    return _docs(sf_dir).map_batches(f, batch_format="pyarrow").sort("doc_id").to_pandas()


PII_REDACT_SQL = f"""
WITH injected AS (
  SELECT doc_id, {PII_INJECT_SQL} AS t FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(t, '{PII_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PII_IP_RE}')) AS BIGINT) AS n_ips,
       CAST(len(regexp_extract_all(t, '{PII_PHONE_RE}')) AS BIGINT) AS n_phones,
       md5(regexp_replace(regexp_replace(regexp_replace(t,
           '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
           '{PII_IP_RE}', '<IP>', 'g'),
           '{PII_PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
FROM injected ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# URL canonicalization + per-host stats (crawl-frontier hygiene)
# --------------------------------------------------------------------------

URL_HOST_RE = r"://(?P<host>[^/?#]+)"
URL_PATH_RE = r"://[^/?#]+(?P<path>[^?#]*)"


def _url_inject(doc_ids) -> list[str]:
    """Deterministic messy-URL planting (mixed case, default port,
    www. prefix, tracking params, fragment). Mirrors URL_INJECT_SQL."""
    return [
        f"HTTPS://WWW.Site{d % 50}.Example.COM:443/p/{d % 1000}"
        f"?utm_source=feed&ref={d % 13}#sec{d % 5}"
        for d in doc_ids
    ]


URL_INJECT_SQL = (
    "'HTTPS://WWW.Site' || (doc_id % 50) || '.Example.COM:443/p/' || (doc_id % 1000) || "
    "'?utm_source=feed&ref=' || (doc_id % 13) || '#sec' || (doc_id % 5)"
)


def url_host_stats(sf_dir: str) -> pd.DataFrame:
    """Canonicalize crawl URLs (lowercase host, strip default :443 port,
    strip leading www., drop fragment + tracking params) and aggregate
    per host: url count, distinct path count, and how many carried
    utm_* tracking params. The canonicalize kernels are stateless Arrow
    RE2 ops; the shuffle moves only pre-aggregated slim (host, path)
    rows."""
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        urls = pa.array(_url_inject(batch["doc_id"].to_pylist()), pa.string())
        host = pc.extract_regex(urls, URL_HOST_RE).field("host")
        host = pc.utf8_lower(host)
        host = pc.replace_substring_regex(host, r":443$", "")
        host = pc.replace_substring_regex(host, r"^www\.", "")
        path = pc.extract_regex(urls, URL_PATH_RE).field("path")
        has_utm = pc.cast(
            pc.match_substring_regex(urls, r"[?&]utm_[a-z]+="), pa.int64()
        )
        t = pa.table({"host": host, "path": path, "n_urls_": pa.array([1] * len(urls), pa.int64()), "n_utm_": has_utm})
        # pre-aggregate per (host, path): the shuffle then moves one slim
        # row per distinct pair per block, never a URL payload
        g = t.group_by(["host", "path"]).aggregate([("n_urls_", "sum"), ("n_utm_", "sum")])
        return pa.table(
            {
                "host": g["host"],
                "path": g["path"],
                "n_urls": g["n_urls__sum"],
                "n_utm": g["n_utm__sum"],
            }
        )

    pairs = (
        _docs(sf_dir, columns=("doc_id",))
        .map_batches(canon, batch_format="pyarrow", batch_size=None)
        .groupby(["host", "path"])
        .aggregate(Sum("n_urls", alias_name="n_urls"), Sum("n_utm", alias_name="n_utm"))
    )

    def per_host_partial(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "host": batch["host"],
                "n_urls": batch["n_urls"],
                "n_paths": pa.array([1] * len(batch), pa.int64()),
                "n_utm": batch["n_utm"],
            }
        )
        g = t.group_by("host").aggregate([("n_urls", "sum"), ("n_paths", "sum"), ("n_utm", "sum")])
        return g.rename_columns(["host", "n_urls", "n_paths", "n_utm"])

    out = (
        pairs.map_batches(per_host_partial, batch_format="pyarrow", batch_size=None)
        .groupby("host")
        .aggregate(
            Sum("n_urls", alias_name="n_urls"),
            Sum("n_paths", alias_name="n_paths"),
            Sum("n_utm", alias_name="n_utm"),
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    return out.astype({"n_urls": "int64", "n_paths": "int64", "n_utm": "int64"})


URL_HOST_SQL = f"""
WITH urls AS (
  SELECT {URL_INJECT_SQL} AS url FROM documents
), canon AS (
  SELECT regexp_replace(regexp_replace(lower(regexp_extract(url, '://([^/?#]+)', 1)),
                        ':443$', ''), '^www\\.', '') AS host,
         regexp_extract(url, '://[^/?#]+([^?#]*)', 1) AS path,
         CASE WHEN regexp_matches(url, '[?&]utm_[a-z]+=') THEN 1 ELSE 0 END AS has_utm
  FROM urls
)
SELECT host,
       CAST(count(*) AS BIGINT) AS n_urls,
       CAST(count(DISTINCT path) AS BIGINT) AS n_paths,
       CAST(sum(has_utm) AS BIGINT) AS n_utm
FROM canon GROUP BY host ORDER BY host
"""


# --------------------------------------------------------------------------
# Paragraph-level exact dedup (CCNet-style cross-document boilerplate strip)
# --------------------------------------------------------------------------

_PARA_SEP = "\n\n"
# paragraphs per doc: own text + two planted boilerplate lines shared by
# many docs (mod 7 / mod 3 variants) — the exact duplication CCNet's
# paragraph-hash pass targets (nav/footer/subscribe lines repeated
# across a site's pages)
_N_PARAS = 3


def _doc_paras(doc_id: int, text: str) -> list[str]:
    """Mirrors PARA_INJECT (the UNION ALL arms of PARAGRAPH_DEDUP_SQL)."""
    return [
        text,
        f"subscribe to newsletter variant {doc_id % 7}",
        f"copyright footer {doc_id % 3}",
    ]


def paragraph_dedup(sf_dir: str) -> pd.DataFrame:
    """Global first-occurrence paragraph dedup: a paragraph survives only
    in the document where it first appears (order = (doc_id, idx) — the
    corpus-position order CCNet uses). Two passes:

    pass 1 (winner election): explode docs to (para_md5, key) where
    key = doc_id * _N_PARAS + idx packs the global order into one int64;
    groupby(para_md5).min(key) elects each paragraph's first occurrence.
    Only 40 B rows cross this shuffle.

    pass 2 (apply): re-derive paragraphs from source (cheaper than
    shipping them through pass 1), hash-join the winner table back on
    para_md5, flag kept = (key == winner), reassemble per doc in idx
    order. Paragraph text crosses exactly one join shuffle.

    Output: (doc_id, n_kept, clean_md5) where clean_md5 hashes the
    surviving paragraphs joined by blank lines (NULL when none survive,
    matching the SQL string_agg FILTER)."""
    from ray.data.aggregate import Min

    def explode_slim(batch: pa.Table) -> pa.Table:
        hs, keys = [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for i, p in enumerate(_doc_paras(d, t)):
                hs.append(hashlib.md5(p.encode()).hexdigest())
                keys.append(d * _N_PARAS + i)
        return pa.table({"para_md5": pa.array(hs, pa.string()), "key": pa.array(keys, pa.int64())})

    winners = (
        _docs(sf_dir)
        .map_batches(explode_slim, batch_format="pyarrow")
        .groupby("para_md5")
        .aggregate(Min("key", alias_name="win_key"))
    )

    def explode_full(batch: pa.Table) -> pa.Table:
        ids, idxs, hs, keys, paras = [], [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for i, p in enumerate(_doc_paras(d, t)):
                ids.append(d)
                idxs.append(i)
                hs.append(hashlib.md5(p.encode()).hexdigest())
                keys.append(d * _N_PARAS + i)
                paras.append(p)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
                "para_md5": pa.array(hs, pa.string()),
                "key": pa.array(keys, pa.int64()),
                "para": pa.array(paras, pa.string()),
            }
        )

    exploded = _docs(sf_dir).map_batches(explode_full, batch_format="pyarrow")
    joined = exploded.join(
        winners, join_type="inner", num_partitions=8, on=("para_md5",)
    )

    # reassembly runs over COARSE hash partitions (doc_id % 64, the
    # events_sessionize pattern) — one vectorized pandas pass per
    # partition, not one Python callback per document (that per-key
    # map_groups shape cost q21 19 s of pure scheduling at sf0.1)
    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array(ids % n_parts, pa.int64()))

    def reassemble_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "idx"], kind="mergesort")
        kept = df.key == df.win_key
        out_ids, out_n, out_md5 = [], [], []
        for doc_id, g in df.assign(_kept=kept).groupby("doc_id", sort=True):
            paras = g.para[g._kept]
            out_ids.append(int(doc_id))
            out_n.append(int(len(paras)))
            out_md5.append(
                hashlib.md5(_PARA_SEP.join(paras).encode()).hexdigest() if len(paras) else None
            )
        return pd.DataFrame({"doc_id": out_ids, "n_kept": out_n, "clean_md5": out_md5})

    out = (
        joined.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(reassemble_part, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return out.astype({"doc_id": "int64", "n_kept": "int64"})


PARAGRAPH_DEDUP_SQL = f"""
WITH paras AS (
  SELECT doc_id, 0 AS idx, text AS para FROM documents
  UNION ALL
  SELECT doc_id, 1, 'subscribe to newsletter variant ' || (doc_id % 7) FROM documents
  UNION ALL
  SELECT doc_id, 2, 'copyright footer ' || (doc_id % 3) FROM documents
), ranked AS (
  SELECT doc_id, idx, para,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, idx) AS rn
  FROM paras
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       md5(string_agg(para, chr(10) || chr(10) ORDER BY idx)
           FILTER (WHERE rn = 1)) AS clean_md5
FROM ranked GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# k-anonymity / l-diversity audit — the privacy-compliance companion to
# pii_redact: redaction scrubs direct identifiers, this measures whether
# QUASI-identifiers still single people out (Sweeney 2002; Machanavajjhala
# et al. 2007 for l-diversity)
# --------------------------------------------------------------------------

K_ANON_K = 5
K_ANON_BAND_CENTS = 250_000  # $2,500 account-balance bands (the sensitive attr)


def k_anonymity_audit(sf_dir: str, k: int = K_ANON_K) -> pd.DataFrame:
    """Audit the customer table's quasi-identifier equivalence classes
    (nationkey, mktsegment): a class smaller than k re-identifies its
    members by linkage; a class whose sensitive attribute (the $2,500
    acctbal band) takes a single value discloses that attribute even
    when k-anonymous (l-diversity < 2). Returns ONE exact-integer
    summary row: class count, row count, below-k classes/rows-at-risk,
    min class size, and single-band (l=1) classes/rows.

    Scale contract: per-block (nation, segment, band, cnt) partials
    pre-reduce inside map_batches (bounded by distinct QI x band cells
    per block, never rows), ONE coarse nation-hash exchange co-locates
    each class, per-partition class stats collapse to ONE summary row
    per partition, and the driver folds <= 64 rows. Money crosses as
    exact int cents (to_cents ≙ DuckDB ROUND(x*100)); the band is int
    floor division so both sides agree at negative balances (DuckDB's
    integer // truncates toward zero — the oracle uses FLOOR instead,
    matching numpy's floor semantics)."""
    import numpy as np

    from .common import to_cents

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cust = sized_read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_nationkey", "c_mktsegment", "c_acctbal"],
    )

    def partials(batch: pa.Table) -> pa.Table:
        cents = to_cents(batch["c_acctbal"].to_numpy(zero_copy_only=False))
        df = pd.DataFrame(
            {
                "n": batch["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64),
                "s": batch["c_mktsegment"].to_pylist(),
                "b": cents // K_ANON_BAND_CENTS,
            }
        )
        g = df.groupby(["n", "s", "b"], as_index=False).size().rename(columns={"size": "cnt"})
        g["qp"] = (g.n & 63).astype("int32")
        return pa.Table.from_pandas(g, preserve_index=False)

    def part_summary(g: pd.DataFrame) -> pd.DataFrame:
        cls = g.groupby(["n", "s"]).agg(sz=("cnt", "sum"), l=("b", "nunique"))
        return pd.DataFrame(
            {
                "n_classes": [len(cls)],
                "n_rows": [int(cls.sz.sum())],
                "n_classes_below_k": [int((cls.sz < k).sum())],
                "n_rows_at_risk": [int(cls.sz[cls.sz < k].sum())],
                "min_class_size": [int(cls.sz.min())],
                "n_classes_l1": [int((cls.l < 2).sum())],
                "n_rows_l1": [int(cls.sz[cls.l < 2].sum())],
            }
        )

    parts = (
        cust.map_batches(partials, batch_format="pyarrow")
        .groupby("qp")
        .map_groups(part_summary, batch_format="pandas")
        .to_pandas()
    )
    out = parts.drop(columns=["min_class_size"]).sum().to_frame().T
    out["min_class_size"] = parts.min_class_size.min()
    cols = [
        "n_classes",
        "n_rows",
        "n_classes_below_k",
        "n_rows_at_risk",
        "min_class_size",
        "n_classes_l1",
        "n_rows_l1",
    ]
    return out[cols].astype("int64")


K_ANONYMITY_SQL = f"""
WITH c AS (
  SELECT c_nationkey AS n, c_mktsegment AS s,
         CAST(FLOOR(CAST(ROUND(c_acctbal * 100.0) AS BIGINT)
                    / {K_ANON_BAND_CENTS}.0) AS BIGINT) AS b
  FROM customer),
cls AS (
  SELECT n, s, COUNT(*) AS sz, COUNT(DISTINCT b) AS l
  FROM c GROUP BY n, s)
SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(sz) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN sz < {K_ANON_K} THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_below_k,
       CAST(SUM(CASE WHEN sz < {K_ANON_K} THEN sz ELSE 0 END) AS BIGINT) AS n_rows_at_risk,
       CAST(MIN(sz) AS BIGINT) AS min_class_size,
       CAST(SUM(CASE WHEN l < 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_classes_l1,
       CAST(SUM(CASE WHEN l < 2 THEN sz ELSE 0 END) AS BIGINT) AS n_rows_l1
FROM cls
"""


# --------------------------------------------------------------------------
# GDPR deletion cascade — referential right-to-be-forgotten propagation
# --------------------------------------------------------------------------

GDPR_DEL_MOD = 53  # deterministic erasure-request list: c_custkey % 53 == 0


def gdpr_delete_cascade(sf_dir: str) -> pd.DataFrame:
    """Right-to-be-forgotten cascade audit — the third privacy op next
    to pii_redact (direct identifiers) and k_anonymity_audit (quasi-
    identifiers): an erasure-request list over customers propagates
    through the foreign-key chain customer -> orders -> lineitem, and
    the audit reports exact deleted/surviving counts per table (the
    numbers a deletion job must reconcile before committing the purge).
    The request list is derived deterministically (c_custkey %
    GDPR_DEL_MOD == 0 — the scrub.py derivation-oracle pattern).

    Scale contract: each cascade hop is ONE native hash join against a
    SLIM key table (8 B keys — the erasure list and the deleted-order
    keys; fact-table payloads never join, only their FK columns are
    read), so the shuffle is key-sized at every hop; totals are
    Dataset.count() off the parquet footers. No driver-side set ever
    holds the fact keys — at 100 TB the deleted-order key table is
    itself distributed (this is why the hop is a join, not an np.isin
    broadcast)."""
    import ray.data as rd  # noqa: F401  (parity with sibling modules)

    def erasure_list(batch: pa.Table) -> pa.Table:
        keys = batch["c_custkey"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keys % GDPR_DEL_MOD == 0))

    del_cust = (
        sized_read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        .map_batches(erasure_list, batch_format="pyarrow")
        .materialize()
    )
    orders = sized_read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    del_orders = orders.join(
        del_cust, join_type="inner", num_partitions=8, on=("o_custkey",), right_on=("c_custkey",)
    ).select_columns(["o_orderkey"]).materialize()
    lineitem = sized_read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    del_line = lineitem.join(
        del_orders, join_type="inner", num_partitions=8, on=("l_orderkey",), right_on=("o_orderkey",)
    )

    n_cust = sized_read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()
    n_ord = orders.count()
    n_li = lineitem.count()
    d_cust = del_cust.count()
    d_ord = del_orders.count()
    d_li = del_line.count()
    return pd.DataFrame(
        {
            "n_del_customers": pd.Series([d_cust], dtype="int64"),
            "n_del_orders": pd.Series([d_ord], dtype="int64"),
            "n_del_lineitems": pd.Series([d_li], dtype="int64"),
            "n_keep_customers": pd.Series([n_cust - d_cust], dtype="int64"),
            "n_keep_orders": pd.Series([n_ord - d_ord], dtype="int64"),
            "n_keep_lineitems": pd.Series([n_li - d_li], dtype="int64"),
        }
    )


GDPR_CASCADE_SQL = f"""
WITH dc AS (SELECT c_custkey FROM customer WHERE c_custkey % {GDPR_DEL_MOD} = 0),
do_ AS (SELECT o_orderkey FROM orders JOIN dc ON o_custkey = c_custkey),
dl AS (SELECT l_orderkey FROM lineitem JOIN do_ ON l_orderkey = o_orderkey)
SELECT CAST((SELECT COUNT(*) FROM dc) AS BIGINT) AS n_del_customers,
       CAST((SELECT COUNT(*) FROM do_) AS BIGINT) AS n_del_orders,
       CAST((SELECT COUNT(*) FROM dl) AS BIGINT) AS n_del_lineitems,
       CAST((SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM dc) AS BIGINT)
         AS n_keep_customers,
       CAST((SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM do_) AS BIGINT)
         AS n_keep_orders,
       CAST((SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM dl) AS BIGINT)
         AS n_keep_lineitems
"""


# --------------------------------------------------------------------------
# differentially-private group counts (seeded Laplace mechanism)
# --------------------------------------------------------------------------

DP_EPS = 0.5


def dp_group_counts(sf_dir: str, eps: float = DP_EPS) -> pd.DataFrame:
    """eps-DP released per-lang document counts via the Laplace mechanism
    — the fourth privacy op (pii_redact scrubs direct identifiers,
    k_anonymity_audit measures quasi-identifier risk, gdpr_delete_cascade
    erases, this RELEASES an aggregate with calibrated noise). Count has
    L1 sensitivity 1, so noise ~ Laplace(1/eps).

    Determinism/oracle contract: the noise draw is SEEDED per group —
    u = md5('dp:' || lang)[:12 hex] / 16^12 - 0.5 (exact in double: a
    <2^48 integer divided by a power of two), then the inverse-CDF
    transform noise = -(1/eps) * sign(u) * ln(1 - 2|u|). The only
    inexact steps are one IEEE subtraction, one correctly-rounded libm
    ln and one multiply, identical in numpy and DuckDB to ~15
    significant digits; the gate rounds to 6. (A production deployment
    feeds a secret per-release salt where 'dp:' sits — the mechanism and
    its calibration are unchanged; the fixed salt is what makes the
    result value-oracle-able.)

    Scale contract: one streaming scan emits per-block (lang, n)
    partials; the exchange is #langs x #blocks rows, the noise pass runs
    on the #langs-sized result. Reference parity: the reference engine
    has no aggregate-release path; this extends SURVEY §2's A-family
    (aggregates) with the private-release variant.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")

    docs = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["lang"])

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by("lang").aggregate([("lang", "count")])
        return g.rename_columns(["lang", "n"])

    counts = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    u = np.array(
        [
            int(hashlib.md5(f"dp:{lang}".encode()).hexdigest()[:12], 16) / float(1 << 48)
            - 0.5
            for lang in counts.lang
        ]
    )
    noise = -(1.0 / eps) * np.sign(u) * np.log(1.0 - 2.0 * np.abs(u))
    counts["n_noisy"] = (counts.n.to_numpy(dtype=np.float64) + noise).round(6)
    return counts[["lang", "n_noisy"]].astype({"lang": "str"})


DP_GROUP_COUNTS_SQL = f"""
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY lang),
u AS (
  SELECT lang, n,
         CAST(CONCAT('0x', substr(md5('dp:' || lang), 1, 12)) AS BIGINT)
           / 281474976710656.0 - 0.5 AS uu
  FROM c
)
SELECT lang,
       ROUND(n + (-1.0 / {DP_EPS}) * sign(uu) * ln(1.0 - 2.0 * abs(uu)), 6)
         AS n_noisy
FROM u ORDER BY lang
"""


# --------------------------------------------------------------------------
# crawl politeness scheduling (frontier -> per-host fetch slots)
# --------------------------------------------------------------------------

CRAWL_RATE = 2  # fetches per second per host


def crawl_schedule(sf_dir: str, rate: int = CRAWL_RATE) -> pd.DataFrame:
    """Politeness-constrained fetch scheduling of the URL frontier: each
    host (the `source` column) may serve at most `rate` fetches per
    second, so url #i of a host (0-based, ordered by doc_id — the
    deterministic frontier order) fetches at second i // rate. The
    crawl-frontier sibling of url_host_stats (key hygiene) and
    domain_cap (volume capping): this op turns the frontier into a
    TIMETABLE, and its per-host makespan is exactly the quantity a
    crawl planner balances against host count.

    Output per host: n_urls, makespan_s (last fetch second + 1), and
    sched_digest = sum(doc_id * fetch_s) — an exact-integer functional
    of EVERY slot assignment, so the oracle value-locks the whole
    timetable without emitting a row per url (the extract_synth_digest
    contract, arithmetic instead of md5 because the slot values are
    already small ints).

    Scale contract: ONE coarse host-hash exchange (the window_top3 /
    sessionize pattern: 64 partitions, one vectorized map_groups call
    per partition, in-group rank = one argsort per host slice); partial
    rows are #hosts-sized."""
    from .common import sized_read_parquet

    N_PARTS = 64

    def add_part(batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.hashes import splitmix64

        h = np.array(
            [
                int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "big")
                for s in batch["source"].to_pylist()
            ],
            dtype=np.uint64,
        )
        part = (splitmix64(h) % np.uint64(N_PARTS)).astype(np.int32)
        return batch.append_column("part", pa.array(part, pa.int32()))

    def sched_part(g: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = g.sort_values(["source", "doc_id"], kind="mergesort")
        slot = g.groupby("source", sort=False).cumcount().to_numpy()
        fetch_s = slot // rate
        g = g.assign(fetch_s=fetch_s, prod=g.doc_id.to_numpy(dtype=np.int64) * fetch_s)
        out = g.groupby("source", as_index=False).agg(
            n_urls=("doc_id", "size"),
            makespan_s=("fetch_s", "max"),
            sched_digest=("prod", "sum"),
        )
        out["makespan_s"] = out.makespan_s + 1
        return out

    out = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(sched_part, batch_format="pandas")
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    return out.astype(
        {"source": "str", "n_urls": "int64", "makespan_s": "int64", "sched_digest": "int64"}
    )


CRAWL_SCHEDULE_SQL = f"""
WITH slots AS (
  SELECT source, doc_id,
         (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
           // {CRAWL_RATE} AS fetch_s
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(MAX(fetch_s) + 1 AS BIGINT) AS makespan_s,
       CAST(SUM(doc_id * fetch_s) AS BIGINT) AS sched_digest
FROM slots GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# encoding audit — invalid-UTF-8 / mojibake detection
# --------------------------------------------------------------------------

ENCODING_CORRUPT_MOD = 13
# UTF-8-encoded UTF-16 surrogate (CESU-8 artifact) — the classic mojibake
# a mixed-encoding crawl plants; strict UTF-8 decoders must reject it.
_CORRUPT_SEQ = b"\xed\xa0\x80"


def _plant_corruption(text: str) -> bytes:
    b = text.encode("utf-8")
    mid = len(b) // 2
    # never split a multi-byte sequence: back up to a boundary byte
    while mid > 0 and (b[mid] & 0xC0) == 0x80:
        mid -= 1
    return b[:mid] + _CORRUPT_SEQ + b[mid:]


def _is_valid_utf8(b: bytes) -> bool:
    try:
        b.decode("utf-8", errors="strict")
        return True
    except UnicodeDecodeError:
        return False


def encoding_audit(sf_dir: str) -> pd.DataFrame:
    """Invalid-UTF-8 / mojibake audit — the charset hygiene gate a crawl
    runs before any text operator (a mis-decoded shard poisons
    tokenization, dedup shingles and LM scores downstream; CCNet and
    RefinedWeb both gate on encoding validity). Docs with
    doc_id % 13 == 0 carry a PLANTED CESU-8 surrogate sequence injected
    at a code-point boundary (the deterministic-derivation oracle
    pattern — the corpus's own texts are valid UTF-8 by construction,
    so ground truth is exactly the planted set), and the detector is a
    REAL strict UTF-8 scan over the raw bytes, not a doc_id lookup —
    the pytest proves that on hand-made byte sequences.

    Per source: n_docs, n_invalid, and an exact invalid-id digest
    (sum doc_id * 31 mod 2^31) so the detector's hit SET is
    value-locked, not just its count. Scale: one stateless streaming
    pass folding to #sources-sized integer partials; bytes never cross
    a shuffle."""
    from ray.data.aggregate import Sum

    docs = sized_read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "source", "text"]
    )

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        invalid = pd.array(
            [
                not _is_valid_utf8(
                    _plant_corruption(t) if i % ENCODING_CORRUPT_MOD == 0 else t.encode("utf-8")
                )
                for i, t in zip(ids, texts)
            ],
            dtype="int64",
        )
        import numpy as np

        inv = invalid.to_numpy(dtype=np.int64)
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pylist(),
                "n_docs": 1,
                "n_invalid": inv,
                "invalid_digest": inv * ((ids * 31) % (1 << 31)),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("source", as_index=False).sum(), preserve_index=False
        )

    out = (
        docs.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("source")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_invalid", alias_name="n_invalid"),
            Sum("invalid_digest", alias_name="invalid_digest"),
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    return out.astype(
        {"source": "str", "n_docs": "int64", "n_invalid": "int64", "invalid_digest": "int64"}
    )


ENCODING_AUDIT_SQL = f"""
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN doc_id % {ENCODING_CORRUPT_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_invalid,
       CAST(SUM(CASE WHEN doc_id % {ENCODING_CORRUPT_MOD} = 0
                     THEN (doc_id * 31) % 2147483648 ELSE 0 END) AS BIGINT)
         AS invalid_digest
FROM documents GROUP BY source ORDER BY source
"""


# --------------------------------------------------------------------------
# robots.txt prefix-rule filtering over the URL frontier
# --------------------------------------------------------------------------


def robots_filter(sf_dir: str) -> pd.DataFrame:
    """Robots-exclusion filtering over the derived URL frontier — the
    crawl-politeness gate next to crawl_schedule (that bounds RATE,
    this bounds SCOPE): each host publishes at most one Disallow
    PATH-PREFIX rule (hosts h % 4 == 0 disallow '/p/1' — a genuine
    prefix, matching /p/1, /p/10..19, /p/100..199; h % 4 == 1 disallow
    '/p/' — everything; others allow all), and every frontier URL is
    classified by a REAL prefix match against its host's rule. Reports
    per host: n_urls, n_blocked and an exact blocked-id digest so the
    blocked SET is value-locked.

    Scale contract: the rule table is #hosts-bounded (a real robots
    corpus is a small side table broadcast once via ray.put); matching
    is vectorized PER RULE (pc.starts_with over the whole batch per
    distinct rule — the standard trick: loop over rules, never rows);
    the exchange is #hosts-sized integer partials."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy()
        h = ids % 50
        paths = pa.array([f"/p/{d % 1000}" for d in ids], pa.string())
        blocked = np.zeros(len(ids), dtype=np.int64)
        # rule 1: hosts h%4==0 disallow prefix '/p/1'
        m0 = (h % 4 == 0) & pc.starts_with(paths, "/p/1").to_numpy(zero_copy_only=False)
        # rule 2: hosts h%4==1 disallow prefix '/p/' (all paths here)
        m1 = (h % 4 == 1) & pc.starts_with(paths, "/p/").to_numpy(zero_copy_only=False)
        blocked[m0 | m1] = 1
        df = pd.DataFrame(
            {
                "host": [f"site{int(x)}.example.com" for x in h],
                "n_urls": 1,
                "n_blocked": blocked,
                "blocked_digest": blocked * ((ids * 17) % (1 << 31)),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("host", as_index=False).sum(), preserve_index=False
        )

    out = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("host")
        .aggregate(
            Sum("n_urls", alias_name="n_urls"),
            Sum("n_blocked", alias_name="n_blocked"),
            Sum("blocked_digest", alias_name="blocked_digest"),
        )
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    return out.astype(
        {"host": "str", "n_urls": "int64", "n_blocked": "int64", "blocked_digest": "int64"}
    )


ROBOTS_FILTER_SQL = """
WITH u AS (
  SELECT doc_id, doc_id % 50 AS h, '/p/' || (doc_id % 1000) AS path FROM documents
),
b AS (
  SELECT h, doc_id,
         CASE WHEN h % 4 = 0 AND path LIKE '/p/1%' THEN 1
              WHEN h % 4 = 1 AND path LIKE '/p/%' THEN 1
              ELSE 0 END AS blocked
  FROM u
)
SELECT 'site' || h || '.example.com' AS host,
       COUNT(*) AS n_urls,
       CAST(SUM(blocked) AS BIGINT) AS n_blocked,
       CAST(SUM(CASE WHEN blocked = 1 THEN (doc_id * 17) % 2147483648 ELSE 0 END) AS BIGINT)
         AS blocked_digest
FROM b GROUP BY h ORDER BY host
"""


# --------------------------------------------------------------------------
# unicode NFC normalization audit
# --------------------------------------------------------------------------

NFC_PLANT_MOD = 7
# decomposed "café" — 'e' + U+0301 combining acute; NFC composes it
_NFC_PLANT = " cafe\u0301"  # explicit escape: an NFC-normalizing editor must not compose it


def unicode_nfc_audit(sf_dir: str) -> pd.DataFrame:
    """Unicode NFC normalization audit — the canonical-form hygiene gate
    next to encoding_audit (that catches invalid BYTES; this catches
    valid-but-denormalized CODE POINTS: the same text in composed vs
    decomposed form hashes differently, silently defeating exact dedup,
    shingles and equality joins — why every curation pipeline NFC-folds
    before hashing). Docs with doc_id % 7 == 0 carry a planted
    decomposed sequence (e + combining acute); detection is a REAL
    normalizer comparison (NFC(t) != t) on BOTH sides — Python
    unicodedata here, DuckDB's normalizer in the oracle — so two
    independent Unicode implementations must agree on every doc, which
    is a stronger check than a derivation constant.

    Per lang: n_docs, n_non_nfc, delta_chars (code points removed by
    composing) and an exact non-NFC id digest. One stateless streaming
    pass to #langs-sized integer partials; text never crosses a
    shuffle."""
    import unicodedata

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch["doc_id"].to_numpy()
        texts = batch["text"].to_pylist()
        non_nfc = np.zeros(len(ids), dtype=np.int64)
        delta = np.zeros(len(ids), dtype=np.int64)
        for j, (i, t) in enumerate(zip(ids, texts)):
            if i % NFC_PLANT_MOD == 0:
                t = t + _NFC_PLANT
            nt = unicodedata.normalize("NFC", t)
            if nt != t:
                non_nfc[j] = 1
                delta[j] = len(t) - len(nt)
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pylist(),
                "n_docs": 1,
                "n_non_nfc": non_nfc,
                "delta_chars": delta,
                "nfc_digest": non_nfc * ((ids * 23) % (1 << 31)),
            }
        )
        return pa.Table.from_pandas(
            df.groupby("lang", as_index=False).sum(), preserve_index=False
        )

    out = (
        sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby("lang")
        .aggregate(
            Sum("n_docs", alias_name="n_docs"),
            Sum("n_non_nfc", alias_name="n_non_nfc"),
            Sum("delta_chars", alias_name="delta_chars"),
            Sum("nfc_digest", alias_name="nfc_digest"),
        )
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return out.astype(
        {
            "lang": "str",
            "n_docs": "int64",
            "n_non_nfc": "int64",
            "delta_chars": "int64",
            "nfc_digest": "int64",
        }
    )


UNICODE_NFC_SQL = f"""
WITH planted AS (
  SELECT doc_id, lang,
         CASE WHEN doc_id % {NFC_PLANT_MOD} = 0
              THEN text || ' cafe' || chr(769)
              ELSE text END AS t
  FROM documents
),
flag AS (
  SELECT doc_id, lang,
         CASE WHEN nfc_normalize(t) != t THEN 1 ELSE 0 END AS non_nfc,
         CASE WHEN nfc_normalize(t) != t
              THEN length(t) - length(nfc_normalize(t)) ELSE 0 END AS delta
  FROM planted
)
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(non_nfc) AS BIGINT) AS n_non_nfc,
       CAST(SUM(delta) AS BIGINT) AS delta_chars,
       CAST(SUM(non_nfc * ((doc_id * 23) % 2147483648)) AS BIGINT) AS nfc_digest
FROM flag GROUP BY lang ORDER BY lang
"""


# --------------------------------------------------------------------------
# C4-style frequent-line filter — remove ALL copies of corpus-frequent lines
# --------------------------------------------------------------------------

FREQ_LINE_MIN = 3  # a line occurring >= this many times corpus-wide is boilerplate


def frequent_line_filter(sf_dir: str) -> pd.DataFrame:
    """C4/RefinedWeb frequent-line removal: any paragraph line occurring
    >= FREQ_LINE_MIN times corpus-wide is boilerplate and EVERY copy is
    dropped — the opposite policy of paragraph_dedup (keep-first
    preserves one navigation/footer copy for the archive; a training
    corpus wants zero). Shares paragraph_dedup's derived paragraph
    structure so both policies are value-locked over the same input.

    Two passes on the same machinery: pass 1 counts per line digest —
    per-block (md5, cnt) pre-aggregated partials, 40 B rows — and
    filters to the banned set (corpus-frequency >= threshold), which
    stays a DISTRIBUTED table; pass 2 re-derives paragraphs, LEFT
    ANTI-joins the banned table on the digest (native hash join — the
    banned side is never a driver broadcast: at 100 TB the frequent-line
    set is site-count-sized, not constant), and reassembles per doc over
    coarse doc_id-hash partitions. Output (doc_id, n_kept, clean_md5) —
    clean_md5 NULL when every line was boilerplate-frequent."""
    from ray.data.aggregate import Sum

    def explode_counts(batch: pa.Table) -> pa.Table:
        hs = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for p in _doc_paras(d, t):
                hs.append(hashlib.md5(p.encode()).hexdigest())
        df = pd.DataFrame({"para_md5": hs})
        g = df.groupby("para_md5", as_index=False).size().rename(columns={"size": "cnt"})
        return pa.Table.from_pandas(g, preserve_index=False)

    banned = (
        _docs(sf_dir)
        .map_batches(explode_counts, batch_format="pyarrow")
        .groupby("para_md5")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .filter(lambda r: r["cnt"] >= FREQ_LINE_MIN)
    )

    def explode_full(batch: pa.Table) -> pa.Table:
        ids, idxs, hs, paras = [], [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            for i, p in enumerate(_doc_paras(d, t)):
                ids.append(d)
                idxs.append(i)
                hs.append(hashlib.md5(p.encode()).hexdigest())
                paras.append(p)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
                "para_md5": pa.array(hs, pa.string()),
                "para": pa.array(paras, pa.string()),
            }
        )

    kept = _docs(sf_dir).map_batches(explode_full, batch_format="pyarrow").join(
        banned, join_type="left_anti", num_partitions=8, on=("para_md5",)
    )

    n_parts = 64

    def add_part(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", pa.array(ids % n_parts, pa.int64()))

    def reassemble_part(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype="int64"),
                    "n_kept": pd.Series([], dtype="int64"),
                    "clean_md5": pd.Series([], dtype=object),
                }
            )
        df = df.sort_values(["doc_id", "idx"], kind="mergesort")
        out_ids, out_n, out_md5 = [], [], []
        for doc_id, g in df.groupby("doc_id", sort=True):
            out_ids.append(int(doc_id))
            out_n.append(int(len(g)))
            out_md5.append(hashlib.md5(_PARA_SEP.join(g.para).encode()).hexdigest())
        return pd.DataFrame({"doc_id": out_ids, "n_kept": out_n, "clean_md5": out_md5})

    survivors = (
        kept.map_batches(add_part, batch_format="pyarrow", batch_size=None)
        .groupby("part")
        .map_groups(reassemble_part, batch_format="pandas")
        .to_pandas()
    )
    # docs whose every line was banned: recover with a left merge against
    # the id list (the anti join dropped them entirely)
    ids = _docs(sf_dir, columns=("doc_id",)).to_pandas()
    out = ids.merge(survivors, on="doc_id", how="left").sort_values("doc_id").reset_index(drop=True)
    out["n_kept"] = out["n_kept"].fillna(0).astype("int64")
    out["clean_md5"] = out["clean_md5"].where(out["clean_md5"].notna(), None)
    return out.astype({"doc_id": "int64", "n_kept": "int64"})


FREQUENT_LINE_SQL = f"""
WITH paras AS (
  SELECT doc_id, 0 AS idx, text AS para FROM documents
  UNION ALL
  SELECT doc_id, 1, 'subscribe to newsletter variant ' || (doc_id % 7) FROM documents
  UNION ALL
  SELECT doc_id, 2, 'copyright footer ' || (doc_id % 3) FROM documents
), freq AS (
  SELECT doc_id, idx, para, COUNT(*) OVER (PARTITION BY para) AS f
  FROM paras
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE f < {FREQ_LINE_MIN}) AS BIGINT) AS n_kept,
       md5(string_agg(para, chr(10) || chr(10) ORDER BY idx)
           FILTER (WHERE f < {FREQ_LINE_MIN})) AS clean_md5
FROM freq GROUP BY doc_id ORDER BY doc_id
"""


# --------------------------------------------------------------------------
# user-level DP histogram — contribution bounding + Laplace release
# --------------------------------------------------------------------------

DP_USER_CAP = 2  # max events any one user contributes to the release


def dp_user_histogram(sf_dir: str, eps: float = DP_EPS, cap: int = DP_USER_CAP) -> pd.DataFrame:
    """USER-level eps-DP event-type histogram — dp_group_counts releases
    with row-level sensitivity 1, which protects a ROW; real
    deployments protect a PERSON, whose many events make row-level
    noise meaningless. The standard fix (Wilson et al., 2020) is
    CONTRIBUTION BOUNDING: keep each user's first `cap` events (order =
    (ts, event_id) — deterministic), so one user changes at most `cap`
    cells by 1 each, L1 sensitivity = cap, noise ~ Laplace(cap/eps) per
    cell with the dp_group_counts seeded-draw contract.

    Scale: contribution bounding is the sessionize coarse user-hash
    partition shape (vectorized per-user rank < cap, no per-user
    callbacks); the bounded stream folds to #types x #blocks integer
    partials; the noise pass runs on the #types-sized result."""
    import numpy as np

    from ray.data.aggregate import Sum

    if eps <= 0:
        raise ValueError(f"eps must be > 0, got {eps}")
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    N_PARTS = 64

    def add_part(batch: pa.Table) -> pa.Table:
        from .joins import _hash_part  # type: ignore[attr-defined]

        ids = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column("part", _hash_part(ids, N_PARTS))

    def bound_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"event_type": pd.Series([], dtype=object), "n": pd.Series([], dtype="int64")}
        )
        if g.empty:
            return empty
        g = g.sort_values(["user_id", "ts", "event_id"])
        rank = g.groupby("user_id").cumcount()
        kept = g[rank < cap]
        out = kept.groupby("event_type", as_index=False).size().rename(columns={"size": "n"})
        return out.astype({"n": "int64"})

    counts = (
        sized_read_parquet(
            f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id", "event_type"]
        )
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bound_part, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    u = np.array(
        [
            int(hashlib.md5(f"dpu:{t}".encode()).hexdigest()[:12], 16) / float(1 << 48) - 0.5
            for t in counts.event_type
        ]
    )
    noise = -(float(cap) / eps) * np.sign(u) * np.log(1.0 - 2.0 * np.abs(u))
    counts["n_noisy"] = (counts.n.to_numpy(dtype=np.float64) + noise).round(6)
    return counts[["event_type", "n_noisy"]].astype({"event_type": "str"})


DP_USER_HISTOGRAM_SQL = f"""
WITH ranked AS (
  SELECT event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
),
c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM ranked WHERE rn <= {DP_USER_CAP} GROUP BY event_type
),
u AS (
  SELECT event_type, n,
         CAST(CONCAT('0x', substr(md5('dpu:' || event_type), 1, 12)) AS BIGINT)
           / 281474976710656.0 - 0.5 AS uu
  FROM c
)
SELECT event_type,
       ROUND(n + (-CAST({DP_USER_CAP} AS DOUBLE) / {DP_EPS}) * sign(uu)
                 * ln(1.0 - 2.0 * abs(uu)), 6) AS n_noisy
FROM u ORDER BY event_type
"""


# --------------------------------------------------------------------------
# one-pass audit panel — scan sharing across audit families
# --------------------------------------------------------------------------


def audit_panel_one_pass(sf_dir: str) -> pd.DataFrame:
    """Corpus audit panel computed in ONE shared scan — the pattern that
    matters at 100 TB: encoding validity, NFC normality, volume and
    length rollups each cost a full corpus read when run as separate
    jobs; a nightly audit fuses them into one pass over one column
    projection, and every additional metric is then marginal-cost-zero.
    (The metric kernels are the ones encoding_audit / unicode_nfc_audit
    already value-lock individually; this operator locks the FUSION —
    same numbers out of the shared scan.)

    Output is the long-form (metric, key, value) panel, all exact
    int64: n_docs and sum_chars per lang, invalid_utf8 per lang
    (encoding_audit's planted derivation), non_nfc per lang
    (unicode_nfc_audit's derivation). Exchange: #metrics x #langs x
    #blocks integer partials — one groupby for the whole panel."""
    import unicodedata

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy()
        langs = batch["lang"].to_pylist()
        texts = batch["text"].to_pylist()
        nchars = batch["n_chars"].to_numpy()
        rows: dict[tuple[str, str], int] = {}

        def add(metric: str, key: str, v: int) -> None:
            rows[(metric, key)] = rows.get((metric, key), 0) + v

        for i, lang, t, nc in zip(ids, langs, texts, nchars):
            add("n_docs", lang, 1)
            add("sum_chars", lang, int(nc))
            raw = (
                _plant_corruption(t)
                if i % ENCODING_CORRUPT_MOD == 0
                else t.encode("utf-8")
            )
            if not _is_valid_utf8(raw):
                add("invalid_utf8", lang, 1)
            s = t + _NFC_PLANT if i % NFC_PLANT_MOD == 0 else t
            if unicodedata.normalize("NFC", s) != s:
                add("non_nfc", lang, 1)
        df = pd.DataFrame(
            [(m, k, v) for (m, k), v in rows.items()], columns=["metric", "key", "value"]
        )
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text", "n_chars"]
        )
        .map_batches(partial, batch_format="pyarrow", batch_size=None)
        .groupby(["metric", "key"])
        .aggregate(Sum("value", alias_name="value"))
        .to_pandas()
        .sort_values(["metric", "key"])
        .reset_index(drop=True)
    )
    return out.astype({"metric": "str", "key": "str", "value": "int64"})


AUDIT_PANEL_SQL = f"""
SELECT 'n_docs' AS metric, lang AS key, CAST(COUNT(*) AS BIGINT) AS value
FROM documents GROUP BY lang
UNION ALL
SELECT 'sum_chars', lang, CAST(SUM(n_chars) AS BIGINT) FROM documents GROUP BY lang
UNION ALL
SELECT 'invalid_utf8', lang,
       CAST(SUM(CASE WHEN doc_id % {ENCODING_CORRUPT_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents GROUP BY lang
HAVING SUM(CASE WHEN doc_id % {ENCODING_CORRUPT_MOD} = 0 THEN 1 ELSE 0 END) > 0
UNION ALL
SELECT 'non_nfc', lang,
       CAST(SUM(CASE WHEN doc_id % {NFC_PLANT_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT)
FROM documents GROUP BY lang
HAVING SUM(CASE WHEN doc_id % {NFC_PLANT_MOD} = 0 THEN 1 ELSE 0 END) > 0
ORDER BY metric, key
"""
