"""Scrub-family semantics: PII redaction, URL canonicalization,
paragraph-level first-occurrence dedup (pipelines/scrub.py). The driver
oracle locks full values vs DuckDB; these tests lock the SEMANTICS
against hand-built references so an oracle edit can't silently redefine
the operator."""

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from paddle_ray.pipelines import scrub

SF = "/root/testdata/sf0.001"


def test_pii_patterns_redact_handcrafted_cases():
    s = pa.array(
        [
            "write to First.Last+tag@sub.domain.org now",
            "server at 192.168.001.7 port 80",
            "call 555-0100 or 555-9999",
            "no pii here at all",
            "a@b.io 1.2.3.4 555-1234 all three",
        ]
    )
    red = pc.replace_substring_regex(s, scrub.PII_EMAIL_RE, "<EMAIL>")
    red = pc.replace_substring_regex(red, scrub.PII_IP_RE, "<IP>")
    red = pc.replace_substring_regex(red, scrub.PII_PHONE_RE, "<PHONE>").to_pylist()
    assert red == [
        "write to <EMAIL> now",
        "server at <IP> port 80",
        "call <PHONE> or <PHONE>",
        "no pii here at all",
        "<EMAIL> <IP> <PHONE> all three",
    ]


def test_pii_redact_finds_every_planted_item_and_output_is_clean(ray_session):
    out = scrub.pii_redact(SF)
    # every doc gets exactly one planted email/phone and one planted IP
    # (word-soup text contains none of its own)
    assert (out.n_emails == 1).all()
    assert (out.n_phones == 1).all()
    assert (out.n_ips == 1).all()
    assert out.doc_id.is_unique


def test_url_host_stats_canonical_hosts(ray_session):
    out = scrub.url_host_stats(SF)
    # canonical form: lowercase, no www., no default port
    assert all(h == h.lower() for h in out.host)
    assert not any(h.startswith("www.") for h in out.host)
    assert not any(":" in h for h in out.host)
    assert set(out.host) == {f"site{i}.example.com" for i in range(50)}
    # every planted URL carries utm tracking params
    assert (out.n_utm == out.n_urls).all()
    assert (out.n_paths <= out.n_urls).all()
    assert out.n_urls.sum() == 500


def test_paragraph_dedup_matches_bruteforce_first_occurrence(ray_session):
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    first = {}
    expect = {}
    for d, t in docs:
        paras = scrub._doc_paras(d, t)
        kept = []
        for i, p in enumerate(paras):
            if p not in first:
                first[p] = (d, i)
                kept.append(p)
        expect[d] = (
            len(kept),
            hashlib.md5("\n\n".join(kept).encode()).hexdigest() if kept else None,
        )

    out = scrub.paragraph_dedup(SF)
    got = {int(r.doc_id): (int(r.n_kept), r.clean_md5) for r in out.itertuples()}
    assert got == expect
    # non-vacuity: boilerplate actually deduplicates — later docs lose
    # their planted paragraphs to earlier first occurrences
    assert any(n < 3 for n, _ in got.values())
    assert sum(n for n, _ in got.values()) < 3 * len(docs)
    # but every doc's own unique text survives (n_kept >= 1) in this corpus
    assert all(n >= 1 for n, _ in got.values())


def test_paragraph_dedup_adversarial_cross_position_duplicates(ray_session):
    """Adversarial corpus: a doc whose OWN text equals another doc's
    planted boilerplate (cross-position duplicate), plus two docs with
    identical own text. First-occurrence order is global (doc_id, idx),
    so doc 0's para0 'copyright footer 1' must beat doc 1's para2 of the
    same string, and doc 3's copy of doc 2's text must lose."""
    import os
    import shutil
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        (0, "copyright footer 1"),          # == doc 1's idx-2 boilerplate
        (1, "unique text one"),
        (2, "shared body text"),
        (3, "shared body text"),            # exact duplicate of doc 2
        (4, "subscribe to newsletter variant 4"),  # == its OWN idx-1 boilerplate
    ]
    d = tempfile.mkdtemp(prefix="para_adv_")
    try:
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([i for i, _ in docs], pa.int64()),
                    "text": pa.array([t for _, t in docs], pa.string()),
                }
            ),
            os.path.join(d, "documents.parquet"),
        )
        out = scrub.paragraph_dedup(d)
        got = {int(r.doc_id): int(r.n_kept) for r in out.itertuples()}
        # brute-force reference over the same derivation
        first, expect = {}, {}
        for i, t in docs:
            kept = 0
            for j, p in enumerate(scrub._doc_paras(i, t)):
                if p not in first:
                    first[p] = (i, j)
                    kept += 1
            expect[i] = kept
        assert got == expect
        # the specific adversarial claims
        assert expect[0] == 3          # doc 0 wins everything incl. the footer string
        # doc 3 keeps only its variant-3 subscribe line: its own text lost
        # to doc 2 AND its footer (3 % 3 = 0) lost to doc 0's footer
        assert expect[3] == 1
        # doc 4's own text == its OWN subscribe boilerplate (kept once, at
        # idx 0) and its footer (4 % 3 = 1) lost to doc 0's own text —
        # only the one merged string survives
        assert expect[4] == 1
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_k_anonymity_matches_single_process_reference(ray_session):
    """k_anonymity_audit == a pandas single-process reference over the
    same QI/band/sensitive definitions; both audit arms (below-k and
    l-diversity) are live at sf0.001; k < 1 raises."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from paddle_ray.pipelines.common import to_cents

    t = pq.read_table(
        f"{SF}/customer.parquet", columns=["c_nationkey", "c_mktsegment", "c_acctbal"]
    ).to_pandas()
    t["b"] = to_cents(t.c_acctbal.to_numpy()) // scrub.K_ANON_BAND_CENTS
    cls = t.groupby(["c_nationkey", "c_mktsegment"]).agg(
        sz=("b", "size"), l=("b", "nunique")
    )
    k = scrub.K_ANON_K
    expect = {
        "n_classes": len(cls),
        "n_rows": int(cls.sz.sum()),
        "n_classes_below_k": int((cls.sz < k).sum()),
        "n_rows_at_risk": int(cls.sz[cls.sz < k].sum()),
        "min_class_size": int(cls.sz.min()),
        "n_classes_l1": int((cls.l < 2).sum()),
        "n_rows_l1": int(cls.sz[cls.l < 2].sum()),
    }

    out = scrub.k_anonymity_audit(SF)
    assert out.iloc[0].to_dict() == expect
    assert expect["n_classes_below_k"] > 0 and expect["n_classes_l1"] > 0
    assert expect["n_classes_below_k"] < expect["n_classes"]  # non-vacuous both ways

    with pytest.raises(ValueError, match="k must be"):
        scrub.k_anonymity_audit(SF, k=0)


def test_gdpr_cascade_matches_single_process_reference(ray_session):
    """gdpr_delete_cascade == pandas FK-chain reference; every deleted
    lineitem's order belongs to an erased customer and vice versa (the
    cascade is exactly the transitive closure); both arms live."""
    import pyarrow.parquet as pq

    cust = pq.read_table(f"{SF}/customer.parquet", columns=["c_custkey"]).to_pandas()
    orders = pq.read_table(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    ).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet", columns=["l_orderkey"]).to_pandas()
    dc = set(cust.c_custkey[cust.c_custkey % scrub.GDPR_DEL_MOD == 0])
    do = set(orders.o_orderkey[orders.o_custkey.isin(dc)])
    dl = int(li.l_orderkey.isin(do).sum())
    expect = {
        "n_del_customers": len(dc),
        "n_del_orders": len(do),
        "n_del_lineitems": dl,
        "n_keep_customers": len(cust) - len(dc),
        "n_keep_orders": len(orders) - len(do),
        "n_keep_lineitems": len(li) - dl,
    }

    out = scrub.gdpr_delete_cascade(SF)
    assert out.iloc[0].to_dict() == expect
    assert expect["n_del_lineitems"] > 0 and expect["n_keep_lineitems"] > 0


def test_dp_group_counts_noise_is_calibrated_laplace(ray_session):
    """dp_group_counts == exact counts + the seeded Laplace draw recomputed
    independently; noise must be nonzero (the mechanism is live) and eps
    must scale it inversely (twice the privacy budget -> half the noise)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq
    import pytest

    from paddle_ray.pipelines.scrub import dp_group_counts

    sf = "/root/testdata/sf0.001"
    langs = pq.read_table(f"{sf}/documents.parquet", columns=["lang"]).to_pandas()
    true = langs.groupby("lang").size()

    def draw(lang, eps):
        u = int(hashlib.md5(f"dp:{lang}".encode()).hexdigest()[:12], 16) / float(1 << 48) - 0.5
        return -(1.0 / eps) * np.sign(u) * np.log(1.0 - 2.0 * abs(u))

    for eps in (0.5, 1.0):
        out = dp_group_counts(sf, eps=eps)
        assert list(out.lang) == sorted(true.index)
        for lang, noisy in zip(out.lang, out.n_noisy):
            expect = round(true[lang] + draw(lang, eps), 6)
            assert noisy == pytest.approx(expect, abs=1e-6)
            assert noisy != true[lang]  # noise actually applied
    a = dp_group_counts(sf, eps=0.5)
    b = dp_group_counts(sf, eps=1.0)
    ratio = (a.n_noisy - true.loc[a.lang].to_numpy()) / (b.n_noisy - true.loc[b.lang].to_numpy())
    assert np.allclose(ratio, 2.0, atol=1e-6)
    with pytest.raises(ValueError):
        dp_group_counts(sf, eps=0.0)


def test_ray_entry_has_no_duplicate_dict_keys():
    """Regression guard for the k_anonymity_audit dup-key bug: a repeated
    key in queries()/oracle_sql() dict literals silently drops the earlier
    operator from the driver contract. Parse the module AST and assert
    every dict literal's constant keys are unique."""
    import ast

    src = open("/root/repo/__ray_entry__.py").read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys if isinstance(k, ast.Constant)]
            dupes = {k for k in keys if keys.count(k) > 1}
            assert not dupes, f"duplicate dict keys at line {node.lineno}: {dupes}"


def test_crawl_schedule_politeness_invariants(ray_session):
    """crawl_schedule == single-process timetable; the politeness bound
    holds (never more than `rate` fetches of one host in one second) and
    the makespan is exactly ceil(n_urls / rate)."""
    import numpy as np
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.scrub import CRAWL_RATE, crawl_schedule

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "source"]).to_pandas()
    ref = {}
    for src, g in t.groupby("source"):
        ids = np.sort(g.doc_id.to_numpy(dtype=np.int64))
        fetch_s = np.arange(len(ids)) // CRAWL_RATE
        counts = np.bincount(fetch_s)
        assert counts.max() <= CRAWL_RATE  # politeness bound by construction
        ref[src] = (len(ids), int(fetch_s.max()) + 1, int((ids * fetch_s).sum()))

    out = crawl_schedule(sf)
    assert list(out.source) == sorted(ref)
    for r in out.itertuples():
        assert (r.n_urls, r.makespan_s, r.sched_digest) == ref[r.source]
        assert r.makespan_s == -(-r.n_urls // CRAWL_RATE)


def test_encoding_audit_detector_is_a_real_scanner(ray_session):
    """The detector must be a genuine strict-UTF-8 scan, not a doc_id
    lookup: hand-made byte sequences classify correctly, the planted
    CESU-8 sequence genuinely fails decode at any insertion point, and
    the engine's per-source counts equal a single-process recount."""
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.scrub import (
        ENCODING_CORRUPT_MOD,
        _is_valid_utf8,
        _plant_corruption,
        encoding_audit,
    )

    assert _is_valid_utf8("héllo 世界".encode("utf-8"))
    assert not _is_valid_utf8(b"\xed\xa0\x80")          # CESU-8 surrogate
    assert not _is_valid_utf8(b"\xc0\xaf")              # overlong slash
    assert not _is_valid_utf8(b"abc\x80def")            # lone continuation
    assert not _is_valid_utf8("é".encode("utf-8")[:1])  # truncated seq
    for t in ["", "plain", "é" * 7, "世界abc"]:
        assert not _is_valid_utf8(_plant_corruption(t)), t

    import pandas as pd

    t = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    t["inv"] = (t.doc_id % ENCODING_CORRUPT_MOD == 0).astype(int)
    ref = (
        t.assign(dig=t.inv * ((t.doc_id * 31) % (1 << 31)))
        .groupby("source", as_index=False)
        .agg(n_docs=("doc_id", "size"), n_invalid=("inv", "sum"), invalid_digest=("dig", "sum"))
        .sort_values("source")
        .reset_index(drop=True)
    )
    out = encoding_audit("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict())[out.columns])
    assert out["n_invalid"].sum() > 0 and (out["n_invalid"] < out["n_docs"]).all()


def test_robots_filter_prefix_semantics(ray_session):
    """The match is a genuine PREFIX match: /p/1, /p/10 and /p/199 are
    blocked under Disallow '/p/1' but /p/2 and /p/21 are not; engine ==
    single-process reference on the real corpus."""
    import pandas as pd
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.scrub import robots_filter

    t = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id"]
    ).to_pandas()
    t["h"] = t.doc_id % 50
    t["path"] = "/p/" + (t.doc_id % 1000).astype(str)
    blocked = (
        ((t.h % 4 == 0) & t.path.str.startswith("/p/1"))
        | ((t.h % 4 == 1) & t.path.str.startswith("/p/"))
    ).astype(int)
    ref = (
        t.assign(blocked=blocked, dig=blocked * ((t.doc_id * 17) % (1 << 31)))
        .assign(host="site" + t.h.astype(str) + ".example.com")
        .groupby("host", as_index=False)
        .agg(n_urls=("doc_id", "size"), n_blocked=("blocked", "sum"), blocked_digest=("dig", "sum"))
        .sort_values("host")
        .reset_index(drop=True)
    )
    out = robots_filter("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict())[out.columns])
    # the rule is genuinely partial: some hosts block some-but-not-all
    partial_hosts = out[(out.n_blocked > 0) & (out.n_blocked < out.n_urls)]
    assert len(partial_hosts) > 0
    # full-block hosts (h%4==1) block everything
    full = out[out.host.str.extract(r"site(\d+)\.", expand=False).astype(int) % 4 == 1]
    assert (full.n_blocked == full.n_urls).all()


def test_unicode_nfc_audit_detector_is_a_real_normalizer(ray_session):
    """Detection must be a genuine NFC comparison: composed text passes,
    decomposed fails with the right delta; engine == single-process
    unicodedata recount including the non-planted docs."""
    import unicodedata

    import pandas as pd
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.scrub import (
        NFC_PLANT_MOD,
        _NFC_PLANT,
        unicode_nfc_audit,
    )

    assert unicodedata.normalize("NFC", _NFC_PLANT) != _NFC_PLANT
    assert len(unicodedata.normalize("NFC", _NFC_PLANT)) == len(_NFC_PLANT) - 1
    assert unicodedata.normalize("NFC", "café") == "café"  # composed passes

    t = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "text"]
    ).to_pandas()
    rows = []
    for r in t.itertuples():
        s = r.text + _NFC_PLANT if r.doc_id % NFC_PLANT_MOD == 0 else r.text
        ns = unicodedata.normalize("NFC", s)
        bad = int(ns != s)
        rows.append((r.lang, bad, (len(s) - len(ns)) if bad else 0,
                     bad * ((r.doc_id * 23) % (1 << 31))))
    ref = (
        pd.DataFrame(rows, columns=["lang", "n_non_nfc", "delta_chars", "nfc_digest"])
        .groupby("lang", as_index=False)
        .agg(n_docs=("n_non_nfc", "size"), n_non_nfc=("n_non_nfc", "sum"),
             delta_chars=("delta_chars", "sum"), nfc_digest=("nfc_digest", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    out = unicode_nfc_audit("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict())[out.columns])
    assert out["n_non_nfc"].sum() > 0 and (out["n_non_nfc"] < out["n_docs"]).all()


def test_frequent_line_filter_all_copies_removed(ray_session):
    """Policy check vs paragraph_dedup: the boilerplate variants occur
    >= FREQ_LINE_MIN times, so frequent-line removes EVERY copy (no doc
    keeps one) while paragraph_dedup keeps exactly the first; unique
    texts survive unless the text itself repeats >= threshold."""
    import hashlib

    import pandas as pd
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.scrub import (
        FREQ_LINE_MIN,
        _doc_paras,
        frequent_line_filter,
    )

    t = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    from collections import Counter

    freq = Counter()
    for r in t.itertuples():
        freq.update(_doc_paras(r.doc_id, r.text))
    ref = {}
    for r in t.itertuples():
        kept = [p for p in _doc_paras(r.doc_id, r.text) if freq[p] < FREQ_LINE_MIN]
        ref[r.doc_id] = (
            len(kept),
            hashlib.md5("\n\n".join(kept).encode()).hexdigest() if kept else None,
        )
    out = frequent_line_filter("/root/testdata/sf0.001")
    got = {r.doc_id: (r.n_kept, r.clean_md5) for r in out.itertuples()}
    assert got == ref
    # boilerplate always frequent -> every doc keeps at most its own text
    assert (out["n_kept"] <= 1).all()
    # and some text is itself corpus-frequent OR all texts unique: either
    # way the policy discriminates (not all docs identical outcome)
    assert out["n_kept"].sum() > 0


def test_dp_user_histogram_contribution_bounding(ray_session):
    """The bound genuinely bites (bounded counts < raw counts), noise is
    live and scales with cap/eps, engine == single-process reference,
    and eps/cap guards raise."""
    import hashlib

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as _pq
    import pytest

    from paddle_ray.pipelines.scrub import DP_EPS, DP_USER_CAP, dp_user_histogram

    t = _pq.read_table(
        "/root/testdata/sf0.001/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    ).to_pandas()
    t = t.sort_values(["user_id", "ts", "event_id"])
    t["rn"] = t.groupby("user_id").cumcount()
    bounded = t[t.rn < DP_USER_CAP].groupby("event_type").size()
    raw = t.groupby("event_type").size()
    assert (bounded < raw).all()  # bounding genuinely bites

    out = dp_user_histogram("/root/testdata/sf0.001").set_index("event_type")
    for et, n in bounded.items():
        u = int(hashlib.md5(f"dpu:{et}".encode()).hexdigest()[:12], 16) / float(1 << 48) - 0.5
        noise = -(DP_USER_CAP / DP_EPS) * np.sign(u) * np.log(1.0 - 2.0 * abs(u))
        assert abs(out.loc[et, "n_noisy"] - round(n + noise, 6)) < 2e-6
        assert abs(out.loc[et, "n_noisy"] - n) > 1e-6  # noise is live

    with pytest.raises(ValueError):
        dp_user_histogram("/root/testdata/sf0.001", eps=0)
    with pytest.raises(ValueError):
        dp_user_histogram("/root/testdata/sf0.001", cap=0)


def test_audit_panel_fusion_equals_individual_operators(ray_session):
    """The fused one-pass panel must reproduce encoding_audit's and
    unicode_nfc_audit's numbers exactly (scan sharing changes cost,
    never answers)."""
    import pandas as pd

    from paddle_ray.pipelines.scrub import (
        audit_panel_one_pass,
        encoding_audit,
        unicode_nfc_audit,
    )

    panel = audit_panel_one_pass("/root/testdata/sf0.001")
    inv = panel[panel.metric == "invalid_utf8"].set_index("key")["value"]
    nfc = panel[panel.metric == "non_nfc"].set_index("key")["value"]
    nd = panel[panel.metric == "n_docs"].set_index("key")["value"]

    # encoding_audit groups by SOURCE; re-derive per-lang from the corpus
    import pyarrow.parquet as _pq

    from paddle_ray.pipelines.scrub import ENCODING_CORRUPT_MOD, NFC_PLANT_MOD

    t = _pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang"]
    ).to_pandas()
    ref_inv = t[t.doc_id % ENCODING_CORRUPT_MOD == 0].groupby("lang").size()
    ref_nfc = t[t.doc_id % NFC_PLANT_MOD == 0].groupby("lang").size()
    pd.testing.assert_series_equal(inv.sort_index(), ref_inv.sort_index(),
                                   check_names=False, check_dtype=False)
    pd.testing.assert_series_equal(nfc.sort_index(), ref_nfc.sort_index(),
                                   check_names=False, check_dtype=False)
    assert (nd.sort_index() == t.groupby("lang").size().sort_index()).all()
    # totals reconcile with the standalone audits
    assert inv.sum() == encoding_audit("/root/testdata/sf0.001")["n_invalid"].sum()
    assert nfc.sum() == unicode_nfc_audit("/root/testdata/sf0.001")["n_non_nfc"].sum()
