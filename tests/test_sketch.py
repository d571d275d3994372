"""HyperLogLog sketch accuracy + mergeability tests."""

import numpy as np

from paddle_ray.functions.sketch import (
    HLL_M,
    hash64_ints,
    hash64_strings,
    hll_estimate,
    hll_merge,
    hll_partial,
)
from paddle_ray.pipelines import analysis, events

SF = "/root/testdata/sf0.001"


def test_hll_accuracy_across_cardinalities():
    rng = np.random.default_rng(7)
    for true_n in (50, 1000, 50_000):
        vals = rng.choice(10 * true_n, size=true_n, replace=False)
        est = hll_estimate(hll_partial(hash64_ints(vals)))
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    vals = np.arange(20_000, dtype=np.int64)
    h = hash64_ints(vals)
    whole = hll_partial(h)
    parts = np.stack([hll_partial(h[i::4]) for i in range(4)])
    assert (hll_merge(parts) == whole).all()


def test_hll_string_hash_stable_and_spread():
    h1 = hash64_strings(["abc", "abd", ""])
    h2 = hash64_strings(["abc", "abd", ""])
    assert (h1 == h2).all() and len(set(h1.tolist())) == 3


def test_hll_register_shape():
    regs = hll_partial(hash64_ints(np.arange(10)))
    assert regs.shape == (HLL_M,) and regs.dtype == np.uint8


def test_hll_pipeline_close_to_exact(ray_session):
    approx = analysis.hll_distinct_users(SF)
    exact = events.events_distinct_users(SF)
    m = approx.merge(exact, on="event_type")
    rel = (m.approx_users - m.n_users).abs() / m.n_users
    assert (rel < 0.03).all(), m


def test_hist_quantile_accuracy_vs_exact():
    import numpy as np

    from paddle_ray.functions.sketch import hist_partial, hist_quantile

    rng = np.random.default_rng(7)
    # lognormal lengths spanning the interesting range
    vals = np.exp(rng.normal(5.5, 1.2, size=20000)).astype(np.int64) + 1
    merged = hist_partial(vals[:7000]) + hist_partial(vals[7000:15000]) + hist_partial(vals[15000:])
    for q in (0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        approx = hist_quantile(merged, q)
        assert abs(approx - exact) / exact < 0.08, (q, exact, approx)


def test_approx_quantile_chars_pipeline(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.analysis import approx_quantile_chars

    out = approx_quantile_chars("/root/testdata/sf0.001").set_index("lang")
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet").to_pandas()
    for lang, g in docs.groupby("lang"):
        exact = float(np.quantile(g.n_chars, 0.5))
        assert abs(out.loc[lang, "p50_approx"] - exact) / exact < 0.08


def test_mg_heavy_hitters_bound_and_topk():
    import numpy as np

    from paddle_ray.functions.sketch import mg_merge, mg_partial

    rng = np.random.default_rng(11)
    # zipf-ish stream: a few heavy users over a long tail
    stream = np.concatenate(
        [np.full(1200, 1), np.full(900, 2), np.full(700, 3),
         rng.integers(100, 5000, size=8000)]
    )
    rng.shuffle(stream)
    C = 100
    parts = [mg_partial(stream[i : i + 500].tolist(), C) for i in range(0, len(stream), 500)]
    summed: dict = {}
    for p in parts:
        for k, v in p.items():
            summed[k] = summed.get(k, 0) + v
    merged = mg_merge([summed], C)
    n = len(stream)
    from collections import Counter

    exact = Counter(stream.tolist())
    # undercount bound: est <= true, true - est <= N/(C+1)
    for u, est in merged.items():
        assert est <= exact[u]
        assert exact[u] - est <= n / (C + 1) + 1e-9
    # heavy users (count >> N/(C+1) ~ 107) must survive with top ranks
    top3 = sorted(merged, key=lambda u: -merged[u])[:3]
    assert set(top3) == {1, 2, 3}


def test_events_heavy_hitters_matches_exact_topk(ray_session):
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.events import events_heavy_hitters

    out = events_heavy_hitters("/root/testdata/sf0.001", k=5, capacity=200)
    ev = pq.read_table("/root/testdata/sf0.001/events.parquet").to_pandas()
    exact = ev.user_id.value_counts()
    # with capacity >> distinct users the sketch is exact
    for u, c in zip(out.user_id, out.approx_count):
        assert exact[u] == c
    assert list(out.user_id) == list(
        exact.reset_index().sort_values(["count", "user_id"], ascending=[False, True]).user_id.head(5)
    )


def test_bloom_no_false_negatives_and_fp_bound():
    import numpy as np

    from paddle_ray.functions.sketch import bloom_contains, bloom_merge, bloom_partial

    rng = np.random.default_rng(3)
    keys = rng.choice(10_000_000, size=10_000, replace=False).astype(np.int64)
    m = 1 << 17  # ~13 bits/key
    parts = np.stack(
        [bloom_partial(keys[i : i + 2500], m) for i in range(0, len(keys), 2500)]
    )
    merged = bloom_merge(parts)
    # every inserted key MUST test positive (prefilters may never drop a match)
    assert bloom_contains(merged, keys).all()
    # false-positive rate on disjoint probes stays near theory (~0.2% here)
    probes = np.arange(20_000_000, 20_050_000, dtype=np.int64)
    fp = bloom_contains(merged, probes).mean()
    assert fp < 0.02, fp


def test_bloom_prejoin_matches_plain_join(ray_session):
    import duckdb

    from paddle_ray.pipelines.joins import URGENT_REVENUE_SQL, urgent_revenue_bloom

    out = urgent_revenue_bloom("/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('/root/testdata/sf0.001/{t}.parquet')"
        )
    ora = con.sql(URGENT_REVENUE_SQL).df()
    assert out.n_orders.iloc[0] == ora.n_orders.iloc[0]
    assert abs(out.revenue.iloc[0] - ora.revenue.iloc[0]) < 1e-6


def test_countmin_overestimates_and_matches_reference(ray_session):
    """CM invariants: est >= true for EVERY query user (the one-sided
    sketch guarantee), est == single-process reference sketch, and the
    register fold is block-size-invariant by construction (exercised by
    the distributed run against the sequential reference)."""
    import hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from paddle_ray.pipelines import events as ev

    u = pq.read_table(f"{SF}/events.parquet", columns=["user_id"])["user_id"].to_numpy(
        zero_copy_only=False
    ).astype(np.int64)
    d, w = ev.CM_DEPTH, ev.CM_WIDTH
    regs = np.zeros((d, w), dtype=np.int64)
    uniq, cnt = np.unique(u, return_counts=True)
    for j in range(d):
        for x, c in zip(uniq, cnt):
            regs[j, int(hashlib.md5(f"cm{j}:{x}".encode()).hexdigest()[:8], 16) % w] += c

    out = ev.countmin_user_counts(SF)
    assert len(out), "query slice must be non-empty"
    for r in out.itertuples():
        true = int(cnt[uniq == r.user_id][0])
        est = min(
            regs[j, int(hashlib.md5(f"cm{j}:{r.user_id}".encode()).hexdigest()[:8], 16) % w]
            for j in range(d)
        )
        assert r.true_count == true
        assert r.est_count == est
        assert r.est_count >= r.true_count  # one-sided CM guarantee
