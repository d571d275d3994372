"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side, compare row count, schema (column
names), and an order-insensitive value hash (columns sorted by name, rows
sorted, values stringified with float rounding).

Usage: python tools/check_oracles.py [--shard I/M] [sf_dir] [only_query ...]

--shard I/M (1-based I) keeps every M-th query starting at the I-th, so M
parallel gate processes cover the suite disjointly, e.g.
  for i in 1 2 3 4; do python tools/check_oracles.py --shard $i/4 & done; wait
(each process owns its own Ray session; run shards on a machine with the
CPU headroom for M x num_cpus=8).
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_df(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.datetime64):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.sha256(canon(df).to_csv(index=False).encode()).hexdigest()


def main():
    argv = sys.argv[1:]
    shard_i, shard_m = 1, 1
    if argv and argv[0] == "--shard":
        if len(argv) < 2 or "/" not in argv[1]:
            print("FAIL --shard needs I/M (e.g. --shard 2/4)")
            sys.exit(1)
        shard_i, shard_m = (int(x) for x in argv[1].split("/", 1))
        if not (1 <= shard_i <= shard_m):
            print(f"FAIL shard index {shard_i} out of range 1..{shard_m}")
            sys.exit(1)
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    # soft per-query wall-time budget: one slow query once blanked an
    # entire round's correctness artifact (dedup_clusters, 313 s at
    # sf0.001 -> driver gate timeout -> CORRECTNESS_r02.json = {}).
    # Anything over the budget is loudly flagged so it gets fixed before
    # the driver's gate ever sees it.
    import os

    soft_budget_s = float(os.environ.get("ORACLE_SOFT_BUDGET_S", "30"))
    slow: list[tuple[str, float]] = []
    unknown = only - set(qs)
    if unknown:
        # a typo'd filter must NOT produce a green "0 checks" run
        print(f"FAIL unknown query name(s): {sorted(unknown)}")
        n_fail += len(unknown)
    for qi, (name, fn) in enumerate(qs.items()):
        if shard_m > 1 and qi % shard_m != shard_i - 1:
            continue
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            mine = to_df(fn(sf_dir))
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if dt > soft_budget_s:
            slow.append((name, dt))
            print(f"WARN {name}: {dt:.1f}s exceeds the {soft_budget_s:.0f}s soft budget "
                  f"— fix before the driver's gate times out on it")
        if name not in oracles:
            print(f"rows-only {name}: {len(mine)} rows in {dt:.1f}s")
            n_rowsonly += 1
            continue
        try:
            ora = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        probs = []
        if len(mine) != len(ora):
            probs.append(f"rowcount {len(mine)} != {len(ora)}")
        if sorted(mine.columns) != sorted(ora.columns):
            probs.append(f"schema {sorted(mine.columns)} != {sorted(ora.columns)}")
        if not probs and value_hash(mine) != value_hash(ora):
            probs.append("value hash mismatch")
            a, b = canon(mine), canon(ora)
            neq = (a != b) & ~(a.isna() & b.isna())
            bad = neq.any(axis=1)
            if bad.any():
                i = bad.idxmax()
                probs.append(f"first diff row {i}: mine={a.loc[i].to_dict()} oracle={b.loc[i].to_dict()}")
        if probs:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(probs))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(mine)} rows in {dt:.1f}s")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rowsonly} rows-only, {n_fail} fail")
    if slow:
        print("over-budget queries: " + ", ".join(f"{n} ({t:.0f}s)" for n, t in slow))
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
