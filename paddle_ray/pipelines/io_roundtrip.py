"""Source/sink format coverage: JSONL and CSV write→read roundtrips.

The reference's only sinks are the doc.md tree + captions CSV
(`/root/reference/client/testScript.py:160-206`,
`imageCaptioningExperiments/blip/captions.csv`); a batch engine also
needs line-format interchange. These pipelines prove payload fidelity
through the format: write the table with Ray's sink, read it back with
Ray's source, and value-oracle the result as an identity against the
original parquet view — any quoting/escaping/dtype drift fails the
driver's hash check.

Scale contract: both write and read are per-block streaming (one file
per block, no driver materialization until the final sorted collect,
which the driver contract requires of every query anyway).
"""

from __future__ import annotations

import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.export import read_csv, read_jsonl, write_csv, write_jsonl
from .common import sized_read_parquet


def jsonl_roundtrip(sf_dir: str) -> pd.DataFrame:
    """documents -> write_jsonl -> read_json -> identity (oracled)."""
    out = tempfile.mkdtemp(prefix="pr_jsonl_")
    try:
        ds = sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        write_jsonl(ds, out)
        back = (
            read_jsonl(out)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)[["doc_id", "text", "lang"]]
        )
        return back.astype({"doc_id": "int64"})
    finally:
        shutil.rmtree(out, ignore_errors=True)


JSONL_ROUNDTRIP_SQL = """
SELECT doc_id, text, lang FROM documents ORDER BY doc_id
"""


def csv_roundtrip(sf_dir: str) -> pd.DataFrame:
    """orders -> write_csv -> read_csv -> identity (oracled; int, float
    and string columns prove quoting + numeric fidelity)."""
    out = tempfile.mkdtemp(prefix="pr_csv_")
    try:
        ds = sized_read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"],
        )
        write_csv(ds, out)
        back = (
            read_csv(out)
            .to_pandas()
            .sort_values("o_orderkey")
            .reset_index(drop=True)[
                ["o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"]
            ]
        )
        return back.astype({"o_orderkey": "int64", "o_totalprice": "float64"})
    finally:
        shutil.rmtree(out, ignore_errors=True)


CSV_ROUNDTRIP_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
FROM orders ORDER BY o_orderkey
"""


def partitioned_roundtrip(sf_dir: str, lang: str = "en") -> pd.DataFrame:
    """Hive-partitioned parquet write + PRUNED read-back — the storage
    layout a 100 TB corpus ships in: write documents partitioned by
    lang (write_parquet(partition_cols=...), one directory per value),
    then read back ONLY the requested partition by path (the read never
    opens the other partitions' files — partition pruning is the
    difference between scanning 1/5th and 5/5ths of a corpus every
    query) and roll it up. Oracled as the equivalent WHERE lang = ...
    aggregate over the source table, so any row loss / duplication /
    dtype drift through the partitioned layout fails the hash check.

    Scale contract: write and read are per-block streaming; the rollup
    is per-block integer partials. The partition column itself is
    encoded in the path (hive style), not the files — the read
    re-attaches it, and the oracle's value equality proves the
    round-trip of that encoding too."""
    import os

    import pyarrow as pa

    out = tempfile.mkdtemp(prefix="pr_hive_")
    try:
        ds = sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
        )
        ds.write_parquet(out, partition_cols=["lang"])
        part_dir = os.path.join(out, f"lang={lang}")
        if not os.path.isdir(part_dir):
            raise ValueError(f"no partition written for lang={lang!r}")
        import ray.data as rd

        back = rd.read_parquet(part_dir)

        def partial(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_docs": pa.array([len(ids)], pa.int64()),
                    "n_chars": pa.array(
                        [int(batch["n_chars"].to_numpy(zero_copy_only=False).sum())],
                        pa.int64(),
                    ),
                    "id_sum": pa.array([int(ids.sum())], pa.int64()),
                }
            )

        agg = back.map_batches(partial, batch_format="pyarrow", batch_size=None).to_pandas().sum()
        return pd.DataFrame(
            {
                "lang": [lang],
                "n_docs": pd.Series([int(agg.n_docs)], dtype="int64"),
                "n_chars": pd.Series([int(agg.n_chars)], dtype="int64"),
                "id_sum": pd.Series([int(agg.id_sum)], dtype="int64"),
            }
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


PARTITIONED_ROUNDTRIP_SQL = """
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM documents WHERE lang = 'en' GROUP BY lang
"""


def orc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """lineitem -> write_orc -> read_orc -> identity (oracled): ORC is
    the third interchange format next to CSV/JSONL, and the typed one —
    int64, double, VARCHAR and TIMESTAMP columns all cross the format,
    so any encoder/decoder dtype drift (the reason ORC exists over CSV)
    fails the value hash. Ray 2.49 ships no ORC connector; the sink is
    a per-block map_batches writer and the source a one-task-per-file
    reader over pyarrow.orc (sources/export.py) — both streaming, the
    driver only ever sees the #files-sized listing."""
    import pyarrow.orc  # noqa: F401 — fail loudly here if ORC is absent

    from ..sources.export import read_orc, write_orc

    out = tempfile.mkdtemp(prefix="pr_orc_")
    try:
        ds = sized_read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_orderkey",
                "l_linenumber",
                "l_extendedprice",
                "l_returnflag",
                "l_shipdate",
            ],
        )
        write_orc(ds, out)
        back = (
            read_orc(out)
            .to_pandas()
            .sort_values(["l_orderkey", "l_linenumber"])
            .reset_index(drop=True)[
                ["l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag", "l_shipdate"]
            ]
        )
        return back.astype(
            {
                "l_orderkey": "int64",
                "l_linenumber": "int64",
                "l_extendedprice": "float64",
                "l_returnflag": "str",
                "l_shipdate": "datetime64[us]",
            }
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


ORC_ROUNDTRIP_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_returnflag, l_shipdate
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


def schema_evolution_read(sf_dir: str) -> pd.DataFrame:
    """Mixed-schema parquet read — the lakehouse column-add case: an old
    writer produced files WITHOUT `lang`, a new writer adds it, and one
    read must span both generations (the situation every long-lived 100
    TB corpus directory is permanently in). Generation 1 (even doc_ids)
    is written without lang, generation 2 (odd) with it; the single
    directory read unifies the schemas (absent column -> null), the
    normalize stage makes the contract explicit (null lang ->
    '(none)'), and the rollup is value-oracled against the same
    derivation over the source table — any row loss, misalignment or
    type drift across the schema seam fails the hash.

    Scale contract: both writes and the read are per-block streaming;
    the rollup is per-block integer partials into a #langs-sized
    groupby."""
    import os

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    out = tempfile.mkdtemp(prefix="pr_evo_")
    try:
        src = sized_read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars", "lang"]
        )

        def gen1(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            t = batch.filter(pa.array(ids % 2 == 0))
            return t.select(["doc_id", "n_chars"])

        def gen2(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(ids % 2 == 1))

        os.makedirs(f"{out}/data")
        src.map_batches(gen1, batch_format="pyarrow").write_parquet(f"{out}/data")
        src.map_batches(gen2, batch_format="pyarrow").write_parquet(f"{out}/data")

        def rollup(batch: pa.Table) -> pa.Table:
            df = pd.DataFrame(
                {
                    "lang": batch["lang"].to_pylist() if "lang" in batch.column_names
                    else [None] * batch.num_rows,
                    "n_chars": batch["n_chars"].to_numpy(zero_copy_only=False),
                }
            )
            df["lang"] = df.lang.fillna("(none)")
            g = df.groupby("lang", as_index=False).agg(
                n_docs=("n_chars", "size"), n_chars=("n_chars", "sum")
            )
            return pa.Table.from_pandas(g, preserve_index=False)

        from ray.data.aggregate import Sum

        res = (
            rd.read_parquet(f"{out}/data")
            .map_batches(rollup, batch_format="pyarrow", batch_size=None)
            .groupby("lang")
            .aggregate(Sum("n_docs", alias_name="n_docs"), Sum("n_chars", alias_name="n_chars"))
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        return res.astype({"lang": "str", "n_docs": "int64", "n_chars": "int64"})
    finally:
        shutil.rmtree(out, ignore_errors=True)


SCHEMA_EVOLUTION_SQL = """
SELECT CASE WHEN doc_id % 2 = 1 THEN lang ELSE '(none)' END AS lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars
FROM documents GROUP BY 1 ORDER BY 1
"""


def arrow_ipc_roundtrip(sf_dir: str) -> pd.DataFrame:
    """lineitem -> write_arrow_ipc -> read_arrow_ipc -> identity
    (oracled): Arrow IPC / Feather v2 is the FOURTH interchange format
    next to CSV/JSONL/ORC and the zero-copy one — the on-disk bytes are
    the in-memory Arrow layout, so readers memory-map instead of
    decoding (what a pipeline spills between stages when parquet's
    encode tax outweighs compression). The same typed column set as
    orc_roundtrip crosses the format (int64 / double / varchar /
    timestamp), so dtype drift fails the value hash."""
    from ..sources.export import read_arrow_ipc, write_arrow_ipc

    out = tempfile.mkdtemp(prefix="pr_ipc_")
    try:
        ds = sized_read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"],
        )
        write_arrow_ipc(ds, out)
        back = (
            read_arrow_ipc(out)
            .to_pandas()
            .sort_values(["l_orderkey", "l_linenumber"])
            .reset_index(drop=True)[
                ["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"]
            ]
        )
        return back.astype(
            {
                "l_orderkey": "int64",
                "l_linenumber": "int64",
                "l_quantity": "float64",
                "l_returnflag": "str",
                "l_shipdate": "datetime64[us]",
            }
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


ARROW_IPC_ROUNDTRIP_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_shipdate
FROM lineitem ORDER BY l_orderkey, l_linenumber
"""


COMPACT_TARGET_BYTES = 1 << 20  # compaction bin size (1 MiB at test scale)


def compact_small_files(sf_dir: str) -> pd.DataFrame:
    """Small-file compaction — the lakehouse OPTIMIZE every long-lived
    corpus directory needs: streaming ingest leaves one file per block
    (here: documents re-written with tiny blocks to simulate a
    fragmented ingest), and the compactor bin-packs the #files-sized
    footer listing into ~COMPACT_TARGET_BYTES groups (first-fit over
    the name-sorted listing — deterministic), then rewrites each group
    as ONE file in ONE task. At 100 TB the plan is computed from
    footer metadata only (no data scan), each task's heap holds one
    bin, and the job is embarrassingly parallel over bins.

    Correctness surface: the post-compaction read must see exactly the
    pre-compaction rows — the per-lang (n_docs, sum_chars, id_digest)
    rollup is oracled against the source table directly, so a dropped,
    duplicated or truncated file breaks the value hash. The pytest
    additionally locks the file-count reduction and plan determinism."""
    import glob
    import os

    import ray.data as rd
    from ray.data.aggregate import Sum

    frag = tempfile.mkdtemp(prefix="pr_frag_")
    comp = tempfile.mkdtemp(prefix="pr_comp_")
    try:
        # fragmented ingest: many small files (tiny blocks)
        sized_read_parquet(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "lang", "n_chars"],
            override_num_blocks=64,
        ).write_parquet(frag)

        files = sorted(glob.glob(os.path.join(frag, "*.parquet")))
        sizes = {f: os.path.getsize(f) for f in files}
        bins: list[list[str]] = []
        cur: list[str] = []
        cur_b = 0
        for f in files:  # first-fit over the sorted listing
            if cur and cur_b + sizes[f] > COMPACT_TARGET_BYTES:
                bins.append(cur)
                cur, cur_b = [], 0
            cur.append(f)
            cur_b += sizes[f]
        if cur:
            bins.append(cur)

        def rewrite(batch: pd.DataFrame) -> pd.DataFrame:
            import pyarrow.parquet as _pq

            out_rows = []
            for i in batch["bin_id"]:
                group = bins[int(i)]
                t = pa.concat_tables([_pq.read_table(p) for p in group])
                _pq.write_table(t, os.path.join(comp, f"part-{int(i):05d}.parquet"))
                out_rows.append({"bin_id": int(i), "rows": t.num_rows})
            return pd.DataFrame(out_rows)

        (
            rd.from_items([{"bin_id": i} for i in range(len(bins))])
            .map_batches(rewrite, batch_format="pandas", batch_size=1)
            .materialize()
        )

        def rollup(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy()
            df = pd.DataFrame(
                {
                    "lang": batch["lang"].to_pylist(),
                    "n_docs": 1,
                    "sum_chars": batch["n_chars"].to_numpy(),
                    # order-independent id digest: sum of (id*2654435761 mod 2^31)
                    "id_digest": (ids * 2654435761) % (1 << 31),
                }
            )
            return pa.Table.from_pandas(
                df.groupby("lang", as_index=False).sum(), preserve_index=False
            )

        out = (
            rd.read_parquet(comp)
            .map_batches(rollup, batch_format="pyarrow", batch_size=None)
            .groupby("lang")
            .aggregate(
                Sum("n_docs", alias_name="n_docs"),
                Sum("sum_chars", alias_name="sum_chars"),
                Sum("id_digest", alias_name="id_digest"),
            )
            .to_pandas()
            .sort_values("lang")
            .reset_index(drop=True)
        )
        return out.astype(
            {"lang": "str", "n_docs": "int64", "sum_chars": "int64", "id_digest": "int64"}
        )
    finally:
        shutil.rmtree(frag, ignore_errors=True)
        shutil.rmtree(comp, ignore_errors=True)


COMPACT_SMALL_FILES_SQL = """
SELECT lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       CAST(SUM((doc_id * 2654435761) % 2147483648) AS BIGINT) AS id_digest
FROM documents GROUP BY lang ORDER BY lang
"""


ZONEMAP_LO = "1995-01-01"
ZONEMAP_HI = "1995-12-31"


def _zonemap_plan(data_dir: str, lo_us: int, hi_us: int, column: str):
    """Plan a pruned read from parquet FOOTER statistics only: returns
    (files_kept, files_total). Driver work is #files-sized — each footer
    read touches KBs, never data pages."""
    import glob
    import os

    import pyarrow.parquet as _pq

    files = sorted(glob.glob(os.path.join(data_dir, "*.parquet")))
    keep = []
    for f in files:
        md = _pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        idx = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            if idx is None:
                idx = next(
                    i for i in range(g.num_columns)
                    if g.column(i).path_in_schema == column
                )
            st = g.column(idx).statistics
            if st is None or not st.has_min_max:
                fmin = None  # stats missing -> cannot prune this file
                break
            mn = st.min.value if hasattr(st.min, "value") else st.min
            mx = st.max.value if hasattr(st.max, "value") else st.max
            mn_us = int(pd.Timestamp(mn).value // 1000)
            mx_us = int(pd.Timestamp(mx).value // 1000)
            fmin = mn_us if fmin is None else min(fmin, mn_us)
            fmax = mx_us if fmax is None else max(fmax, mx_us)
        if fmin is None or (fmin <= hi_us and fmax >= lo_us):
            keep.append(f)
    return keep, files


def zonemap_prune(sf_dir: str, *, prune: bool = True) -> pd.DataFrame:
    """Zone-map (min/max footer statistics) pruned read — the mechanism
    that makes a 100 TB range query touch GBs: orders are laid out
    range-clustered by o_orderdate (one distributed sort at write time),
    so each file's footer min/max covers a tight date slice, and a
    year-range revenue query plans from the #files-sized footer listing,
    reading ONLY overlapping files. Files without stats are kept
    (pruning must never be allowed to change answers — the pytest forces
    prune=True == prune=False to bit-equality and locks that files were
    GENUINELY skipped).

    The oracled surface is the query answer itself (per-status order
    count + exact int cents revenue in the range), so an over-eager
    prune that drops a boundary file breaks the value hash."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .common import to_cents

    lo_us = int(pd.Timestamp(ZONEMAP_LO).value // 1000)
    hi_us = int(pd.Timestamp(ZONEMAP_HI).value // 1000)
    lay = tempfile.mkdtemp(prefix="pr_zone_")
    try:
        (
            sized_read_parquet(
                f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"],
            )
            .sort("o_orderdate")
            .write_parquet(lay)
        )
        if prune:
            keep, _ = _zonemap_plan(lay, lo_us, hi_us, "o_orderdate")
        else:
            import glob
            import os

            keep = sorted(glob.glob(os.path.join(lay, "*.parquet")))

        def agg(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            d = pc.cast(batch["o_orderdate"], pa.int64()).to_numpy()
            m = (d >= lo_us) & (d <= hi_us)
            df = pd.DataFrame(
                {
                    "o_orderstatus": np.asarray(batch["o_orderstatus"].to_pylist(), dtype=object)[m],
                    "n_orders": 1,
                    "revenue_cents": to_cents(batch["o_totalprice"].to_numpy())[m],
                }
            )
            return pa.Table.from_pandas(
                df.groupby("o_orderstatus", as_index=False).sum(), preserve_index=False
            )

        out = (
            rd.read_parquet(keep)
            .map_batches(agg, batch_format="pyarrow", batch_size=None)
            .groupby("o_orderstatus")
            .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("revenue_cents", alias_name="revenue_cents"))
            .to_pandas()
            .sort_values("o_orderstatus")
            .reset_index(drop=True)
        )
        return out.astype(
            {"o_orderstatus": "str", "n_orders": "int64", "revenue_cents": "int64"}
        )
    finally:
        shutil.rmtree(lay, ignore_errors=True)


ZONEMAP_PRUNE_SQL = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '{ZONEMAP_LO}'
  AND o_orderdate <= TIMESTAMP '{ZONEMAP_HI}'
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def time_travel_read(sf_dir: str) -> pd.DataFrame:
    """Lakehouse time travel: reads are pinned to a MANIFEST VERSION,
    never to a directory listing — the mechanism that makes a 100 TB
    table safely readable while a commit is in flight and lets an audit
    re-run against last week's snapshot byte-for-byte. Version 1 is the
    ingested base (o_orderkey % 4 != 0, the ivm_delta_agg scenario);
    commit 2 applies the delta (insert key % 4 == 0, retract base keys
    % 9 == 0) by writing NEW data files plus manifest v2 — v1's files
    are immutable, so AS-OF-v1 reads reproduce the pre-commit table
    exactly (the pytest locks both immutability and read stability
    across the commit).

    Output: per-version per-status rollup (version, status, n_orders,
    revenue_cents), each arm oracled by its derivation over the source
    table. Data files write/read per-block streaming; the manifest is
    a #files-sized JSON the driver owns (exactly the checkpoint
    contract in state/checkpoint.py)."""
    import glob
    import json
    import os

    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .common import to_cents

    root = tempfile.mkdtemp(prefix="pr_tt_")
    try:
        src = sized_read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
        )

        def commit(version: int, keep_fn) -> None:
            """Write the version's rows as new files + a manifest."""
            vdir = os.path.join(root, f"data_v{version}")

            def filt(batch: pa.Table) -> pa.Table:
                k = batch["o_orderkey"].to_numpy()
                return batch.filter(pa.array(keep_fn(k)))

            src.map_batches(filt, batch_format="pyarrow", batch_size=None).write_parquet(vdir)
            files = sorted(glob.glob(os.path.join(vdir, "*.parquet")))
            with open(os.path.join(root, f"manifest_v{version}.json"), "w") as f:
                json.dump({"version": version, "files": files}, f)

        base_m = lambda k: k % 4 != 0  # noqa: E731
        commit(1, base_m)
        commit(2, lambda k: (k % 4 == 0) | ((k % 4 != 0) & (k % 9 != 0)))

        def read_version(version: int):
            with open(os.path.join(root, f"manifest_v{version}.json")) as f:
                manifest = json.load(f)
            return rd.read_parquet(manifest["files"])

        def rollup(version: int) -> pd.DataFrame:
            def partial(batch: pa.Table) -> pa.Table:
                df = pd.DataFrame(
                    {
                        "o_orderstatus": batch["o_orderstatus"].to_pylist(),
                        "n_orders": 1,
                        "revenue_cents": to_cents(batch["o_totalprice"].to_numpy()),
                    }
                )
                return pa.Table.from_pandas(
                    df.groupby("o_orderstatus", as_index=False).sum(), preserve_index=False
                )

            out = (
                read_version(version)
                .map_batches(partial, batch_format="pyarrow", batch_size=None)
                .groupby("o_orderstatus")
                .aggregate(Sum("n_orders", alias_name="n_orders"), Sum("revenue_cents", alias_name="revenue_cents"))
                .to_pandas()
            )
            out.insert(0, "version", version)
            return out

        out = (
            pd.concat([rollup(1), rollup(2)], ignore_index=True)
            .sort_values(["version", "o_orderstatus"])
            .reset_index(drop=True)
        )
        return out.astype(
            {"version": "int64", "o_orderstatus": "str", "n_orders": "int64", "revenue_cents": "int64"}
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


TIME_TRAVEL_SQL = """
SELECT 1 AS version, o_orderstatus, COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders WHERE o_orderkey % 4 != 0
GROUP BY o_orderstatus
UNION ALL
SELECT 2, o_orderstatus, COUNT(*),
       CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
FROM orders WHERE (o_orderkey % 4 = 0) OR (o_orderkey % 4 != 0 AND o_orderkey % 9 != 0)
GROUP BY o_orderstatus
ORDER BY version, o_orderstatus
"""
