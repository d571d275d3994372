"""JSONL/CSV roundtrips under adversarial payloads the ASCII test corpus
never produces (quotes, commas, newlines, unicode)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from paddle_ray.pipelines import io_roundtrip

SF = "/root/testdata/sf0.001"


def test_jsonl_roundtrip_identity_sf():
    out = io_roundtrip.jsonl_roundtrip(SF)
    src = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    src = src.sort_values("doc_id").reset_index(drop=True)
    assert list(out.doc_id) == list(src.doc_id)
    assert list(out.text) == list(src.text)


def test_jsonl_adversarial_payloads(tmp_path):
    rows = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ['he said "hi", twice', "line\nbreak\ttab", "café 中文"],
            "lang": ["en", "en", "zh"],
        }
    )
    rows["source"] = "s"
    rows["n_chars"] = rows.text.str.len()
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), tmp_path / "documents.parquet")
    out = io_roundtrip.jsonl_roundtrip(str(tmp_path))
    assert list(out.text) == list(rows.text)


def test_csv_adversarial_payloads(tmp_path):
    rows = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_orderstatus": ['quote"inside', "comma,inside", "plain"],
            "o_orderpriority": ["1-URGENT", "5-LOW", "2-HIGH"],
            "o_totalprice": [1.5, -2.25, 1e7],
            "o_custkey": [1, 1, 1],
        }
    )
    rows["o_orderdate"] = pd.Timestamp("1996-01-01")
    pq.write_table(pa.Table.from_pandas(rows, preserve_index=False), tmp_path / "orders.parquet")
    out = io_roundtrip.csv_roundtrip(str(tmp_path))
    assert list(out.o_orderstatus) == list(rows.o_orderstatus)
    assert list(out.o_totalprice) == list(rows.o_totalprice)


def test_partitioned_roundtrip_prunes_and_preserves(ray_session):
    """The hive-partitioned roundtrip preserves the partition's exact
    row set (count/chars/id-sum fingerprint vs DuckDB), every lang gets
    its own partition directory, and a missing partition fails loudly."""
    import duckdb
    import pytest

    from paddle_ray.pipelines.io_roundtrip import partitioned_roundtrip

    sf = "/root/testdata/sf0.001"
    for lang in ("en", "zh"):
        out = partitioned_roundtrip(sf, lang=lang)
        exp = duckdb.sql(
            f"""SELECT COUNT(*) AS n, SUM(n_chars) AS c, SUM(doc_id) AS s
                FROM read_parquet('{sf}/documents.parquet') WHERE lang = '{lang}'"""
        ).fetchone()
        assert (out.n_docs[0], out.n_chars[0], out.id_sum[0]) == (
            int(exp[0]), int(exp[1]), int(exp[2])
        )
    with pytest.raises(ValueError, match="no partition"):
        partitioned_roundtrip(sf, lang="xx-missing")


def test_orc_roundtrip_preserves_types_and_rows(ray_session):
    """ORC identity: row count, dtypes (incl. timestamp) and exact values
    survive the per-block sink + per-file source; empty dir fails loudly."""
    import pandas as pd
    import pyarrow.parquet as pq
    import pytest

    from paddle_ray.pipelines.io_roundtrip import orc_roundtrip
    from paddle_ray.sources.export import read_orc

    sf = "/root/testdata/sf0.001"
    out = orc_roundtrip(sf)
    src = pq.read_table(
        f"{sf}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_returnflag", "l_shipdate"],
    ).to_pandas()
    assert len(out) == len(src)
    assert str(out.l_shipdate.dtype).startswith("datetime64")
    # (l_orderkey, l_linenumber) is NOT unique in this corpus (1401 dup
    # pairs at sf0.001), so compare under a TOTAL order over all columns
    # — the same canonicalization the driver gate applies
    cols = list(out.columns)
    a = out.sort_values(cols).reset_index(drop=True)
    b = src.astype(out.dtypes.to_dict()).sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    with pytest.raises(FileNotFoundError):
        read_orc("/tmp/definitely_missing_orc_dir_xyz")


def test_schema_evolution_read_null_fills_old_generation(ray_session):
    """The old generation's missing column arrives as null and is
    normalized to '(none)'; the two generations together cover every
    source row exactly once."""
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.io_roundtrip import schema_evolution_read

    sf = "/root/testdata/sf0.001"
    out = schema_evolution_read(sf)
    src = pq.read_table(f"{sf}/documents.parquet", columns=["doc_id", "n_chars", "lang"]).to_pandas()
    assert out.n_docs.sum() == len(src)
    assert out.n_chars.sum() == src.n_chars.sum()
    none_row = out[out.lang == "(none)"]
    assert len(none_row) == 1
    assert int(none_row.n_docs.iloc[0]) == int((src.doc_id % 2 == 0).sum())
    # real langs only come from the new generation (odd ids)
    odd = src[src.doc_id % 2 == 1]
    got_langs = set(out.lang) - {"(none)"}
    assert got_langs == set(odd.lang)


def test_arrow_ipc_roundtrip_types_and_total_order(ray_session):
    """Dtypes (incl. timestamp) survive the IPC format; rows compared
    under a TOTAL order (orderkey,linenumber is not unique — the
    orc_roundtrip lesson); loud failure on an empty dir."""
    import pytest

    from paddle_ray.pipelines.io_roundtrip import arrow_ipc_roundtrip
    from paddle_ray.sources.export import read_arrow_ipc

    out = arrow_ipc_roundtrip("/root/testdata/sf0.001")
    src = pq.read_table(
        "/root/testdata/sf0.001/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_shipdate"],
    ).to_pandas()
    cols = list(src.columns)
    a = out.sort_values(cols).reset_index(drop=True)
    b = src.sort_values(cols).reset_index(drop=True).astype(out.dtypes.to_dict())
    pd.testing.assert_frame_equal(a, b[a.columns])
    assert str(out["l_shipdate"].dtype).startswith("datetime64")

    with pytest.raises(FileNotFoundError):
        read_arrow_ipc("/tmp/definitely_missing_ipc_dir")


def test_compact_small_files_reduces_count_preserves_rows(ray_session, monkeypatch, tmp_path):
    """The compactor must genuinely reduce file count (bin-packing is
    live) while the rollup equals a direct source rollup."""
    import glob
    import os
    import shutil as _sh

    from paddle_ray.pipelines import io_roundtrip as io_rt

    seen = {}
    orig_mkdtemp = io_rt.tempfile.mkdtemp

    def spy_mkdtemp(prefix=""):
        d = orig_mkdtemp(prefix=prefix)
        seen[prefix] = seen.get(prefix, [])
        seen[prefix].append(d)
        return d

    counts = {}
    orig_rmtree = io_rt.shutil.rmtree

    def spy_rmtree(path, ignore_errors=False):
        counts[path] = len(glob.glob(os.path.join(path, "*.parquet")))
        return orig_rmtree(path, ignore_errors=ignore_errors)

    monkeypatch.setattr(io_rt.tempfile, "mkdtemp", spy_mkdtemp)
    monkeypatch.setattr(io_rt.shutil, "rmtree", spy_rmtree)
    out = io_rt.compact_small_files("/root/testdata/sf0.001")

    frag_dir = seen["pr_frag_"][0]
    comp_dir = seen["pr_comp_"][0]
    assert counts[comp_dir] >= 1
    assert counts[comp_dir] < counts[frag_dir], (counts[comp_dir], counts[frag_dir])

    src = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    ).to_pandas()
    ref = (
        src.assign(id_digest=(src.doc_id * 2654435761) % (1 << 31))
        .groupby("lang", as_index=False)
        .agg(n_docs=("doc_id", "size"), sum_chars=("n_chars", "sum"), id_digest=("id_digest", "sum"))
        .sort_values("lang")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, ref.astype(out.dtypes.to_dict())[out.columns])


def test_zonemap_prune_skips_files_and_answers_identically(ray_session, monkeypatch):
    """Pruning must be invisible in the answer (prune=True == prune=False
    bit-equal) while genuinely skipping files on the range-clustered
    layout."""
    from paddle_ray.pipelines import io_roundtrip as io_rt

    plans = []
    orig = io_rt._zonemap_plan

    def spy(data_dir, lo, hi, col):
        keep, files = orig(data_dir, lo, hi, col)
        plans.append((len(keep), len(files)))
        return keep, files

    monkeypatch.setattr(io_rt, "_zonemap_plan", spy)
    pruned = io_rt.zonemap_prune("/root/testdata/sf0.001", prune=True)
    full = io_rt.zonemap_prune("/root/testdata/sf0.001", prune=False)
    pd.testing.assert_frame_equal(pruned, full)
    n_keep, n_total = plans[0]
    assert n_total > 1, "layout produced a single file — pruning untestable"
    assert n_keep < n_total, f"zone maps pruned nothing ({n_keep}/{n_total})"


def test_time_travel_v1_read_stable_across_commit(ray_session, monkeypatch):
    """AS-OF-v1 must reproduce the pre-commit table byte-for-byte after
    commit 2 (file immutability + manifest pinning), and the two
    versions genuinely differ."""
    import glob
    import hashlib
    import os

    from paddle_ray.pipelines import io_roundtrip as io_rt

    state = {}
    orig = io_rt.tempfile.mkdtemp

    def spy(prefix=""):
        d = orig(prefix=prefix)
        if prefix == "pr_tt_":
            state["root"] = d
        return d

    # freeze rmtree so we can inspect, then clean up ourselves
    monkeypatch.setattr(io_rt.tempfile, "mkdtemp", spy)
    monkeypatch.setattr(io_rt.shutil, "rmtree", lambda *a, **k: None)
    try:
        out = io_rt.time_travel_read("/root/testdata/sf0.001")
        root = state["root"]
        v1_files = sorted(glob.glob(os.path.join(root, "data_v1", "*.parquet")))
        assert v1_files
        digests = {f: hashlib.md5(open(f, "rb").read()).hexdigest() for f in v1_files}
        # v2 commit wrote its own files; v1's are untouched
        assert all(os.path.exists(f) for f in v1_files)
        assert {hashlib.md5(open(f, "rb").read()).hexdigest() for f in v1_files} == set(
            digests.values()
        )
        v1 = out[out.version == 1].set_index("o_orderstatus")
        v2 = out[out.version == 2].set_index("o_orderstatus")
        assert not v1["n_orders"].equals(v2["n_orders"])  # the commit changed the table
        assert (v1["n_orders"] > 0).all() and (v2["n_orders"] > 0).all()
    finally:
        import shutil as _sh

        if "root" in state:
            _sh.rmtree(state["root"], ignore_errors=True)
