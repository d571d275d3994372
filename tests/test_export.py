"""Exporter + extra-sink tests: doc tree, CSV/JSONL roundtrip."""

import os

from paddle_ray.pipelines.extract import extract_synth
from paddle_ray.sources.export import export_doc_tree, read_csv, read_jsonl, write_csv, write_jsonl


def test_export_doc_tree(tmp_path, ray_session):
    ds, expected = extract_synth(20, pdf_every=0, outlier_every=0)
    n = export_doc_tree(ds, str(tmp_path / "tree"))
    assert n == 20
    assert os.path.exists(tmp_path / "tree" / "index.md")
    # one dir per doc with doc.md + doc.txt matching the pipeline text
    urls = sorted(expected)
    some = urls[0]
    slug_dirs = [d for d in os.listdir(tmp_path / "tree") if d != "index.md"]
    assert len(slug_dirs) == 20
    found = [d for d in slug_dirs if some.replace("https://", "").split("/")[-1] in d]
    assert found
    with open(tmp_path / "tree" / found[0] / "doc.txt", encoding="utf-8") as f:
        assert f.read() == expected[some]


def test_csv_jsonl_roundtrip(tmp_path, ray_session):
    import ray.data as rd

    ds = rd.from_items([{"a": i, "b": f"s{i}"} for i in range(100)])
    write_csv(ds, str(tmp_path / "csv"))
    write_jsonl(ds, str(tmp_path / "jsonl"))
    back_csv = read_csv(str(tmp_path / "csv")).to_pandas().sort_values("a").reset_index(drop=True)
    back_jsonl = read_jsonl(str(tmp_path / "jsonl")).to_pandas().sort_values("a").reset_index(drop=True)
    assert list(back_csv.a) == list(range(100))
    assert list(back_jsonl.b) == [f"s{i}" for i in range(100)]
