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
