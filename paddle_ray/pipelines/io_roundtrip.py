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

import pandas as pd

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
