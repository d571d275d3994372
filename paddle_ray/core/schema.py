"""Arrow schemas for every table the engine reads or writes (SURVEY.md §1.4)."""

from __future__ import annotations

import pyarrow as pa

# input: Common-Crawl-style pages (BASELINE.json input_hint — fixed shape)
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

BLOCK_TYPE = pa.struct(
    [
        ("label", pa.string()),
        ("bbox", pa.list_(pa.int32(), 4)),
        ("content", pa.string()),
        ("path", pa.string()),
    ]
)

# per-page raster dimensions (≙ dataInfo.pages, model.py:591-606)
PAGE_DIM_TYPE = pa.struct([("width", pa.int32()), ("height", pa.int32())])

# output: extracted documents (flattened InferResult analogue, model.py:536-552)
EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),
        ("blocks", pa.list_(BLOCK_TYPE)),
        ("markdown", pa.string()),
        # extracted image payloads keyed by their markdown ref name
        # (≙ markdown.images map<path -> b64>, model.py:541); payloads are
        # already capped to max_output_img_size (model.py:96-119 semantics)
        ("images", pa.map_(pa.string(), pa.binary())),
        # dataInfo envelope columns (model.py:591-606)
        ("num_pages", pa.int32()),
        ("page_dims", pa.list_(PAGE_DIM_TYPE)),
        ("doc_type", pa.string()),
        ("n_blocks", pa.int32()),
        ("n_bytes_in", pa.int64()),
        ("content_hash", pa.string()),
        ("partition_id", pa.int32()),
        ("error", pa.string()),  # 422-envelope analogue; null == success
    ]
)

# checkpoint manifest (FIXTURES.md §5)
MANIFEST_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("url_min", pa.string()),
        ("url_max", pa.string()),
        ("row_count", pa.int64()),
        # rolled-up sha256 over the url-ordered per-row content hashes —
        # manifests stay id-sized at any row count
        ("content_digest", pa.string()),
        ("status", pa.string()),
    ]
)

# per-stage/partition metrics row (status-heartbeat analogue, SURVEY.md §2.5)
METRICS_SCHEMA = pa.schema(
    [
        ("stage", pa.string()),
        ("partition_id", pa.int32()),
        ("rows", pa.int64()),
        ("bytes_in", pa.int64()),
        ("blocks", pa.int64()),
        ("errors", pa.int64()),
        ("captions", pa.int64()),  # A5 caption-merge count
        ("wall_s", pa.float64()),
    ]
)
