"""End-to-end flagship pipeline tests (golden roundtrip, pdf path, captions,
checkpointed write + resume, determinism across parallelism)."""

import glob
import json
import os
import shutil

import pytest

from paddle_ray.core.config import ExtractConfig
from paddle_ray.pipelines.extract import extract_pipeline, extract_synth
from paddle_ray.sources.pages import pages_from_documents, synth_pages
from paddle_ray.state import checkpoint as ckpt

SF = "/root/testdata/sf0.001"


def test_documents_roundtrip_byte_identical():
    """North-rule contract: extracted text byte-identical per url vs ground
    truth, through the full boilerplate shell + Ray pipeline."""
    ds = extract_pipeline(pages_from_documents(SF))
    df = ds.to_pandas()
    import pyarrow.parquet as pq

    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    truth = {f"https://fixtures.local/doc/{r.doc_id}": r.text for r in docs.itertuples()}
    assert len(df) == len(truth)
    for url, text in zip(df.url, df.extracted_text):
        assert text == truth[url], f"byte mismatch for {url}"
    assert df.error.isna().all()


def test_synth_full_grammar_roundtrip():
    ds, expected = extract_synth(120, pdf_every=10, outlier_every=0)
    df = ds.to_pandas()
    assert len(df) == 120
    for url, text in zip(df.url, df.extracted_text):
        assert text == expected[url], f"mismatch for {url}"
    # pdf docs got page separators
    assert (df.extracted_text.str.startswith("=== PAGE 1 ===")).sum() == 12


def test_output_sorted_and_hashed():
    ds, _ = extract_synth(60, pdf_every=0, outlier_every=0)
    df = ds.to_pandas()
    assert list(df.url) == sorted(df.url)
    import hashlib

    for t, h in zip(df.extracted_text, df.content_hash):
        assert hashlib.sha256(t.encode()).hexdigest() == h


def test_captions_merged_into_image_blocks():
    cfg = ExtractConfig(captioning_enabled=True)
    ds, _ = extract_synth(30, cfg=cfg, pdf_every=0, outlier_every=0)
    df = ds.to_pandas()
    captioned = uncaptioned_small = 0
    for blocks in df.blocks:
        for b in blocks:
            if b["label"] != "image":
                continue
            w = b["bbox"][2] - b["bbox"][0]
            h = b["bbox"][3] - b["bbox"][1]
            extra = len(b["content"].split()) > 3
            if w >= 100 and h >= 100 and w * h >= 10_000:
                captioned += extra
            else:
                uncaptioned_small += not extra
    assert captioned > 0  # size-gate-passing images got captions
    # captions are deterministic: run again, same result
    ds2, _ = extract_synth(30, cfg=cfg, pdf_every=0, outlier_every=0)
    assert ds.to_pandas().blocks.apply(str).tolist() == ds2.to_pandas().blocks.apply(str).tolist()


def test_captioning_disabled():
    cfg = ExtractConfig(captioning_enabled=False)
    ds, expected = extract_synth(20, cfg=cfg, pdf_every=0, outlier_every=0)
    df = ds.to_pandas()
    for url, text in zip(df.url, df.extracted_text):
        assert text == expected[url]


def test_error_rows_kept_not_dropped():
    import pyarrow as pa

    from paddle_ray.core.schema import PAGES_SCHEMA

    # a pdf-magic payload with undecodable body -> zero pages -> error row
    import datetime

    t = pa.table(
        {
            "url": ["https://x/bad", "https://x/good"],
            "warc_ts": [datetime.datetime(2025, 1, 1)] * 2,
            "html": [b"%PDF-\nnot json at all", b"<main><p>fine</p></main>"],
            "text": ["", "fine"],
            "lang": ["en", "en"],
        },
        schema=PAGES_SCHEMA,
    )
    df = extract_pipeline(t).to_pandas()
    assert len(df) == 2
    bad = df[df.url == "https://x/bad"].iloc[0]
    assert bad.error and "no pages" in bad.error
    good = df[df.url == "https://x/good"].iloc[0]
    assert good.extracted_text == "fine" and good.error is None


def test_checkpointed_write_and_resume(tmp_path):
    out = str(tmp_path / "out")
    pages, expected = synth_pages(100, pdf_every=10, outlier_every=0)
    man = extract_pipeline(pages, out_dir=out).to_pandas()
    assert man.row_count.sum() == 100
    n_parts = len(man)
    assert len(glob.glob(f"{out}/_manifests/partition-*.json")) == n_parts

    # simulate partial failure: delete 2 partitions' data+manifest
    victims = sorted(man.partition_id)[:2]
    lost_rows = int(man[man.partition_id.isin(victims)].row_count.sum())
    for pid in victims:
        shutil.rmtree(f"{out}/part-{pid:05d}")
        os.remove(ckpt.manifest_path(out, pid))
    # torn manifest for a third partition (no data loss) must NOT be skipped...
    # actually a torn manifest means incomplete: remove manifest only
    third = sorted(man.partition_id)[2]
    os.remove(ckpt.manifest_path(out, third))

    man2 = extract_pipeline(pages, out_dir=out).to_pandas()
    # only the 3 incomplete partitions recomputed
    assert sorted(man2.partition_id) == sorted(victims + [third])

    # final output identical to expected, nothing missing or duplicated
    final = ckpt.read_output(out).to_pandas()
    assert len(final) == 100
    assert lost_rows > 0
    for url, text in zip(final.url, final.extracted_text):
        assert text == expected[url]


def test_determinism_across_parallelism():
    """Same input, different block structure -> byte-identical sorted output."""
    pages, _ = synth_pages(80, pdf_every=8, outlier_every=0)
    import ray.data as rd

    a = extract_pipeline(rd.from_arrow(pages).repartition(2)).to_pandas()
    b = extract_pipeline(rd.from_arrow(pages).repartition(13)).to_pandas()
    assert a.url.tolist() == b.url.tolist()
    assert a.extracted_text.tolist() == b.extracted_text.tolist()
    assert a.content_hash.tolist() == b.content_hash.tolist()


def test_skew_outliers_get_dedicated_partitions():
    cfg = ExtractConfig()
    pages, _ = synth_pages(250, pdf_every=0, outlier_every=200)
    ds = extract_pipeline(pages, cfg=cfg)
    df = ds.to_pandas()
    big = df[df.n_bytes_in > cfg.outlier_bytes]
    assert len(big) >= 1
    assert (big.partition_id >= cfg.n_partitions).all()
    small = df[df.n_bytes_in <= cfg.outlier_bytes]
    assert (small.partition_id < cfg.n_partitions).all()


def test_single_document_request_api():
    """Request/response parity surface (paddle_ray/api.py): same kernels,
    no Ray session, reference-shaped envelope."""
    from paddle_ray.api import extract_document_request
    from paddle_ray.sources.pages import synth_pages

    pages, expected = synth_pages(5, pdf_every=0, outlier_every=0)
    url = pages["url"][0].as_py()
    payload = pages["html"][0].as_py()
    resp = extract_document_request(payload)
    assert resp["errorCode"] == 0
    assert resp["result"]["contentType"] == "html"
    assert resp["result"]["extractedText"] == expected[url]

    bad = extract_document_request(b"%PDF-garbage")
    assert bad["errorCode"] == 422 and bad["result"] is None


def test_deep_verify_detects_tampering(tmp_path):
    """verify_output: clean checkpoint passes; a tampered partition's
    recomputed hashes mismatch its manifest."""
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.extract import extract_pipeline
    from paddle_ray.sources.pages import synth_pages
    from paddle_ray.state.checkpoint import verify_output

    pages, _ = synth_pages(60, pdf_every=0, outlier_every=0)
    out_dir = str(tmp_path / "out")
    extract_pipeline(pages, out_dir=out_dir, resume=False).materialize()
    ok, bad = verify_output(out_dir)
    assert ok and not bad

    victim = sorted(ok)[0]
    data_path = f"{out_dir}/part-{victim:05d}/data.parquet"
    t = pq.read_table(data_path)
    texts = t["extracted_text"].to_pylist()
    texts[0] = texts[0] + " TAMPERED"
    import pyarrow as pa

    t = t.set_column(
        t.schema.get_field_index("extracted_text"), "extracted_text", pa.array(texts)
    )
    pq.write_table(t, data_path)
    ok2, bad2 = verify_output(out_dir)
    assert bad2 == [victim] and victim not in ok2


def test_malformed_bbox_never_poisons_batch(ray_session):
    """A pdf payload with a short bbox list must become an error-free row
    (bbox padded to 4), or at worst an error row — never an Arrow
    conversion crash that kills the whole batch (review regression)."""
    import json

    import pyarrow as pa
    import ray.data as rd

    from paddle_ray.pipelines.extract import extract_pipeline

    body = json.dumps({"pages": [[{"label": "text", "bbox": [1, 2], "content": "hi"}]]})
    payload = b"%PDF-FAKE\n" + body.encode()
    good = b"<html><body><main><p>fine</p></main></body></html>"
    t = pa.table(
        {
            "url": ["https://a.example/bad", "https://a.example/good"],
            "warc_ts": pa.array([0, 0], pa.timestamp("us")),
            "html": [payload, good],
            "text": ["", ""],
            "lang": ["en", "en"],
        }
    )
    out = extract_pipeline(rd.from_arrow(t)).to_pandas()
    assert len(out) == 2  # both rows survive
    bad = out[out.url.str.endswith("bad")].iloc[0]
    assert bad.error is None and bad.extracted_text == "=== PAGE 1 ===\n\nhi"
    assert list(bad.blocks[0]["bbox"]) == [1, 2, 0, 0]


def test_implicit_body_fallback():
    """HTML5-legal page with no body/div container still extracts content
    (review regression: used to silently return empty)."""
    from paddle_ray.functions.boilerplate import extract_document

    html = b"<html><head><title>T</title><style>p{}</style></head>" \
        b"<p>Real content paragraph with enough text to matter.</p></html>"
    r = extract_document(html)
    assert "Real content paragraph" in r["extracted_text"]
    assert "T" not in r["extracted_text"].split("Real")[0]  # head never leaks


def test_resume_refuses_partitioning_mismatch(tmp_path, ray_session):
    """Review regression: resuming a checkpoint under a DIFFERENT
    partitioning config must raise, not silently drop rows."""
    import pytest

    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.pipelines.extract import extract_pipeline
    from paddle_ray.sources.pages import synth_pages

    pages, _ = synth_pages(60, pdf_every=0, outlier_every=0)
    out = str(tmp_path / "o")
    extract_pipeline(pages, out_dir=out, resume=False).materialize()
    # same config resumes fine (no-op)
    assert len(extract_pipeline(pages, out_dir=out, resume=True).to_pandas()) == 0
    # different partition count must refuse
    with pytest.raises(ValueError, match="partitioning"):
        extract_pipeline(pages, cfg=ExtractConfig(n_partitions=32), out_dir=out, resume=True)
    # different mode must refuse
    with pytest.raises(ValueError, match="partitioning"):
        extract_pipeline(pages, out_dir=out, resume=True, partitioning="planned")


def test_assemble_pages_ds_operator(ray_session):
    """The engine-side page->document reassembly operator (M16/O1): pages
    arrive unordered; output must be page_index-sorted with separators."""
    import pyarrow as pa
    import ray.data as rd

    from paddle_ray.stages.assemble import assemble_pages_ds

    rows = pa.table(
        {
            "url": ["u2", "u1", "u1", "u2", "u1"],
            "page_index": [1, 2, 0, 0, 1],
            "page_text": ["B2", "a3", "a1", "B1", "a2"],
        }
    )
    out = assemble_pages_ds(rd.from_arrow(rows)).to_pandas().sort_values("url")
    u1 = out[out.url == "u1"].iloc[0]
    assert u1.n_pages == 3
    assert u1.extracted_text == (
        "=== PAGE 1 ===\n\na1\n\n=== PAGE 2 ===\n\na2\n\n=== PAGE 3 ===\n\na3"
    )
    u2 = out[out.url == "u2"].iloc[0]
    assert u2.n_pages == 2 and "B1" in u2.extracted_text and "B2" in u2.extracted_text


def test_resume_false_resets_stale_checkpoint_state(tmp_path):
    """resume=False into an existing out_dir must not leave stale manifests
    or a stamp describing the OLD partitioning config (ADVICE r1): a later
    resume=True under the new config has to see only this run's state."""
    out = str(tmp_path / "out")
    pages, expected = synth_pages(60, pdf_every=0, outlier_every=0)
    cfg_a = ExtractConfig(n_partitions=8)
    extract_pipeline(pages, cfg=cfg_a, out_dir=out).materialize()
    stale_parts = set(glob.glob(f"{out}/part-*"))
    assert stale_parts

    # rerun FRESH with a different partitioning config
    cfg_b = ExtractConfig(n_partitions=3)
    extract_pipeline(pages, cfg=cfg_b, out_dir=out, resume=False).materialize()
    with open(f"{out}/_manifests/{ckpt.PARTITIONING_STAMP}") as f:
        stamp = json.load(f)
    assert stamp["n_partitions"] == 3  # stamp rewritten, not first-writer-wins
    # no leftover partition dirs/manifests from the old config
    manifests = ckpt.completed_manifests(out)
    part_dirs = {os.path.basename(p) for p in glob.glob(f"{out}/part-*")}
    assert part_dirs == {f"part-{m['partition_id']:05d}" for m in manifests}
    final = ckpt.read_output(out).to_pandas()
    assert len(final) == 60
    for url, text in zip(final.url, final.extracted_text):
        assert text == expected[url]

    # and a subsequent resume=True under cfg_b is a clean no-op resume
    man3 = extract_pipeline(pages, cfg=cfg_b, out_dir=out).to_pandas()
    assert len(man3) == 0 or man3.row_count.sum() == 0

    # while resume=True under a DIFFERENT config still refuses
    with pytest.raises(ValueError, match="partitioning"):
        extract_pipeline(pages, cfg=cfg_a, out_dir=out)


def test_partitioning_stamp_exclusive_writer(tmp_path):
    """O_EXCL stamp: the first writer wins; a second run with a DIFFERENT
    partitioning config must refuse instead of silently overwriting
    (two-driver race, review r2)."""
    import pytest

    from paddle_ray.state import checkpoint as ckpt

    fp1 = {"mode": "streaming", "n_partitions": 64}
    fp2 = {"mode": "streaming", "n_partitions": 32}
    ckpt.write_partitioning_stamp(str(tmp_path), fp1)
    ckpt.write_partitioning_stamp(str(tmp_path), fp1)  # same config: fine
    with pytest.raises(ValueError, match="already stamped"):
        ckpt.write_partitioning_stamp(str(tmp_path), fp2)


def test_gpu_resource_knobs_reach_the_actor_pools():
    """config_gpu_paddlex.pbtxt:18-23 parity: layout/caption num_gpus (and
    num_cpus) flow from ExtractConfig into the map_batches resource
    request, so a real GPU model drops in with zero pipeline surgery. The
    plan is inspected WITHOUT executing (this host has no GPUs); num_gpus
    must be absent entirely when 0 so CPU-only clusters schedule."""
    cfg = ExtractConfig(
        layout_num_gpus=0.25, caption_num_gpus=0.5, deterministic_sort=False
    )
    ds = extract_pipeline(pages_from_documents(SF), cfg=cfg)

    def remote_args(ds):
        out, op = [], ds._logical_plan.dag
        while True:
            ra = getattr(op, "_ray_remote_args", None)
            if ra is not None:
                out.append(ra)
            if not op.input_dependencies:
                return out
            op = op.input_dependencies[0]

    args = remote_args(ds)
    assert {"num_cpus": 0.5, "num_gpus": 0.5} in args    # captioner pool (0.5 CPU default)
    assert {"num_cpus": 1.0, "num_gpus": 0.25} in args   # layout pool

    cpu_only = remote_args(
        extract_pipeline(pages_from_documents(SF), cfg=ExtractConfig(deterministic_sort=False))
    )
    assert all("num_gpus" not in ra for ra in cpu_only)


def test_seal_formula_subpipelines_config_gated():
    """pipeline_config.yaml:5,7 parity: seal/formula regions are NOT
    recognized by default (the reference ships both sub-pipelines
    disabled); enabling the knobs emits them as typed blocks in reading
    order. Exercised through the extractor kernel directly — the same code
    the actor pool runs per batch."""
    import json as _json

    from paddle_ray.stages.extract import DocumentExtractor

    pages = [[
        {"label": "title", "bbox": [50, 100, 1100, 250], "content": "heading"},
        {"label": "seal", "bbox": [60, 300, 300, 500], "content": "OFFICIAL SEAL"},
        {"label": "formula", "bbox": [50, 600, 900, 700], "content": "E = mc^2"},
        {"label": "text", "bbox": [50, 800, 1100, 950], "content": "body text"},
    ]]
    payload = b"%PDF-\n" + _json.dumps({"pages": pages}, sort_keys=True).encode()

    off = DocumentExtractor(ExtractConfig())._one("u", "pdf", payload)
    assert "OFFICIAL SEAL" not in off["extracted_text"]
    assert "E = mc^2" not in off["extracted_text"]
    assert {b["label"] for b in off["blocks"]} == {"title", "text"}

    on = DocumentExtractor(
        ExtractConfig(use_seal_recognition=True, use_formula_recognition=True)
    )._one("u", "pdf", payload)
    assert on["extracted_text"].split("\n\n") == [
        "=== PAGE 1 ===", "heading", "OFFICIAL SEAL", "E = mc^2", "body text",
    ]
    assert [b["label"] for b in on["blocks"]] == ["title", "seal", "formula", "text"]

    seal_only = DocumentExtractor(
        ExtractConfig(use_seal_recognition=True)
    )._one("u", "pdf", payload)
    assert "OFFICIAL SEAL" in seal_only["extracted_text"]
    assert "E = mc^2" not in seal_only["extracted_text"]


def test_streaming_write_equals_barrier_write(tmp_path):
    """The two checkpointed-write modes must be indistinguishable to a
    reader: same partition files, same in-partition url order, same
    manifest digests."""
    import pyarrow.parquet as pq

    pages, _ = synth_pages(120, pdf_every=12, outlier_every=0)
    out_s = str(tmp_path / "streaming")
    out_b = str(tmp_path / "barrier")
    man_s = (
        extract_pipeline(pages, cfg=ExtractConfig(write_mode="streaming"), out_dir=out_s)
        .to_pandas()
        .sort_values("partition_id")
        .reset_index(drop=True)
    )
    man_b = (
        extract_pipeline(pages, cfg=ExtractConfig(write_mode="barrier"), out_dir=out_b)
        .to_pandas()
        .sort_values("partition_id")
        .reset_index(drop=True)
    )
    assert man_s.partition_id.tolist() == man_b.partition_id.tolist()
    assert man_s.content_digest.tolist() == man_b.content_digest.tolist()
    assert man_s.row_count.tolist() == man_b.row_count.tolist()
    for pid in man_s.partition_id:
        a = pq.read_table(f"{out_s}/part-{pid:05d}/data.parquet")
        b = pq.read_table(f"{out_b}/part-{pid:05d}/data.parquet")
        assert a.equals(b), f"partition {pid} differs between modes"
    ok, bad = ckpt.verify_output(out_s)
    assert ok and not bad


def test_streaming_write_spill_path(tmp_path):
    """A tiny spill threshold forces every partition through run files;
    output must still be byte-equal to the in-memory path and the run
    files must be cleaned up at finalize."""
    import pyarrow.parquet as pq

    pages, expected = synth_pages(100, pdf_every=0, outlier_every=0)
    out = str(tmp_path / "spill")
    man = extract_pipeline(
        pages, cfg=ExtractConfig(write_mode="streaming", write_spill_bytes=1), out_dir=out
    ).to_pandas()
    assert man.row_count.sum() == 100
    assert not glob.glob(f"{out}/part-*/run-*.parquet"), "run files leaked"
    final = ckpt.read_output(out).to_pandas()
    assert len(final) == 100
    for url, text in zip(final.url, final.extracted_text):
        assert text == expected[url]
    ok, bad = ckpt.verify_output(out)
    assert ok and not bad


def test_streaming_append_is_idempotent(tmp_path):
    """A retried router task re-sends the same slice with the same key —
    the appender must drop it (exactly-once under Ray task retry)."""
    import pyarrow as pa

    from paddle_ray.state.checkpoint import _PartitionAppender, _slice_key

    t = pa.table(
        {
            "url": [f"https://x/{i}" for i in range(10)],
            "partition_id": pa.array([i % 3 for i in range(10)], pa.int32()),
            "extracted_text": [f"t{i}" for i in range(10)],
        }
    )
    w = _PartitionAppender(str(tmp_path))
    key = _slice_key(t)
    assert w.append(t, key) == 10
    assert w.append(t, key) == 0  # retry: dropped
    man = w.finalize()
    assert man.num_rows == 3  # partitions 0,1,2
    assert sum(man["row_count"].to_pylist()) == 10


def test_write_mode_auto_resolution(ray_session):
    """"auto" picks the barrier write below write_streaming_min_rows and
    the streaming appender pool at/above it (both byte-identical by the
    equality test above; this locks the size-aware selection)."""
    import ray.data as rd

    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.pipelines.extract import resolve_write_mode

    small = rd.range(10)
    cfg = ExtractConfig(write_streaming_min_rows=50)
    assert resolve_write_mode(cfg, small) == "barrier"
    big = rd.range(50)
    assert resolve_write_mode(cfg, big) == "streaming"
    assert resolve_write_mode(ExtractConfig(write_mode="streaming"), small) == "streaming"
    assert resolve_write_mode(ExtractConfig(write_mode="barrier"), big) == "barrier"


def test_extract_tiered_partitioned_write(tmp_path):
    """The tier-partitioned sink must (a) lay out tier=head/mid/tail
    subdirs, (b) contain EXACTLY the kept rows (dropped tail docs never
    reach the sink), and (c) agree with the rollup's kept counts; the
    per-tier doc/token totals must match quality_tiers (same text, same
    tier rule — only the keep keying differs: url here, doc_id there)."""
    import pyarrow.parquet as pq

    from paddle_ray.pipelines.curate import extract_tiered
    from paddle_ray.pipelines.webtext import quality_tiers

    out = str(tmp_path / "tiers")
    roll = extract_tiered(SF, out_dir=out)
    subdirs = sorted(os.path.basename(p) for p in glob.glob(os.path.join(out, "tier=*")))
    assert subdirs == ["tier=head", "tier=mid", "tier=tail"]
    written = pq.read_table(out).to_pandas()
    per_tier = written.groupby("tier").agg(n=("url", "size"), toks=("n_tok", "sum"))
    for _, row in roll.groupby("tier", as_index=False).sum(numeric_only=True).iterrows():
        assert per_tier.loc[row.tier, "n"] == row.n_kept
        assert per_tier.loc[row.tier, "toks"] == row.kept_tokens
    qt = quality_tiers(SF).set_index("tier")
    rt = roll.groupby("tier").sum(numeric_only=True)
    assert (rt.n_docs == qt.n_docs).all()
    assert (rt.n_tokens == qt.n_tokens).all()
    # head keeps everything under either keying
    assert rt.loc["head", "n_kept"] == rt.loc["head", "n_docs"]
