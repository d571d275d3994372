"""Metrics/lineage side-channel tests (state/metrics.py — the Ray-native
replacement for the reference's heartbeat-file monitoring plane,
status_server.py:56-123)."""

from paddle_ray.pipelines.extract import extract_pipeline
from paddle_ray.sources.pages import synth_pages
from paddle_ray.state.metrics import metrics_snapshot_df, reset_metrics


def test_metrics_collected_per_stage(ray_session):
    reset_metrics()
    pages, _ = synth_pages(120, pdf_every=0, outlier_every=0)
    out = extract_pipeline(pages, with_metrics=True)
    n = out.count()
    assert n == 120
    df = metrics_snapshot_df()
    sniff = df[df.stage == "sniff"]
    assert len(sniff) > 0
    assert sniff.rows.sum() == 120
    assert sniff.bytes_in.sum() > 0  # sniff CREATES n_bytes_in — must be counted
    assert (sniff.partition_id >= 0).all()  # per-partition, not first-row binning
    assert (sniff.wall_s >= 0).all()
    reset_metrics()
    assert len(metrics_snapshot_df()) == 0


def test_metrics_all_stages_report_and_caption_count(ray_session):
    """The full metrics plane (VERDICT r1 #7): sniff + extract + caption all
    report per-partition counters, and the Captioner emits the caption-merge
    count (A5, layout_captioning.py:322-343)."""
    reset_metrics()
    # with_extras images every 3rd doc -> caption merges guaranteed
    pages, _ = synth_pages(90, pdf_every=9, outlier_every=0)
    out = extract_pipeline(pages, with_metrics=True)
    assert out.count() == 90
    df = metrics_snapshot_df()
    stages = set(df.stage)
    assert {"sniff", "extract", "caption"} <= stages
    for s in ("sniff", "extract", "caption"):
        assert df[df.stage == s].rows.sum() == 90, s
    # extract emits block counts; caption emits merge counts
    assert df[df.stage == "extract"].blocks.sum() > 0
    assert df[df.stage == "caption"].captions.sum() > 0
    # merges attributed per partition, not to a catch-all bucket
    cap = df[(df.stage == "caption") & (df.captions > 0)]
    assert (cap.partition_id >= 0).all()
    reset_metrics()


def test_metrics_snapshot_written_next_to_output(ray_session, tmp_path):
    """--metrics write path: per-stage/per-partition metrics parquet next to
    the checkpointed output."""
    import os

    from paddle_ray.state.metrics import write_metrics_parquet

    reset_metrics()
    pages, _ = synth_pages(40, pdf_every=0, outlier_every=0)
    out_dir = str(tmp_path / "out")
    extract_pipeline(pages, out_dir=out_dir, with_metrics=True).materialize()
    path = write_metrics_parquet(out_dir)
    assert os.path.exists(path)
    import pyarrow.parquet as pq

    t = pq.read_table(path)
    assert t.num_rows > 0
    assert {"stage", "partition_id", "rows", "captions"} <= set(t.column_names)


def test_duplicate_report_key_counted_once(ray_session):
    from paddle_ray.state.metrics import get_metrics_actor, metrics_snapshot_df, reset_metrics
    import ray

    reset_metrics()
    a = get_metrics_actor()
    # same content key re-reported (an at-least-once retry) -> one count
    ray.get(a.report.remote("dup_stage", 3, 10, 100, 5, 0, 1.0, key="k1"))
    ray.get(a.report.remote("dup_stage", 3, 10, 100, 5, 0, 1.0, key="k1"))
    ray.get(a.report.remote("dup_stage", 3, 7, 70, 2, 0, 0.5, key="k2"))
    df = metrics_snapshot_df()
    row = df[(df.stage == "dup_stage") & (df.partition_id == 3)].iloc[0]
    assert row.rows == 17 and row.bytes_in == 170 and row.blocks == 7
    reset_metrics()


def test_metrics_actor_survives_keyless_reports(ray_session):
    """key=None (legacy/external callers) keeps plain += semantics."""
    from paddle_ray.state.metrics import get_metrics_actor, metrics_snapshot_df, reset_metrics
    import ray

    reset_metrics()
    a = get_metrics_actor()
    ray.get(a.report.remote("nk", 1, 1, 0, 0, 0, 0.0))
    ray.get(a.report.remote("nk", 1, 1, 0, 0, 0, 0.0))
    df = metrics_snapshot_df()
    assert int(df[(df.stage == "nk")].rows.iloc[0]) == 2
    reset_metrics()
