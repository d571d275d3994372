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
