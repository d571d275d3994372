"""The declared Arrow schemas (core/schema.py) must match what the code
actually produces — unenforced schema constants rot silently."""

import pyarrow as pa

from paddle_ray.core.config import ExtractConfig
from paddle_ray.core.schema import EXTRACTED_SCHEMA, MANIFEST_SCHEMA, METRICS_SCHEMA, PAGES_SCHEMA
from paddle_ray.sources.pages import synth_pages
from paddle_ray.stages.extract import DocumentExtractor
from paddle_ray.stages.sniff import make_sniff_batch


def test_pages_and_extracted_schema_match():
    pages, _ = synth_pages(10, pdf_every=0, outlier_every=0)
    assert pages.schema.equals(PAGES_SCHEMA), pages.schema
    batch = make_sniff_batch(ExtractConfig())(pages)
    out = DocumentExtractor(ExtractConfig())(batch)
    assert out.schema.equals(EXTRACTED_SCHEMA), out.schema


def test_manifest_schema_match(tmp_path, ray_session):
    from paddle_ray.pipelines.extract import extract_pipeline

    pages, _ = synth_pages(20, pdf_every=0, outlier_every=0)
    man = extract_pipeline(pages, out_dir=str(tmp_path / "o"), resume=False)
    t = pa.Table.from_pandas(man.to_pandas(), preserve_index=False)
    assert set(t.column_names) == set(MANIFEST_SCHEMA.names)


def test_metrics_schema_match(ray_session):
    from paddle_ray.state.metrics import metrics_snapshot_df

    df = metrics_snapshot_df()
    assert list(df.columns) == METRICS_SCHEMA.names
