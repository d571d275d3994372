"""paddle_ray — a from-scratch Ray-Data-native document-extraction engine.

Re-expresses the data-processing capabilities of xynehq/paddle (a
Triton-served PP-StructureV3 layout/OCR deployment, see /root/reference)
as a streaming ``ray.data.Dataset`` pipeline over Parquet tables of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``.

Layout:
- ``core``       Arrow schemas + the ExtractConfig knob surface
- ``sources``    deterministic synthetic pages generator, testdata readers
- ``functions``  pure scalar/vector functions (DOM, boilerplate scoring,
                 cleaning, bbox math, text stats, hashing/sketches)
- ``stages``     map_batches stages (stateless tasks and actor pools)
- ``pipelines``  end-to-end Dataset pipelines (extraction flagship, dedup,
                 similarity, analysis, relational)
- ``state``      checkpoint manifests + metrics/lineage side Dataset

No module here calls ``ray.init()``/``ray.shutdown()`` — the driver,
``bench.py`` and the test fixture own the Ray session.
"""

__version__ = "0.1.0"

# public convenience surface (lazy — keep package import light for workers)
def extract_pipeline(*args, **kwargs):
    from .pipelines.extract import extract_pipeline as _ep

    return _ep(*args, **kwargs)


def extract_document_request(*args, **kwargs):
    from .api import extract_document_request as _edr

    return _edr(*args, **kwargs)
