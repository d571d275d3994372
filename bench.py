"""Benchmark driver.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) with ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
   "sf": ..., "num_cpus": N, "docs_per_sec": ...}

--scaling: runs the headline extraction pipeline twice in fresh
subprocesses (num_cpus=8 then 32) on the same input and reports both
throughputs + scaling efficiency (the sandbox proxy for the N-vs-4N-node
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SYNTH_DOCS = int(os.environ.get("BENCH_SYNTH_DOCS", "4000"))


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False


def _bench_extract(sf_dir: str) -> tuple[float, int]:
    """Headline: full extraction over the documents-derived pages table
    PLUS a synthetic full-grammar corpus (pdfs, captions, outliers)."""
    import pyarrow as pa

    from paddle_ray.core.config import ExtractConfig
    from paddle_ray.pipelines.extract import extract_pipeline
    from paddle_ray.sources.pages import pages_from_documents, synth_pages

    cfg = ExtractConfig(layout_pool_size=(2, max(2, NUM_CPUS - 4)))
    pages1 = pages_from_documents(sf_dir)
    pages2, _ = synth_pages(SYNTH_DOCS, pdf_every=20, outlier_every=500)
    n_docs = pages1.num_rows + pages2.num_rows
    pages = pa.concat_tables([pages1, pages2])

    t0 = time.perf_counter()
    out = extract_pipeline(pages, cfg=cfg)
    n = out.count()
    dt = time.perf_counter() - t0
    assert n == n_docs, (n, n_docs)
    return dt, n_docs


def run_benchmarks() -> dict:
    _init_ray(NUM_CPUS)
    import __ray_entry__ as em

    queries = em.queries()
    bench_queries = [
        "q1_pricing_summary",
        "q3_top_orders",
        "q5_nation_revenue",
        "dedup_exact",
        "dedup_minhash_lsh",
        "knn_bruteforce",
        "token_counts",
        "events_tumbling",
        "events_sessionize",
    ]
    timings: dict[str, float] = {}

    ext_s, n_docs = _bench_extract(SF_DIR)
    timings["extract_flagship"] = round(ext_s, 3)

    for name in bench_queries:
        t0 = time.perf_counter()
        res = queries[name](SF_DIR)
        if hasattr(res, "count") and not hasattr(res, "shape"):
            res.count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    return {
        "metric": "extraction+ops wall time (docs/sec in docs_per_sec)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / ext_s, 2),
    }


def run_scaling():
    results = {}
    for ncpu in (8, 32):
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            BENCH_SCALING_CHILD="1",
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        rec = json.loads(out.strip().splitlines()[-1])
        results[ncpu] = rec
    t8 = results[8]["queries"]["extract_flagship"]
    t32 = results[32]["queries"]["extract_flagship"]
    eff = (t8 / t32) / (32 / 8)
    print(
        json.dumps(
            {
                "sec_8": t8,
                "sec_32": t32,
                "docs_per_sec_8": results[8]["docs_per_sec"],
                "docs_per_sec_32": results[32]["docs_per_sec"],
                "scaling_efficiency": round(eff, 3),
            }
        )
    )


def main():
    if "--scaling" in sys.argv:
        run_scaling()
        return
    # warm the page cache so we measure compute+shuffle, not first disk read
    for name in os.listdir(SF_DIR):
        with open(os.path.join(SF_DIR, name), "rb") as f:
            while f.read(1 << 22):
                pass
    rec = run_benchmarks()
    print(json.dumps(rec))
    import ray

    ray.shutdown()


if __name__ == "__main__":
    main()
