"""Exact LPT byte-balancing planner tests (stages/partition.py strategy 2;
the streaming crc32+outlier strategy is covered in test_pipeline)."""

import numpy as np
import ray.data as rd

from paddle_ray.stages.partition import (
    N_BUCKETS,
    bucket_sizes,
    make_planned_assigner,
    plan_partitions_from_sizes,
)


def test_lpt_balances_uniform_buckets():
    sizes = np.full(N_BUCKETS, 1000, dtype=np.int64)
    assign = plan_partitions_from_sizes(sizes, 16)
    loads = np.bincount(assign, weights=sizes, minlength=16)
    assert loads.max() / loads.min() < 1.01


def test_lpt_isolates_giant_bucket():
    """One bucket holding 50% of all bytes must get a partition where it is
    essentially alone; the rest still balance."""
    sizes = np.full(N_BUCKETS, 100, dtype=np.int64)
    sizes[7] = sizes.sum()
    assign = plan_partitions_from_sizes(sizes, 8)
    giant_pid = assign[7]
    loads = np.bincount(assign, weights=sizes, minlength=8)
    others = np.delete(loads, giant_pid)
    # giant partition contains (almost) only the giant bucket
    assert loads[giant_pid] < sizes[7] * 1.02
    assert others.max() / others.min() < 1.2


def test_lpt_deterministic():
    rng = np.random.default_rng(3)
    sizes = rng.integers(0, 10_000, N_BUCKETS)
    a = plan_partitions_from_sizes(sizes, 32)
    b = plan_partitions_from_sizes(sizes, 32)
    assert (a == b).all()


def test_bucket_sizes_and_assigner_roundtrip(ray_session):
    """bucket_sizes over a Dataset + planned assigner: every row lands in
    [0, P) and byte loads are near-balanced."""
    import pyarrow as pa

    n = 5000
    rng = np.random.default_rng(11)
    urls = [f"https://s{i % 97}.example/d/{i}" for i in range(n)]
    nbytes = rng.integers(500, 5000, n).astype("int64")
    nbytes[::500] = 2_000_000  # skew outliers
    ds = rd.from_arrow(
        pa.table({"url": pa.array(urls), "n_bytes_in": pa.array(nbytes, pa.int64())})
    )
    sizes = bucket_sizes(ds)
    assert sizes.sum() == nbytes.sum()
    assign = plan_partitions_from_sizes(sizes, 16)
    out = ds.map_batches(make_planned_assigner(assign), batch_format="pyarrow").to_pandas()
    assert out.partition_id.between(0, 15).all()
    loads = out.groupby("partition_id").n_bytes_in.sum()
    assert loads.max() / loads.sum() < 2.5 / 16  # no partition > ~2.5x fair share


def test_planned_partitioning_end_to_end(tmp_path, ray_session):
    """partitioning='planned' writes byte-balanced partitions and resumes
    exactly like the streaming mode."""
    from paddle_ray.pipelines.extract import extract_pipeline
    from paddle_ray.sources.pages import synth_pages

    pages, _ = synth_pages(400, pdf_every=0, outlier_every=100)
    out = str(tmp_path / "o")
    man = extract_pipeline(pages, out_dir=out, resume=False, partitioning="planned").to_pandas()
    assert man.row_count.sum() == 400
    # resume is a no-op
    man2 = extract_pipeline(pages, out_dir=out, resume=True, partitioning="planned").to_pandas()
    assert len(man2) == 0

    import glob
    import os

    import pyarrow.parquet as pq

    part_rows = []
    for f in glob.glob(os.path.join(out, "part-*", "data.parquet")):
        rows = pq.read_table(f, columns=["n_bytes_in"])["n_bytes_in"].to_pylist()
        part_rows.append(rows)
    loads = sorted(sum(r) for r in part_rows)
    biggest_row = max(max(r) for r in part_rows)
    # an indivisible MB-outlier row may exceed the fair share — LPT must
    # then ISOLATE it (its partition ~= just that row) rather than stack
    # other work behind it
    assert max(loads) <= biggest_row * 1.2
    # partitions without an outlier balance tightly
    normal = [x for x in loads if x < biggest_row / 2]
    assert normal and max(normal) / min(normal) < 3.0
