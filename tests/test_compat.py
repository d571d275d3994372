"""Regression tests for the hash-shuffle schema-broadcast workarounds in
paddle_ray/compat.py (upstream ray 2.49.2 defect — see module docstring).
Both scenarios crash with ArrowInvalid ("No match or multiple matches for
key field reference ...") without the patches."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd
from ray.data.aggregate import Sum

import paddle_ray.pipelines  # noqa: F401  (applies the compat patches)


def test_upstream_bug_reproduces_unpatched(tmp_path, ray_session):
    """DELETION CRITERION for paddle_ray/compat.py: the unpatched ray
    hash-shuffle must still CRASH on the aggregate-feeds-join shape (the
    one-shot schema broadcast consumed by a zero-column empty block).
    When this test FAILS on a newer ray — the unpatched run succeeds —
    upstream fixed the bug and the whole compat module should be deleted
    (see its module docstring). Restores the patches in all cases."""
    import pytest

    from paddle_ray import compat

    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k": [1, 2, 3]}), preserve_index=False),
        tmp_path / "l.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"k2": [1, 1, 2], "n": [1, 1, 1]}), preserve_index=False
        ),
        tmp_path / "r.parquet",
    )

    def run():
        left = rd.read_parquet(str(tmp_path / "l.parquet"))
        counts = (
            rd.read_parquet(str(tmp_path / "r.parquet"))
            .groupby("k2")
            .aggregate(Sum("n", alias_name="c"))
        )
        return left.join(
            counts, join_type="left_outer", num_partitions=8, on=("k",), right_on=("k2",)
        ).to_pandas()

    compat.unapply_patches()
    try:
        with pytest.raises(Exception) as exc_info:
            run()
        # the characteristic schemaless-aggregator failure, not some
        # unrelated crash
        assert "key field reference" in str(exc_info.value) or "No match" in str(
            exc_info.value
        )
    finally:
        assert compat.apply_patches()
    # and the patched path immediately succeeds in the same session
    out = run().sort_values("k").reset_index(drop=True)
    assert out.c.fillna(0).astype(int).tolist() == [2, 1, 0]


def test_version_guard_is_active():
    """The running ray version must be in the verified set (otherwise a
    round bumped ray without re-running the verification protocol), and
    the patches must report active."""
    import ray

    from paddle_ray import compat

    assert ray.__version__ in compat.PATCH_VERIFIED_RAY_VERSIONS
    assert compat.PATCHES_ACTIVE


def test_join_right_side_aggregate_of_parquet(tmp_path):
    """Sort-aggregates emit zero-column empty blocks; one arriving first
    used to consume the join's one-shot schema broadcast."""
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k": [1, 2, 3]}), preserve_index=False),
        tmp_path / "l.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"k2": [1, 1, 2], "n": [1, 1, 1]}), preserve_index=False
        ),
        tmp_path / "r.parquet",
    )
    left = rd.read_parquet(str(tmp_path / "l.parquet"))
    counts = (
        rd.read_parquet(str(tmp_path / "r.parquet"))
        .groupby("k2")
        .aggregate(Sum("n", alias_name="c"))
    )
    out = (
        left.join(counts, join_type="left_outer", num_partitions=8, on=("k",), right_on=("k2",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.k) == [1, 2, 3]
    assert out.c.fillna(0).astype(int).tolist() == [2, 1, 0]


def test_join_with_legitimately_empty_side(tmp_path):
    """A filter matching nothing leaves one side all-empty-but-schema'd;
    the patches must still distribute that schema so the join finalizes."""
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k": [1, 2]}), preserve_index=False),
        tmp_path / "l.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k2": [1, 2], "v": [5, 6]}), preserve_index=False),
        tmp_path / "r.parquet",
    )
    left = rd.read_parquet(str(tmp_path / "l.parquet"))
    right = rd.read_parquet(str(tmp_path / "r.parquet")).filter(expr="v > 100")
    out = (
        left.join(right, join_type="left_outer", num_partitions=4, on=("k",), right_on=("k2",))
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out.k) == [1, 2]
    assert out.v.isna().all()


def test_join_both_sides_empty(tmp_path):
    """Both inputs filter to zero rows (schema-bearing empties): the join
    must produce an empty result, not a schemaless-partition crash."""
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k": [1], "v": [5]}), preserve_index=False),
        tmp_path / "l.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame({"k2": [1], "w": [7]}), preserve_index=False),
        tmp_path / "r.parquet",
    )
    left = rd.read_parquet(str(tmp_path / "l.parquet")).filter(expr="v > 100")
    right = rd.read_parquet(str(tmp_path / "r.parquet")).filter(expr="w > 100")
    out = left.join(
        right, join_type="inner", num_partitions=2, on=("k",), right_on=("k2",)
    ).to_pandas()
    assert len(out) == 0
