"""Workarounds for upstream Ray Data bugs, applied at import time.

Both patches address the same upstream defect chain in the hash-shuffle
machinery (ray 2.49.2,
``ray/data/_internal/execution/operators/hash_shuffle.py``); they are
minimal, additive, and documented against the exact source they correct.

The defect: the hash-shuffle operator (joins, hash aggregates)
broadcasts input schemas to its aggregator pool exactly once per input
sequence — piggybacked on the FIRST block submitted
(``send_empty_blocks=True``, ``hash_shuffle.py:584``) — and sets
``_has_schemas_broadcasted[input_index] = True`` unconditionally right
after submitting that first task. Two failure modes follow:

1. ``_shuffle_block`` early-returns on an EMPTY block
   (``hash_shuffle.py:224``) *before* the schema fan-out, so an empty
   first block silently consumes the one-shot broadcast.
2. Worse, upstream sort-based aggregates emit empty blocks with a
   ZERO-COLUMN schema for empty key ranges, so even performing the
   fan-out with such a block distributes a useless schema.

Either way, aggregator partitions that never receive a non-empty shard
finalize on a SCHEMALESS empty table, and ``pa.Table.join`` fails with
"No match or multiple matches for key field reference ... on {left,
right} side of the join". Observed deterministically on small inputs
(tiny test corpora) and possible at any scale with filter-heavy or
skew-partitioned inputs whose first-arriving block is empty.

Patch A (``_do_add_input_inner``): drop EMPTY blocks from incoming
bundles before the operator fans them out — they carry no data, and
removing them guarantees the one-shot broadcast rides a real,
schema-bearing block.

Patch B (``_shuffle_block``): if a broadcast-carrying block IS empty
but has a usable schema (belt-and-braces for paths that still submit
one), fan an empty-but-schema-bearing shard to every aggregator instead
of early-returning.

Version guard (VERDICT r4 #4): the patches are applied only when the
hash-shuffle seams they target still exist. On a ray version outside
``PATCH_VERIFIED_RAY_VERSIONS`` a warning names the verification step;
if the seams themselves are gone the patches are skipped entirely (fail
soft — pipelines run unpatched) with an actionable message.

DELETION CRITERION: when
``tests/test_compat.py::test_upstream_bug_reproduces_unpatched`` FAILS
on a new ray version (i.e. the unpatched pipeline no longer crashes,
because https://github.com/ray-project/ray hash_shuffle fixed the
one-shot schema broadcast), delete this module, its import hooks in
``paddle_ray/pipelines/__init__.py``, and ``tests/test_compat.py``.
"""

from __future__ import annotations

import warnings

import ray

# ray versions whose hash_shuffle source these patches were written and
# verified against (tests/test_compat.py green, including the unpatched
# bug-reproduction test)
PATCH_VERIFIED_RAY_VERSIONS = {"2.49.2"}

# pristine upstream callables, captured before the first patch so tests
# can restore them (unapply_patches) to demonstrate the upstream bug
_ORIGINALS: dict[str, object] = {}


def _seams() -> tuple[object, object] | None:
    """Return (hash_shuffle module, HashShufflingOperatorBase) iff every
    attribute the patches touch still exists with the expected shape."""
    try:
        from ray.data._internal.arrow_ops.transform_pyarrow import (  # noqa: F401
            _create_empty_table,
        )
        from ray.data._internal.execution.interfaces import RefBundle  # noqa: F401
        from ray.data._internal.execution.operators import hash_shuffle as hs
        from ray.data._internal.table_block import TableBlockAccessor  # noqa: F401

        base = hs.HashShufflingOperatorBase
        if not hasattr(hs, "_shuffle_block"):
            return None
        # unpatched: a ray.remote function wrapping the plain function
        fn = hs._shuffle_block
        if not (
            hasattr(fn, "_function")
            or getattr(fn, "__paddle_ray_schema_safe__", False)
        ):
            return None
        if not hasattr(base, "_do_add_input_inner"):
            return None
        return hs, base
    except Exception:
        return None


def _apply_shuffle_block_schema_patch() -> None:
    from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
    from ray.data._internal.execution.operators import hash_shuffle as hs
    from ray.data._internal.table_block import TableBlockAccessor
    from ray.data.block import BlockAccessor, BlockExecStats, BlockType

    if getattr(hs._shuffle_block, "__paddle_ray_schema_safe__", False):
        return  # idempotent

    _ORIGINALS.setdefault("_shuffle_block", hs._shuffle_block)
    orig_fn = hs._shuffle_block._function

    def _shuffle_block_schema_safe(
        block,
        input_index,
        key_columns,
        pool,
        block_transformer=None,
        send_empty_blocks=False,
        override_partition_id=None,
    ):
        stats = BlockExecStats.builder()
        if block_transformer is not None:
            block = block_transformer(block)
        block = TableBlockAccessor.try_convert_block_type(
            block, block_type=BlockType.ARROW
        )
        if block.num_rows == 0 and send_empty_blocks:
            # the upstream early-return skips the one-shot schema
            # broadcast; replicate the fan-out it performs for non-empty
            # first blocks so no aggregator partition stays schemaless
            shard = _create_empty_table(block.schema)
            shard_ref = ray.put(shard)  # identical shard: put once, fan the ref
            pending = []
            for partition_id in range(pool.num_partitions):
                aggregator = pool.get_aggregator_for_partition(partition_id)
                pending.append(
                    aggregator.submit.remote(input_index, partition_id, shard_ref)
                )
            while pending:
                _, pending = ray.wait(pending, num_returns=len(pending), timeout=1)
            meta = BlockAccessor.for_block(block).get_metadata(
                exec_stats=stats.build()
            )
            return (meta, {})
        # transformer/conversion already applied; original re-applying the
        # arrow conversion is a no-op
        return orig_fn(
            block,
            input_index,
            key_columns,
            pool,
            block_transformer=None,
            send_empty_blocks=send_empty_blocks,
            override_partition_id=override_partition_id,
        )

    patched = ray.remote(_shuffle_block_schema_safe)
    patched.__paddle_ray_schema_safe__ = True
    hs._shuffle_block = patched


def _apply_empty_block_filter_patch() -> None:
    from ray.data._internal.execution.interfaces import RefBundle
    from ray.data._internal.execution.operators.hash_shuffle import (
        HashShufflingOperatorBase,
    )

    if getattr(
        HashShufflingOperatorBase._do_add_input_inner,
        "__paddle_ray_schema_safe__",
        False,
    ):
        return  # idempotent

    _ORIGINALS.setdefault(
        "_do_add_input_inner", HashShufflingOperatorBase._do_add_input_inner
    )
    orig = HashShufflingOperatorBase._do_add_input_inner

    def _do_add_input_inner_nonempty(self, input_bundle, input_index):
        # Empty blocks carrying a real schema are legitimate broadcast
        # vehicles (Patch B fans their schema out), so a bundle whose
        # schema is known and non-trivial passes through untouched — a
        # legitimately-empty join side then still distributes its schema.
        # Only when the bundle's schema is unknown/zero-column (the
        # sort-aggregate's poison empties) are its empty blocks dropped,
        # so the one-shot broadcast waits for a real block instead.
        schema = input_bundle.schema
        names = getattr(schema, "names", None) if schema is not None else None
        if names:
            return orig(self, input_bundle, input_index)
        keep = [
            (ref, meta)
            for ref, meta in zip(input_bundle.block_refs, input_bundle.metadata)
            if meta.num_rows != 0
        ]
        if len(keep) != len(input_bundle.block_refs):
            dropped = RefBundle(
                tuple(
                    (ref, meta)
                    for ref, meta in zip(input_bundle.block_refs, input_bundle.metadata)
                    if meta.num_rows == 0
                ),
                owns_blocks=input_bundle.owns_blocks,
                schema=input_bundle.schema,
            )
            # the dropped zero-column empties never reach the operator's
            # normal per-bundle accounting, so free them here (ADVICE r2:
            # silent object-store leak when the bundle owns its blocks)
            dropped.destroy_if_owned()
            if not keep:
                return
            input_bundle = RefBundle(
                tuple(keep), owns_blocks=input_bundle.owns_blocks,
                schema=input_bundle.schema,
            )
        return orig(self, input_bundle, input_index)

    _do_add_input_inner_nonempty.__paddle_ray_schema_safe__ = True
    HashShufflingOperatorBase._do_add_input_inner = _do_add_input_inner_nonempty


def apply_patches() -> bool:
    """Apply both hash-shuffle patches if the current ray exposes the
    seams they target. Returns True iff the patches are active. Safe to
    call repeatedly (idempotent)."""
    seams = _seams()
    if seams is None:
        warnings.warn(
            f"paddle_ray.compat: ray {ray.__version__} no longer exposes the "
            "hash-shuffle internals these patches target — running UNPATCHED. "
            "If tests/test_compat.py passes with the patches inactive (run "
            "test_upstream_bug_reproduces_unpatched: its crash arm failing "
            "means upstream fixed the schema broadcast), delete "
            "paddle_ray/compat.py per its module-docstring deletion criterion; "
            "otherwise pin ray to one of "
            f"{sorted(PATCH_VERIFIED_RAY_VERSIONS)}.",
            RuntimeWarning,
            stacklevel=2,
        )
        return False
    if ray.__version__ not in PATCH_VERIFIED_RAY_VERSIONS:
        warnings.warn(
            f"paddle_ray.compat: ray {ray.__version__} is not a verified "
            f"version ({sorted(PATCH_VERIFIED_RAY_VERSIONS)}); the hash-shuffle "
            "seams still match, so the schema-broadcast patches are applied "
            "anyway. Verify by running tests/test_compat.py — if "
            "test_upstream_bug_reproduces_unpatched FAILS, upstream fixed the "
            "bug: delete paddle_ray/compat.py (see module docstring); if all "
            "tests pass, add this version to PATCH_VERIFIED_RAY_VERSIONS.",
            RuntimeWarning,
            stacklevel=2,
        )
    _apply_shuffle_block_schema_patch()
    _apply_empty_block_filter_patch()
    return True


def unapply_patches() -> None:
    """Restore the pristine upstream callables (test hook: lets
    tests/test_compat.py demonstrate the upstream bug on the unpatched
    path, which is the module's documented deletion criterion)."""
    from ray.data._internal.execution.operators import hash_shuffle as hs

    if "_shuffle_block" in _ORIGINALS:
        hs._shuffle_block = _ORIGINALS["_shuffle_block"]
    if "_do_add_input_inner" in _ORIGINALS:
        hs.HashShufflingOperatorBase._do_add_input_inner = _ORIGINALS[
            "_do_add_input_inner"
        ]


PATCHES_ACTIVE = apply_patches()
