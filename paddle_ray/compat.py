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
"""

from __future__ import annotations

import ray


def _apply_shuffle_block_schema_patch() -> None:
    from ray.data._internal.arrow_ops.transform_pyarrow import _create_empty_table
    from ray.data._internal.execution.operators import hash_shuffle as hs
    from ray.data._internal.table_block import TableBlockAccessor
    from ray.data.block import BlockAccessor, BlockExecStats, BlockType

    if getattr(hs._shuffle_block, "__paddle_ray_schema_safe__", False):
        return  # idempotent

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


_apply_shuffle_block_schema_patch()
_apply_empty_block_filter_patch()
