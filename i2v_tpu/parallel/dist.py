"""Multi-host: DCN initialization + per-process sample sharding.

Replaces the reference's manual ``--batch_nums/--batch_index`` process
sharding (image_main.py:18-19,61-63): each host takes a contiguous slice of
the sample manifest; within a host, clips shard over the ICI mesh.
"""

from __future__ import annotations

import jax


def maybe_initialize_distributed() -> None:
    """Initialize jax.distributed when launched multi-host (no-op otherwise)."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def process_shard_bounds(n_samples: int, n_shards: int | None = None,
                         shard_index: int | None = None) -> tuple[int, int]:
    """[left, right) bounds of this shard.

    Defaults to (jax.process_count(), jax.process_index()); explicit values
    reproduce the reference's 1-based --batch_index CLI contract when passed
    as (batch_nums, batch_index-1).
    """
    if n_shards is None:
        n_shards = jax.process_count()
    if shard_index is None:
        shard_index = jax.process_index()
    per = n_samples // n_shards
    left = shard_index * per
    right = n_samples if shard_index == n_shards - 1 else left + per
    return left, right
