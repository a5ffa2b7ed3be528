"""Multi-host: DCN initialization + per-process sample sharding.

Replaces the reference's manual ``--batch_nums/--batch_index`` process
sharding (image_main.py:18-19,61-63): each host takes a contiguous slice of
the sample manifest; within a host, clips shard over the ICI mesh.
"""

from __future__ import annotations

import jax


_initialized = False


def maybe_initialize_distributed() -> bool:
    """Initialize jax.distributed when launched multi-host (no-op otherwise).

    Launch contract (the JAX-standard env vars): set
    ``JAX_COORDINATOR_ADDRESS`` (host:port of process 0),
    ``JAX_NUM_PROCESSES`` and ``JAX_PROCESS_ID`` on every process.
    Idempotent — CLI entry points call this unconditionally. Returns whether
    a multi-process runtime is active.
    """
    import os

    global _initialized
    if _initialized:
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        # jax.distributed auto-detects only managed clusters (SLURM etc.);
        # for the plain env-var launch contract pass the values explicitly
        num = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        jax.distributed.initialize(
            num_processes=int(num) if num else None,
            process_id=int(pid) if pid else None)
        _initialized = True
    elif int(os.environ.get("SLURM_NTASKS", "1")) > 1:
        # managed clusters carry their own env contract — argless
        # initialize() auto-detects them; without this, a SLURM multi-task
        # launch would silently run every task over the FULL sample set
        jax.distributed.initialize()
        _initialized = True
    return _initialized


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
    if n_shards < 1 or not 0 <= shard_index < n_shards:
        # a 0-based --batch_index habit would otherwise wrap via Python
        # negative indexing and silently attack the wrong shard
        raise ValueError(
            f"shard index {shard_index} out of range for {n_shards} shards "
            "(the CLI --batch_index contract is 1-based, image_main.py:18-19)")
    per = n_samples // n_shards
    left = shard_index * per
    right = n_samples if shard_index == n_shards - 1 else left + per
    return left, right
