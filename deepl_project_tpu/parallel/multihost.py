"""Multi-host initialization — the torchrun/NCCL-process-group analogue.

Reference: setup_distributed() reads RANK/WORLD_SIZE/LOCAL_RANK and calls
dist.init_process_group('nccl') (ref: train.py:78-93). On TPU pods the runtime
discovers the topology itself; ``jax.distributed.initialize()`` wires the
hosts, and per-host data sharding uses ``jax.process_index()`` instead of the
env-var rank.
"""

from __future__ import annotations

import jax


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> dict:
    """Initialize the JAX distributed runtime (no-op on single host).

    On Cloud TPU pods all arguments are auto-detected. Returns topology info
    used for data sharding: {'process_index', 'process_count',
    'local_device_count', 'global_device_count'}.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def host_shard_info() -> tuple[int, int]:
    """(shard_index, num_shards) for per-host dataset sharding — the analogue
    of HF dataset.shard(world_size, rank) (ref: train_2.py:184-185)."""
    return jax.process_index(), jax.process_count()
