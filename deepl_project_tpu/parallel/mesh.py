"""Device-mesh construction and sharding placement.

The reference's distributed story is exactly one strategy: DDP over NCCL with
per-rank data sharding (SURVEY.md §2.7). The TPU-native equivalent is a
``jax.sharding.Mesh`` with a ``data`` axis (batch-sharded; XLA emits the
gradient psum over ICI during the jitted step) plus an optional ``model`` axis
for tensor/FSDP parameter sharding of the 1.3B/2.3B variants — no hand-written
communication at all.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
CONTEXT_AXIS = "context"
MODEL_AXIS = "model"


def create_mesh(data: int | None = None, model: int = 1, context: int = 1,
                devices=None) -> Mesh:
    """Create a (data, context, model) mesh over the available devices.

    With defaults, all devices go to the data axis (pure DP — the reference's
    torchrun world). ``model > 1`` carves a model-parallel sub-axis laid out
    innermost so its collectives ride the fastest ICI links; ``context > 1``
    adds a sequence/context-parallel axis for ring attention (its ppermute
    neighbor exchanges also want ICI adjacency, so it sits inside data).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % (model * context) == 0, (n, model, context)
        data = n // (model * context)
    assert data * context * model == n, (
        f"mesh {data}x{context}x{model} != {n} devices")
    arr = np.array(devices).reshape(data, context, model)
    return Mesh(arr, (DATA_AXIS, CONTEXT_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis — the analogue of
    DistributedSampler / dataset.shard(world, rank) (ref: train.py:442-443,
    train_2.py:184-185)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def context_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard images [B, H, W, C] with batch over 'data' AND rows (H) over
    'context' — the input placement for context-parallel (≥1024px) training.
    GSPMD halo-exchanges the convs across the row boundary; the attention
    modules run ring attention over the sharded token axis."""
    return NamedSharding(mesh, P(DATA_AXIS, CONTEXT_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded over data."""
    return jax.device_put(batch, batch_sharding(mesh))
