from .mesh import (CONTEXT_AXIS, DATA_AXIS, MODEL_AXIS, batch_sharding,
                   context_batch_sharding, create_mesh, replicated,
                   shard_batch)
from .ring_attention import (context_parallel_attention, ring_attention,
                             sequence_parallel_attention)
from .sharding import param_shardings, param_specs, shard_params

__all__ = [
    "CONTEXT_AXIS", "DATA_AXIS", "MODEL_AXIS", "create_mesh",
    "batch_sharding", "context_batch_sharding", "replicated", "shard_batch",
    "param_specs", "param_shardings", "shard_params", "ring_attention",
    "context_parallel_attention", "sequence_parallel_attention",
]
