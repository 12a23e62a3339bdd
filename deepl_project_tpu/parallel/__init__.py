from .mesh import (DATA_AXIS, MODEL_AXIS, batch_sharding, create_mesh,
                   replicated, shard_batch)
from .sharding import param_shardings, param_specs, shard_params

__all__ = [
    "DATA_AXIS", "MODEL_AXIS", "create_mesh", "batch_sharding", "replicated",
    "shard_batch", "param_specs", "param_shardings", "shard_params",
]
