"""deepl_project_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
reference TransVAE framework (benabbouosama/DEEPL-Project).

Public API parity with ``from transvae import TransVAE, create_transvae,
TransVAELoss`` (ref: transvae/__init__.py:5-9), plus the TPU-first extensions:
device-mesh parallelism, Pallas flash attention, orbax checkpointing.

Note: importing the top-level package is intentionally light — losses and
training pull in heavier deps and are imported lazily via submodules.
"""

from .config import VARIANTS, TransVAEConfig, get_config
from .models import (TransVAE, count_params, create_transvae, from_pretrained,
                     init_params)

__version__ = "0.1.0"

__all__ = [
    "TransVAE", "TransVAEConfig", "VARIANTS", "get_config",
    "create_transvae", "init_params", "count_params", "from_pretrained",
]
