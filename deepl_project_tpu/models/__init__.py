from .decoder import TransVAEDecoder
from .dit import DIT_VARIANTS, DiT, DiTConfig, get_dit_config, init_dit_params
from .encoder import TransVAEEncoder
from .transvae import (TransVAE, adaptive_gan_weight, count_params, create_transvae,
                       enable_gradient_checkpointing, from_pretrained,
                       get_last_layer, get_num_params, init_params)

__all__ = [
    "TransVAE", "TransVAEEncoder", "TransVAEDecoder",
    "create_transvae", "init_params", "count_params", "from_pretrained",
    "get_last_layer", "adaptive_gan_weight", "get_num_params",
    "enable_gradient_checkpointing",
    "DiT", "DiTConfig", "DIT_VARIANTS", "get_dit_config", "init_dit_params",
]
