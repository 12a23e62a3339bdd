from .decoder import TransVAEDecoder
from .dit import DIT_VARIANTS, DiT, DiTConfig, get_dit_config, init_dit_params
from .encoder import TransVAEEncoder
from .transvae import (TransVAE, adaptive_gan_weight, count_params, create_transvae,
                       from_pretrained, get_last_layer, init_params)

__all__ = [
    "TransVAE", "TransVAEEncoder", "TransVAEDecoder",
    "create_transvae", "init_params", "count_params", "from_pretrained",
    "get_last_layer", "adaptive_gan_weight",
    "DiT", "DiTConfig", "DIT_VARIANTS", "get_dit_config", "init_dit_params",
]
