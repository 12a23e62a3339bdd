from .decoder import TransVAEDecoder
from .encoder import TransVAEEncoder
from .transvae import TransVAE, count_params, create_transvae, from_pretrained, init_params

__all__ = [
    "TransVAE", "TransVAEEncoder", "TransVAEDecoder",
    "create_transvae", "init_params", "count_params", "from_pretrained",
]
