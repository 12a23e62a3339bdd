"""Drop-in import-compatibility shim for reference users.

The reference exposes ``from transvae import TransVAE, create_transvae,
TransVAELoss`` (ref: transvae/__init__.py:5-9). This shim maps that surface
onto the TPU-native implementation so existing scripts can switch with an
unchanged import line. Notable differences (see README "Layout and dtype
contracts"): NHWC tensors, functional loss (TransVAELoss here is a thin
callable wrapper over deepl_project_tpu.losses.transvae_loss).
"""

from deepl_project_tpu import (TransVAE, TransVAEConfig, VARIANTS,  # noqa: F401
                               create_transvae, get_config)
from deepl_project_tpu.losses import LossWeights, transvae_loss
from deepl_project_tpu.data.transforms import (preprocess_file,  # noqa: F401
                                               preprocess_image)
from deepl_project_tpu.models import (TransVAEDecoder, TransVAEEncoder,  # noqa: F401
                                      count_params,
                                      enable_gradient_checkpointing,
                                      from_pretrained, get_last_layer,
                                      get_num_params, init_params)


class TransVAELoss:
    """Callable matching the reference loss object's role
    (ref: transvae/losses/vae_loss.py:21): holds weights, returns the loss
    dict. Purely functional inside — safe under jit."""

    def __init__(self, l1_weight=1.0, lpips_weight=1.0, kl_weight=1e-8,
                 vf_weight=0.1, gan_weight=0.05, use_gan=False,
                 logvar_clip=(-30.0, 20.0), lpips_params=None):
        self.weights = LossWeights(
            l1=l1_weight, lpips=lpips_weight, kl=kl_weight, vf=vf_weight,
            gan=gan_weight if use_gan else 0.0, logvar_clip=tuple(logvar_clip))
        if lpips_params is None and lpips_weight > 0:
            from deepl_project_tpu.losses import get_lpips_params

            lpips_params = get_lpips_params()
        self.lpips_params = lpips_params

    def __call__(self, reconstruction, target, mu, logvar, **kw):
        return transvae_loss(reconstruction, target, mu, logvar, self.weights,
                             lpips_params=self.lpips_params, **kw)


__all__ = ["TransVAE", "TransVAELoss", "create_transvae", "TransVAEConfig",
           "VARIANTS", "get_config", "TransVAEEncoder", "TransVAEDecoder",
           "count_params", "from_pretrained", "get_last_layer", "init_params",
           "get_num_params", "enable_gradient_checkpointing",
           "preprocess_image", "preprocess_file"]
