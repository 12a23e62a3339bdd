"""TransVAE encoder: CNN stages then transformer stages, NHWC.

Reference behavior (transvae/models/encoder.py:12-126): 3x3 conv stem; first
``num_cnn_stages`` (=2) stages are ResBlocks, the rest TransVAE blocks; a
Downsample between every pair of stages (so f = 2**(num_stages-1)).

TPU notes: the per-stage block loop is static Python (config-driven), so XLA
sees a flat fused graph. Gradient checkpointing is per-block ``nn.remat``
(the XLA analogue of torch.utils.checkpoint in ref encoder.py:114-124).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TransVAEConfig
from ..ops.blocks import ResBlock, TransVAEBlock, resolve_remat_policy
from ..ops.stack import BlockStack
from ..ops.ffn import _conv_kernel_init
from ..ops.resample import Downsample


class TransVAEEncoder(nn.Module):
    config: TransVAEConfig

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        dtype, pdtype = cfg.compute_dtype, cfg.params_dtype
        res_cls, tv_cls, rs_cls = ResBlock, TransVAEBlock, Downsample
        if cfg.remat:
            policy = resolve_remat_policy(cfg.remat_policy)
            res_cls = nn.remat(ResBlock, policy=policy)
            tv_cls = nn.remat(TransVAEBlock, static_argnums=(2,), policy=policy)
        if cfg.remat and cfg.remat_resample:
            rs_cls = nn.remat(Downsample)

        h = nn.Conv(cfg.base_dims[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, param_dtype=pdtype,
                    kernel_init=_conv_kernel_init(), name="conv_in")(x.astype(dtype))

        q_res = cfg.quant if cfg.quant_scope in ("all", "resblock") else None
        q_ffn = cfg.quant if cfg.quant_scope in ("all", "ffn") else None
        for i in range(cfg.num_stages):
            dim = cfg.base_dims[i]
            is_cnn = i < cfg.num_cnn_stages
            res_kwargs = dict(in_channels=dim, out_channels=dim,
                              quant=q_res, calibrate=cfg.quant_calibrate,
                              dtype=dtype, param_dtype=pdtype)
            tv_kwargs = dict(dim=dim, mlp_ratio=cfg.mlp_ratio,
                             head_dim=cfg.head_dim, use_rope=cfg.use_rope,
                             rope_pairing=cfg.rope_pairing,
                             use_conv_ffn=cfg.use_conv_ffn,
                             conv_ffn_type=cfg.conv_ffn_type,
                             dropout=cfg.dropout,
                             attention_impl=cfg.attention_impl,
                             context_axis=cfg.context_axis,
                             quant=q_ffn, calibrate=cfg.quant_calibrate,
                             dtype=dtype, param_dtype=pdtype)
            if cfg.scan_blocks:
                h = BlockStack(
                    block_cls=ResBlock if is_cnn else TransVAEBlock,
                    block_kwargs=tuple(sorted(
                        (res_kwargs if is_cnn else tv_kwargs).items())),
                    depth=cfg.depths[i], remat=cfg.remat,
                    remat_policy=cfg.remat_policy,
                    pass_deterministic=not is_cnn,
                    name=f"stage{i}_blocks")(h, deterministic)
            else:
                for j in range(cfg.depths[i]):
                    if is_cnn:
                        h = res_cls(**res_kwargs,
                                    name=f"stage{i}_block{j}")(h)
                    else:
                        h = tv_cls(**tv_kwargs,
                                   name=f"stage{i}_block{j}")(h, deterministic)
            if i < cfg.num_stages - 1:
                h = rs_cls(dim, cfg.base_dims[i + 1], use_dc_path=cfg.use_dc_path,
                               dtype=dtype, param_dtype=pdtype,
                               name=f"down{i}")(h)
        return h
