"""TransVAE decoder: transformer stages then CNN stages, NHWC (symmetric to the
encoder).

Reference behavior (transvae/models/decoder.py:12-132): 3x3 conv from latent;
first ``num_stages - 2`` stages are TransVAE blocks, last 2 CNN ResBlocks;
Upsample between stages; final GroupNorm(32)→SiLU→3x3 conv.

Output contract: **unbounded logits** — apply ``jax.nn.sigmoid`` at the boundary
to obtain [0,1] images (patched reference semantics; SURVEY.md §2.9.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..config import TransVAEConfig
from ..ops.blocks import ResBlock, TransVAEBlock, resolve_remat_policy
from ..ops.stack import BlockStack
from ..ops.ffn import _conv_kernel_init
from ..ops.norms import GroupNorm, gn_groups
from ..ops.resample import Upsample


class TransVAEDecoder(nn.Module):
    config: TransVAEConfig

    @nn.compact
    def __call__(self, z: jax.Array, deterministic: bool = True) -> jax.Array:
        cfg = self.config
        dtype, pdtype = cfg.compute_dtype, cfg.params_dtype
        depths = tuple(reversed(cfg.depths))
        dims = tuple(reversed(cfg.base_dims))
        num_transformer_stages = cfg.num_stages - cfg.num_cnn_stages

        res_cls, tv_cls, rs_cls = ResBlock, TransVAEBlock, Upsample
        if cfg.remat:
            policy = resolve_remat_policy(cfg.remat_policy)
            res_cls = nn.remat(ResBlock, policy=policy)
            tv_cls = nn.remat(TransVAEBlock, static_argnums=(2,), policy=policy)
        if cfg.remat and cfg.remat_resample:
            rs_cls = nn.remat(Upsample)

        h = nn.Conv(dims[0], (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, param_dtype=pdtype,
                    kernel_init=_conv_kernel_init(), name="conv_in")(z.astype(dtype))

        q_res = cfg.quant if cfg.quant_scope in ("all", "resblock") else None
        q_ffn = cfg.quant if cfg.quant_scope in ("all", "ffn") else None
        for i in range(cfg.num_stages):
            dim = dims[i]
            is_cnn = i >= num_transformer_stages
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
                    depth=depths[i], remat=cfg.remat,
                    remat_policy=cfg.remat_policy,
                    pass_deterministic=not is_cnn,
                    name=f"stage{i}_blocks")(h, deterministic)
            else:
                for j in range(depths[i]):
                    if is_cnn:
                        h = res_cls(**res_kwargs,
                                    name=f"stage{i}_block{j}")(h)
                    else:
                        h = tv_cls(**tv_kwargs,
                                   name=f"stage{i}_block{j}")(h, deterministic)
            if i < cfg.num_stages - 1:
                h = rs_cls(dim, dims[i + 1], use_dc_path=cfg.use_dc_path,
                             dtype=dtype, param_dtype=pdtype, name=f"up{i}")(h)

        h = GroupNorm(gn_groups(dims[-1]), dims[-1], dtype=dtype, param_dtype=pdtype, name="norm_out")(h)
        h = nn.silu(h)
        x = nn.Conv(cfg.input_channels, (3, 3), padding=((1, 1), (1, 1)),
                    dtype=dtype, param_dtype=pdtype,
                    kernel_init=_conv_kernel_init(), name="conv_out")(h)
        return x
