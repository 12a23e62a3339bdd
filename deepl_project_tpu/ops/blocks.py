"""Core building blocks: CNN ResBlock and the hybrid TransVAE block (NHWC).

Reference behavior: transvae/modules/blocks.py:12-151.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import AttentionRoPE
from .ffn import ConvFFN, StandardFFN, _conv_kernel_init
from .norms import GroupNorm, RMSNorm, gn_groups


def _convs_and_dots_saveable(prim, *_, **__) -> bool:
    # The built-in dots policies ignore conv_general_dilated, so under them
    # every CNN-stage conv is recomputed in the backward pass — expensive at
    # the high-spatial stages. This policy saves conv AND matmul outputs;
    # remat then recomputes only the cheap elementwise chains.
    return str(getattr(prim, "name", prim)) in ("conv_general_dilated",
                                                "dot_general")


def resolve_remat_policy(name: str | None):
    """Map a config remat_policy name to a jax.checkpoint policy.

    'none'      — save nothing (max memory saving, max recompute)
    'dots'      — save non-batch matmul outputs (attention QK/PV and conv
                  outputs still recomputed)
    'dots_all'  — save ALL matmul outputs incl. batched attention matmuls
    'conv_dots' — save conv + matmul outputs; recompute only elementwise
                  (fastest backward, highest memory)
    """
    if name in (None, "none"):
        return None
    if name == "dots":
        return jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    if name == "dots_all":
        return jax.checkpoint_policies.dots_saveable
    if name == "conv_dots":
        return _convs_and_dots_saveable
    raise ValueError(f"Unknown remat policy {name!r}")


class ResBlock(nn.Module):
    """GroupNorm(32)→SiLU→3x3 conv, x2, plus 1x1 (or 3x3) shortcut on channel
    change (ref: blocks.py:12-68)."""

    in_channels: int
    out_channels: int
    use_conv_shortcut: bool = False
    # Int8 serving path + calibration hook — see ops/quant.py. GroupNorm/SiLU
    # stay float; the three convs run s8xs8->s32 with static act scales.
    quant: str | None = None
    calibrate: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.quant == "int8":
            from .quant import QConv

            conv = lambda feats, ks, name: QConv(  # noqa: E731
                feats, ks, dtype=self.dtype, name=name)
        else:
            _c = functools.partial(
                nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
                kernel_init=_conv_kernel_init())
            conv = lambda feats, ks, name: _c(  # noqa: E731
                feats, ks, padding="SAME", name=name)
        gn = lambda dim, name: GroupNorm(  # noqa: E731
            gn_groups(dim), dim, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        h = gn(self.in_channels, name="norm1")(x)
        h = nn.silu(h)
        if self.calibrate:
            from .quant import sow_amax

            sow_amax(self, "amax_h1", h)
        h = conv(self.out_channels, (3, 3), name="conv1")(h)
        h = gn(self.out_channels, name="norm2")(h)
        h = nn.silu(h)
        if self.calibrate:
            sow_amax(self, "amax_h2", h)
        h = conv(self.out_channels, (3, 3), name="conv2")(h)
        if self.in_channels != self.out_channels:
            if self.calibrate:
                sow_amax(self, "amax_x", x)
            if self.use_conv_shortcut:
                sc = conv(self.out_channels, (3, 3), name="shortcut")(x)
            else:
                sc = conv(self.out_channels, (1, 1), name="shortcut")(x)
        else:
            sc = x
        return h + sc


class TransVAEBlock(nn.Module):
    """Pre-norm transformer block on feature maps:
    x + attn(RMSNorm(x)); x + ffn(RMSNorm(x))  (ref: blocks.py:71-151)."""

    dim: int
    mlp_ratio: float = 1.0
    head_dim: int = 64
    use_rope: bool = True
    rope_pairing: str = "reference"
    use_conv_ffn: bool = True
    conv_ffn_type: str = "full"
    dropout: float = 0.0
    attention_impl: str = "auto"
    context_axis: str | None = None
    quant: str | None = None  # int8 serving path (ConvFFN only; attention
    calibrate: bool = False   # stays in the fused bf16 kernels)
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        common = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        h = RMSNorm(self.dim, name="norm1", **common)(x)
        h = AttentionRoPE(self.dim, head_dim=self.head_dim, use_rope=self.use_rope,
                          rope_pairing=self.rope_pairing,
                          dropout=self.dropout, impl=self.attention_impl,
                          context_axis=self.context_axis,
                          name="attn", **common)(h, deterministic=deterministic)
        x = x + h
        h = RMSNorm(self.dim, name="norm2", **common)(x)
        if self.use_conv_ffn:
            h = ConvFFN(self.dim, mlp_ratio=self.mlp_ratio,
                        conv_type=self.conv_ffn_type, dropout=self.dropout,
                        quant=self.quant, calibrate=self.calibrate,
                        name="ffn", **common)(h, deterministic=deterministic)
        else:
            h = StandardFFN(self.dim, mlp_ratio=self.mlp_ratio,
                            dropout=self.dropout, name="ffn",
                            **common)(h, deterministic=deterministic)
        return x + h
