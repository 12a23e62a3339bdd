"""Down/Upsample with DC (direct-connect) paths, NHWC.

Reference behavior (transvae/modules/upsample.py:10-128):
- Downsample: main path conv3x3(s1)→SiLU→conv3x3(s2) plus DC path
  pixel_unshuffle(2)→1x1 conv, summed.
- Upsample: main path nearest-x2→conv3x3→SiLU→conv3x3 plus DC path
  1x1 conv to 4*C_out→pixel_shuffle(2), summed.

TPU notes: pixel (un)shuffle is pure reshape/transpose in NHWC (free at the XLA
level — it fuses into the adjacent 1x1 conv as a strided matmul). The channel
ordering of space_to_depth / depth_to_space below matches PyTorch's
F.pixel_unshuffle / F.pixel_shuffle exactly so converted reference weights are
drop-in after the OIHW→HWIO transpose.

Stride-2 conv uses explicit ((1,1),(1,1)) padding (not XLA 'SAME', whose
asymmetric pad placement differs from torch's symmetric padding=1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ffn import _conv_kernel_init


def space_to_depth(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC pixel-unshuffle: [B,H,W,C] -> [B,H/r,W/r,C*r*r].

    Output channel order is c*r*r + i*r + j (torch F.pixel_unshuffle order).
    """
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # [B, H/r, W/r, C, r, r]
    return x.reshape(b, h // r, w // r, c * r * r)


def depth_to_space(x: jax.Array, r: int = 2) -> jax.Array:
    """NHWC pixel-shuffle: [B,H,W,C*r*r] -> [B,H*r,W*r,C].

    Input channel c*r*r + i*r + j maps to output channel c at offset (i, j)
    (torch F.pixel_shuffle order).
    """
    b, h, w, c4 = x.shape
    c = c4 // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # [B, H, r, W, r, C]
    return x.reshape(b, h * r, w * r, c)


def nearest_upsample(x: jax.Array, r: int = 2) -> jax.Array:
    """Nearest-neighbour x2 upsample in NHWC via repeat."""
    x = jnp.repeat(x, r, axis=1)
    return jnp.repeat(x, r, axis=2)


class Downsample(nn.Module):
    """Conv downsample x2 with information-preserving DC shortcut."""

    in_channels: int
    out_channels: int
    use_dc_path: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = functools.partial(
            nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=_conv_kernel_init())
        y = conv(self.in_channels, (3, 3), padding=((1, 1), (1, 1)), name="main_0")(x)
        y = nn.silu(y)
        y = conv(self.out_channels, (3, 3), strides=(2, 2),
                 padding=((1, 1), (1, 1)), name="main_1")(y)
        if self.use_dc_path:
            dc = space_to_depth(x, 2)
            dc = conv(self.out_channels, (1, 1), name="dc_conv")(dc)
            y = y + dc
        return y


class Upsample(nn.Module):
    """Conv upsample x2 with information-preserving DC shortcut."""

    in_channels: int
    out_channels: int
    use_dc_path: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = functools.partial(
            nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=_conv_kernel_init())
        y = nearest_upsample(x, 2)
        y = conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="main_0")(y)
        y = nn.silu(y)
        y = conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="main_1")(y)
        if self.use_dc_path:
            dc = conv(self.out_channels * 4, (1, 1), name="dc_conv")(x)
            dc = depth_to_space(dc, 2)
            y = y + dc
        return y
