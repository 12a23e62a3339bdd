"""PatchGAN discriminator for stage-2 adversarial training.

The reference wires GAN losses and CLI flags but ships **no discriminator
architecture** (always passes discriminator=None; SURVEY.md §2.3 note,
PROJECT_STRUCTURE.md:163 lists PatchGAN as TODO). This supplies the missing
piece so stage 2 is actually trainable: a standard 70x70 PatchGAN
(pix2pix-style) in NHWC with instance norm, emitting a logit map.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn


class InstanceNorm(nn.Module):
    """Per-(batch, channel) normalization over spatial dims, fp32 stats."""

    dim: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.dim,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), self.param_dtype)
        x32 = x.astype(jnp.float32)
        m1 = jnp.mean(x32, axis=(1, 2), keepdims=True)
        m2 = jnp.mean(jnp.square(x32), axis=(1, 2), keepdims=True)
        var = jnp.maximum(m2 - jnp.square(m1), 0.0)
        y = (x32 - m1) * jax.lax.rsqrt(var + self.eps)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(self.dtype)


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN: input [B,H,W,3] in [0,1] → patch logits [B,H/8,W/8,1]."""

    base_channels: int = 64
    num_layers: int = 3
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = functools.partial(
            nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(0.02))
        leaky = functools.partial(nn.leaky_relu, negative_slope=0.2)

        # Receptive-field floor: after num_layers stride-2 convs the map is
        # H/2^L; conv_pen and conv_out (4x4, pad 1, stride 1) each shave one
        # more pixel. Anything smaller produces a ZERO-SIZE logit map whose
        # mean is silently NaN — fail loudly instead.
        min_input = 3 * (2 ** self.num_layers)
        if x.shape[1] < min_input or x.shape[2] < min_input:
            raise ValueError(
                f"PatchDiscriminator(num_layers={self.num_layers}) needs "
                f"inputs >= {min_input}px; got {x.shape[1]}x{x.shape[2]}. "
                "Use fewer layers for small images.")
        h = x.astype(self.dtype)
        ch = self.base_channels
        h = conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                 name="conv0")(h)
        h = leaky(h)
        for i in range(1, self.num_layers):
            ch = min(self.base_channels * (2 ** i), 512)
            h = conv(ch, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=False, name=f"conv{i}")(h)
            h = InstanceNorm(ch, dtype=self.dtype, name=f"norm{i}")(h)
            h = leaky(h)
        ch = min(self.base_channels * (2 ** self.num_layers), 512)
        h = conv(ch, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                 use_bias=False, name="conv_pen")(h)
        h = InstanceNorm(ch, dtype=self.dtype, name="norm_pen")(h)
        h = leaky(h)
        logits = conv(1, (4, 4), strides=(1, 1), padding=((1, 1), (1, 1)),
                      name="conv_out")(h)
        return logits.astype(jnp.float32)
