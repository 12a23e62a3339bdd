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


class _FusedDownDC(nn.Module):
    """Exact fusion of pixel-unshuffle(2) + 1x1 conv as ONE 2x2 stride-2 conv.

    space_to_depth orders channels as c*4 + i*2 + j, so the 1x1 kernel
    [1,1,4C,Co] reshapes to [C,2,2,Co] -> HWIO [2,2,C,Co] and the op becomes a
    single strided conv — no materialized unshuffled intermediate, no
    transpose chain.  Param shapes/names match the 1x1 conv exactly, so
    checkpoints (incl. converted reference weights) are unaffected.
    """

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", _conv_kernel_init(),
                            (1, 1, 4 * self.in_channels, self.out_channels),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                          self.param_dtype)
        w = kernel.astype(self.dtype).reshape(
            self.in_channels, 2, 2, self.out_channels).transpose(1, 2, 0, 3)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class Downsample(nn.Module):
    """Conv downsample x2 with information-preserving DC shortcut."""

    in_channels: int
    out_channels: int
    use_dc_path: bool = True
    # Exact fused DC path (single 2x2 s2 conv); disable for the literal
    # reference op order.
    fuse_dc: bool = True
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
            if self.fuse_dc:
                dc = _FusedDownDC(self.in_channels, self.out_channels,
                                  dtype=self.dtype,
                                  param_dtype=self.param_dtype,
                                  name="dc_conv")(x)
            else:
                dc = space_to_depth(x, 2)
                dc = conv(self.out_channels, (1, 1), name="dc_conv")(dc)
            y = y + dc
        return y


class _FusedUpConv(nn.Module):
    """Exact fusion of nearest-x2 upsample + conv3x3(pad 1).

    Output phase (i, j) of the upsampled grid sees only a 2x2 input window
    whose taps are sums of the 3x3 kernel's rows/columns (nearest-neighbour
    duplication collapses adjacent taps):  rows for i=0 are {W0, W1+W2},
    for i=1 {W0+W1, W2}, likewise for columns.  So the op is four 2x2
    stride-1 convs at INPUT resolution + pixel-shuffle — 16 vs 36
    MACs/output (2.25x fewer FLOPs) and no materialized 4x-size
    intermediate.  Param shapes/names match the plain conv ("kernel"
    [3,3,Ci,Co], "bias" [Co]) so checkpoints are unaffected.
    """

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", _conv_kernel_init(),
                            (3, 3, self.in_channels, self.out_channels),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,),
                          self.param_dtype)
        w = kernel.astype(self.dtype)
        xb = x.astype(self.dtype)
        # nearest-x2 is conv_transpose(ones(2,2), stride 2), so the composed
        # op is ONE stride-2 transposed conv with the 4x4 kernel
        # K[u,v] = sum_{dy in S_u, dx in S_v} W[dy,dx], S = {0},{0,1},{1,2},{2}
        # (adjacent taps collapse under nearest duplication). XLA's
        # lhs-dilated lowering phase-decomposes this internally — measured
        # 12.3 ms vs ~25 ms for the explicit 4-phase-conv + interleave at
        # 128->256 c192 b32 on v5e — and no 4x-size intermediate exists.
        # Derivation: out[2a+i] over dilated x with pad 2 picks taps
        # u = i, i+2 -> x[a-1+u/2]; matches GN-free phase sums exactly.
        s_taps = ((0,), (0, 1), (1, 2), (2,))
        k4 = jnp.stack([
            jnp.stack([sum(w[dy, dx] for dy in su for dx in sv)
                       for sv in s_taps], axis=0)
            for su in s_taps], axis=0)  # [4,4,Ci,Co]
        y = jax.lax.conv_general_dilated(
            xb, k4, window_strides=(1, 1), padding=((2, 2), (2, 2)),
            lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias.astype(self.dtype)


class _FusedUpDC(nn.Module):
    """Exact fusion of 1x1 conv to 4*C_out + pixel-shuffle(2) as ONE stride-2
    TRANSPOSED conv (the mirror of _FusedDownDC).

    depth_to_space sends input channel o*4 + i*2 + j to output channel o at
    spatial offset (i, j), so dc[2a+i, 2b+j, o] = x[a, b] @ W[:, o*4+i*2+j].
    As an lhs-dilated conv (dilation 2, kernel 2x2, pad 1): out[p] =
    sum_u xd[p+u-1] k[u] with xd[2a]=x[a], so phase i picks tap u = 1-i and
    k[u, v, :, o] = W[:, o*4 + (1-u)*2 + (1-v)].  The per-phase bias
    b[o*4+i*2+j] is added via a broadcast over the (even,odd) row/col split —
    no materialized [H/2,W/2,4C] intermediate, no transpose chain.  Param
    shapes/names match the 1x1 conv exactly, so checkpoints are unaffected.
    """

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        co = self.out_channels
        kernel = self.param("kernel", _conv_kernel_init(),
                            (1, 1, self.in_channels, 4 * co),
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (4 * co,),
                          self.param_dtype)
        w = kernel.astype(self.dtype).reshape(self.in_channels, co, 2, 2)
        # k[u, v, ci, o] = W[ci, o*4 + (1-u)*2 + (1-v)]
        k2 = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)  # [2,2,Ci,Co]
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2, window_strides=(1, 1),
            padding=((1, 1), (1, 1)), lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        b, h2, w2, _ = y.shape
        btile = bias.astype(self.dtype).reshape(co, 2, 2).transpose(1, 2, 0)
        y = y.reshape(b, h2 // 2, 2, w2 // 2, 2, co)
        y = y + btile[None, None, :, None, :, :]
        return y.reshape(b, h2, w2, co)


class Upsample(nn.Module):
    """Conv upsample x2 with information-preserving DC shortcut."""

    in_channels: int
    out_channels: int
    use_dc_path: bool = True
    # Exact fused nearest+conv main path (2.25x fewer FLOPs); disable to run
    # the literal reference op order.
    fuse_main: bool = True
    # Exact fused DC path (single 2x2 s2 transposed conv); disable for the
    # literal reference op order.
    fuse_dc: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = functools.partial(
            nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=_conv_kernel_init())
        if self.fuse_main:
            y = _FusedUpConv(self.in_channels, self.out_channels,
                             dtype=self.dtype, param_dtype=self.param_dtype,
                             name="main_0")(x)
        else:
            y = nearest_upsample(x, 2)
            y = conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                     name="main_0")(y)
        y = nn.silu(y)
        y = conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), name="main_1")(y)
        if self.use_dc_path:
            if self.fuse_dc:
                dc = _FusedUpDC(self.in_channels, self.out_channels,
                                dtype=self.dtype, param_dtype=self.param_dtype,
                                name="dc_conv")(x)
            else:
                dc = conv(self.out_channels * 4, (1, 1), name="dc_conv")(x)
                dc = depth_to_space(dc, 2)
            y = y + dc
        return y
