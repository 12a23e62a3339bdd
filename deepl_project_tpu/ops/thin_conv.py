"""3x3 convolutions with thin input/output channel counts, rewritten as
MXU-shaped matmuls (exact up to fp reassociation).

Two forms, for the model's boundary convs (ref transvae/models/encoder.py:33
stem 3->C, decoder.py:126 head C->3):

- thin INPUT (im2col): 9 padded shifts concatenated on channels followed by
  ONE [9*Ci, C_out] matmul — avoids XLA's input-lane padding of the native
  conv (measured isolated on v5e, 3->192 @256^2 b32: 6.07 -> 4.55 ms).

- thin OUTPUT (tap-major): ONE [C_in, 9*C_out] matmul producing all taps'
  contributions at every pixel, then 9 shifted slice-adds — avoids wasting
  125/128 MXU output lanes per tap (isolated, GN+SiLU+192->3 @256^2 b32:
  11.24 -> 4.99 ms).

**NOT wired into the model.** In-model A/B on the headline bench (large@256
b32, PERFORMANCE.md round-2c) both REGRESSED: the stem im2col cost -137 ms
end-to-end (the [B,H,W,27] intermediate poisons XLA's layout choices through
the whole first CNN stage) and the head form +2.4 ms (XLA already fuses the
in-context head to ~4 ms; the isolated 11.24 ms is not what the model pays).
Kept as a correct, tested primitive — the same lesson as ops/pallas/
fused_norm.py: only in-model deltas decide what ships.

Both forms keep the nn.Conv parameter tree ({kernel [3,3,Ci,Co], bias [Co]})
so checkpoints and the torch->JAX converter are unaffected.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .ffn import _conv_kernel_init

# 9*Cin lanes stay under one MXU K tile's padding waste budget; beyond this
# XLA's native conv is already lane-efficient.
_THIN_IN_MAX = 32
_THIN_OUT_MAX = 16


def thin_input_conv3x3(x: jax.Array, kernel: jax.Array,
                       bias: jax.Array | None) -> jax.Array:
    """stride-1 pad-1 3x3 conv via im2col for small C_in.

    x: [B,H,W,Ci]; kernel: [3,3,Ci,Co]; returns [B,H,W,Co] in x.dtype.
    """
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = [xp[:, dy:dy + h, dx:dx + w, :]
            for dy in range(3) for dx in range(3)]
    xim = jnp.concatenate(cols, axis=-1)            # [B,H,W,9*Ci]
    wim = kernel.reshape(9 * ci, co).astype(x.dtype)  # (dy,dx,ci) row order
    y = jnp.dot(xim, wim, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def thin_output_conv3x3(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array | None) -> jax.Array:
    """stride-1 pad-1 3x3 conv via a tap-major matmul for small C_out.

    x: [B,H,W,Ci]; kernel: [3,3,Ci,Co]; returns [B,H,W,Co] in x.dtype.
    """
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    # [Ci, 9*Co], minor order (dy, dx, o): column (dy*3+dx)*co + o.
    wflat = kernel.transpose(2, 0, 1, 3).reshape(ci, 9 * co).astype(x.dtype)
    z = jnp.dot(x, wflat, preferred_element_type=jnp.float32)  # [B,H,W,9Co]
    zp = jnp.pad(z, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # y[p,q,o] = sum_{dy,dx} z[p+dy-1, q+dx-1, (dy*3+dx)*co + o]
    y = sum(zp[:, dy:dy + h, dx:dx + w,
               (dy * 3 + dx) * co:(dy * 3 + dx + 1) * co]
            for dy in range(3) for dx in range(3))
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class ThinConv3x3(nn.Module):
    """Drop-in for nn.Conv(features, (3,3), padding=1) when either channel
    axis is thin. Falls back to the native conv when neither side qualifies
    (so callers can use it unconditionally at boundary convs)."""

    in_channels: int
    out_channels: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param("kernel", _conv_kernel_init(),
                            (3, 3, self.in_channels, self.out_channels),
                            self.param_dtype)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.out_channels,), self.param_dtype)
                if self.use_bias else None)
        xc = x.astype(self.dtype)
        if self.in_channels <= _THIN_IN_MAX:
            return thin_input_conv3x3(xc, kernel, bias)
        if self.out_channels <= _THIN_OUT_MAX:
            return thin_output_conv3x3(xc, kernel, bias)
        y = jax.lax.conv_general_dilated(
            xc, kernel.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        if bias is not None:
            y = y + bias.astype(self.dtype)
        return y
