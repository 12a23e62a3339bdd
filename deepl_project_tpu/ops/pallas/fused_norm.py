"""Fused GroupNorm(+SiLU) Pallas kernels — EXPERIMENTAL, not used by the model.

Measured on v5e at (16, 256, 256, 192): this kernel runs 6.1 ms vs XLA's
2.85 ms for the same GN+SiLU — XLA's fusion is already better at this shape
(C=192 is 1.5 lane tiles and the two pallas_calls re-read the activation).
Kept as a correct, tested baseline for future fusion work (e.g. folding the
apply pass into the following conv); the model uses ops.norms.GroupNorm.

The CNN stages' GroupNorm→SiLU chains are HBM-bound (PERFORMANCE.md): XLA's
stats + normalize passes move the fp32-converted tensor several times
(~300 GB/s effective of ~819 peak). This implementation does exactly two
bf16 passes over the data:

1. stats kernel — grid (B, rows/br) over the flattened [B, H·W, C] view:
   per-(batch, group) sum and sum-of-squares accumulated into a revisited
   [1, 2G] fp32 block.
2. tiny XLA epilogue on [B, 2G]: fold mean/rsqrt/scale/bias into per-
   (batch, channel) mul/add vectors.
3. apply kernel — grid (B, rows/br): y = silu(x·mul + add), elementwise in
   fp32, emitted in the input dtype.

Matches ops.norms.GroupNorm (single-pass moments) + SiLU semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stats_kernel(x_ref, out_ref):
    # Per-CHANNEL moments only — no narrow group reshape inside the kernel
    # (lane-hostile); the group reduction happens in the tiny XLA epilogue.
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_ref[0] = jnp.zeros_like(out_ref[0])

    x = x_ref[0].astype(jnp.float32)  # [br, C]
    s1 = jnp.sum(x, axis=0, keepdims=True)           # [1, C]
    s2 = jnp.sum(jnp.square(x), axis=0, keepdims=True)
    out_ref[0] = out_ref[0] + jnp.concatenate([s1, s2], axis=0)  # [2, C]


def _apply_kernel(x_ref, mul_ref, add_ref, y_ref, *, silu: bool):
    x = x_ref[0].astype(jnp.float32)  # [br, C]
    y = (x * mul_ref[0, 0].astype(jnp.float32)
         + add_ref[0, 0].astype(jnp.float32))
    if silu:
        y = y * jax.nn.sigmoid(y)
    y_ref[0] = y.astype(y_ref.dtype)


def group_norm_silu(x: jax.Array, scale: jax.Array, bias: jax.Array,
                    groups: int = 32, eps: float = 1e-5, silu: bool = True,
                    block_rows: int = 2048) -> jax.Array:
    """Fused GroupNorm(+SiLU) on NHWC input. scale/bias: [C] fp32 params."""
    b, h, w, c = x.shape
    assert c % groups == 0
    rows = h * w
    block_rows = min(block_rows, rows)
    assert rows % block_rows == 0, (rows, block_rows)
    r_blocks = rows // block_rows
    xf = x.reshape(b, rows, c)

    stats = pl.pallas_call(
        _stats_kernel,
        grid=(b, r_blocks),
        in_specs=[pl.BlockSpec((1, block_rows, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
    )(xf)

    # Tiny XLA epilogue: per-channel sums -> per-group stats -> mul/add.
    cg = c // groups
    count = float(rows * cg)
    s1 = stats[:, 0, :].reshape(b, groups, cg).sum(-1)   # [B, G]
    s2 = stats[:, 1, :].reshape(b, groups, cg).sum(-1)
    mean = s1 / count
    var = jnp.maximum(s2 / count - jnp.square(mean), 0.0)
    inv = jax.lax.rsqrt(var + eps)                       # [B, G]
    inv_c = jnp.repeat(inv, cg, axis=1)                  # [B, C]
    mean_c = jnp.repeat(mean, cg, axis=1)
    mul = inv_c * scale.astype(jnp.float32)[None, :]
    add = bias.astype(jnp.float32)[None, :] - mean_c * mul

    y = pl.pallas_call(
        functools.partial(_apply_kernel, silu=silu),
        grid=(b, r_blocks),
        in_specs=[
            pl.BlockSpec((1, block_rows, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_rows, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, rows, c), x.dtype),
    )(xf, mul[:, None, :], add[:, None, :])
    return y.reshape(b, h, w, c)
