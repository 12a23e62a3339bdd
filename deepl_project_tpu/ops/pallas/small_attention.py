"""Single-kernel whole-head attention for token axes up to N=1024.

One Pallas program computes an entire head's attention in VMEM (fp32 logits
NxN: 4 MB at N=1024), the grid iterating over (batch*heads) with Pallas
double-buffering the q/k/v block DMAs. Measured on v5e at batch 32, N=1024,
h=12, d=64: **3.20 ms vs 4.51 ms blockwise-flash vs 5.91 ms XLA** — the
online-softmax block machinery costs more than it saves when the whole score
matrix fits VMEM. At N=256 XLA's batched path is equal (1.7 ms) — both
overhead-bound — so dispatch keeps XLA there.

Forward-only kernel; the backward (custom VJP) differentiates the plain XLA
attention, which is cheap and memory-safe at these sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_SMALL_N = 1024  # fp32 NxN scores must fit VMEM


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [n, d]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v,
                       preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _forward(q, k, v, scale, interpret=False):
    b, n, h, d = q.shape
    g = b * h

    def to_g(x):
        return x.transpose(0, 2, 1, 3).reshape(g, n, d)

    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((g, n, d), q.dtype),
        interpret=interpret,
    )(to_g(q), to_g(k), to_g(v))
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _xla_reference(q, k, v, scale):
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


@functools.lru_cache(maxsize=None)
def _make_op(scale: float, interpret: bool):
    @jax.custom_vjp
    def op(q, k, v):
        return _forward(q, k, v, scale, interpret)

    def fwd(q, k, v):
        return _forward(q, k, v, scale, interpret), (q, k, v)

    def bwd(residuals, g):
        q, k, v = residuals
        _, vjp = jax.vjp(
            lambda q, k, v: _xla_reference(q, k, v, scale), q, k, v)
        return vjp(g)

    op.defvjp(fwd, bwd)
    return op


def small_attention(q, k, v, scale: float, interpret: bool = False):
    """Attention for N <= 1024: q/k/v [B, N, heads, head_dim] -> same shape.

    Above _MAX_SMALL_N the fp32 NxN score block no longer fits VMEM; callers
    get an explicit error instead of a runtime Mosaic failure.
    """
    if q.shape[1] > _MAX_SMALL_N:
        raise ValueError(
            f"small_attention supports N <= {_MAX_SMALL_N}; got N={q.shape[1]}"
            " — use flash_attention (blockwise) for longer token axes")
    return _make_op(float(scale), bool(interpret))(q, k, v)
