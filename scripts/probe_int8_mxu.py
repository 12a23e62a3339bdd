"""Probe: does s8xs8->s32 hit the v5e MXU fast path (2x bf16 peak)?

v5e peak: 197 bf16 TFLOP/s vs 394 int8 TOP/s. If XLA lowers int8
dot_general / conv to the native int8 MXU mode, a post-training-quantized
serving path could raise the (compute-bound) headline materially. If it
instead upcasts to bf16 (or worse, fp32), int8 is a dead end on this
toolchain and we record that.

Measures, at a large square matmul and at the model's hot conv shape:
  bf16xbf16->f32, s8xs8->s32, and (weight-only) bf16xs8.

Usage: python scripts/probe_int8_mxu.py
"""

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax


def _time(fn, *args, iters=20):
    fetch = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    out = fn(*args)
    float(fetch(out))  # warmup + fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def matmul_probe(n=8192):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    a_bf = jax.random.normal(k1, (n, n), jnp.bfloat16)
    b_bf = jax.random.normal(k2, (n, n), jnp.bfloat16)
    a_i8 = (jax.random.normal(k1, (n, n)) * 30).astype(jnp.int8)
    b_i8 = (jax.random.normal(k2, (n, n)) * 30).astype(jnp.int8)

    @jax.jit
    def mm_bf16(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    @jax.jit
    def mm_i8(a, b):
        return lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)

    @jax.jit
    def mm_w8(a, b):  # weight-only: dequantize weights then bf16 matmul
        return lax.dot_general(a, b.astype(jnp.bfloat16),
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)

    flops = 2.0 * n ** 3
    for name, fn, args in [("bf16", mm_bf16, (a_bf, b_bf)),
                           ("int8", mm_i8, (a_i8, b_i8)),
                           ("w8(dequant)", mm_w8, (a_bf, b_i8))]:
        dt = _time(fn, *args)
        print(f"matmul {n}^3 {name:12s}: {dt*1e3:7.2f} ms  "
              f"{flops/dt/1e12:6.1f} T{'OP' if 'int8' in name else 'FLOP'}/s",
              flush=True)


def conv_probe(b=32, hw=64, cin=384, cout=384):
    """Stage-2-like 3x3 conv (the ConvFFN bottleneck band)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x_bf = jax.random.normal(k1, (b, hw, hw, cin), jnp.bfloat16)
    w_bf = jax.random.normal(k2, (3, 3, cin, cout), jnp.bfloat16)
    x_i8 = (jax.random.normal(k1, (b, hw, hw, cin)) * 30).astype(jnp.int8)
    w_i8 = (jax.random.normal(k2, (3, 3, cin, cout)) * 30).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x_bf.shape, w_bf.shape,
                                    ("NHWC", "HWIO", "NHWC"))

    @functools.partial(jax.jit, static_argnames=("ptype",))
    def conv(x, w, ptype=jnp.float32):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn,
                                        preferred_element_type=ptype)

    flops = 2.0 * b * hw * hw * 9 * cin * cout
    for name, args, kw in [("bf16", (x_bf, w_bf), {}),
                           ("int8", (x_i8, w_i8), dict(ptype=jnp.int32))]:
        try:
            dt = _time(lambda *a: conv(*a, **kw), *args)
            print(f"conv3x3 b{b} {hw}^2 c{cin}->{cout} {name:5s}: "
                  f"{dt*1e3:7.2f} ms  {flops/dt/1e12:6.1f} T/s", flush=True)
        except Exception as e:  # int8 convs may be unsupported
            print(f"conv3x3 {name}: FAILED — {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    matmul_probe()
    conv_probe()
