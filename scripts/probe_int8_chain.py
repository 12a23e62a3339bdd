"""Probe: the FULL int8 PTQ chain vs plain bf16, at the model's hot shapes.

probe_int8_mxu.py measured pre-quantized operands (pure s8xs8 conv/matmul)
and found 1.30x on the 384-channel conv and 1.79x on the big matmul. The
in-model result at large@256 b32 is a 0.876x REGRESSION (bench_quant.py), so
this probe isolates where the win dies: it times, per shape,

  bf16:   y = conv(x_bf16, w_bf16)                      (the float path)
  chain:  y = dequant(conv(quantize(x_bf16), w_i8))     (what the model runs)
  pure:   y = conv(x_i8, w_i8) -> s32                   (the mxu-probe number)

over the stage shapes of large f16d32 @256 b32 (ResBlock convs at c=192
128^2/64^2, ConvFFN conv_1 at its bottleneck widths) plus the ConvFFN folded
matmuls. Usage: python scripts/probe_int8_chain.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from deepl_project_tpu.ops.quant import qconv, qmatmul, quantize_weight


def _time(fn, *args, iters=20):
    fetch = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    float(fetch(fn(*args)))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def conv_shapes():
    # (tag, B, HW, Cin, Cout) — large f16d32 @256 b32 conv sites.
    return [
        ("stage0 res 3x3", 32, 128, 192, 192),
        ("stage1 res 3x3", 32, 64, 192, 192),
        ("stage2 ffn conv_1", 32, 32, 384, 384),
        ("stage3 ffn conv_1", 32, 16, 768, 768),
        ("stage4 ffn conv_1", 32, 8, 1536, 1536),
    ]


def probe_conv(tag, b, hw, cin, cout):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (b, hw, hw, cin), jnp.bfloat16)
    w = jax.random.normal(k2, (3, 3, cin, cout), jnp.bfloat16) * 0.05
    wq, ws = quantize_weight(w, axis=-1)
    a = jnp.asarray(3.0 / 127.0, jnp.float32)
    bias = jnp.zeros((cout,), jnp.float32)
    xq = (jax.random.normal(k1, (b, hw, hw, cin)) * 30).astype(jnp.int8)

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    f_bf = jax.jit(lambda x: lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=dn))
    f_chain = jax.jit(lambda x: qconv(x, wq, ws, a, bias=bias))
    f_pure = jax.jit(lambda xq: lax.conv_general_dilated(
        xq, wq, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.int32))

    flops = 2.0 * b * hw * hw * 9 * cin * cout
    t_bf = _time(f_bf, x)
    t_ch = _time(f_chain, x)
    t_pu = _time(f_pure, xq)
    print(f"{tag:20s} b{b} {hw:4d}^2 c{cin:4d}: "
          f"bf16 {t_bf*1e3:6.2f} ms {flops/t_bf/1e12:6.1f} T/s | "
          f"chain {t_ch*1e3:6.2f} ({t_bf/t_ch:4.2f}x) | "
          f"pure {t_pu*1e3:6.2f} ({t_bf/t_pu:4.2f}x)", flush=True)


def probe_matmul(tag, rows, cin, cout):
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    x = jax.random.normal(k1, (rows, cin), jnp.bfloat16)
    w = jax.random.normal(k2, (cin, cout), jnp.bfloat16) * 0.05
    wq, ws = quantize_weight(w, axis=-1)
    a = jnp.asarray(3.0 / 127.0, jnp.float32)

    f_bf = jax.jit(lambda x: jnp.dot(x, w))
    f_chain = jax.jit(lambda x: qmatmul(x, wq, ws, a))
    flops = 2.0 * rows * cin * cout
    t_bf = _time(f_bf, x)
    t_ch = _time(f_chain, x)
    print(f"{tag:20s} [{rows}x{cin}]@[{cin}x{cout}]: "
          f"bf16 {t_bf*1e3:6.2f} ms {flops/t_bf/1e12:6.1f} T/s | "
          f"chain {t_ch*1e3:6.2f} ({t_bf/t_ch:4.2f}x)", flush=True)


if __name__ == "__main__":
    print(f"devices: {jax.devices()}", flush=True)
    for shape in conv_shapes():
        probe_conv(*shape)
    # ConvFFN folded matmuls (stage4: hidden=6144, w_head [6144, 1536+1536]).
    probe_matmul("stage4 w_head", 32 * 8 * 8, 6144, 3072)
    probe_matmul("stage4 proj_in", 32 * 8 * 8, 1536, 6144)
    probe_matmul("stage2 w_head", 32 * 32 * 32, 1536, 768)
