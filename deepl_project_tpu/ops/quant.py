"""Int8 post-training quantization primitives (serving/inference path).

Motivation (measured, scripts/probe_int8_mxu.py on v5e-1): the MXU runs
s8xs8->s32 matmuls at 262 TOP/s vs 146 TFLOP/s bf16 (1.79x) and the hot 3x3
conv shape at 121.7 vs 93.5 T/s (1.30x). Weight-only quantization (dequantize
then bf16 matmul) measured ~flat — BOTH operands must be int8 to hit the fast
path, so activations are quantized too.

Scheme (standard production PTQ):
  - weights: symmetric per-output-channel int8, scale = absmax / 127
  - activations: symmetric per-tensor int8 with STATIC scales baked at
    calibration time (no runtime absmax reduction — the quantize step is a
    pure elementwise op XLA fuses into the preceding norm/gelu chain, and the
    int8 tensor halves the conv's HBM read bytes)
  - accumulation in int32, dequantize to fp32, bias add, cast to compute dtype

Coverage: ResBlock convs and ConvFFN matmuls/convs — the FLOP-dominant,
MXU-bound ops. Attention sublayers stay in the fused bf16 Pallas kernels
(already fused; int8 attention would need fp softmax round trips), and the
quality-critical boundary convs (stem conv_in, conv_out, latent heads,
resample paths) stay bf16 — standard first/last-layer exemption.

The reference has no quantization story (pure bf16 torch,
ref: transvae-implementation/README.md:467); this is a beyond-parity serving
feature. See deepl_project_tpu/quantize.py for the calibrate+transform
pipeline and scripts/bench_quant.py for measured speed/quality.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

QMAX = 127.0


def _zeros_i8(key, shape, dtype=jnp.int8):
    del key
    return jnp.zeros(shape, jnp.int8)


def quantize_weight(w: jax.Array, axis: int = -1):
    """Symmetric per-output-channel int8 quantization of a float kernel.

    Returns (w_q int8, scale f32[out]) with w ~= w_q * scale broadcast over
    ``axis`` (the output-feature axis).
    """
    w = w.astype(jnp.float32)
    axis = axis % w.ndim
    red = tuple(i for i in range(w.ndim) if i != axis)
    amax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / QMAX
    wq = jnp.clip(jnp.round(w / scale), -QMAX, QMAX).astype(jnp.int8)
    return wq, scale.reshape(w.shape[axis])


def quantize_act(x: jax.Array, act_scale: jax.Array) -> jax.Array:
    """Elementwise static-scale int8 quantization (fusable, no reductions)."""
    inv = (1.0 / act_scale).astype(jnp.float32)
    xq = jnp.round(x.astype(jnp.float32) * inv)
    return jnp.clip(xq, -QMAX, QMAX).astype(jnp.int8)


def qmatmul(x, kq, kscale, act_scale, bias=None, out_dtype=jnp.bfloat16):
    """x[... , in] @ kq[in, out] in int8, dequantized to out_dtype."""
    xq = quantize_act(x, act_scale)
    y = lax.dot_general(xq, kq, (((x.ndim - 1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (act_scale.astype(jnp.float32) * kscale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


def qconv(x, kq, kscale, act_scale, bias=None, strides=(1, 1),
          padding="SAME", out_dtype=jnp.bfloat16):
    """NHWC int8 conv with int32 accumulation, dequantized to out_dtype.

    Zero padding is exact under symmetric quantization (0 -> 0).
    """
    xq = quantize_act(x, act_scale)
    dn = lax.conv_dimension_numbers(x.shape, kq.shape, ("NHWC", "HWIO", "NHWC"))
    y = lax.conv_general_dilated(xq, kq, strides, padding,
                                 dimension_numbers=dn,
                                 preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (act_scale.astype(jnp.float32) * kscale)
    if bias is not None:
        y = y + bias
    return y.astype(out_dtype)


class QDense(nn.Module):
    """Drop-in int8 Dense. Param tree: {kernel_q, kernel_scale, bias,
    act_scale} — produced by deepl_project_tpu.quantize.quantize_params."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        kq = self.param("kernel_q", _zeros_i8, (in_f, self.features))
        ks = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        a = self.param("act_scale", nn.initializers.ones, (), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return qmatmul(x, kq, ks, a, bias=b, out_dtype=self.dtype)


class QConv(nn.Module):
    """Drop-in int8 NHWC conv (same call contract as the nn.Conv uses in
    ResBlock/ConvFFN: explicit kernel size, stride 1, SAME padding)."""

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_f = x.shape[-1]
        kh, kw = self.kernel_size
        kq = self.param("kernel_q", _zeros_i8, (kh, kw, in_f, self.features))
        ks = self.param("kernel_scale", nn.initializers.ones,
                        (self.features,), jnp.float32)
        a = self.param("act_scale", nn.initializers.ones, (), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        return qconv(x, kq, ks, a, bias=b, strides=self.strides,
                     out_dtype=self.dtype)


def sow_amax(module: nn.Module, name: str, x: jax.Array) -> None:
    """Record the absmax of a quantization site during calibration.

    Reduced with max across calls/batches via the sow reduce_fn, so repeated
    apply() calls accumulate a running per-site maximum in the
    'intermediates' collection.
    """
    module.sow("intermediates", name,
               jnp.max(jnp.abs(x.astype(jnp.float32))),
               init_fn=lambda: jnp.asarray(0.0, jnp.float32),
               reduce_fn=jnp.maximum)
