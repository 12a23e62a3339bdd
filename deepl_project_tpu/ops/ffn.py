"""Feed-forward networks: convolutional FFN (the paper's "local prior
enhancement") and a standard MLP for ablations.

Reference behavior (transvae/modules/conv.py:10-159): ConvFFN expands the channel
dim by mlp_ratio*4 with a Linear, GELU, runs a conv branch *with residual* at the
expanded width, then projects back. conv_type='full' is a 1x1→GELU→3x3→GELU→1x1
bottleneck at mlp_ratio*dim width; 'depthwise' is a single 3x3 depthwise conv.

TPU notes: NHWC throughout; the Linear expand/project are token-axis matmuls that
map straight onto the MXU; the 3x3 convs are NHWC convolutions that XLA tiles
onto the MXU natively. GELU is exact (erf-based) to match torch F.gelu defaults.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import linen as nn

def _gelu(x: jax.Array) -> jax.Array:
    """GELU matching torch F.gelu (erf-exact) at the compute precision.

    In bf16 the tanh form is OUTPUT-EQUIVALENT: max |gelu_tanh - gelu_erf|
    ~= 3e-4 absolute, ~25x below bf16's own rounding ulp (7.8e-3 at 1.0) —
    and measured 18% faster for the whole ConvFFN on v5e (erf is a long
    VPU polynomial; the 4C-wide gelu tensors dominate the FFN's VPU time).
    fp32 keeps exact erf so torch-golden parity is bit-faithful.
    """
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _conv_kernel_init():
    # Kaiming-normal fan_out for convs (ref: transvae/models/transvae.py:157-161).
    return nn.initializers.variance_scaling(2.0, "fan_out", "normal")


class _ConvParams(nn.Module):
    """Parameter holder matching nn.Conv's tree ({kernel, bias})."""

    kshape: tuple
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", _conv_kernel_init(), self.kshape,
                            self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.kshape[-1],),
                          self.param_dtype)
        return kernel, bias


class _DenseParams(nn.Module):
    """Parameter holder matching nn.Dense's tree ({kernel, bias})."""

    dim: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.truncated_normal(0.02),
                            (self.dim, self.features), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return kernel, bias


class ConvFFN(nn.Module):
    """Inverted-bottleneck FFN with spatial conv mixing (NHWC)."""

    dim: int
    mlp_ratio: float = 1.0
    conv_type: str = "full"
    dropout: float = 0.0
    # Exact reassociation (y + z @ W2) @ Wout == y@Wout + z@(W2@Wout) + fold
    # of the biases: conv_2 and proj_out collapse into ONE [ch, dim] matmul
    # on the narrow branch plus a [hidden, dim] matmul on y — 2*N*ch*hidden
    # FLOPs become 2*N*ch*dim (a 12% FLOP cut at mlp_ratio 1) and the
    # [N, hidden] z2/residual intermediates never exist. Param tree is
    # unchanged (holders create conv_2/proj_out under the same names), so
    # checkpoints are unaffected; disable for the literal reference op order.
    fold_output: bool = True
    # Int8 serving path ('int8' | None) and its calibration hook — see
    # ops/quant.py. quant='int8' switches to a param tree produced by
    # deepl_project_tpu.quantize.quantize_params (folded weights quantized
    # per-output-channel, static activation scales); calibrate=True keeps the
    # float path but sows per-site activation absmax into 'intermediates'.
    quant: str | None = None
    calibrate: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        assert c == self.dim
        hidden = int(self.dim * self.mlp_ratio * 4)

        if self.quant == "int8" and self.conv_type == "full":
            return self._int8_forward(x, hidden)

        dense = functools.partial(
            nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.truncated_normal(0.02))
        conv = functools.partial(
            nn.Conv, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=_conv_kernel_init())

        if self.calibrate and self.conv_type == "full":
            from .quant import sow_amax

            sow_amax(self, "amax_in", x)

        y = dense(hidden, name="proj_in")(x)
        y = _gelu(y)

        fold = self.fold_output and self.conv_type == "full"
        if fold:
            ch = int(self.dim * self.mlp_ratio)
            w0, b0 = _ConvParams((1, 1, hidden, ch), self.param_dtype,
                                 name="conv_0")()
            w2, b2 = _ConvParams((1, 1, ch, hidden), self.param_dtype,
                                 name="conv_2")()
            wout, bout = _DenseParams(hidden, self.dim, self.param_dtype,
                                      name="proj_out")()
            wout_c = wout.astype(self.dtype)
            # conv_0 and the folded y@Wout contract the SAME gelu(y): one
            # [hidden, ch+dim] matmul reads y once with full-width MXU tiles.
            w_head = jnp.concatenate(
                [w0.reshape(hidden, ch).astype(self.dtype), wout_c], axis=1)
            if self.calibrate:
                from .quant import sow_amax

                sow_amax(self, "amax_y", y)
            yw = jnp.dot(y, w_head,
                         preferred_element_type=jnp.float32).astype(self.dtype)
            z = _gelu(yw[..., :ch] + b0.astype(self.dtype))
            if self.calibrate:
                sow_amax(self, "amax_z", z)
            z = conv(ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_1")(z)
            z = _gelu(z)
            if self.calibrate:
                sow_amax(self, "amax_z2", z)
            w_fold = jnp.dot(w2.reshape(ch, hidden).astype(self.dtype),
                             wout_c, preferred_element_type=jnp.float32
                             ).astype(self.dtype)
            b_fold = (b2 @ wout + bout).astype(jnp.float32)
            y = (yw[..., ch:]
                 + jnp.dot(z, w_fold, preferred_element_type=jnp.float32)
                 + b_fold).astype(self.dtype)
        else:
            if self.conv_type == "full":
                ch = int(self.dim * self.mlp_ratio)
                z = conv(ch, (1, 1), name="conv_0")(y)
                z = _gelu(z)
                z = conv(ch, (3, 3), padding=((1, 1), (1, 1)), name="conv_1")(z)
                z = _gelu(z)
                z = conv(hidden, (1, 1), name="conv_2")(z)
            elif self.conv_type == "depthwise":
                z = conv(hidden, (3, 3), padding=((1, 1), (1, 1)),
                         feature_group_count=hidden, name="conv_dw")(y)
            else:
                raise ValueError(f"Unknown conv_type: {self.conv_type}")
            y = y + z  # residual around the conv branch (ref: conv.py:92-93)
            y = dense(self.dim, name="proj_out")(y)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y

    def _int8_forward(self, x: jax.Array, hidden: int) -> jax.Array:
        """Int8 serving path mirroring the folded op order (see fold_output).

        Folded float matrices (w_head = [conv_0 | proj_out], w_fold =
        conv_2 @ proj_out) are quantized per-output-channel offline by
        quantize_params; activation scales are static from calibration.
        """
        from .quant import QConv, QDense, qmatmul

        ch = int(self.dim * self.mlp_ratio)
        y = QDense(hidden, dtype=self.dtype, name="proj_in")(x)
        y = _gelu(y)

        w_head_q = self.param("w_head_q", lambda k, s: jnp.zeros(s, jnp.int8),
                              (hidden, ch + self.dim))
        w_head_s = self.param("w_head_scale", nn.initializers.ones,
                              (ch + self.dim,), jnp.float32)
        a_y = self.param("act_scale_y", nn.initializers.ones, (), jnp.float32)
        b0 = self.param("b0", nn.initializers.zeros, (ch,), jnp.float32)
        yw = qmatmul(y, w_head_q, w_head_s, a_y, out_dtype=self.dtype)
        z = _gelu(yw[..., :ch] + b0.astype(self.dtype))

        z = QConv(ch, (3, 3), dtype=self.dtype, name="conv_1")(z)
        z = _gelu(z)

        w_fold_q = self.param("w_fold_q", lambda k, s: jnp.zeros(s, jnp.int8),
                              (ch, self.dim))
        w_fold_s = self.param("w_fold_scale", nn.initializers.ones,
                              (self.dim,), jnp.float32)
        a_z2 = self.param("act_scale_z2", nn.initializers.ones, (),
                          jnp.float32)
        b_fold = self.param("b_fold", nn.initializers.zeros, (self.dim,),
                            jnp.float32)
        out = (yw[..., ch:].astype(jnp.float32)
               + qmatmul(z, w_fold_q, w_fold_s, a_z2, out_dtype=jnp.float32)
               + b_fold)
        return out.astype(self.dtype)


class StandardFFN(nn.Module):
    """Plain Linear-GELU-Linear FFN (ablation baseline; ref: conv.py:108-159)."""

    dim: int
    mlp_ratio: float = 1.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        hidden = int(self.dim * self.mlp_ratio)
        dense = functools.partial(
            nn.Dense, dtype=self.dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.truncated_normal(0.02))
        y = dense(hidden, name="fc1")(x)
        y = _gelu(y)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = dense(self.dim, name="fc2")(y)
        if self.dropout > 0.0:
            y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y
