"""Global self-attention over feature maps, with QKV-norm and 2D RoPE.

Reference behavior (transvae/modules/attention.py:12-104): flatten NCHW→[B,N,C],
apply three *separate* LayerNorms to the block input before the Q/K/V projections
("QKV norm"), bias-free Q/K/V linears, multi-head split with
num_heads = dim // head_dim, 2D RoPE on Q and K, softmax attention at scale
head_dim**-0.5, output projection (with bias).

TPU design: NHWC in/out; the three norms + projections are fused by XLA into
MXU matmuls over the token axis; the attention core dispatches to either a plain
XLA einsum+softmax (small N) or the Pallas flash-attention kernel
(deepl_project_tpu/ops/pallas/flash_attention.py) for large N where the O(N^2)
logits matrix would blow HBM — e.g. N=65536 tokens at 1024px stage 3.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from .norms import LayerNorm
from .rope import apply_rope2d

# Above this token count the full fp32 [B,h,N,N] logits tensor becomes a
# multi-GB allocation; the query-chunked path is measured speed-equal on v5e
# at N=4096 while bounding memory to O(B*h*chunk*N).
_XLA_FULL_SOFTMAX_MAX_TOKENS = 2048
# Middle band where a Pallas kernel beats XLA's fused softmax-attention on
# v5e at production batch (the stage-3 shape of every f16 model at 256px:
# b=32, h=12, d=64, N=1024). Within the band, N<=1024 uses the whole-head
# single-block kernel (3.20 ms — scores fit VMEM), larger N the blockwise
# flash kernel (4.51 ms at N=1024; XLA 5.91). XLA wins again at N=4096
# (12.4 vs 16.4 ms) before losing for good at N>=8192.
_PALLAS_MID_BAND = (1024, 2048)
_SMALL_KERNEL_MAX_TOKENS = 1024  # fp32 NxN scores must fit VMEM
# Beyond this, even chunked XLA loses to the Pallas flash kernel (measured
# 2.4x at N=16384 on v5e).
_PALLAS_MIN_TOKENS = 8192
# Training dispatch ('auto_train') switches to the flash kernel earlier: the
# backward through XLA attention must *save* the [B, h, N, N] weights (at
# N=4096 that is a 3 GB fp32 logits + 1.5 GB bf16 weights temp per stage-2
# block — the measured cause of large-variant @256px training OOM on a 16 GB
# chip), while the flash kernel's custom VJP saves only O + logsumexp (O(N)).
# Inference keeps the faster XLA path ('auto'); softmax fuses there and the
# weights are never materialized.
_PALLAS_MIN_TOKENS_TRAIN = 4096


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float) -> jax.Array:
    """Plain XLA attention: [B, N, nh, hd] x3 -> [B, N, nh, hd]; fp32 softmax."""
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    weights = jax.nn.softmax(logits * scale, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def xla_attention_chunked(q, k, v, scale, chunk: int = 4096) -> jax.Array:
    """Query-chunked XLA attention: memory O(chunk * N) instead of O(N^2).

    Used as the non-Pallas fallback for very long token axes (1024px inference).
    """
    b, n, h, d = q.shape
    if n % chunk != 0:
        return xla_attention(q, k, v, scale)
    qc = q.reshape(b, n // chunk, chunk, h, d)

    def body(carry, q_blk):
        out = xla_attention(q_blk, k, v, scale)
        return carry, out

    _, out = jax.lax.scan(body, None, jnp.moveaxis(qc, 1, 0))
    return jnp.moveaxis(out, 0, 1).reshape(b, n, h, d)


def _ambient_axis_size(axis: str | None) -> int:
    """Size of ``axis`` in the ambient mesh (jax.set_mesh), or 1 when unset /
    absent — the context-parallel path is live only under a mesh that
    defines it, so plain single-device apply/init still work unchanged."""
    if axis is None:
        return 1
    try:
        mesh = jax.sharding.get_abstract_mesh()
        if mesh.axis_names and axis in mesh.axis_names:
            return int(mesh.shape[axis])
    except Exception:
        pass
    return 1


def core_attention(q, k, v, scale, impl: str = "auto") -> jax.Array:
    """Dispatch the attention core. q/k/v: [B, N, num_heads, head_dim]."""
    n = q.shape[1]
    if impl in ("auto", "auto_train"):
        # Measured on v5e: XLA's fused attention beats the Pallas kernel up to
        # N=4096 (attention is ~1% of model FLOPs at 256px); beyond
        # _XLA_FULL_SOFTMAX_MAX_TOKENS the O(N^2) fp32 logits blow HBM and the
        # blockwise Pallas kernel wins (N=16k at 512px, 65k at 1024px).
        # 'auto_train' drops the Pallas threshold to 4096 for backward-pass
        # memory (see _PALLAS_MIN_TOKENS_TRAIN).
        min_pallas = (_PALLAS_MIN_TOKENS_TRAIN if impl == "auto_train"
                      else _PALLAS_MIN_TOKENS)
        on_tpu = jax.default_backend() == "tpu"
        pallas_ok = on_tpu and n % 512 == 0 and q.shape[-1] <= 128
        lo, hi = _PALLAS_MID_BAND
        # Mid-band Pallas is an INFERENCE win only: in training its backward
        # recomputes the tiles, while XLA's saved-weights backward is cheap at
        # this N (measured: large@256 train 767 -> 945 ms/step with mid-band
        # in 'auto_train'; inference 44.9 -> 46.4 img/s with it in 'auto').
        if impl == "auto" and pallas_ok and lo <= n <= hi:
            impl = ("pallas_small" if n <= _SMALL_KERNEL_MAX_TOKENS
                    else "pallas")
        elif n <= _XLA_FULL_SOFTMAX_MAX_TOKENS:
            impl = "xla"
        elif pallas_ok and n >= min_pallas:
            impl = "pallas"
        else:
            impl = "xla_chunked"
    if impl == "pallas_small":
        try:
            from .pallas.small_attention import small_attention

            return small_attention(q, k, v, scale)
        except Exception:
            impl = "xla"
    if impl == "pallas":
        try:
            from .pallas.flash_attention import flash_attention

            return flash_attention(q, k, v, scale)
        except Exception:
            impl = "xla_chunked" if n > _XLA_FULL_SOFTMAX_MAX_TOKENS else "xla"
    if impl == "xla_chunked":
        return xla_attention_chunked(q, k, v, scale)
    return xla_attention(q, k, v, scale)


class _LNParams(nn.Module):
    """Parameter holder matching LayerNorm's tree ({scale, bias}) for the
    fused-QKV path — created under the same child names (norm_q/k/v) so
    checkpoints are identical either way."""

    dim: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,),
                          self.param_dtype)
        return scale, bias


class _DenseParams(nn.Module):
    """Parameter holder matching bias-free nn.Dense's tree ({kernel})."""

    dim: int
    features: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self):
        return self.param("kernel", nn.initializers.truncated_normal(0.02),
                          (self.dim, self.features), self.param_dtype)


class _DenseBiasParams(nn.Module):
    """Parameter holder matching biased nn.Dense's tree ({kernel, bias})."""

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


class AttentionRoPE(nn.Module):
    """Multi-head global attention block operating on NHWC feature maps."""

    dim: int
    head_dim: int = 64
    use_rope: bool = True
    rope_pairing: str = "reference"
    dropout: float = 0.0
    impl: str = "auto"
    # Fold the three QKV LayerNorm affines into one [C, 3C] projection:
    # LN_i(x) @ W_i == xhat @ (diag(g_i) W_i) + b_i @ W_i with shared
    # normalization statistics. Exact up to fp reassociation; params
    # unchanged. Measured ~2% SLOWER end-to-end on v5e (46.35 -> 45.5 img/s
    # large@256 b32): XLA already CSEs the stats and fuses each affine into
    # its matmul, so the rewrite only adds weight-prep work. Kept as an
    # option; default off.
    fuse_qkv: bool = False
    # Mesh axis name for context parallelism: when set AND an ambient mesh
    # (jax.set_mesh) defines it, the attention core runs ring attention over
    # the token axis sharded on that mesh axis (shard_map island; GSPMD still
    # handles the surrounding convs/norms incl. halo exchange). The ≥1024px
    # training extension — SURVEY.md §2.7 SP row.
    context_axis: str | None = None
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        b, h, w, c = x.shape
        assert c == self.dim, (c, self.dim)
        num_heads = self.dim // self.head_dim
        scale = self.head_dim ** -0.5
        n = h * w

        xf = x.reshape(b, n, c)

        # Fully-fused sublayer kernel (inference, N<=1024): LN trio + QKV +
        # RoPE + attention + proj in one VMEM-resident Pallas program — x is
        # read once and the sublayer output written once (see
        # pallas/fused_attention_block.py). Training ('auto_train') and CP
        # keep the composable path.
        from .pallas.fused_attention_block import supported as _fused_ok

        use_fused = (
            self.impl in ("auto", "fused")
            and (self.dropout == 0.0 or deterministic)
            and not self.fuse_qkv
            and jax.default_backend() == "tpu"
            and _ambient_axis_size(self.context_axis) == 1
            and _fused_ok(n, c, self.head_dim, self.dtype))
        if use_fused:
            from .pallas.fused_attention_block import fused_attention_sublayer

            ln = tuple(_LNParams(self.dim, self.param_dtype,
                                 name=f"norm_{t}")() for t in "qkv")
            wq_, wk_, wv_ = (_DenseParams(self.dim, self.dim,
                                          self.param_dtype,
                                          name=f"to_{t}")() for t in "qkv")
            wp_, bp_ = _DenseBiasParams(self.dim, self.dim, self.param_dtype,
                                        name="proj")()
            out = fused_attention_sublayer(
                xf, ln, wq_, wk_, wv_, wp_, bp_, h, w,
                pairing=self.rope_pairing, head_dim=self.head_dim,
                use_rope=self.use_rope)
            return out.reshape(b, h, w, c)

        # For longer token axes (stage-2 N=4096, 512/1024px inference) the
        # whole-sublayer kernel's buffers exceed VMEM, but LN trio + QKV +
        # RoPE still fuse into one row-blocked kernel; q/k come back in the
        # per-head permuted layout (attention-invariant) with RoPE applied.
        from .pallas.fused_attention_block import qkv_supported as _qkv_ok

        use_qkv_kernel = (
            self.impl in ("auto", "fused")
            and (self.dropout == 0.0 or deterministic)
            and not self.fuse_qkv
            and jax.default_backend() == "tpu"
            and _ambient_axis_size(self.context_axis) == 1
            and _qkv_ok(n, c, self.head_dim, self.dtype))
        if use_qkv_kernel:
            from .pallas.fused_attention_block import fused_qkv_rope_op

            ln = tuple(_LNParams(self.dim, self.param_dtype,
                                 name=f"norm_{t}")() for t in "qkv")
            wq_, wk_, wv_ = (_DenseParams(self.dim, self.dim,
                                          self.param_dtype,
                                          name=f"to_{t}")() for t in "qkv")
            q, k, v = fused_qkv_rope_op(
                xf, ln, wq_, wk_, wv_, h, w, pairing=self.rope_pairing,
                head_dim=self.head_dim, use_rope=self.use_rope)
            q = q.reshape(b, n, num_heads, self.head_dim)
            k = k.reshape(b, n, num_heads, self.head_dim)
            v = v.reshape(b, n, num_heads, self.head_dim)
            out = core_attention(q, k, v, scale, impl=self.impl)
            out = out.reshape(b, n, c)
            out = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                           param_dtype=self.param_dtype,
                           kernel_init=nn.initializers.truncated_normal(0.02),
                           name="proj")(out)
            return out.reshape(b, h, w, c)

        if self.fuse_qkv:
            ln = [_LNParams(self.dim, self.param_dtype, name=f"norm_{t}")()
                  for t in "qkv"]
            ws = [_DenseParams(self.dim, self.dim, self.param_dtype,
                               name=f"to_{t}")() for t in "qkv"]
            # One shared-stats normalization pass (fp32, LayerNorm semantics).
            x32 = xf.astype(jnp.float32)
            mean = jnp.mean(x32, axis=-1, keepdims=True)
            var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
            xhat = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5)).astype(self.dtype)
            # Fold each norm's affine into its projection (fp32 weight prep —
            # O(C^2), negligible next to the O(N*C^2) matmul).
            w_fused = jnp.concatenate(
                [g[:, None] * w for (g, _), w in zip(ln, ws)], axis=1)
            b_fused = jnp.concatenate(
                [bb @ w for (_, bb), w in zip(ln, ws)])
            qkv = (jnp.dot(xhat, w_fused.astype(self.dtype),
                           preferred_element_type=jnp.float32)
                   + b_fused[None, None]).astype(self.dtype)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            dense = lambda name: nn.Dense(  # noqa: E731
                self.dim, use_bias=False, dtype=self.dtype,
                param_dtype=self.param_dtype,
                kernel_init=nn.initializers.truncated_normal(0.02), name=name)
            norm = lambda name: LayerNorm(  # noqa: E731
                self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                name=name)

            q = dense("to_q")(norm("norm_q")(xf))
            k = dense("to_k")(norm("norm_k")(xf))
            v = dense("to_v")(norm("norm_v")(xf))

        q = q.reshape(b, n, num_heads, self.head_dim)
        k = k.reshape(b, n, num_heads, self.head_dim)
        v = v.reshape(b, n, num_heads, self.head_dim)

        if self.use_rope:
            q = apply_rope2d(q, h, w, self.rope_pairing)
            k = apply_rope2d(k, h, w, self.rope_pairing)

        cp_size = _ambient_axis_size(self.context_axis)
        if cp_size > 1 and n % cp_size == 0:
            from ..parallel.ring_attention import context_parallel_attention
            out = context_parallel_attention(q, k, v, scale, self.context_axis)
        else:
            out = core_attention(q, k, v, scale, impl=self.impl)
        out = out.reshape(b, n, c)
        out = nn.Dense(self.dim, use_bias=True, dtype=self.dtype,
                       param_dtype=self.param_dtype,
                       kernel_init=nn.initializers.truncated_normal(0.02),
                       name="proj")(out)
        if self.dropout > 0.0:
            out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out.reshape(b, h, w, c)
