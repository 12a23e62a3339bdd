"""Latent Diffusion Transformer (DiT) over TransVAE latents.

The paper's downstream evaluation (Table 2b; SURVEY.md §6) trains a
LightningDiT-B/2 on TransVAE latents and reports FID-10K — the pipeline
itself is paper-private (not in the reference repo), so this is the
framework-native implementation of that harness: a DiT operating on the
[B, h, w, d] latent grids TransVAE produces (f16d32 @256px → 16x16x32),
trained with rectified flow (see training/diffusion.py) and sampled with CFG.

TPU design notes:
- NHWC latents, tokens = (h/p)*(w/p) patches; all matmuls MXU-shaped.
- adaLN-Zero conditioning (timestep + class embedding) as in DiT; the
  per-block modulation tensors are computed once and indexed per block —
  with scan_blocks the blocks run as one lax.scan over stacked params.
- LightningDiT-style modernizations, config-gated: RMSNorm instead of
  LayerNorm, SwiGLU FFN, 2D RoPE on the patch grid (reuses ops/rope.py) —
  all resolution-agnostic so the DiT inherits TransVAE's
  train@256/sample@512 extrapolation story.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import core_attention
from ..ops.rope import apply_rope2d


def _affine_free_norm(x: jax.Array, use_rms: bool, eps: float = 1e-6
                      ) -> jax.Array:
    """Norm WITHOUT learnable affine — adaLN supplies shift/scale instead
    (DiT's elementwise_affine=False norms). fp32 statistics."""
    x32 = x.astype(jnp.float32)
    if use_rms:
        y = x32 * jax.lax.rsqrt(
            jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + eps)
    else:
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y.astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    """DiT-{S,B,L,XL}/p geometry + LightningDiT modernization gates."""

    variant: str = "B"
    patch_size: int = 2
    in_channels: int = 32  # TransVAE f16d32 latent dim
    hidden_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_classes: int = 1000
    class_dropout: float = 0.1  # CFG label dropout
    # LightningDiT modernizations (all off = faithful DiT):
    use_rmsnorm: bool = True
    use_swiglu: bool = True
    use_rope: bool = True
    learn_sigma: bool = False  # rectified flow predicts velocity only
    dtype: str = "bfloat16"
    param_dtype: str = "float32"
    attention_impl: str = "auto"
    # Block-stack execution policy (orthogonal to the architecture):
    # scan_blocks stacks the per-block params on a leading depth axis and runs
    # the stack as one lax.scan (one compiled block body instead of `depth`
    # inlined copies). pipeline_axis additionally runs that stacked stack as a
    # GPipe-style pipeline over the named mesh axis when an ambient mesh
    # (jax.set_mesh) defines it — see parallel/pipeline.py.
    scan_blocks: bool = False
    pipeline_axis: str | None = None
    pipeline_microbatches: int = 8
    # Mixture-of-Experts FFN (Switch top-1; ops/moe.py). 0/1 = dense FFN.
    # Experts shard over the 'expert' mesh axis (expert parallelism) when an
    # ambient mesh defines it; the router's load-balance aux loss is sown and
    # applied by rectified_flow_loss with weight moe_aux_weight.
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 0.01
    moe_axis: str = "expert"

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def params_dtype(self):
        return jnp.dtype(self.param_dtype)

    def replace(self, **kw) -> "DiTConfig":
        return dataclasses.replace(self, **kw)


DIT_VARIANTS: dict[str, dict] = {
    "S": dict(hidden_dim=384, depth=12, num_heads=6),
    "B": dict(hidden_dim=768, depth=12, num_heads=12),
    "L": dict(hidden_dim=1024, depth=24, num_heads=16),
    "XL": dict(hidden_dim=1152, depth=28, num_heads=16),
}


def get_dit_config(variant: str = "B", patch_size: int = 2, **kw) -> DiTConfig:
    if variant not in DIT_VARIANTS:
        raise ValueError(f"Unknown DiT variant {variant!r}; known: "
                         f"{sorted(DIT_VARIANTS)}")
    spec = dict(DIT_VARIANTS[variant])
    spec.update(kw)
    return DiTConfig(variant=variant, patch_size=patch_size, **spec)


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0
                       ) -> jax.Array:
    """Sinusoidal timestep embedding; t in [0, 1] is scaled by 1000 to match
    the conventional discrete-timestep frequency band."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
                    / half)
    args = (t.astype(jnp.float32) * 1000.0)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedder(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        x = timestep_embedding(t, 256)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="fc1")(x.astype(self.dtype))
        x = nn.silu(x)
        return nn.Dense(self.dim, dtype=self.dtype,
                        param_dtype=self.param_dtype, name="fc2")(x)


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout: a trained 'null' class at index
    num_classes stands in for dropped / unconditional labels."""

    num_classes: int
    dim: int
    dropout: float = 0.1
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, labels: jax.Array, deterministic: bool = True
                 ) -> jax.Array:
        table = self.param(
            "embedding", nn.initializers.normal(0.02),
            (self.num_classes + 1, self.dim), self.param_dtype)
        if not deterministic and self.dropout > 0.0:
            rng = self.make_rng("label_dropout")
            drop = jax.random.bernoulli(rng, self.dropout, labels.shape)
            labels = jnp.where(drop, self.num_classes, labels)
        return table[labels]


def modulate(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    return x * (1.0 + scale[:, None]) + shift[:, None]


class DiTBlock(nn.Module):
    """adaLN-Zero transformer block on [B, N, D] tokens."""

    cfg: DiTConfig
    grid: tuple  # (h, w) patch grid, static per trace — for RoPE

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array) -> jax.Array:
        cfg = self.cfg
        dt, pdt = cfg.compute_dtype, cfg.params_dtype
        d = cfg.hidden_dim
        norm = lambda h: _affine_free_norm(h, cfg.use_rmsnorm)  # noqa: E731

        # adaLN-Zero: 6 modulation vectors from the conditioning, zero-init so
        # each block starts as identity.
        mod = nn.Dense(6 * d, dtype=dt, param_dtype=pdt,
                       kernel_init=nn.initializers.zeros,
                       name="adaln")(nn.silu(c))
        sh_a, sc_a, gate_a, sh_m, sc_m, gate_m = jnp.split(mod, 6, axis=-1)

        # Attention (with optional 2D RoPE on the patch grid).
        h = modulate(norm(x), sh_a, sc_a)
        b, n, _ = h.shape
        nh = cfg.num_heads
        hd = d // nh
        qkv = nn.Dense(3 * d, use_bias=True, dtype=dt, param_dtype=pdt,
                       kernel_init=nn.initializers.truncated_normal(0.02),
                       name="qkv")(h)
        q, k, v = jnp.split(qkv.reshape(b, n, 3 * nh, hd), 3, axis=2)
        if cfg.use_rope:
            gh, gw = self.grid
            q = apply_rope2d(q, gh, gw, "standard")
            k = apply_rope2d(k, gh, gw, "standard")
        attn = core_attention(q, k, v, hd ** -0.5, impl=cfg.attention_impl)
        attn = nn.Dense(d, dtype=dt, param_dtype=pdt,
                        kernel_init=nn.initializers.truncated_normal(0.02),
                        name="proj")(attn.reshape(b, n, d))
        x = x + gate_a[:, None] * attn

        # FFN: SwiGLU (LightningDiT) or GELU MLP (original DiT); optionally a
        # Switch MoE over the 'expert' mesh axis (ops/moe.py).
        h = modulate(norm(x), sh_m, sc_m)
        hidden = int(d * cfg.mlp_ratio)
        if cfg.moe_experts > 1:
            from ..ops.moe import SwitchFFN

            moe_hidden = int(2 * hidden / 3) if cfg.use_swiglu else hidden
            h = SwitchFFN(d, moe_hidden, cfg.moe_experts,
                          cfg.moe_capacity_factor, cfg.use_swiglu,
                          cfg.moe_axis, dt, pdt, name="moe_ffn")(h)
            return x + gate_m[:, None] * h
        if cfg.use_swiglu:
            hidden = int(2 * hidden / 3)  # param-matched SwiGLU width
            a = nn.Dense(hidden, dtype=dt, param_dtype=pdt, name="ffn_gate")(h)
            bq = nn.Dense(hidden, dtype=dt, param_dtype=pdt, name="ffn_up")(h)
            h = nn.silu(a) * bq
        else:
            h = nn.Dense(hidden, dtype=dt, param_dtype=pdt, name="ffn_up")(h)
            h = nn.gelu(h, approximate=True)
        h = nn.Dense(d, dtype=dt, param_dtype=pdt, name="ffn_down")(h)
        return x + gate_m[:, None] * h


class _DiTScanBody(nn.Module):
    """One DiT block in lax.scan carry form: (x, cond) -> (x', None). nn.scan
    over this body stacks the per-block params on a leading depth axis —
    the layout both scan_blocks and the pipeline stages consume."""

    cfg: DiTConfig
    grid: tuple

    @nn.compact
    def __call__(self, x: jax.Array, cond: jax.Array):
        return DiTBlock(self.cfg, self.grid, name="block")(x, cond), None


class DiT(nn.Module):
    """Diffusion transformer over latent grids.

    __call__(z_t [B,h,w,C], t [B] in [0,1], labels [B]) → velocity [B,h,w,C].
    """

    config: DiTConfig

    @nn.compact
    def __call__(self, z: jax.Array, t: jax.Array, labels: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cfg = self.config
        dt, pdt = cfg.compute_dtype, cfg.params_dtype
        b, h, w, c = z.shape
        p = cfg.patch_size
        assert h % p == 0 and w % p == 0, (h, w, p)
        gh, gw = h // p, w // p
        d = cfg.hidden_dim

        # Patchify: conv with stride p == linear patch embedding, MXU-native.
        x = nn.Conv(d, (p, p), strides=(p, p), dtype=dt, param_dtype=pdt,
                    name="patch_embed")(z.astype(dt))
        x = x.reshape(b, gh * gw, d)
        if not cfg.use_rope:
            # Learned absolute positions (original DiT used fixed sincos;
            # learned is equivalent at these grid sizes but simpler).
            pos = self.param("pos_embed", nn.initializers.normal(0.02),
                             (gh * gw, d), pdt)
            x = x + pos.astype(dt)[None]

        t_emb = TimestepEmbedder(d, dtype=dt, param_dtype=pdt,
                                 name="t_embed")(t)
        y_emb = LabelEmbedder(cfg.num_classes, d, cfg.class_dropout,
                              param_dtype=pdt,
                              name="y_embed")(labels, deterministic)
        cond = t_emb + y_emb.astype(dt)

        if cfg.scan_blocks or cfg.pipeline_axis:
            blocks = nn.scan(_DiTScanBody, variable_axes={"params": 0},
                             split_rngs={"params": True}, length=cfg.depth,
                             in_axes=nn.broadcast)(cfg, (gh, gw),
                                                   name="blocks")
            from ..parallel.ring_attention import ambient_mesh_has_axis

            if (cfg.pipeline_axis and not self.is_initializing()
                    and ambient_mesh_has_axis(cfg.pipeline_axis)):
                # GPipe microbatch pipeline over the 'pipe' mesh axis: each
                # stage holds depth/P consecutive blocks of the stacked
                # params. Falls back to the sequential scan when no ambient
                # mesh defines the axis (single chip, init, tests).
                from ..parallel.pipeline import pipeline_apply

                stacked = self.variables["params"]["blocks"]
                body = _DiTScanBody(cfg, (gh, gw))

                def block_fn(p, xb, cb):
                    return body.apply({"params": p}, xb, cb)[0]

                x = pipeline_apply(block_fn, stacked, x, cond,
                                   axis=cfg.pipeline_axis,
                                   num_microbatches=cfg.pipeline_microbatches)
            else:
                x, _ = blocks(x, cond)
        else:
            for i in range(cfg.depth):
                x = DiTBlock(cfg, (gh, gw), name=f"block{i}")(x, cond)

        # Final adaLN + linear head, zero-init (standard DiT final layer).
        xn = _affine_free_norm(x, cfg.use_rmsnorm)
        mod = nn.Dense(2 * d, dtype=dt, param_dtype=pdt,
                       kernel_init=nn.initializers.zeros,
                       name="adaln_out")(nn.silu(cond))
        shift, scale = jnp.split(mod, 2, axis=-1)
        xn = modulate(xn, shift, scale)
        out_ch = c * (2 if cfg.learn_sigma else 1)
        out = nn.Dense(p * p * out_ch, dtype=dt, param_dtype=pdt,
                       kernel_init=nn.initializers.zeros, name="head")(xn)
        # Unpatchify [B, gh*gw, p*p*C] → [B, h, w, C].
        out = out.reshape(b, gh, gw, p, p, out_ch)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, out_ch)
        return out.astype(jnp.float32)


def init_dit_params(model: DiT, rng: jax.Array, grid: int = 16,
                    batch: int = 1):
    cfg = model.config
    z = jnp.zeros((batch, grid, grid, cfg.in_channels), jnp.float32)
    t = jnp.zeros((batch,), jnp.float32)
    y = jnp.zeros((batch,), jnp.int32)
    return model.init({"params": rng}, z, t, y)["params"]
