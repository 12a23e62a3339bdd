"""Switch-style Mixture-of-Experts FFN with expert parallelism (EP).

The reference has no MoE (its FFNs are dense; ref: transvae-implementation
transvae/modules/*.py) — this is a beyond-parity scaling feature completing
the framework's parallelism axes (DP/TP/FSDP/CP/PP already exist): expert
params carry a leading ``E`` axis shardable over an ``'expert'`` mesh axis,
and token dispatch/combine are einsums against a one-hot dispatch tensor —
the GShard/Switch formulation that XLA turns into ``all_to_all`` collectives
over ICI when the activations/params are sharded (no hand-written routing
communication, exactly like the DDP→psum translation elsewhere in this repo).

Design choices (Switch Transformer defaults):
- top-1 routing, fp32 router, load-balance aux loss ``E * sum(f_e * p_e)``
  exposed via ``self.sow('losses', 'moe_aux', ...)``;
- fixed expert capacity ``ceil(tokens/E * capacity_factor)`` → static shapes
  (XLA requirement); over-capacity tokens fall through on the residual path;
- experts evaluated with a vmapped FFN body over the leading expert axis, so
  one compiled body serves all experts (same trick as scan_blocks).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


class _FFNBody(nn.Module):
    """One dense FFN expert: SwiGLU (LightningDiT) or GELU MLP."""

    d: int
    hidden: int
    use_swiglu: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: jax.Array) -> jax.Array:
        dt, pdt = self.dtype, self.param_dtype
        if self.use_swiglu:
            a = nn.Dense(self.hidden, dtype=dt, param_dtype=pdt,
                         name="gate")(h)
            b = nn.Dense(self.hidden, dtype=dt, param_dtype=pdt, name="up")(h)
            h = nn.silu(a) * b
        else:
            h = nn.Dense(self.hidden, dtype=dt, param_dtype=pdt, name="up")(h)
            h = nn.gelu(h, approximate=True)
        return nn.Dense(self.d, dtype=dt, param_dtype=pdt, name="down")(h)


def _ep_constraint(t: jax.Array, axis: str | None) -> jax.Array:
    """Shard the leading expert dim over ``axis`` when an ambient mesh
    defines it (GSPMD inserts the all_to_alls); no-op otherwise."""
    from ..parallel.ring_attention import ambient_mesh_has_axis

    if axis and ambient_mesh_has_axis(axis):
        spec = P(axis, *([None] * (t.ndim - 1)))
        return jax.lax.with_sharding_constraint(t, spec)
    return t


class SwitchFFN(nn.Module):
    """Top-1 MoE FFN on [B, N, D] tokens, expert-parallel over ``expert_axis``.

    Contract matches a dense FFN (same in/out shape); callers add the
    residual. The load-balance aux loss is sown into the ``'losses'``
    collection — training code applies it with
    ``model.apply(..., mutable=['losses'])`` (see
    ``training/diffusion.py::rectified_flow_loss``).
    """

    d: int
    hidden: int
    num_experts: int
    capacity_factor: float = 1.25
    use_swiglu: bool = True
    expert_axis: str | None = "expert"
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, d = x.shape
        e = self.num_experts
        cap = max(1, math.ceil(n * self.capacity_factor / e))

        # Router: fp32 for a stable softmax/argmax (Switch Transformer §2.4).
        logits = nn.Dense(e, dtype=jnp.float32, param_dtype=jnp.float32,
                          name="router")(x.astype(jnp.float32))  # [B,N,E]
        probs = jax.nn.softmax(logits, axis=-1)
        gate = jnp.max(probs, axis=-1)                            # [B,N]
        idx = jnp.argmax(probs, axis=-1)                          # [B,N]

        # Static-shape dispatch: position of each token within its expert's
        # capacity buffer, tokens past capacity dropped (residual fallthrough).
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)        # [B,N,E]
        pos = jnp.sum(jnp.cumsum(onehot, axis=1) * onehot, axis=-1) - 1.0
        keep = (pos < cap).astype(jnp.float32)                    # [B,N]
        pos_oh = jax.nn.one_hot(pos.astype(jnp.int32), cap,
                                dtype=jnp.float32)                # [B,N,C]
        dispatch = (onehot * keep[..., None])[..., None] * pos_oh[:, :, None]
        combine = dispatch * gate[..., None, None]                # [B,N,E,C]

        # Load-balance aux: E * sum(frac_routed * mean_prob) — minimized at
        # uniform routing (value 1.0).
        f = jnp.mean(onehot, axis=(0, 1))                         # [E]
        p_mean = jnp.mean(probs, axis=(0, 1))                     # [E]
        self.sow("losses", "moe_aux", e * jnp.sum(f * p_mean))

        # Expert-major layout [E, B, C, D]; sharding the leading dim over the
        # expert mesh axis makes XLA emit the dispatch/return all_to_alls.
        xin = jnp.einsum("bnec,bnd->ebcd", dispatch.astype(x.dtype), x)
        xin = _ep_constraint(xin, self.expert_axis)
        experts = nn.vmap(_FFNBody, variable_axes={"params": 0},
                          split_rngs={"params": True}, in_axes=0, out_axes=0,
                          axis_size=e)(self.d, self.hidden, self.use_swiglu,
                                       self.dtype, self.param_dtype,
                                       name="experts")
        xout = experts(xin)                                       # [E,B,C,D]
        xout = _ep_constraint(xout, self.expert_axis)
        return jnp.einsum("bnec,ebcd->bnd", combine.astype(x.dtype), xout)


def collect_aux_losses(variables: dict) -> jax.Array:
    """Sum every loss sown into the 'losses' collection (0.0 when none)."""
    total = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(variables.get("losses", {})):
        total = total + jnp.sum(jnp.asarray(leaf, jnp.float32))
    return total
