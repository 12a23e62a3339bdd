"""Ring (context-parallel) attention over a sharded token axis.

The reference has no sequence parallelism — its long-sequence story is RoPE
extrapolation plus flash attention on one device (SURVEY.md §2.7/§5). This is
the TPU-native extension for when even one image's token axis outgrows a chip
(1024px training: N=65,536 at stage 2): shard the tokens over a mesh axis and
rotate K/V chunks around the ring with ``jax.lax.ppermute`` (XLA lowers it to
ICI neighbor exchanges), merging partial attention with the online-softmax
rule. Compute overlaps the permute because each step's matmuls are independent
of the in-flight transfer.

Used inside ``jax.shard_map`` — see ``sequence_parallel_attention`` for the
driver that takes global arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# Above this per-device query length, each ring step's logits block
# [B,H,Nq,Nk] is computed in query chunks so local memory stays
# O(B*H*chunk*Nk) — at 1024px/8-way CP the full block would be multi-GB.
_RING_Q_CHUNK = 2048


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, scale: float,
                   axis_name: str) -> jax.Array:
    """Blockwise-exact attention with K/V ring rotation.

    Args (per-device shards, inside shard_map):
      q, k, v: [B, N_local, H, D]
      axis_name: mesh axis the token dimension is sharded over.
    Returns: [B, N_local, H, D] — exact softmax(q·kᵀ)·v over the GLOBAL token
    axis.
    """
    n_dev = jax.lax.psum(1, axis_name)

    def partial_full(q, k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)          # [B,H,Nq,1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)          # [B,H,Nq,1]
        o = jnp.einsum("bhqk,bkhd->bhqd", p.astype(v.dtype), v,
                       preferred_element_type=jnp.float32)  # [B,H,Nq,D]
        return m, l, o

    def partial_attn(q, k, v):
        nq = q.shape[1]
        if nq <= _RING_Q_CHUNK or nq % _RING_Q_CHUNK != 0:
            return partial_full(q, k, v)
        b_, _, h_, d_ = q.shape
        qc = q.reshape(b_, nq // _RING_Q_CHUNK, _RING_Q_CHUNK, h_, d_)

        def chunk_body(_, q_blk):
            return None, partial_full(q_blk, k, v)

        _, (m, l, o) = jax.lax.scan(chunk_body, None, jnp.moveaxis(qc, 1, 0))
        # [C,B,H,qc,*] → [B,H,Nq,*]
        merge = lambda t: jnp.moveaxis(t, 0, 2).reshape(  # noqa: E731
            b_, h_, nq, t.shape[-1])
        return merge(m), merge(l), merge(o)

    def body(carry, _):
        m_acc, l_acc, o_acc, k_cur, v_cur = carry
        m_new, l_new, o_new = partial_attn(q, k_cur, v_cur)
        m_tot = jnp.maximum(m_acc, m_new)
        alpha = jnp.exp(m_acc - m_tot)
        beta = jnp.exp(m_new - m_tot)
        l_tot = alpha * l_acc + beta * l_new
        o_tot = alpha * o_acc + beta * o_new
        # Rotate K/V to the next ring position (ICI neighbor exchange).
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return (m_tot, l_tot, o_tot, k_nxt, v_nxt), None

    b, nq, h, d = q.shape
    # Mark the init carries as device-varying over the ring axis so the
    # scan carry type matches the outputs under shard_map's varying-axis check.
    vary = lambda t: jax.lax.pcast(t, axis_name, to="varying")  # noqa: E731
    m0 = vary(jnp.full((b, h, nq, 1), -jnp.inf, jnp.float32))
    l0 = vary(jnp.zeros((b, h, nq, 1), jnp.float32))
    o0 = vary(jnp.zeros((b, h, nq, d), jnp.float32))
    (m_f, l_f, o_f, _, _), _ = jax.lax.scan(
        body, (m0, l0, o0, k, v), None, length=n_dev)
    out = (o_f / l_f).astype(q.dtype)                   # [B,H,Nq,D]
    return out.transpose(0, 2, 1, 3)                    # → [B,Nq,H,D]


def context_parallel_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                               scale: float, axis: str) -> jax.Array:
    """Ring attention as a shard_map island INSIDE a jitted model.

    Manual only over ``axis`` (the token/context mesh axis) — batch ('data')
    and any parameter ('model') shardings stay under GSPMD control, so this
    composes with DP/TP/FSDP in the same program. Requires an ambient mesh
    (``jax.set_mesh(mesh)`` around jit/apply) whose axis names include
    ``axis``; q/k/v are GLOBAL [B, N, H, D] with N% mesh.shape[axis] == 0.
    """
    spec = P(None, axis, None, None)
    fn = jax.shard_map(
        functools.partial(ring_attention, scale=scale, axis_name=axis),
        in_specs=(spec, spec, spec), out_specs=spec, axis_names={axis})
    return fn(q, k, v)


def ambient_mesh_has_axis(axis: str) -> bool:
    """True when an ambient mesh (jax.set_mesh) defines ``axis`` — used by the
    attention module to decide whether the context-parallel path is live."""
    try:
        mesh = jax.sharding.get_abstract_mesh()
        return axis in (mesh.axis_names or ())
    except Exception:
        return False


def sequence_parallel_attention(mesh: Mesh, q: jax.Array, k: jax.Array,
                                v: jax.Array, scale: float,
                                axis: str = "data") -> jax.Array:
    """Run ring attention on GLOBAL [B, N, H, D] arrays, token axis sharded
    over ``axis``. Requires N % mesh.shape[axis] == 0."""
    spec = P(None, axis, None, None)

    fn = jax.shard_map(
        functools.partial(ring_attention, scale=scale, axis_name=axis),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    q = jax.device_put(q, NamedSharding(mesh, spec))
    k = jax.device_put(k, NamedSharding(mesh, spec))
    v = jax.device_put(v, NamedSharding(mesh, spec))
    return fn(q, k, v)
