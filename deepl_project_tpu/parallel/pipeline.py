"""GPipe-style pipeline parallelism over a ``'pipe'`` mesh axis.

The reference scales with DDP only (ref: transvae-implementation/train_2.py
distributed init); DP/TP/FSDP/CP are already first-class here
(``parallel/sharding.py``, ``parallel/ring_attention.py``). This module adds
the remaining classic axis — **pipeline parallelism** — the TPU way:

- the block stack's params are stacked on a leading depth axis and sharded
  over ``'pipe'`` (each stage holds ``depth/P`` *consecutive* blocks, which is
  exactly how XLA shards a leading dimension);
- microbatches stream through the stages inside ONE jitted program: a
  ``lax.scan`` over ``M + P - 1`` ticks, each tick running every stage's local
  blocks and rotating activations to the next stage with ``lax.ppermute``
  (point-to-point over ICI — no host involvement, no NCCL analogue);
- the result is made replicated over ``'pipe'`` with a masked ``psum`` so the
  (cheap, replicated) head/loss that follows composes under GSPMD, and
  backward through ``scan``+``ppermute`` gives each stage exactly its own
  blocks' gradients — no hand-written backward schedule.

This is the standard single-program SPMD pipelining recipe (scaling-book
"pipelining" chapter): the bubble is ``(P-1)/(M+P-1)`` of the ticks, so pick
``num_microbatches >= 4*P`` in production. Only the ``'pipe'`` axis is manual;
``'data'`` (DP) and ``'model'`` (TP) axes stay under GSPMD control, so
DP x PP x TP composes in one jit.

Used for the deep uniform transformer stacks (DiT; TransVAE stage-2/3 blocks
are shallow enough that TP/FSDP is always the better cut on ICI).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BlockFn = Callable[[Any, jax.Array, jax.Array], jax.Array]


def _stage_apply(block_fn: BlockFn, local_params: Any, x: jax.Array,
                 cond: jax.Array) -> jax.Array:
    """Apply this stage's (depth/P) stacked blocks sequentially."""

    def body(carry, p):
        return block_fn(p, carry, cond), None

    out, _ = lax.scan(body, x, local_params)
    return out


def _pipeline_shard(block_fn: BlockFn, num_stages: int, num_microbatches: int,
                    axis: str, stacked_params: Any, x: jax.Array,
                    cond: jax.Array) -> jax.Array:
    """Body run under shard_map: params are the LOCAL [depth/P, ...] shard,
    x/cond are replicated over ``axis`` (sharding over other axes, e.g.
    'data', is untouched — they remain auto/GSPMD)."""
    m, p_stages = num_microbatches, num_stages
    stage = lax.axis_index(axis)
    b = x.shape[0]
    x_mbs = x.reshape(m, b // m, *x.shape[1:])
    cond_mbs = cond.reshape(m, b // m, *cond.shape[1:])

    def tick(cur, t):
        # Stage 0 feeds microbatch t (clipped during the drain ticks — those
        # outputs are never selected); stage s>0 consumes the activation its
        # neighbour pushed last tick. Conditioning must travel with its
        # microbatch: stage s at tick t is processing microbatch t - s.
        feed = lax.dynamic_index_in_dim(x_mbs, jnp.clip(t, 0, m - 1), 0,
                                        keepdims=False)
        inp = jnp.where(stage == 0, feed, cur)
        c_mb = lax.dynamic_index_in_dim(cond_mbs,
                                        jnp.clip(t - stage, 0, m - 1), 0,
                                        keepdims=False)
        out = _stage_apply(block_fn, stacked_params, inp, c_mb)
        nxt = lax.ppermute(out, axis,
                           [(i, i + 1) for i in range(p_stages - 1)])
        return nxt, out

    # Init carry marked device-varying over 'pipe' so the scan carry type
    # matches the ppermute output under shard_map's varying-axis check (same
    # idiom as ring_attention.py).
    carry0 = lax.pcast(jnp.zeros_like(x_mbs[0]), axis, to="varying")
    _, ys = lax.scan(tick, carry0, jnp.arange(m + p_stages - 1))

    # Valid outputs appear on the LAST stage at ticks P-1 .. M+P-2. The
    # masked psum re-replicates them over 'pipe' so downstream (head, loss)
    # is an ordinary GSPMD program again.
    y = ys[p_stages - 1:].reshape(b, *x.shape[1:])
    return lax.psum(jnp.where(stage == p_stages - 1, y, jnp.zeros_like(y)),
                    axis)


def pipeline_apply(block_fn: BlockFn, stacked_params: Any, x: jax.Array,
                   cond: jax.Array, *, mesh: Mesh | None = None,
                   axis: str = "pipe", num_microbatches: int = 8) -> jax.Array:
    """Run a stack of identical blocks as a ``P``-stage pipeline.

    Args:
      block_fn: ``block_fn(params_one_block, x [B', N, D], cond [B', D]) ->
        [B', N, D]`` — one block, pure.
      stacked_params: pytree whose leaves have leading axis ``depth``
        (as produced by ``jax.vmap(init)`` or ``nn.scan`` param stacking).
        Sharded (or shardable) over ``axis`` on that leading dim.
      x: global activations ``[B, N, D]``; ``B % num_microbatches == 0``.
      cond: per-example conditioning ``[B, D]`` (adaLN input for DiT).
      mesh: optional explicit mesh; defaults to the ambient mesh
        (``jax.set_mesh``) like the CP path in ``ring_attention.py``.
      axis: pipeline mesh axis name.
      num_microbatches: M; the bubble fraction is ``(P-1)/(M+P-1)``.

    Returns ``[B, N, D]``, replicated over ``axis`` (other axes keep their
    GSPMD shardings).
    """
    if mesh is not None:
        num_stages = mesh.shape[axis]
    else:
        num_stages = dict(
            zip(jax.sharding.get_abstract_mesh().axis_names,
                jax.sharding.get_abstract_mesh().axis_sizes))[axis]
    depth = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if depth % num_stages:
        raise ValueError(f"depth {depth} not divisible by pipeline stages "
                         f"{num_stages}")
    if x.shape[0] % num_microbatches:
        raise ValueError(f"batch {x.shape[0]} not divisible by "
                         f"num_microbatches {num_microbatches}")

    body = functools.partial(_pipeline_shard, block_fn, num_stages,
                             num_microbatches, axis)
    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    kw = dict(in_specs=(param_specs, P(), P()), out_specs=P(),
              axis_names={axis})
    if mesh is not None:
        kw["mesh"] = mesh
    return jax.shard_map(body, **kw)(stacked_params, x, cond)


def stage_sharding(mesh: Mesh, stacked_params: Any,
                   axis: str = "pipe") -> Any:
    """NamedShardings placing each stage's consecutive depth-slice of the
    stacked block params on its pipeline stage (leading axis over ``axis``,
    everything else replicated)."""
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(axis)), stacked_params)
