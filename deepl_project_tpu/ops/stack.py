"""Scan-over-layers block stacks.

Within any TransVAE stage every block has identical parameter shapes
(stage width is constant; ref: encoder.py:62-93), so a stage's depth-N block
loop can compile as ONE ``lax.scan`` body with stacked [N, ...] params instead
of N unrolled copies. This is the standard big-model TPU pattern: it shrinks
the XLA program (compile time and compiler memory — the unrolled 545M-param
training graph overwhelms compile services) and composes with per-iteration
remat for gradient checkpointing.

Param layout: ``{stage}_blocks/scan/block/...`` with a leading depth axis.
``stack_stage_params`` / ``unstack_stage_params`` convert to/from the unrolled
``{stage}_block{j}/...`` layout so reference-converted checkpoints load in
either mode.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class BlockStack(nn.Module):
    """Depth-N stack of one block class, compiled as a single scan body."""

    block_cls: type
    block_kwargs: tuple  # tuple(sorted(kwargs.items())) — hashable
    depth: int
    remat: bool = False
    remat_policy: str = "none"
    pass_deterministic: bool = True

    @nn.compact
    def __call__(self, h: jax.Array, deterministic: bool = True) -> jax.Array:
        cls = self.block_cls
        kwargs = dict(self.block_kwargs)
        pass_det = self.pass_deterministic

        class Body(nn.Module):
            @nn.compact
            def __call__(self, carry, _):
                block = cls(**kwargs, name="block")
                out = block(carry, deterministic) if pass_det else block(carry)
                return out, None

        if self.remat:
            from .blocks import resolve_remat_policy

            body = nn.remat(Body, prevent_cse=False,
                            policy=resolve_remat_policy(self.remat_policy))
        else:
            body = Body
        scanned = nn.scan(
            body,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.depth,
        )(name="scan")
        h, _ = scanned(h, None)
        return h


def stack_stage_params(params: dict, prefix: str, depth: int) -> dict:
    """Convert unrolled ``{prefix}_block{j}`` entries (j = 0..depth-1) in a
    stage's param dict into the scanned ``{prefix}_blocks`` layout. Returns a
    new dict; input untouched."""
    out = {k: v for k, v in params.items()
           if not (k.startswith(f"{prefix}_block") and k[len(prefix) + 6:].isdigit())}
    blocks = [params[f"{prefix}_block{j}"] for j in range(depth)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)
    out[f"{prefix}_blocks"] = {"scan": {"block": stacked}}
    return out


def unstack_stage_params(params: dict, prefix: str, depth: int) -> dict:
    """Inverse of stack_stage_params."""
    out = {k: v for k, v in params.items() if k != f"{prefix}_blocks"}
    stacked = params[f"{prefix}_blocks"]["scan"]["block"]
    for j in range(depth):
        out[f"{prefix}_block{j}"] = jax.tree_util.tree_map(
            lambda x, j=j: x[j], stacked)
    return out


def to_scanned_params(model_params: dict, config) -> dict:
    """Whole-model unrolled → scanned param-layout conversion."""
    out = dict(model_params)
    for top, depths in (("encoder", tuple(config.depths)),
                        ("decoder", tuple(reversed(config.depths)))):
        sub = dict(out[top])
        for i, d in enumerate(depths):
            sub = stack_stage_params(sub, f"stage{i}", d)
        out[top] = sub
    return out


def from_scanned_params(model_params: dict, config) -> dict:
    """Whole-model scanned → unrolled param-layout conversion."""
    out = dict(model_params)
    for top, depths in (("encoder", tuple(config.depths)),
                        ("decoder", tuple(reversed(config.depths)))):
        sub = dict(out[top])
        for i, d in enumerate(depths):
            sub = unstack_stage_params(sub, f"stage{i}", d)
        out[top] = sub
    return out
