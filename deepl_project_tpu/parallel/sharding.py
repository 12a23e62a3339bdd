"""Parameter sharding rules for pjit: replicate / FSDP / tensor-parallel.

TPU equivalents of SURVEY.md §2.7's table:
- replicate  — DDP parity: params replicated, batch sharded over 'data'; XLA
  inserts the grad psum (what DDP's NCCL allreduce did, ref: train.py:672-674).
- fsdp       — ZeRO-style: every large parameter sharded along its largest
  divisible axis over 'model'; XLA all-gathers weights per layer on use.
- tensor     — Megatron-style channel sharding of the transformer matmuls
  (q/k/v column-parallel, proj row-parallel; ConvFFN in/out likewise) for the
  1.3B huge / 2.3B giant variants.

Rules operate on parameter *path names*, so they work on the plain linen
param pytree without invasive logical-axis annotations.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS

# Dense kernels are [in, out]; conv kernels are HWIO. Scanned BlockStack
# params ("scan" in the path) carry a leading depth axis which is never
# sharded — the rules below apply to the trailing dims.
_COLUMN_PARALLEL = ("to_q", "to_k", "to_v", "proj_in")  # shard output dim
_ROW_PARALLEL = ("proj", "proj_out")  # shard input dim (XLA psums output)
# Conv HWIO kernels: 'column' shards output channels over 'model'. Only the
# FLOP-dominant ResBlock/ConvFFN 3x3 convs are sharded (ref blocks.py:12-68);
# the consumer conv (conv2 / main_1 / dc / heads) keeps a REPLICATED kernel
# and XLA all-gathers the channel-sharded activation it consumes.
#
# Why no row-parallel (input-channel) conv sharding: the Megatron col->row
# pairing on convs makes SPMD emit "involuntary full rematerialization" on
# every row-sharded kernel's backward `rev` op (and the Downsample/Upsample
# main/dc convs did the same even column-sharded) — a replicate+repartition
# of the kernel every step. Measured on the 8-virtual-device DPxCPxTP dryrun:
# Megatron conv rules -> 24 involuntary-remat warnings; column-only on
# ResBlock/FFN convs -> 0, with step-loss equality to the replicated baseline
# unchanged (delta ~1e-3 fp32 reassociation). Traffic is comparable: Megatron
# pays an output-activation psum per pair, column-only pays an activation
# all-gather — both one activation-sized ICI collective — while column-only
# avoids the per-step kernel remats. Dense matmuls keep the classic
# col->row pairing (_ROW_PARALLEL above): their backward reshards fine.
_CONV_COLUMN = ("conv_0", "conv_2", "conv1")


def _path_names(path) -> list[str]:
    return [str(getattr(p, "key", getattr(p, "name", p))) for p in path]


def _spec_for_tensor(names: list[str], shape: tuple, model_size: int) -> P:
    leaf = names[-1]
    parent = names[-2] if len(names) >= 2 else ""
    stacked = 1 if "scan" in names else 0  # leading lax.scan depth axis
    rank = len(shape) - stacked
    pre = (None,) * stacked

    def spec(*dims) -> P:
        return P(*(pre + dims))

    if leaf == "kernel" and rank == 2:
        if parent in _COLUMN_PARALLEL and shape[-1] % model_size == 0:
            return spec(None, MODEL_AXIS)
        if parent in _ROW_PARALLEL and shape[-2] % model_size == 0:
            return spec(MODEL_AXIS, None)
    if leaf == "kernel" and rank == 4:
        if parent in _CONV_COLUMN and shape[-1] % model_size == 0:
            return spec(None, None, None, MODEL_AXIS)
    if (leaf == "bias" and rank == 1
            and parent in _COLUMN_PARALLEL + _CONV_COLUMN
            and shape[-1] % model_size == 0):
        return spec(MODEL_AXIS)
    return P()


def _spec_for_fsdp(shape: tuple, model_size: int, min_size: int) -> P:
    size = 1
    for s in shape:
        size *= s
    if size < min_size:
        return P()
    # Shard the largest divisible axis.
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for axis in order:
        if shape[axis] % model_size == 0 and shape[axis] >= model_size:
            spec = [None] * len(shape)
            spec[axis] = MODEL_AXIS
            return P(*spec)
    return P()


def param_specs(params: Any, mode: str = "replicate", model_size: int = 1,
                fsdp_min_size: int = 2 ** 16) -> Any:
    """PartitionSpec pytree for ``params`` under the given strategy."""
    if mode == "replicate" or model_size == 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    if mode == "tensor":
        return jax.tree_util.tree_map_with_path(
            lambda path, p: _spec_for_tensor(_path_names(path), p.shape,
                                             model_size), params)
    if mode == "fsdp":
        return jax.tree_util.tree_map(
            lambda p: _spec_for_fsdp(p.shape, model_size, fsdp_min_size), params)
    raise ValueError(f"Unknown sharding mode: {mode!r}")


def param_shardings(mesh: Mesh, params: Any, mode: str = "replicate",
                    fsdp_min_size: int = 2 ** 16) -> Any:
    model_size = mesh.shape[MODEL_AXIS]
    specs = param_specs(params, mode, model_size, fsdp_min_size)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs,
                                  is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params: Any, mode: str = "replicate",
                 fsdp_min_size: int = 2 ** 16) -> Any:
    """Place a parameter pytree onto the mesh under the given strategy."""
    shardings = param_shardings(mesh, params, mode, fsdp_min_size)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
