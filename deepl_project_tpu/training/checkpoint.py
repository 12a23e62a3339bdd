"""Checkpoint save/resume via orbax (the TPU-native answer to torch.save dicts).

Logical contents match the reference checkpoint dict {epoch, global_step,
model_state_dict, optimizer_state_dict, scheduler_state_dict, args}
(ref: train_2.py:245-260) — here {step, epoch, params, opt_state} plus a JSON
config sidecar. Multi-host/sharded arrays are handled natively by orbax
(the reference needed rank-0 gating + DDP unwrapping; ref: train.py:739-758).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any

import jax
import orbax.checkpoint as ocp

from ..config import TransVAEConfig


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                             create=True))


def save_checkpoint(directory: str, step: int, state: Any,
                    epoch: int = 0, config: TransVAEConfig | None = None,
                    max_to_keep: int = 3,
                    metrics: dict[str, float] | None = None) -> None:
    """Save {params, opt_state, step, epoch}; config goes to config.json.
    ``metrics`` (e.g. val PSNR for a best-checkpoint dir) go to a
    metrics.json sidecar — NOT into the orbax payload, whose meta structure
    must stay fixed for structured restores."""
    os.makedirs(directory, exist_ok=True)
    if config is not None:
        with open(os.path.join(directory, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(config), f, indent=2, default=list)
    if metrics:
        with open(os.path.join(directory, "metrics.json"), "w") as f:
            json.dump({"step": step,
                       **{k: float(v) for k, v in metrics.items()}}, f,
                      indent=1)
    payload = {"state": state, "meta": {"epoch": epoch, "step": step}}
    mngr = _manager(directory, max_to_keep)
    mngr.save(step, args=ocp.args.StandardSave(payload))
    mngr.wait_until_finished()
    mngr.close()


def latest_step(directory: str) -> int | None:
    if not os.path.isdir(directory):
        return None
    mngr = _manager(directory)
    step = mngr.latest_step()
    mngr.close()
    return step


def restore_checkpoint(directory: str, abstract_state: Any | None = None,
                       step: int | None = None):
    """Restore (state, meta). With abstract_state (a pytree of ShapeDtypeStruct
    or concrete arrays) the restore preserves shardings/dtypes."""
    mngr = _manager(directory)
    step = step if step is not None else mngr.latest_step()
    if step is None:
        mngr.close()
        raise FileNotFoundError(f"No checkpoint found in {directory}")
    if abstract_state is not None:
        abstract = {"state": jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, abstract_state),
            "meta": {"epoch": 0, "step": 0}}
        payload = mngr.restore(step, args=ocp.args.StandardRestore(abstract))
    else:
        try:
            payload = mngr.restore(step)
        except ValueError as e:
            # Cross-platform restore (e.g. exporting a TPU-trained checkpoint
            # on a CPU-only process): the saved sharding names devices that
            # don't exist here. Rebuild an abstract tree from the metadata
            # with no shardings so orbax restores to the default device.
            if "jax.local_devices" not in str(e):
                raise
            meta = mngr.item_metadata(step)
            abstract = jax.tree_util.tree_map(
                lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype)
                if hasattr(m, "shape") else m, meta)
            payload = mngr.restore(step,
                                   args=ocp.args.StandardRestore(abstract))
    mngr.close()
    return payload["state"], payload["meta"]


def checkpoint_state_keys(directory: str, step: int | None = None) -> set[str]:
    """Top-level keys of the saved payload's ``state`` dict, read via orbax's
    public metadata API — no array data is loaded. Lets resume decide
    whether e.g. discriminator state is present before building the abstract
    target tree for a structured restore."""
    # item_handlers must be given explicitly: a fresh manager has no handler
    # registered for the default item and returns None from item_metadata.
    mngr = ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(create=True),
        item_handlers=ocp.StandardCheckpointHandler())
    try:
        if step is None:
            step = mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoint found in {directory}")
        metadata = mngr.item_metadata(step)
        if metadata is None:
            raise FileNotFoundError(
                f"No readable checkpoint metadata at {directory} step {step}")
        return set(metadata["state"].keys())
    finally:
        mngr.close()


def checkpoint_metrics(directory: str) -> dict | None:
    """The metrics.json sidecar written with a best checkpoint, or None."""
    path = os.path.join(directory, "metrics.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_config(directory: str) -> TransVAEConfig:
    with open(os.path.join(directory, "config.json")) as f:
        raw = json.load(f)
    for key in ("depths", "base_dims"):
        raw[key] = tuple(raw[key])
    raw["logvar_clip"] = tuple(raw["logvar_clip"])
    return TransVAEConfig(**raw)


def restore_params(directory: str, step: int | None = None,
                   prefer_ema: bool = True):
    """Restore just the model params from a full train-state checkpoint (for
    from_pretrained / eval). With prefer_ema (default), an EMA shadow saved
    by the trainer is returned instead of the raw params — the EMA model is
    the one best-checkpoint selection scored."""
    state, _ = restore_checkpoint(directory, step=step)
    if prefer_ema and isinstance(state, dict) and "ema_params" in state:
        return state["ema_params"]
    params = state["params"] if isinstance(state, dict) and "params" in state else state
    return params


def restore_model_params(directory: str, step: int | None = None,
                         prefer_ema: bool = True):
    """Like :func:`restore_params` but also unwraps the trainer's
    {'model': ..., 'vf_proj': ...} split — the params tree a bare
    ``model.apply`` expects."""
    params = restore_params(directory, step=step, prefer_ema=prefer_ema)
    if isinstance(params, dict) and "model" in params:
        params = params["model"]
    return params
