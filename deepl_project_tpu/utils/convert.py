"""PyTorch → JAX weight conversion for reference TransVAE checkpoints.

Maps the reference's state_dict naming (transvae/models/{transvae,encoder,
decoder}.py, transvae/modules/*) onto this package's NHWC flax param tree:

- conv weights OIHW → HWIO (transpose 2,3,1,0); linear [out,in] → [in,out]
- norm ``weight`` → ``scale`` (bias name unchanged)
- encoder.stages.{i}.{j}.* → encoder/stage{i}_block{j}/*; downsamples.{i} →
  down{i} (main_path.0/.2 → main_0/main_1); decoder symmetric with
  upsamples.{i}.main_path.1/.3 → up{i}.main_0/main_1
- ConvFFN full branch: ffn.conv.0/.2/.4 → ffn/conv_0,conv_1,conv_2;
  depthwise: ffn.conv → ffn/conv_dw (torch depthwise [C,1,kh,kw] → HWIO
  [kh,kw,1,C])

Works on plain numpy dicts, so no torch import is required at conversion time
(pass ``{k: np.asarray(v) for k, v in state_dict.items()}``).
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..config import TransVAEConfig


def _conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _depthwise_conv(w: np.ndarray) -> np.ndarray:
    # torch depthwise [C,1,kh,kw] → flax HWIO [kh,kw,1,C] (feature_group_count=C)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _dense(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def _set(tree: dict, path: list[str], value: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def _convert_block(out: dict, base: list[str], name: str, tensor: np.ndarray,
                   is_cnn_block: bool) -> bool:
    """Convert one within-block tensor. ``name`` is the suffix after
    'stages.{i}.{j}.'. Returns False if unrecognized."""
    if is_cnn_block:
        # ResBlock: norm1/2 (GroupNorm), conv1/2, shortcut
        mod, leaf = name.rsplit(".", 1)
        if mod in ("norm1", "norm2"):
            _set(out, base + [mod, "scale" if leaf == "weight" else "bias"], tensor)
        elif mod in ("conv1", "conv2", "shortcut"):
            _set(out, base + [mod, "kernel" if leaf == "weight" else "bias"],
                 _conv(tensor) if leaf == "weight" else tensor)
        else:
            return False
        return True

    # TransVAEBlock
    parts = name.split(".")
    if parts[0] in ("norm1", "norm2"):
        _set(out, base + [parts[0], "scale"], tensor)  # RMSNorm has no bias
        return True
    if parts[0] == "attn":
        mod = parts[1]
        leaf = parts[-1]
        if mod in ("norm_q", "norm_k", "norm_v"):
            _set(out, base + ["attn", mod,
                              "scale" if leaf == "weight" else "bias"], tensor)
        elif mod in ("to_q", "to_k", "to_v", "proj"):
            _set(out, base + ["attn", mod,
                              "kernel" if leaf == "weight" else "bias"],
                 _dense(tensor) if leaf == "weight" else tensor)
        elif mod == "rope":
            return True  # inv_freq buffer: recomputed, not a parameter
        else:
            return False
        return True
    if parts[0] == "ffn":
        leaf = parts[-1]
        if parts[1] in ("proj_in", "proj_out", "fc1", "fc2"):
            _set(out, base + ["ffn", parts[1],
                              "kernel" if leaf == "weight" else "bias"],
                 _dense(tensor) if leaf == "weight" else tensor)
            return True
        if parts[1] == "conv":
            if len(parts) == 3:  # depthwise: ffn.conv.weight
                _set(out, base + ["ffn", "conv_dw",
                                  "kernel" if leaf == "weight" else "bias"],
                     _depthwise_conv(tensor) if leaf == "weight" else tensor)
                return True
            # full: Sequential indices 0, 2, 4 → conv_0, conv_1, conv_2
            idx = {"0": "conv_0", "2": "conv_1", "4": "conv_2"}[parts[2]]
            _set(out, base + ["ffn", idx,
                              "kernel" if leaf == "weight" else "bias"],
                 _conv(tensor) if leaf == "weight" else tensor)
            return True
    return False


def torch_state_dict_to_params(state_dict: Mapping[str, np.ndarray],
                               config: TransVAEConfig) -> dict:
    """Convert a reference TransVAE state_dict (numpy values) to this
    package's param pytree (model params, i.e. what goes under
    {'params': ...})."""
    num_stages = config.num_stages
    enc_cnn = set(range(config.num_cnn_stages))
    dec_cnn = set(range(num_stages - config.num_cnn_stages, num_stages))

    out: dict[str, Any] = {}
    unused = []
    for key, tensor in state_dict.items():
        tensor = np.asarray(tensor)
        parts = key.split(".")
        top = parts[0]
        if top in ("conv_mu", "conv_logvar"):
            _set(out, [top, "kernel" if parts[1] == "weight" else "bias"],
                 _conv(tensor) if parts[1] == "weight" else tensor)
            continue
        if top not in ("encoder", "decoder"):
            unused.append(key)
            continue
        sub = parts[1]
        rest = parts[2:]
        if sub == "conv_in":
            _set(out, [top, "conv_in",
                       "kernel" if rest[0] == "weight" else "bias"],
                 _conv(tensor) if rest[0] == "weight" else tensor)
        elif sub == "conv_out":
            _set(out, [top, "conv_out",
                       "kernel" if rest[0] == "weight" else "bias"],
                 _conv(tensor) if rest[0] == "weight" else tensor)
        elif sub == "norm_out":
            _set(out, [top, "norm_out",
                       "scale" if rest[0] == "weight" else "bias"], tensor)
        elif sub == "stages":
            i, j = int(rest[0]), int(rest[1])
            name = ".".join(rest[2:])
            is_cnn = i in (enc_cnn if top == "encoder" else dec_cnn)
            ok = _convert_block(out, [top, f"stage{i}_block{j}"], name, tensor,
                                is_cnn)
            if not ok:
                unused.append(key)
        elif sub in ("downsamples", "upsamples"):
            i = int(rest[0])
            prefix = ("down" if sub == "downsamples" else "up") + str(i)
            mod = rest[1]
            leaf = rest[-1]
            if mod == "main_path":
                seq = rest[2]
                if sub == "downsamples":
                    name = {"0": "main_0", "2": "main_1"}[seq]
                else:
                    name = {"1": "main_0", "3": "main_1"}[seq]
                _set(out, [top, prefix, name,
                           "kernel" if leaf == "weight" else "bias"],
                     _conv(tensor) if leaf == "weight" else tensor)
            elif mod == "dc_conv":
                _set(out, [top, prefix, "dc_conv",
                           "kernel" if leaf == "weight" else "bias"],
                     _conv(tensor) if leaf == "weight" else tensor)
            else:
                unused.append(key)
        else:
            unused.append(key)
    if unused:
        skippable = [k for k in unused if "rope" not in k]
        if skippable:
            raise ValueError(f"Unconverted reference keys: {skippable[:10]}"
                             f" (+{max(0, len(skippable) - 10)} more)")
    return out


def _seq_name(top: str, sub: str, name: str) -> str:
    """Map a resample submodule name back to the reference's nn.Sequential
    index (Downsample main_path = [conv, act, conv] → 0/2; Upsample
    main_path = [up, conv, act, conv] → 1/3)."""
    if sub.startswith("down"):
        return {"main_0": "main_path.0", "main_1": "main_path.2"}[name]
    return {"main_0": "main_path.1", "main_1": "main_path.3"}[name]


def params_to_torch_state_dict(params: Mapping[str, Any],
                               config: TransVAEConfig) -> dict:
    """Inverse of :func:`torch_state_dict_to_params`: emit this package's
    model params as a reference-layout torch state_dict (numpy values) so
    TPU-trained checkpoints load back into the PyTorch reference
    (ref: transvae-implementation/transvae/models/transvae.py naming).

    RoPE ``inv_freq`` buffers are deliberately absent (the reference
    recomputes them at construction; load with ``strict=False`` or restore
    into a freshly built model whose buffers already exist). Weight-layout
    transforms are shape-driven: HWIO conv kernels → OIHW, [in,out] dense
    kernels → [out,in], ``scale`` → ``weight``.
    """
    flat: dict[tuple, np.ndarray] = {}

    def walk(node, path):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, path + (k,))
        else:
            flat[path] = np.asarray(node)

    walk(params, ())

    out: dict[str, np.ndarray] = {}
    for path, tensor in flat.items():
        leaf = path[-1]
        if leaf == "kernel":
            torch_leaf = "weight"
            tensor = (np.ascontiguousarray(np.transpose(tensor, (3, 2, 0, 1)))
                      if tensor.ndim == 4 else
                      np.ascontiguousarray(tensor.T))
        elif leaf == "scale":
            torch_leaf = "weight"
        elif leaf == "bias":
            torch_leaf = "bias"
        else:
            raise ValueError(f"Unexpected param leaf {'.'.join(path)}")

        mods = []
        for name in path[:-1]:
            if name.startswith("stage") and "_block" in name:
                i, j = name[5:].split("_block")
                mods += ["stages", i, j]
            elif name.startswith("down"):
                mods += ["downsamples", name[4:]]
            elif name.startswith("up") and name[2:].isdigit():
                mods += ["upsamples", name[2:]]
            elif name in ("main_0", "main_1"):
                mods.append(_seq_name(path[0], path[1], name))
            elif name == "conv_dw":
                mods.append("conv")
            elif name in ("conv_0", "conv_1", "conv_2"):
                mods.append({"conv_0": "conv.0", "conv_1": "conv.2",
                             "conv_2": "conv.4"}[name])
            else:
                mods.append(name)
        out[".".join(mods + [torch_leaf])] = tensor
    return out


def load_reference_checkpoint(path: str, config: TransVAEConfig) -> dict:
    """Load a torch .pt checkpoint (file with model_state_dict or raw
    state_dict) and convert. Requires torch importable."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    sd = raw.get("model_state_dict", raw) if isinstance(raw, dict) else raw
    np_sd = {k.replace("module.", ""): v.numpy() for k, v in sd.items()}
    return torch_state_dict_to_params(np_sd, config)
