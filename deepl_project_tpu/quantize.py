"""Int8 post-training quantization pipeline: calibrate + transform.

Usage (serving; see cli/serve.py --quantize int8 and scripts/bench_quant.py):

    model, qparams = quantize_model(config, params, calib_batches)
    recon, mu, logvar = jax.jit(
        lambda p, x: model.apply({"params": p}, x, sample=False))(qparams, x)

``calib_batches`` is any iterable of [B, H, W, 3] float batches in [0, 1]
(a handful is enough — the scales are per-tensor absmax). The calibration
pass runs the FLOAT model with absmax sows (ops/quant.py sow_amax); the
transform then rewrites the param tree in place of every ResBlock and
full-ConvFFN node: per-output-channel int8 kernels + static activation
scales, folded FFN matrices quantized directly (one quantization step, no
intermediate rounding of the fold).

Scope/limits: inference only; requires conv_ffn_type='full' (all reference
variants) and scan_blocks=False; attention, norms, stem/out/latent-head and
resample convs stay in the float path (quality-critical or already fused).
The reference framework has no quantization support — beyond-parity feature.
"""

from __future__ import annotations

from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .config import TransVAEConfig
from .ops.quant import QMAX, quantize_weight


def _act_scale(amax) -> jnp.ndarray:
    return jnp.maximum(jnp.asarray(amax, jnp.float32), 1e-8) / QMAX


def _q_conv_or_dense(node: dict, amax) -> dict:
    wq, ws = quantize_weight(node["kernel"], axis=-1)
    out = {"kernel_q": wq, "kernel_scale": ws, "act_scale": _act_scale(amax)}
    if "bias" in node:
        out["bias"] = node["bias"].astype(jnp.float32)
    return out


def _q_resblock(node: dict, am: dict) -> dict:
    out = {"norm1": node["norm1"], "norm2": node["norm2"],
           "conv1": _q_conv_or_dense(node["conv1"], am["amax_h1"]),
           "conv2": _q_conv_or_dense(node["conv2"], am["amax_h2"])}
    if "shortcut" in node:
        out["shortcut"] = _q_conv_or_dense(node["shortcut"], am["amax_x"])
    return out


def _q_ffn(node: dict, am: dict) -> dict:
    w0 = np.asarray(node["conv_0"]["kernel"], np.float32)
    b0 = np.asarray(node["conv_0"]["bias"], np.float32)
    w2 = np.asarray(node["conv_2"]["kernel"], np.float32)
    b2 = np.asarray(node["conv_2"]["bias"], np.float32)
    wout = np.asarray(node["proj_out"]["kernel"], np.float32)
    bout = np.asarray(node["proj_out"]["bias"], np.float32)
    hidden, ch = w0.shape[-2], w0.shape[-1]
    # Folded matrices (exactly the fold_output=True float path, ffn.py):
    w_head = np.concatenate([w0.reshape(hidden, ch), wout], axis=1)
    w_fold = w2.reshape(ch, hidden) @ wout
    b_fold = b2 @ wout + bout
    wh_q, wh_s = quantize_weight(jnp.asarray(w_head), axis=-1)
    wf_q, wf_s = quantize_weight(jnp.asarray(w_fold), axis=-1)
    return {
        "proj_in": _q_conv_or_dense(node["proj_in"], am["amax_in"]),
        "conv_1": _q_conv_or_dense(node["conv_1"], am["amax_z"]),
        "w_head_q": wh_q, "w_head_scale": wh_s,
        "act_scale_y": _act_scale(am["amax_y"]),
        "b0": jnp.asarray(b0.reshape(ch)),
        "w_fold_q": wf_q, "w_fold_scale": wf_s,
        "act_scale_z2": _act_scale(am["amax_z2"]),
        "b_fold": jnp.asarray(b_fold),
    }


def quantize_params(params: dict, amax: dict, scope: str = "all") -> dict:
    """Rewrite a float TransVAE param tree into the quant='int8' tree.

    ``amax`` is the merged 'intermediates' tree from the calibration pass;
    it mirrors the module structure of ``params``. ``scope`` selects which
    module families are rewritten ('all' | 'resblock' | 'ffn') and must match
    the model config's ``quant_scope``.
    """

    def walk(node, am):
        if not isinstance(node, dict):
            return node
        if "conv1" in node and "norm1" in node:  # ResBlock
            return (_q_resblock(node, am) if scope in ("all", "resblock")
                    else node)
        if "proj_in" in node and "conv_1" in node:  # full ConvFFN
            return _q_ffn(node, am) if scope in ("all", "ffn") else node
        return {k: walk(v, am.get(k, {}) if isinstance(am, dict) else {})
                for k, v in node.items()}

    return walk(params, amax)


def calibrate_amax(config: TransVAEConfig, params: dict,
                   calib_batches: Iterable[jax.Array]) -> dict:
    """Run the float model over calibration batches, return merged absmax."""
    from .models.transvae import TransVAE

    model = TransVAE(config.replace(quant=None, quant_calibrate=True))

    @jax.jit
    def step(p, x):
        _, mut = model.apply({"params": p}, x, sample=False,
                             mutable=["intermediates"])
        return mut["intermediates"]

    amax = None
    n = 0
    for x in calib_batches:
        a = step(params, jnp.asarray(x))
        amax = a if amax is None else jax.tree.map(jnp.maximum, amax, a)
        n += 1
    if n == 0:
        raise ValueError("quantize: calib_batches is empty")
    return jax.device_get(amax)


def quantize_model(config: TransVAEConfig, params: dict,
                   calib_batches: Iterable[jax.Array], scope: str = "all"):
    """Full pipeline: calibrate, transform, return (quant model, qparams)."""
    from .models.transvae import TransVAE

    if config.scan_blocks:
        raise ValueError("quant='int8' does not support scan_blocks param "
                         "layouts; rebuild the checkpoint with "
                         "scan_blocks=False (ops/stack.py converters).")
    if config.conv_ffn_type != "full":
        raise ValueError("quant='int8' requires conv_ffn_type='full'")
    if scope not in ("all", "resblock", "ffn"):
        raise ValueError(f"quant scope must be all|resblock|ffn, got {scope}")
    amax = calibrate_amax(config, params, calib_batches)
    qparams = quantize_params(params, amax, scope=scope)
    qcfg = config.replace(quant="int8", quant_scope=scope,
                          quant_calibrate=False)
    return TransVAE(qcfg), qparams
