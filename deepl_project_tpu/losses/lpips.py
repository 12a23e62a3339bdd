"""LPIPS perceptual loss (VGG16 backbone) as a pure JAX function.

The reference reaches LPIPS through the ``lpips`` pip package with a frozen
pretrained VGG16 (ref: patched vae_loss.py:52-54). Here the backbone and the
linear heads are implemented natively in JAX (NHWC convs on the MXU) and the
pretrained weights are loaded from an ``.npz`` produced once by
``scripts/convert_lpips_weights.py`` from any machine that has the pip package.

Semantics match lpips.LPIPS(net='vgg', spatial=False):
  input in [-1, 1] → ImageNet-style rescale (shift/scale) → VGG16 features at
  relu1_2/relu2_2/relu3_3/relu4_3/relu5_3 → channel-unit-normalize → squared
  diff → 1x1 non-negative linear head → spatial mean → sum over the 5 taps.

Without pretrained weights the loss still runs (random heads) so the training
pipeline is testable end-to-end; quality parity of course requires the real
weights. ``lpips_params_available()`` reports which mode you are in.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 convolutional config: channel widths per conv layer, 'M' = 2x2 maxpool.
_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512)
# Indices (into conv outputs, post-ReLU) of the 5 LPIPS taps:
# relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_TAP_AFTER_CONV = (1, 3, 6, 9, 12)
_TAP_CHANNELS = (64, 128, 256, 512, 512)

# lpips.ScalingLayer constants (input in [-1,1]).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "weights", "lpips_vgg.npz")


def init_lpips_params(rng: jax.Array | None = None) -> dict:
    """Random-init LPIPS params with the exact pytree structure of the
    converted pretrained weights. Used when no weights file is present."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params: dict[str, Any] = {"conv": {}, "lin": {}}
    in_ch = 3
    idx = 0
    keys = jax.random.split(rng, 32)
    ki = 0
    for c in _VGG16_CFG:
        if c == "M":
            continue
        params["conv"][f"w{idx}"] = (
            jax.random.normal(keys[ki], (3, 3, in_ch, c), jnp.float32)
            * np.sqrt(2.0 / (9 * in_ch)))
        params["conv"][f"b{idx}"] = jnp.zeros((c,), jnp.float32)
        in_ch = c
        idx += 1
        ki += 1
    for i, c in enumerate(_TAP_CHANNELS):
        params["lin"][f"w{i}"] = jnp.abs(
            jax.random.normal(keys[ki], (c,), jnp.float32)) / c
        ki += 1
    return params


def load_lpips_params(path: str = DEFAULT_WEIGHTS_PATH) -> dict | None:
    """Load converted pretrained weights; None if the file doesn't exist."""
    if not os.path.exists(path):
        return None
    raw = np.load(path)
    params: dict[str, Any] = {"conv": {}, "lin": {}}
    for k in raw.files:
        group, name = k.split("/")
        params[group][name] = jnp.asarray(raw[k])
    return params


def lpips_params_available(path: str = DEFAULT_WEIGHTS_PATH) -> bool:
    return os.path.exists(path)


def get_lpips_params(path: str = DEFAULT_WEIGHTS_PATH) -> dict:
    p = load_lpips_params(path)
    return p if p is not None else init_lpips_params()


def _vgg_features(params: dict, x: jax.Array) -> list[jax.Array]:
    """Run the VGG16 trunk, returning the 5 tap activations. x: NHWC in [-1,1]."""
    h = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    taps = []
    idx = 0
    for c in _VGG16_CFG:
        if c == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
            continue
        w = params["conv"][f"w{idx}"]
        b = params["conv"][f"b{idx}"]
        h = jax.lax.conv_general_dilated(
            h, w.astype(h.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h = jax.nn.relu(h + b.astype(h.dtype))
        if idx in _TAP_AFTER_CONV:
            taps.append(h)
        idx += 1
    return taps


def _unit_normalize(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / (norm + eps)


def lpips(params: dict, x: jax.Array, y: jax.Array) -> jax.Array:
    """LPIPS distance per batch element.

    Args:
      params: from get_lpips_params() / load_lpips_params().
      x, y: NHWC images in [-1, 1].
    Returns: [B] distances (fp32).
    """
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    fx = _vgg_features(params, x)
    fy = _vgg_features(params, y)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        d = jnp.square(_unit_normalize(a) - _unit_normalize(b))
        w = params["lin"][f"w{i}"]  # [C] non-negative 1x1 head
        d = jnp.sum(d * w, axis=-1)  # [B,H,W]
        total = total + jnp.mean(d, axis=(1, 2))  # spatial mean
    return total
