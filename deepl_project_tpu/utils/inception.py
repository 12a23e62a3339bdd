"""InceptionV3 pool3 feature extractor in pure JAX — the canonical rFID
backbone (paper Table 1 protocol; ref eval computes quality metrics in
patched/evaluate_transvae.py:109-341 and the paper's rFID uses InceptionV3).

Weights are converter-gated like LPIPS: run
``scripts/convert_inception_weights.py`` once on a machine with torchvision
(or the pytorch-fid variant's state_dict) and ship the resulting ``.npz``.
BatchNorm is folded into conv biases at conversion (exact in eval mode), so
every layer here is conv+bias+relu.

Without a weights file, ``get_inception_params()`` falls back to seeded
random weights with the exact same pytree — the FID *formula* and pipeline
stay testable end-to-end; absolute rFID numbers need the real weights.

Preprocessing contract (pytorch-fid): NHWC float in [0,1] → bilinear resize
to 299x299 → scale to [-1,1] → features [B, 2048].
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .inception_spec import BLOCKS, FEATURE_DIM, INPUT_SIZE, conv_specs

DEFAULT_WEIGHTS_PATH = os.path.join(
    os.path.dirname(__file__), "..", "weights", "inception_v3.npz")


def init_inception_params(rng: jax.Array | None = None) -> dict:
    """Random params with the converted-weights pytree (He-normal convs,
    zero biases)."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    params: dict[str, Any] = {}
    for i, (name, (cin, cout, (kh, kw), _, _)) in enumerate(
            sorted(conv_specs().items())):
        k = jax.random.fold_in(rng, i)
        fan_in = kh * kw * cin
        params[f"{name}/w"] = (jax.random.normal(
            k, (kh, kw, cin, cout), jnp.float32) * np.sqrt(2.0 / fan_in))
        params[f"{name}/b"] = jnp.zeros((cout,), jnp.float32)
    return params


def load_inception_params(path: str = DEFAULT_WEIGHTS_PATH) -> dict | None:
    if not os.path.exists(path):
        return None
    raw = np.load(path)
    return {k: jnp.asarray(raw[k]) for k in raw.files}


def inception_params_available(path: str = DEFAULT_WEIGHTS_PATH) -> bool:
    return os.path.exists(path)


def get_inception_params(path: str = DEFAULT_WEIGHTS_PATH) -> dict:
    p = load_inception_params(path)
    return p if p is not None else init_inception_params()


# -- forward ---------------------------------------------------------------

_SPECS = conv_specs()


def _conv(params: dict, name: str, x: jax.Array) -> jax.Array:
    _, _, _, strides, (ph, pw) = _SPECS[name]
    w = params[f"{name}/w"].astype(x.dtype)
    b = params[f"{name}/b"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w, strides, ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jax.nn.relu(y + b)


def _max_pool3s2(x: jax.Array) -> jax.Array:
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avg_pool3s1p1(x: jax.Array, count_include_pad: bool) -> jax.Array:
    pads = ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1), [(p[0], p[1]) for p in pads])
    if count_include_pad:
        return summed / 9.0
    ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                   (1, 1, 1, 1),
                                   [(p[0], p[1]) for p in pads])
    return summed / counts


def _block_a(params, p, x, pool_pad):
    b1 = _conv(params, f"{p}.branch1x1", x)
    b5 = _conv(params, f"{p}.branch5x5_2",
               _conv(params, f"{p}.branch5x5_1", x))
    b3 = _conv(params, f"{p}.branch3x3dbl_3",
               _conv(params, f"{p}.branch3x3dbl_2",
                     _conv(params, f"{p}.branch3x3dbl_1", x)))
    bp = _conv(params, f"{p}.branch_pool", _avg_pool3s1p1(x, pool_pad))
    return jnp.concatenate([b1, b5, b3, bp], axis=-1)


def _block_b(params, p, x, pool_pad):
    b3 = _conv(params, f"{p}.branch3x3", x)
    bd = _conv(params, f"{p}.branch3x3dbl_3",
               _conv(params, f"{p}.branch3x3dbl_2",
                     _conv(params, f"{p}.branch3x3dbl_1", x)))
    return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


def _block_c(params, p, x, pool_pad):
    b1 = _conv(params, f"{p}.branch1x1", x)
    b7 = x
    for s in ("branch7x7_1", "branch7x7_2", "branch7x7_3"):
        b7 = _conv(params, f"{p}.{s}", b7)
    bd = x
    for s in ("branch7x7dbl_1", "branch7x7dbl_2", "branch7x7dbl_3",
              "branch7x7dbl_4", "branch7x7dbl_5"):
        bd = _conv(params, f"{p}.{s}", bd)
    bp = _conv(params, f"{p}.branch_pool", _avg_pool3s1p1(x, pool_pad))
    return jnp.concatenate([b1, b7, bd, bp], axis=-1)


def _block_d(params, p, x, pool_pad):
    b3 = _conv(params, f"{p}.branch3x3_2",
               _conv(params, f"{p}.branch3x3_1", x))
    b7 = x
    for s in ("branch7x7x3_1", "branch7x7x3_2", "branch7x7x3_3",
              "branch7x7x3_4"):
        b7 = _conv(params, f"{p}.{s}", b7)
    return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


def _block_e(params, p, x, pool_pad):
    b1 = _conv(params, f"{p}.branch1x1", x)
    h = _conv(params, f"{p}.branch3x3_1", x)
    b3 = jnp.concatenate([_conv(params, f"{p}.branch3x3_2a", h),
                          _conv(params, f"{p}.branch3x3_2b", h)], axis=-1)
    h = _conv(params, f"{p}.branch3x3dbl_2",
              _conv(params, f"{p}.branch3x3dbl_1", x))
    bd = jnp.concatenate([_conv(params, f"{p}.branch3x3dbl_3a", h),
                          _conv(params, f"{p}.branch3x3dbl_3b", h)], axis=-1)
    bp = _conv(params, f"{p}.branch_pool", _avg_pool3s1p1(x, pool_pad))
    return jnp.concatenate([b1, b3, bd, bp], axis=-1)


_BLOCK_FNS = {"A": _block_a, "B": _block_b, "C": _block_c, "D": _block_d,
              "E": _block_e}


def inception_features(params: dict, x: jax.Array,
                       normalize_input: bool = True,
                       resize: bool = True,
                       count_include_pad: bool = False) -> jax.Array:
    """pool3 features [B, 2048] of NHWC images in [0, 1].

    ``count_include_pad=False`` matches pytorch-fid's FID-variant average
    pools; True matches stock torchvision.
    """
    x = x.astype(jnp.float32)
    if resize and x.shape[1:3] != (INPUT_SIZE, INPUT_SIZE):
        x = jax.image.resize(
            x, (x.shape[0], INPUT_SIZE, INPUT_SIZE, x.shape[3]), "bilinear")
    if normalize_input:
        x = x * 2.0 - 1.0
    h = _conv(params, "Conv2d_1a_3x3", x)
    h = _conv(params, "Conv2d_2a_3x3", h)
    h = _conv(params, "Conv2d_2b_3x3", h)
    h = _max_pool3s2(h)
    h = _conv(params, "Conv2d_3b_1x1", h)
    h = _conv(params, "Conv2d_4a_3x3", h)
    h = _max_pool3s2(h)
    for name, kind in BLOCKS:
        h = _BLOCK_FNS[kind](params, name, h, count_include_pad)
    feats = jnp.mean(h, axis=(1, 2))  # global average pool → [B, 2048]
    assert feats.shape[-1] == FEATURE_DIM
    return feats


def make_inception_feature_fn(params: dict | None = None,
                              batch_jit: bool = True):
    """Feature fn for utils.fid.rfid / training.diffusion.generation_fid."""
    params = params if params is not None else get_inception_params()
    fn = lambda x: inception_features(params, jnp.asarray(x))  # noqa: E731
    return jax.jit(fn) if batch_jit else fn
