"""Evaluation metrics: PSNR / SSIM (jit-safe JAX, on-device) + helpers.

The reference computes PSNR/SSIM per image on CPU via scikit-image
(ref: evaluate.py:104-124) or a simplified on-GPU torch version (ref: patched
evaluate_transvae.py:47-77). Here both are proper on-device JAX functions —
batched, jittable, no D2H copies in the eval loop. SSIM follows Wang et al.
with the standard 11x11 Gaussian window (a superset of the reference's
avg-pool approximation; constants C1/C2 identical).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(x: jax.Array, y: jax.Array, max_val: float = 1.0) -> jax.Array:
    """Per-image PSNR in dB. x, y: [B, H, W, C] in [0, max_val] → [B]."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    mse = jnp.mean(jnp.square(x - y), axis=(1, 2, 3))
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-0.5 * ((np.arange(size) - size // 2) / sigma) ** 2)
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def ssim(x: jax.Array, y: jax.Array, max_val: float = 1.0,
         window_size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Per-image SSIM (mean over channels/windows). x, y: [B,H,W,C] → [B]."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    kern = jnp.asarray(_gaussian_kernel(window_size, sigma))
    ch = x.shape[-1]
    # Depthwise valid conv: HWIO kernel [k,k,1,1] with feature_group_count=C.
    k4 = jnp.tile(kern[:, :, None, None], (1, 1, 1, ch))

    def filt(img):
        return jax.lax.conv_general_dilated(
            img, k4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ch)

    mu_x = filt(x)
    mu_y = filt(y)
    mu_x2, mu_y2, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    # Clamp variance estimates at 0: on perfectly flat windows the E[x^2]-E[x]^2
    # estimator can go slightly negative in fp32, collapsing the denominator
    # and exploding individual windows to |SSIM| >> 1.
    sigma_x = jnp.maximum(filt(x * x) - mu_x2, 0.0)
    sigma_y = jnp.maximum(filt(y * y) - mu_y2, 0.0)
    sigma_xy = filt(x * y) - mu_xy
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)) / (
        (mu_x2 + mu_y2 + c1) * (sigma_x + sigma_y + c2))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def summarize(values: np.ndarray) -> dict:
    """mean/std/median summary like the reference reports (evaluate.py:136-143)."""
    v = np.asarray(values, np.float64)
    return {"mean": float(v.mean()), "std": float(v.std()),
            "median": float(np.median(v)), "min": float(v.min()),
            "max": float(v.max())}
