"""Evaluation harness: PSNR/SSIM/LPIPS over a dataset, reconstruction grids,
random sampling, resolution-extrapolation sweeps.

Reference counterparts: evaluate.py:68-193 (metrics loop; per-image skimage on
CPU) and patched evaluate_transvae.py:109-341 (on-GPU metrics, sigmoid on
logits, metrics.json, comparison grids, random samples),
scripts/reproduce/test_rope_extrapolation.py (PSNR at 256/512/1024).

TPU design: the whole eval step — forward + sigmoid + PSNR/SSIM/LPIPS — is one
jitted program; only the final per-batch metric vectors cross to host.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from .losses import LossWeights, get_lpips_params, lpips as lpips_distance
from .models.transvae import TransVAE
from .utils.image import make_grid, save_image
from .utils.metrics import psnr, ssim, summarize


def make_metric_step(model: TransVAE, lpips_params: Any | None = None):
    """Jitted: batch -> (recon[0,1], {psnr, ssim, lpips per image})."""

    @jax.jit
    def step(params, batch):
        recon_logits, mu, logvar = model.apply(
            {"params": params}, batch, sample=False)
        recon = jax.nn.sigmoid(recon_logits.astype(jnp.float32))
        target = batch.astype(jnp.float32)
        out = {"psnr": psnr(recon, target), "ssim": ssim(recon, target)}
        if lpips_params is not None:
            out["lpips"] = lpips_distance(
                lpips_params, recon * 2.0 - 1.0, target * 2.0 - 1.0)
        return recon, out

    return step


def make_vgg_feature_fn(lpips_params: Any):
    """Perceptual feature extractor for FID-style metrics: spatially-pooled
    deepest VGG tap. NOTE: this is a VGG-feature FID, not InceptionV3 rFID —
    relative comparisons are valid, absolute values are not comparable to
    paper Table 1 (Inception weights are converter-gated like LPIPS)."""
    from .losses.lpips import _vgg_features

    @jax.jit
    def feature_fn(images01):
        x = jnp.asarray(images01, jnp.float32) * 2.0 - 1.0
        taps = _vgg_features(lpips_params, x)
        return jnp.mean(taps[-1], axis=(1, 2))  # [B, 512]

    return feature_fn


def make_fid_feature_fn() -> tuple:
    """(feature_fn, metric_key) for FID-style metrics: InceptionV3 pool3 when
    converted weights exist (paper Table 1/2b protocol), else pooled VGG
    features under a 'vgg_' key so relative-only numbers are never conflated
    with paper-comparable ones."""
    from .utils.inception import (inception_params_available,
                                  make_inception_feature_fn)

    if inception_params_available():
        return make_inception_feature_fn(), "rfid"
    return make_vgg_feature_fn(get_lpips_params()), "vgg_rfid"


def evaluate_model(model: TransVAE, params: Any,
                   batches: Iterator[np.ndarray],
                   use_lpips: bool = True,
                   max_batches: int | None = None,
                   output_dir: str | None = None,
                   save_grids: int = 0,
                   compute_rfid: bool = False) -> dict:
    """Run reconstruction metrics over batches; returns {metric: summary}
    and optionally writes metrics.json + comparison grids."""
    lpips_params = get_lpips_params() if (use_lpips or compute_rfid) else None
    step = make_metric_step(model, lpips_params if use_lpips else None)
    model_params = params["model"] if isinstance(params, dict) and "model" in params else params
    feature_fn = None
    rfid_key = None
    if compute_rfid:
        feature_fn, rfid_key = make_fid_feature_fn()
    real_feats: list = []
    fake_feats: list = []

    collected: dict[str, list] = {}
    grids_saved = 0
    n_images = 0
    for i, batch in enumerate(batches):
        if max_batches is not None and i >= max_batches:
            break
        recon, metrics = step(model_params, jnp.asarray(batch))
        for name, vals in metrics.items():
            collected.setdefault(name, []).append(np.asarray(vals))
        if feature_fn is not None:
            real_feats.append(np.asarray(feature_fn(batch)))
            fake_feats.append(np.asarray(feature_fn(recon)))
        n_images += batch.shape[0]
        if output_dir and grids_saved < save_grids:
            pair = np.concatenate([np.asarray(batch, np.float32),
                                   np.asarray(recon)], axis=0)
            os.makedirs(output_dir, exist_ok=True)
            save_image(make_grid(pair, nrow=batch.shape[0]),
                       os.path.join(output_dir, f"comparison_{i:03d}.png"))
            grids_saved += 1

    results = {name: summarize(np.concatenate(vals))
               for name, vals in collected.items()}
    results["num_images"] = n_images
    if feature_fn is not None and n_images > 1:
        from .utils.fid import fid_from_features

        results[rfid_key] = fid_from_features(
            np.concatenate(real_feats), np.concatenate(fake_feats))
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        with open(os.path.join(output_dir, "metrics.json"), "w") as f:
            json.dump(results, f, indent=2)
    return results


def extrapolation_sweep(model: TransVAE, params: Any, images: np.ndarray,
                        resolutions: tuple = (256, 512, 1024),
                        compute_rfid: bool = False,
                        chunk: int | None = None) -> dict:
    """PSNR (+ SSIM, + optional (vgg_)rfid) at multiple inference resolutions
    from one trained model — the RoPE extrapolation experiment (ref:
    test_rope_extrapolation.py:28-140; paper Table 1 reports rFID *and* PSNR
    per resolution, which compute_rfid mirrors).

    ``images`` must be at the largest resolution; smaller ones are produced by
    area-downsampling. ``chunk`` bounds the per-forward batch (1024px
    activations at stage 2 are N=65k tokens — a full 64-image batch does not
    fit); per-resolution results keep the PSNR summary at the top level for
    compatibility, with ``ssim`` / rfid nested.
    """
    from .utils.metrics import ssim as ssim_fn

    model_params = params["model"] if isinstance(params, dict) and "model" in params else params
    feature_fn = rfid_key = None
    if compute_rfid:
        feature_fn, rfid_key = make_fid_feature_fn()
    results = {}
    for res in resolutions:
        b, h, w, c = images.shape
        if h != res:
            batch = jax.image.resize(jnp.asarray(images), (b, res, res, c),
                                     method="linear")
        else:
            batch = jnp.asarray(images)

        @jax.jit
        def step(p, xb):
            recon_logits, *_ = model.apply({"params": p}, xb, sample=False)
            recon = jax.nn.sigmoid(recon_logits.astype(jnp.float32))
            xb32 = xb.astype(jnp.float32)
            return recon, psnr(recon, xb32), ssim_fn(recon, xb32)

        step_size = min(chunk or b, b)
        psnrs, ssims, real_f, fake_f = [], [], [], []
        for i in range(0, b, step_size):
            xb = batch[i:i + step_size]
            recon, p_vals, s_vals = step(model_params, xb)
            psnrs.append(np.asarray(p_vals))
            ssims.append(np.asarray(s_vals))
            if feature_fn is not None:
                real_f.append(np.asarray(feature_fn(xb)))
                fake_f.append(np.asarray(feature_fn(recon)))
        entry = summarize(np.concatenate(psnrs))
        entry["ssim"] = summarize(np.concatenate(ssims))
        if feature_fn is not None and b > 1:
            from .utils.fid import fid_from_features

            entry[rfid_key] = fid_from_features(
                np.concatenate(real_f), np.concatenate(fake_f))
        results[res] = entry
    return results


def generate_random(model: TransVAE, params: Any, rng: jax.Array,
                    num_samples: int = 16, latent_hw: int = 16) -> np.ndarray:
    """Decode z ~ N(0,1) samples (ref: generate_images.py:76-108; latent shape
    [N, h, w, d] fixing reference defect §2.9.5)."""
    model_params = params["model"] if isinstance(params, dict) and "model" in params else params
    z = jax.random.normal(
        rng, (num_samples, latent_hw, latent_hw, model.config.latent_dim))
    logits = model.apply({"params": model_params}, z, method="decode")
    return np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))


def generate_interpolation(model: TransVAE, params: Any, image_a: np.ndarray,
                           image_b: np.ndarray, steps: int = 8) -> np.ndarray:
    """Linear interpolation between two images' latents
    (ref: generate_images.py:112-143)."""
    model_params = params["model"] if isinstance(params, dict) and "model" in params else params
    batch = jnp.stack([jnp.asarray(image_a), jnp.asarray(image_b)])
    mu, _ = model.apply({"params": model_params}, batch, method="encode")
    alphas = jnp.linspace(0.0, 1.0, steps).reshape(steps, 1, 1, 1)
    z = (1 - alphas) * mu[0] + alphas * mu[1]
    logits = model.apply({"params": model_params}, z, method="decode")
    return np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))


def reconstruct(model: TransVAE, params: Any, images: np.ndarray) -> np.ndarray:
    """Deterministic encode→decode (ref: inference_example.py:34-80 uses mu)."""
    model_params = params["model"] if isinstance(params, dict) and "model" in params else params
    logits, *_ = model.apply({"params": model_params}, jnp.asarray(images),
                             sample=False)
    return np.asarray(jax.nn.sigmoid(logits.astype(jnp.float32)))
