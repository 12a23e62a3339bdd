#!/usr/bin/env python
"""Latent-space diagnostics + linear probe on a trained tokenizer.

The shapes-scale analogue of the paper's Table 2(a) (linear-probe accuracy
on tokenizer latents) and Table 2 latent-distribution diagnostics
(ref: transvae paper §4.2; EXPERIMENTS.md latent-analysis protocol).
ImageNet labels are unavailable offline, so the probe task is a synthetic
4-class shape-type classification at the training resolution: each image is
one shape (rectangle / ellipse / triangle / cross) on a gradient background,
matching the training distribution's rendering. A tokenizer whose latents
carry semantics separates the classes from mean-pooled mu alone.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_latents.py \
      --checkpoint runs/tiny256_vf01/checkpoints [--num_images 512] \
      [--name latent_probe_tiny256]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLASSES = ("rectangle", "ellipse", "triangle", "cross")


def labeled_shapes(resolution: int, num_samples: int, seed: int = 0):
    """One dominant shape per image, label = shape type (4 classes)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, resolution),
                         np.linspace(0, 1, resolution), indexing="ij")
    images, labels = [], []
    for _ in range(num_samples):
        c0, c1 = rng.random(3), rng.random(3)
        angle = rng.random() * 2 * np.pi
        t = np.cos(angle) * xx + np.sin(angle) * yy
        t = (t - t.min()) / (np.ptp(t) + 1e-9)
        img = c0 + t[..., None] * (c1 - c0)
        label = int(rng.integers(0, len(CLASSES)))
        color = rng.random(3)
        cy, cx = 0.3 + 0.4 * rng.random(2)
        h, w = 0.12 + 0.18 * rng.random(2)
        if label == 0:  # rectangle
            mask = (np.abs(yy - cy) < h) & (np.abs(xx - cx) < w)
        elif label == 1:  # ellipse
            mask = ((yy - cy) / h) ** 2 + ((xx - cx) / w) ** 2 < 1.0
        elif label == 2:  # triangle (upward, half-plane intersection)
            mask = ((yy - cy < h) & (yy - cy > -h)
                    & (np.abs(xx - cx) < (yy - cy + h) * w / (2 * h)))
        else:  # cross (union of two thin bars)
            mask = (((np.abs(yy - cy) < h / 3) & (np.abs(xx - cx) < w))
                    | ((np.abs(yy - cy) < h) & (np.abs(xx - cx) < w / 3)))
        img = np.where(mask[..., None], color, img)
        images.append(img.astype(np.float32))
        labels.append(label)
    return np.stack(images), np.asarray(labels, np.int32)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--num_images", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--probe_steps", type=int, default=500)
    p.add_argument("--name", default=None,
                   help="RESULTS/<name>.json via record_run.py")
    args = p.parse_args()

    from deepl_project_tpu.data import batch_iterator, make_dataset
    from deepl_project_tpu.models.transvae import TransVAE
    from deepl_project_tpu.training.checkpoint import (load_config,
                                                       restore_params)
    from deepl_project_tpu.utils.latent_metrics import (latent_diagnostics,
                                                        linear_probe,
                                                        pool_latents)

    cfg = load_config(args.checkpoint)
    model = TransVAE(cfg)
    params = restore_params(args.checkpoint)

    # -- linear probe on mean-pooled mu --------------------------------
    images, labels = labeled_shapes(args.resolution, args.num_images)
    batches = (images[i:i + args.batch_size]
               for i in range(0, len(images), args.batch_size))
    feats = pool_latents(model, params, batches)
    probe = linear_probe(feats, labels, num_classes=len(CLASSES),
                         steps=args.probe_steps)
    # Pixel-space control: the same probe on mean-pooled raw pixels. The
    # latent probe is only evidence of semantics if it beats this.
    pixel_feats = images.reshape(len(images), -1, 3).mean(axis=1)
    pixel_probe = linear_probe(pixel_feats, labels,
                               num_classes=len(CLASSES),
                               steps=args.probe_steps)

    # -- distribution diagnostics on the training distribution ----------
    model_params = (params["model"]
                    if isinstance(params, dict) and "model" in params
                    else params)
    import jax.numpy as jnp

    @jax.jit
    def encode(p, x):
        mu, _ = model.apply({"params": p}, x, method="encode")
        return mu.astype(jnp.float32)

    train_batches = batch_iterator(
        make_dataset("shapes", resolution=args.resolution,
                     num_samples=args.num_images, seed=7),
        args.batch_size)
    lat = np.concatenate([np.asarray(encode(model_params, jnp.asarray(b)))
                          for b in train_batches])
    diag = latent_diagnostics(lat.reshape(-1))

    out = {"checkpoint": args.checkpoint,
           "resolution": args.resolution,
           "num_images": args.num_images,
           "classes": list(CLASSES),
           "probe": probe,
           "pixel_control_probe": pixel_probe,
           "latent_diagnostics": diag,
           "latent_shape": list(lat.shape)}
    print(json.dumps(out, indent=1))
    if args.name:
        subprocess.run([sys.executable,
                        os.path.join(REPO, "scripts", "record_run.py"),
                        "--name", args.name, "--json", json.dumps(out)],
                       check=True)


if __name__ == "__main__":
    main()
