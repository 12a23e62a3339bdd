"""Generation CLI: random / interpolate / reconstruct modes
(ref: patched generate_images.py:171-236)."""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..config import get_config
from ..data import preprocess_file
from ..evaluation import (generate_interpolation, generate_random, reconstruct)
from ..models.transvae import TransVAE, init_params
from ..training.checkpoint import load_config, restore_params
from ..utils.image import make_grid, save_image


def main(argv=None):
    p = argparse.ArgumentParser(description="Generate images with TransVAE")
    p.add_argument("--mode", default="random",
                   choices=["random", "interpolate", "reconstruct"])
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--variant", default="tiny")
    p.add_argument("--compression_ratio", type=int, default=16)
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--latent_hw", type=int, default=16,
                   help="latent spatial size for random mode (16 → 256px @f16)")
    p.add_argument("--steps", type=int, default=8, help="interpolation steps")
    p.add_argument("--image", default=None, help="input image (reconstruct)")
    p.add_argument("--image_b", default=None, help="second image (interpolate)")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output_dir", default="generated")
    args = p.parse_args(argv)

    if args.checkpoint:
        cfg = load_config(args.checkpoint)
        model = TransVAE(cfg)
        params = restore_params(args.checkpoint)
    else:
        cfg = get_config(args.variant, args.compression_ratio)
        model = TransVAE(cfg)
        params = init_params(model, jax.random.PRNGKey(0),
                             image_size=args.resolution)
        print("[generate] WARNING: no checkpoint given — random weights")

    os.makedirs(args.output_dir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)

    if args.mode == "random":
        imgs = generate_random(model, params, rng, args.num_samples,
                               args.latent_hw)
        save_image(make_grid(imgs), os.path.join(args.output_dir, "random.png"))
        for i, img in enumerate(imgs):
            save_image(img, os.path.join(args.output_dir, f"sample_{i:03d}.png"))
    elif args.mode == "interpolate":
        assert args.image and args.image_b, "--image and --image_b required"
        a = preprocess_file(args.image, args.resolution)
        b = preprocess_file(args.image_b, args.resolution)
        imgs = generate_interpolation(model, params, a, b, args.steps)
        save_image(make_grid(imgs, nrow=args.steps),
                   os.path.join(args.output_dir, "interpolation.png"))
    else:  # reconstruct
        assert args.image, "--image required"
        x = preprocess_file(args.image, args.resolution)[None]
        recon = reconstruct(model, params, x)
        pair = np.concatenate([x, recon], axis=0)
        save_image(make_grid(pair, nrow=2),
                   os.path.join(args.output_dir, "reconstruction.png"))
    print(f"[generate] wrote outputs to {args.output_dir}")


if __name__ == "__main__":
    main()
