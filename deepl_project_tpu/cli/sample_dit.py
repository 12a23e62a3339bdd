"""Standalone DiT sampling CLI: checkpoint → class-conditional images.

Completes the Table-2(b) latent-diffusion pipeline as a user-facing tool
(training-side sampling lives in cli/train_dit.py): restores the DiT from its
checkpoint + dit_config.json sidecar (EMA params when present), the TransVAE
tokenizer, runs the CFG Euler rectified-flow sampler, and writes a grid PNG
plus individual images.

Usage:
  python -m deepl_project_tpu.cli.sample_dit --checkpoint runs/dit \
      --num_samples 16 --cfg_scale 4.0 --classes 207,250,387
"""

from __future__ import annotations

import argparse
import json
import os


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Sample images from a trained DiT")
    p.add_argument("--checkpoint", required=True,
                   help="train_dit output dir (checkpoint + dit_config.json)")
    p.add_argument("--vae_checkpoint", default=None,
                   help="override the tokenizer checkpoint recorded at "
                        "training time")
    p.add_argument("--num_samples", type=int, default=16)
    p.add_argument("--classes", default=None,
                   help="comma-separated class ids; default cycles 0..N")
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--use_ema", action=argparse.BooleanOptionalAction,
                   default=True, help="sample from EMA params when present")
    p.add_argument("--output_dir", default="samples")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np

    from ..config import get_config
    from ..models import DiT, DiTConfig, TransVAE, init_params
    from ..training import LatentStats, generate_images
    from ..training.checkpoint import (restore_checkpoint,
                                       restore_model_params)
    from ..utils.image import save_grid, save_image

    with open(os.path.join(args.checkpoint, "dit_config.json")) as f:
        side = json.load(f)
    dcfg = DiTConfig(**side["dit"])
    dit = DiT(dcfg)

    raw, meta = restore_checkpoint(args.checkpoint)
    inner = raw["state"]
    if args.use_ema and isinstance(inner, dict) and inner.get("ema_params"):
        dit_params = inner["ema_params"]
        src = "ema"
    else:
        dit_params = inner["params"]
        src = "live"
    stats = LatentStats(mean=jnp.asarray(raw["latent_mean"]),
                        std=jnp.asarray(raw["latent_std"]))

    vae_ckpt = args.vae_checkpoint or side.get("vae_checkpoint")
    # Architecture from the tokenizer checkpoint's own config sidecar when
    # present (same reasoning as cli/train_dit.py — variant flags alone drop
    # training-time structure like norm_latents).
    vcfg = None
    if vae_ckpt:
        from ..training.checkpoint import load_config

        try:
            vcfg = load_config(vae_ckpt)
        except (FileNotFoundError, OSError):
            vcfg = None
    if vcfg is None:
        vcfg = get_config(side["vae_variant"], side["vae_compression"])
    vae = TransVAE(vcfg)
    if vae_ckpt:
        vae_params = restore_model_params(vae_ckpt)
    else:
        print("WARNING: no tokenizer checkpoint recorded; random decoder")
        vae_params = init_params(vae, jax.random.PRNGKey(0),
                                 image_size=side["resolution"], batch=1)

    cfg_scale = args.cfg_scale
    if side.get("unconditional"):
        # The model was trained with class_dropout=1.0 (no real labels): the
        # only trained embedding is the null token, and CFG>1 would
        # extrapolate between two unconditional branches.
        print("NOTE: unconditional checkpoint — ignoring --classes, "
              "forcing cfg_scale=1.0")
        labels = jnp.full((args.num_samples,), dcfg.num_classes, jnp.int32)
        cfg_scale = 1.0
    elif args.classes:
        ids = [int(c) for c in args.classes.split(",")]
        labels = jnp.asarray([ids[i % len(ids)]
                              for i in range(args.num_samples)])
    else:
        labels = jnp.arange(args.num_samples) % dcfg.num_classes

    print(f"sampling {args.num_samples} images (step {meta['step']}, {src} "
          f"params, cfg {cfg_scale}, {args.sample_steps} steps)")
    imgs = generate_images(vae, vae_params, dit, dit_params, stats,
                           jax.random.PRNGKey(args.seed), labels,
                           grid=side["grid"], num_steps=args.sample_steps,
                           cfg_scale=cfg_scale)
    imgs = np.asarray(imgs)
    os.makedirs(args.output_dir, exist_ok=True)
    save_grid(imgs, os.path.join(args.output_dir, "grid.png"))
    for i, img in enumerate(imgs):
        save_image(img, os.path.join(args.output_dir,
                                     f"sample_{i:03d}_c{int(labels[i])}.png"))
    print(f"wrote {len(imgs)} images to {args.output_dir}")


if __name__ == "__main__":
    main()
