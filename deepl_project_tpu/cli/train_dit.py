"""Latent-DiT training CLI — the paper's Table 2(b) downstream pipeline
(LightningDiT on TransVAE latents; not shipped in the reference repo).

Usage (smoke):
  python -m deepl_project_tpu.cli.train_dit --dit_variant B --vae_variant tiny \
      --data synthetic --resolution 64 --batch_size 8 --total_steps 20 \
      --output_dir out/dit

With a trained tokenizer:
  python -m deepl_project_tpu.cli.train_dit --vae_checkpoint out/vae/ckpt \
      --data /data/imagenet --resolution 256 --total_steps 400000
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train a latent DiT on TransVAE "
                                            "latents (rectified flow)")
    # DiT
    p.add_argument("--dit_variant", default="B", choices=["S", "B", "L", "XL"])
    p.add_argument("--patch_size", type=int, default=2)
    p.add_argument("--num_classes", type=int, default=1000)
    p.add_argument("--class_dropout", type=float, default=0.1)
    p.add_argument("--plain_dit", action="store_true",
                   help="disable the LightningDiT modernizations "
                        "(RMSNorm/SwiGLU/RoPE)")
    # Tokenizer
    p.add_argument("--vae_variant", default="tiny",
                   choices=["tiny", "base", "large", "huge", "giant"])
    p.add_argument("--vae_compression", type=int, default=16, choices=[8, 16])
    p.add_argument("--vae_checkpoint", default=None,
                   help="orbax checkpoint dir of a trained TransVAE; random "
                        "init when omitted (smoke only)")
    # Data
    p.add_argument("--data", default="synthetic")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--stats_batches", type=int, default=8,
                   help="batches used to estimate latent channel stats")
    # Training
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--total_steps", type=int, default=400_000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--warmup_steps", type=int, default=1000)
    p.add_argument("--time_sampling", default="logit_normal",
                   choices=["logit_normal", "uniform"])
    p.add_argument("--ema_decay", type=float, default=0.9999,
                   help="EMA of DiT params for eval/sampling; 0 disables")
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in --output_dir")
    p.add_argument("--seed", type=int, default=42)
    # Sampling / logging
    p.add_argument("--sample_every", type=int, default=0,
                   help="if > 0, write a sample grid every N steps")
    p.add_argument("--sample_steps", type=int, default=50)
    p.add_argument("--cfg_scale", type=float, default=4.0)
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--save_every", type=int, default=10_000)
    p.add_argument("--fid_every", type=int, default=0,
                   help="if > 0, compute generation FID every N steps "
                        "(InceptionV3 when converted weights exist, else "
                        "VGG features — relative-only) and append it to "
                        "<output_dir>/history.jsonl")
    p.add_argument("--fid_samples", type=int, default=256,
                   help="samples per FID evaluation (paper FID-10K uses "
                        "10000; shapes-scale trajectories use fewer)")
    p.add_argument("--output_dir", default="outputs/dit")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from ..config import get_config
    from ..data import batch_iterator, make_dataset
    from ..models import DiT, TransVAE, get_dit_config, init_dit_params
    from ..training import (LatentStats, init_ema_train_state,
                            init_train_state, make_dit_train_step,
                            make_optimizer, make_sampler, save_checkpoint)
    from ..training.checkpoint import (latest_step, restore_checkpoint,
                                       restore_model_params)

    rng = jax.random.PRNGKey(args.seed)

    # Tokenizer (frozen): encode images → latents. The architecture MUST
    # come from the checkpoint's config sidecar when one exists — rebuilding
    # from CLI flags silently drops training-time settings (e.g. a
    # norm_latents=True checkpoint applied to a norm_latents=False structure
    # runs without error but yields random-scale latents, since Flax ignores
    # the unused GroupNorm params).
    if args.vae_checkpoint:
        from ..training.checkpoint import load_config

        try:
            vcfg = load_config(args.vae_checkpoint)
        except (FileNotFoundError, OSError):
            vcfg = get_config(args.vae_variant, args.vae_compression)
    else:
        vcfg = get_config(args.vae_variant, args.vae_compression)
    vae = TransVAE(vcfg)
    if args.vae_checkpoint:
        vae_params = restore_model_params(args.vae_checkpoint)
    else:
        print("WARNING: no --vae_checkpoint; random tokenizer (smoke only)")
        from ..models import init_params
        vae_params = init_params(vae, rng, image_size=args.resolution, batch=1)

    @jax.jit
    def encode(images):
        mu, _ = vae.apply({"params": vae_params}, images, method="encode")
        return mu.astype(jnp.float32)

    # Labeled batches: (images [B,H,W,3], labels [B]); sources without class
    # structure yield label -1. When no real labels exist, conditioning on
    # random labels would train a sham class-conditional model (and CFG would
    # extrapolate between two unconditional branches) — train unconditional
    # instead: class_dropout=1.0 routes every sample to the null token, and
    # sampling forces cfg_scale=1.0.
    def epoch_batches():
        # Finite sources (folder/COCO/shapes) exhaust; diffusion training is
        # step-count-driven, so loop epochs forever.
        while True:
            yield from batch_iterator(
                make_dataset(args.data, args.resolution, with_labels=True),
                args.batch_size)

    raw_batches = epoch_batches()
    first_batch = next(raw_batches)
    has_labels = bool((first_batch[1] >= 0).any())
    class_dropout = args.class_dropout if has_labels else 1.0
    if not has_labels:
        print("NOTE: dataset provides no class labels — training "
              "unconditional (class_dropout=1.0, sampling cfg_scale=1.0)")

    def batches(first, rest):
        yield first
        yield from rest

    data = batches(first_batch, raw_batches)

    grid = args.resolution // vcfg.compression_ratio
    dcfg = get_dit_config(
        args.dit_variant, args.patch_size, in_channels=vcfg.latent_dim,
        num_classes=args.num_classes, class_dropout=class_dropout)
    if args.plain_dit:
        dcfg = dcfg.replace(use_rmsnorm=False, use_swiglu=False, use_rope=False)
    dit = DiT(dcfg)
    # Sidecar config so cli/sample_dit can rebuild the exact model later.
    # On --resume an existing sidecar is kept: rewriting it from the current
    # args would clobber recorded facts (e.g. vae_checkpoint) when the resume
    # invocation omits flags it doesn't need.
    import dataclasses as _dc
    import json as _json
    import os as _os
    _os.makedirs(args.output_dir, exist_ok=True)
    _sidecar = _os.path.join(args.output_dir, "dit_config.json")
    if not (args.resume and _os.path.exists(_sidecar)):
        with open(_sidecar, "w") as f:
            _json.dump({"dit": _dc.asdict(dcfg),
                        "vae_variant": args.vae_variant,
                        "vae_compression": args.vae_compression,
                        "vae_checkpoint": args.vae_checkpoint,
                        "resolution": args.resolution, "grid": grid,
                        "unconditional": not has_labels},
                       f, indent=2)
    dit_params = init_dit_params(dit, jax.random.fold_in(rng, 1), grid=grid)
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(dit_params))
    print(f"DiT-{args.dit_variant}/{args.patch_size}: {n_params/1e6:.1f}M "
          f"params on {grid}x{grid}x{vcfg.latent_dim} latents")

    # Latent channel statistics from the first few batches.
    lat0 = [np.asarray(encode(jnp.asarray(next(data)[0])))
            for _ in range(args.stats_batches)]
    stats = LatentStats.from_latents(jnp.asarray(np.concatenate(lat0)))
    print(f"latent stats: mean|max|={float(jnp.max(jnp.abs(stats.mean))):.3f} "
          f"std range [{float(jnp.min(stats.std)):.3f}, "
          f"{float(jnp.max(stats.std)):.3f}]")

    tx = make_optimizer(learning_rate=args.lr, warmup_steps=args.warmup_steps,
                        b2=0.95)
    use_ema = args.ema_decay > 0.0
    state = (init_ema_train_state(dit_params, tx) if use_ema
             else init_train_state(dit_params, tx))
    step_fn = make_dit_train_step(
        dit, tx, time_sampling=args.time_sampling,
        ema_decay=args.ema_decay if use_ema else None)

    start_step = 0
    if args.resume and latest_step(args.output_dir) is not None:
        payload = {"state": state, "latent_mean": stats.mean,
                   "latent_std": stats.std}
        restored, meta = restore_checkpoint(args.output_dir,
                                            abstract_state=payload)
        state = restored["state"]
        stats = LatentStats(mean=restored["latent_mean"],
                            std=restored["latent_std"])
        start_step = int(meta["step"])
        print(f"resumed from step {start_step} in {args.output_dir}")

    def ckpt_payload(state):
        return {"state": state, "latent_mean": stats.mean,
                "latent_std": stats.std}

    from ..utils.logging import RunHistory

    history = RunHistory(_os.path.join(args.output_dir, "history.jsonl"))

    fid_feature_fn, fid_key, fid_real = None, None, None
    if args.fid_every:
        from ..evaluation import make_fid_feature_fn

        fid_feature_fn, fid_key = make_fid_feature_fn()
        fid_key = fid_key.replace("rfid", "gen_fid")
        # Fixed real-image pool for every evaluation (same-protocol curve).
        # Drawn from a SEPARATE dataset iterator, not the shared training
        # stream: a resumed run must score against the same real pool as the
        # original (and must not skew which batches training sees next)
        # (ADVICE r3).
        fid_pool_iter = batch_iterator(
            make_dataset(args.data, args.resolution, with_labels=True),
            args.batch_size)
        fid_real, seen = [], 0
        while seen < args.fid_samples:
            b = next(fid_pool_iter)[0]
            fid_real.append(b)
            seen += b.shape[0]

    best_fid = [float("inf")]
    # Resumed runs must not overwrite a better earlier best checkpoint.
    _best_meta = _os.path.join(args.output_dir, "best", "metrics.json")
    if args.resume and _os.path.exists(_best_meta):
        with open(_best_meta) as f:
            best_fid[0] = _json.load(f).get(fid_key or "gen_fid", float("inf"))

    def run_fid(state, step):
        from ..training.diffusion import generation_fid

        fid = generation_fid(
            vae, vae_params, dit,
            state.ema_params if use_ema else state.params, stats,
            iter(fid_real), fid_feature_fn, jax.random.PRNGKey(step),
            num_samples=args.fid_samples, batch_size=args.batch_size,
            grid=grid, num_steps=args.sample_steps,
            cfg_scale=args.cfg_scale if has_labels else 1.0,
            unconditional=not has_labels)
        print(f"step {step}: {fid_key} {fid:.3f} "
              f"({args.fid_samples} samples)")
        history.append(step, {fid_key: fid}, kind="fid")
        # Best-FID retention (mirrors the VAE trainer's checkpoints_best):
        # max_to_keep retains the LATEST checkpoints, which loses the best
        # sampler when training ends off its FID minimum.
        if fid < best_fid[0]:
            best_fid[0] = fid
            best_dir = _os.path.join(args.output_dir, "best")
            save_checkpoint(best_dir, step, ckpt_payload(state),
                            max_to_keep=1, metrics={fid_key: fid})
            print(f"step {step}: new best {fid_key} {fid:.3f} -> {best_dir}")
        return fid

    t0, imgs_seen = time.time(), 0
    for i in range(start_step, args.total_steps):
        images_np, labels_np = next(data)
        images = jnp.asarray(images_np)
        # Unlabeled samples (-1) map to the trained null class at index
        # num_classes — the same token CFG dropout uses.
        labels = jnp.asarray(np.where(labels_np < 0, args.num_classes,
                                      labels_np))
        z0 = stats.normalize(encode(images))
        state, metrics = step_fn(state, z0, labels, rng)
        imgs_seen += images.shape[0]
        if (i + 1) % args.log_every == 0:
            dt = time.time() - t0
            host = {"loss": float(metrics["loss"]),
                    "grad_norm": float(metrics["grad_norm"]),
                    "images_per_sec": imgs_seen / dt}
            print(f"step {i+1}: loss {host['loss']:.4f} "
                  f"grad_norm {host['grad_norm']:.3f} "
                  f"{host['images_per_sec']:.1f} img/s")
            history.append(i + 1, host, kind="train")
            t0, imgs_seen = time.time(), 0
        if args.fid_every and (i + 1) % args.fid_every == 0:
            run_fid(state, i + 1)
        if args.save_every and (i + 1) % args.save_every == 0:
            save_checkpoint(args.output_dir, i + 1, ckpt_payload(state))
        if args.sample_every and (i + 1) % args.sample_every == 0:
            _write_samples(args, vae, vae_params, dit,
                           state.ema_params if use_ema else state.params,
                           stats, grid, i + 1, has_labels=has_labels)

    if start_step < args.total_steps:
        save_checkpoint(args.output_dir, args.total_steps,
                        ckpt_payload(state))
    print(f"done; checkpoint at {args.output_dir}")


def _write_samples(args, vae, vae_params, dit, dit_params, stats, grid, step,
                   has_labels: bool = True):
    import os

    from ..training import generate_images
    from ..utils.image import save_grid

    rng = jax.random.PRNGKey(step)
    if has_labels:
        labels = jnp.arange(8) % args.num_classes
        cfg_scale = args.cfg_scale
    else:  # unconditional model: null token, no guidance to extrapolate
        labels = jnp.full((8,), args.num_classes, jnp.int32)
        cfg_scale = 1.0
    imgs = generate_images(vae, vae_params, dit, dit_params, stats, rng,
                           labels, grid=grid, num_steps=args.sample_steps,
                           cfg_scale=cfg_scale)
    os.makedirs(args.output_dir, exist_ok=True)
    path = os.path.join(args.output_dir, f"samples_{step:07d}.png")
    save_grid(np.asarray(imgs), path, nrow=4)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
