"""Training CLI — flag parity with the reference's argparse front-end
(ref: train.py:27-75; YAML model-section precedence ref: train.py:96-124).

Usage:
  python -m deepl_project_tpu.cli.train --variant tiny --data synthetic \
      --batch_size 8 --num_epochs 1 --steps_per_epoch 20 --output_dir out/
"""

from __future__ import annotations

import argparse

from ..config import get_config
from ..data import make_dataset
from ..data.pipeline import input_pipeline
from ..losses import LossWeights
from ..training.trainer import Trainer, TrainerConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train TransVAE (TPU-native)")
    # Model
    p.add_argument("--variant", default="tiny",
                   choices=["tiny", "base", "large", "huge", "giant"])
    p.add_argument("--compression_ratio", type=int, default=16, choices=[8, 16])
    p.add_argument("--latent_dim", type=int, default=None)
    p.add_argument("--config", default=None, help="YAML config path")
    p.add_argument("--gradient_checkpointing", action="store_true")
    p.add_argument("--norm_latents", action="store_true", default=True,
                   help="GroupNorm before the latent heads (training "
                        "stability; disable only for reference-checkpoint "
                        "weight parity)")
    p.add_argument("--no_norm_latents", dest="norm_latents",
                   action="store_false")
    p.add_argument("--scan_blocks", action="store_true",
                   help="compile per-stage block loops as lax.scan "
                        "(large/huge/giant training)")
    p.add_argument("--attention_impl", default="auto_train",
                   choices=["auto", "auto_train", "xla", "xla_chunked",
                            "pallas"],
                   help="attention dispatch; 'auto_train' uses the Pallas "
                        "flash kernel from N=4096 so the backward saves O(N) "
                        "memory (required for large@256 on 16 GB HBM)")
    p.add_argument("--mu_dtype", default=None, choices=[None, "bfloat16"],
                   help="AdamW first-moment dtype (bfloat16 halves that "
                        "buffer for big-variant training)")
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adafactor"],
                   help="'adafactor' (factored 2nd moment) makes 1B-param "
                        "large-variant training fit one 16 GB chip")
    # Data
    p.add_argument("--data", default="synthetic",
                   help="'synthetic', 'hf:<dataset>', or a local path")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--num_workers", type=int, default=-1,
                   help="parallel decode threads for folder/COCO sources "
                        "(the reference's DataLoader workers, ref: "
                        "train.py:449-459); -1 = min(cpu_count, 16)")
    # Training
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--accum_steps", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--warmup_steps", type=int, default=10_000)
    p.add_argument("--lr_schedule", default="constant",
                   choices=["constant", "cosine"],
                   help="post-warmup LR: constant (reference recipe) or "
                        "cosine decay over the full run")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--skip_data_on_resume", action="store_true",
                   help="on resume, fast-forward the data stream by the "
                        "restored step count (exact data-position continuity; "
                        "costs one decode per skipped batch)")
    # Losses (reference defaults, patched vae_loss.py:31-38)
    p.add_argument("--l1_weight", type=float, default=1.0)
    p.add_argument("--lpips_weight", type=float, default=1.0)
    p.add_argument("--perceptual", default="vgg", choices=["vgg", "self"],
                   help="LPIPS-slot feature net: 'vgg' (reference parity; "
                        "needs converted weights, WEIGHTS.md) or 'self' "
                        "(frozen trained encoder from --perceptual_checkpoint "
                        "— the honest in-env substitute)")
    p.add_argument("--perceptual_checkpoint", default="",
                   help="trained checkpoint dir for --perceptual self")
    p.add_argument("--kl_weight", type=float, default=1e-8)
    p.add_argument("--vf_weight", type=float, default=0.0)
    p.add_argument("--gan_weight", type=float, default=0.0)
    # Stage 2
    p.add_argument("--use_gan", action="store_true")
    p.add_argument("--freeze_encoder", action="store_true")
    p.add_argument("--gan_adaptive_weight", action="store_true",
                   help="VQGAN adaptive GAN weight ||g_rec||/||g_gan|| on the "
                        "decoder's last layer (logged as "
                        "adaptive_gan_weight)")
    p.add_argument("--gan_warmup_steps", type=int, default=0,
                   help="VQGAN disc_start analogue: generator GAN term "
                        "zeroed for the discriminator's first N steps. "
                        "Default 0: measured r4/r5 runs show ANY disc head "
                        "start destabilizes the generator; co-evolution "
                        "from scratch is the stable regime")
    p.add_argument("--gan_ramp_steps", type=int, default=1,
                   help="linear 0->1 ramp of the GAN term after the warmup "
                        "gate opens (1 = step function; only meaningful "
                        "with --gan_warmup_steps > 0)")
    p.add_argument("--gan_adaptive_max", type=float, default=1.0,
                   help="clamp on the VQGAN adaptive ratio (1.0 = down-only; "
                        "VQGAN's 1e4 permits the measured 41.9x explosion)")
    p.add_argument("--gan_disc_loss_floor", type=float, default=0.6,
                   help="freeze discriminator updates while its loss is "
                        "below this floor — the 'don't let D win' control "
                        "(hinge: ~2.0 untrained, 0.0 = perfect separation; "
                        "0 disables)")
    p.add_argument("--gan_r1_gamma", type=float, default=10.0,
                   help="R1 gradient penalty on the discriminator "
                        "(StyleGAN slope control; bounds dD/dx, which the "
                        "hinge loss does not — every measured un-penalized "
                        "stage-2 run collapsed via a D-slope arms race; "
                        "0 disables)")
    p.add_argument("--divergence_halt_db", type=float, default=5.0,
                   help="halt when selection PSNR sits this many dB below "
                        "the run's best for --divergence_patience consecutive "
                        "evals (finite-collapse circuit breaker; 0 disables)")
    p.add_argument("--divergence_patience", type=int, default=3)
    # Infra
    p.add_argument("--output_dir", default="outputs")
    p.add_argument("--save_every_epochs", type=int, default=5)
    p.add_argument("--save_every_steps", type=int, default=0,
                   help="also checkpoint every N steps (0 = epochs only)")
    p.add_argument("--eval_every_steps", type=int, default=0,
                   help="compute validation PSNR/SSIM every N steps (the "
                        "reference acceptance ladder is val-PSNR based)")
    p.add_argument("--val_batches", type=int, default=4,
                   help="number of fixed validation batches for "
                        "--eval_every_steps")
    p.add_argument("--ema_decay", type=float, default=0.0,
                   help="EMA decay for a shadow copy of the params (0 = off; "
                        "0.999 typical); eval logs val_psnr_ema and the best "
                        "checkpoint tracks the EMA model")
    p.add_argument("--no_keep_best", action="store_true",
                   help="disable the separate best-val-PSNR checkpoint "
                        "(checkpoints_best/)")
    p.add_argument("--dino_model", default="facebook/dinov2-base",
                   help="VF teacher model name (used when --vf_weight > 0; "
                        "falls back to a deterministic stub teacher when "
                        "DINOv2 weights are not locally available)")
    p.add_argument("--log_every", type=int, default=100)
    p.add_argument("--mesh_model", type=int, default=1,
                   help="model-parallel axis size (tensor sharding for huge/giant)")
    p.add_argument("--param_sharding", default="replicate",
                   choices=["replicate", "fsdp", "tensor"])
    return p


def load_yaml_config(path: str, args: argparse.Namespace) -> dict:
    """YAML schema parity: model/training/losses sections; the model section
    takes precedence over CLI flags (ref: train.py:116-124)."""
    import yaml

    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    model = raw.get("model", {})
    for key in ("variant", "compression_ratio", "latent_dim", "norm_latents",
                "scan_blocks"):
        if key in model:
            setattr(args, key, model[key])
    training = raw.get("training", {})
    for src, dst in [("batch_size", "batch_size"), ("learning_rate", "lr"),
                     ("warmup_steps", "warmup_steps"),
                     ("num_epochs", "num_epochs"),
                     ("gradient_accumulation", "accum_steps")]:
        if src in training:
            setattr(args, dst, training[src])
    losses = raw.get("losses", {})
    for src, dst in [("l1", "l1_weight"), ("lpips", "lpips_weight"),
                     ("kl", "kl_weight"), ("vf", "vf_weight"),
                     ("gan", "gan_weight")]:
        if src in losses:
            setattr(args, dst, losses[src])
    return raw


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.config:
        load_yaml_config(args.config, args)

    # Provenance: record the resolved flag set so every run directory is
    # auditable (scripts/record_run.py collects this + history.jsonl into
    # the tracked RESULTS/ dir). Process-0 only, and never clobber an earlier
    # invocation's record — a resume appends a numbered run_args.N.json
    # instead (ADVICE r3: keep the original run's provenance).
    import json as _json
    import os as _os_prov
    import sys as _sys

    import jax as _jax

    if _jax.process_index() == 0:
        _os_prov.makedirs(args.output_dir, exist_ok=True)
        prov = _os_prov.path.join(args.output_dir, "run_args.json")
        n = 1
        while _os_prov.path.exists(prov):
            prov = _os_prov.path.join(args.output_dir, f"run_args.{n}.json")
            n += 1
        with open(prov, "w") as f:
            _json.dump({"argv": _sys.argv[1:], "args": vars(args)}, f, indent=1)

    model_cfg = get_config(args.variant, args.compression_ratio,
                           args.latent_dim, remat=args.gradient_checkpointing,
                           norm_latents=args.norm_latents,
                           scan_blocks=args.scan_blocks,
                           attention_impl=args.attention_impl)
    weights = LossWeights(l1=args.l1_weight, lpips=args.lpips_weight,
                          kl=args.kl_weight, vf=args.vf_weight,
                          gan=args.gan_weight if args.use_gan else 0.0)
    train_cfg = TrainerConfig(
        batch_size=args.batch_size, accum_steps=args.accum_steps,
        learning_rate=args.lr, warmup_steps=args.warmup_steps,
        num_epochs=args.num_epochs, steps_per_epoch=args.steps_per_epoch,
        freeze_encoder=args.freeze_encoder, weights=weights,
        use_lpips=args.lpips_weight > 0, resolution=args.resolution,
        seed=args.seed, log_every=args.log_every,
        save_every_epochs=args.save_every_epochs,
        save_every_steps=args.save_every_steps,
        eval_every_steps=args.eval_every_steps, output_dir=args.output_dir,
        mesh_model=args.mesh_model, param_sharding=args.param_sharding,
        mu_dtype=args.mu_dtype, optimizer=args.optimizer,
        ema_decay=args.ema_decay, keep_best=not args.no_keep_best,
        gan_adaptive_weight=args.gan_adaptive_weight,
        perceptual=args.perceptual,
        perceptual_checkpoint=args.perceptual_checkpoint,
        gan_warmup_steps=args.gan_warmup_steps,
        gan_ramp_steps=args.gan_ramp_steps,
        gan_adaptive_max=args.gan_adaptive_max,
        gan_disc_loss_floor=args.gan_disc_loss_floor,
        gan_r1_gamma=args.gan_r1_gamma,
        lr_schedule=args.lr_schedule,
        skip_data_on_resume=args.skip_data_on_resume,
        divergence_halt_db=args.divergence_halt_db,
        divergence_patience=args.divergence_patience)

    import os as _os

    workers = (min(_os.cpu_count() or 1, 16) if args.num_workers < 0
               else args.num_workers)
    synthetic_sources = ("synthetic", "shapes")
    if args.data in synthetic_sources:
        extra = {"num_samples": 10 ** 9}
    elif args.data.startswith("hf:"):
        extra = {"num_workers": workers}  # streaming: pipelined decode
    else:
        extra = {"repeat": True, "num_workers": workers}
    source = make_dataset(args.data, resolution=args.resolution, **extra)

    # VF teacher (reference stage-1 default is vf=0.1, patched
    # vae_loss.py:31-38): DINOv2 when its weights are locally available,
    # else a deterministic stub — either way the eager vf_proj is created in
    # create_state and updated by the optimizer.
    teacher_fn = None
    if args.vf_weight > 0:
        from ..losses.teachers import make_vf_teacher

        teacher_fn = make_vf_teacher(args.dino_model)

    trainer = Trainer(model_cfg, train_cfg, teacher_fn=teacher_fn)

    # Fixed validation batches for the periodic val-PSNR hook: a held-out
    # slice of the same source (distinct seed for synthetic sources).
    val_batches = None
    if args.eval_every_steps > 0:
        from ..data import batch_iterator

        val_kw = {"resolution": args.resolution}
        if args.data in synthetic_sources:
            val_kw["seed"] = 1234
            val_kw["num_samples"] = args.val_batches * args.batch_size
        val_src = make_dataset(args.data, **val_kw)
        val_batches = [b for _, b in zip(
            range(args.val_batches), batch_iterator(val_src, args.batch_size))]

    # Prefetch + stage batches on device in the trainer's (data, model)
    # sharding: host-side generation/decode and the H2D copy overlap the
    # previous step instead of serializing with it.
    from ..parallel import batch_sharding
    data = input_pipeline(source, args.batch_size,
                          sharding=batch_sharding(trainer.mesh))
    trainer.fit(data, val_batches=val_batches)


if __name__ == "__main__":
    main()
