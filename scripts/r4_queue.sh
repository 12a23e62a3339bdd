#!/bin/bash
# Round-4 measured-run queue (sitting-2 revision). The axon tunnel supports
# exactly ONE jax client at a time (a second wedges both), so every TPU job is
# strictly serial, bounded by `timeout`, with a tiny-matmul chip probe between
# steps. The VM was reset between sittings: runs/ (all r3 checkpoints) is gone
# and /tmp/jax_cache is cold — every job here is self-contained on a fresh
# machine, and the DiT job consumes the stage-1 best checkpoint produced by
# THIS queue instead of the deleted runs/tiny256_vf01.
#
# Jobs (r3 VERDICT items 3, 4, 5, 6):
#   1. Headline-bench A/B: fp32 params (+ int8 scope=resblock lever) vs bf16
#      params (VERDICT weak #2 / next-5).
#   2. Two-stage lineage with the COMPLETE loss (l1=1 lpips=1[random-head]
#      kl=1e-8 vf=0.1[stub]) + EMA 0.999 + best-ckpt + cosine LR (the
#      val-PSNR-dip lever, VERDICT weak #4): stage-1 6k steps, stage-2
#      (+gan 0.05, frozen encoder, adaptive weight ON) +2k steps from the
#      stage-1 checkpoint; before/after best-ckpt evals ->
#      RESULTS/two_stage_tiny256.json (VERDICT missing #3, weak #3/#5).
#   3. DiT-S/2 generation-FID trajectory on the stage-1 VAE's latents ->
#      RESULTS/dit_s_tiny256_fid.json (VERDICT next-6).
#
# Usage: nohup bash scripts/r4_queue.sh > runs/r4_queue.log 2>&1 &
#        echo $! > /tmp/r4_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p runs RESULTS /tmp/jax_cache

stamp() { date -u "+%Y-%m-%dT%H:%M:%S"; }

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print('probe ok', float((x @ x).astype(jnp.float32).sum()))" \
    || { echo "[$(stamp)] PROBE FAILED rc=$? — chip wedged, waiting 120s"; sleep 120; }
}

run() { # run <bound_s> <tag> <cmd...>
  local bound=$1 tag=$2; shift 2
  echo "[$(stamp)] START $tag"
  timeout "$bound" "$@"
  local rc=$?
  echo "[$(stamp)] END $tag rc=$rc"
  probe
}

# ---- 1. Bench A/B: param dtype + int8 lever --------------------------------
run 2400 bench_full python bench.py
run 1500 bench_bf16p env BENCH_QUANT=0 BENCH_PARAM_DTYPE=bfloat16 python bench.py
# (outputs captured in this log; the winning config is re-run warm at the end
#  so the driver's own bench.py hits a hot compile cache)

# ---- 2a. Stage 1: complete loss + EMA + best-ckpt + cosine LR --------------
run 9000 two_stage_s1 python -m deepl_project_tpu.cli.train \
    --variant tiny --data shapes --resolution 256 --batch_size 16 \
    --lr 2e-4 --warmup_steps 500 --lr_schedule cosine \
    --l1_weight 1.0 --lpips_weight 1.0 --kl_weight 1e-8 --vf_weight 0.1 \
    --ema_decay 0.999 \
    --num_epochs 6 --steps_per_epoch 1000 --eval_every_steps 500 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/two_stage_tiny256
python scripts/record_run.py --run_dir runs/two_stage_tiny256 \
    --name two_stage_tiny256_s1 \
    --note "stage-1, complete loss: l1=1 lpips=1 (RANDOM-HEAD VGG — no pretrained weights in env, see WEIGHTS.md) kl=1e-8 vf=0.1 (stub teacher); ema 0.999, best-ckpt on val_psnr_ema, cosine LR (val-PSNR-dip lever vs r3's constant-LR run)" || true

# ---- 2b. Stage 2: +GAN, frozen encoder, adaptive weight, same lineage ------
if [ -d runs/two_stage_tiny256/checkpoints ]; then
  rm -rf runs/two_stage_tiny256_s2
  mkdir -p runs/two_stage_tiny256_s2
  cp -r runs/two_stage_tiny256/checkpoints runs/two_stage_tiny256_s2/checkpoints
fi
run 6000 two_stage_s2 python -m deepl_project_tpu.cli.train \
    --variant tiny --data shapes --resolution 256 --batch_size 16 \
    --lr 1e-4 --warmup_steps 0 \
    --l1_weight 1.0 --lpips_weight 1.0 --kl_weight 1e-8 --vf_weight 0.1 \
    --use_gan --gan_weight 0.05 --freeze_encoder --gan_adaptive_weight \
    --ema_decay 0.999 \
    --num_epochs 8 --steps_per_epoch 1000 --eval_every_steps 500 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/two_stage_tiny256_s2
python scripts/record_run.py --run_dir runs/two_stage_tiny256_s2 \
    --name two_stage_tiny256_s2 \
    --note "stage-2 from the stage-1 checkpoint: +gan 0.05 (PatchGAN, hinge), frozen encoder, VQGAN adaptive weight ON (adaptive_gan_weight traced in history), ema 0.999, constant LR 1e-4" || true

# ---- 2c. Before/after evals on the two best checkpoints --------------------
run 1800 eval_s1 python -m deepl_project_tpu.cli.evaluate \
    --checkpoint runs/two_stage_tiny256/checkpoints_best --data shapes \
    --resolution 256 --no_lpips --num_batches 8 --rfid \
    --output_dir runs/two_stage_tiny256/eval_best
run 1800 eval_s2 python -m deepl_project_tpu.cli.evaluate \
    --checkpoint runs/two_stage_tiny256_s2/checkpoints_best --data shapes \
    --resolution 256 --no_lpips --num_batches 8 --rfid \
    --output_dir runs/two_stage_tiny256_s2/eval_best
python scripts/record_two_stage.py || true

# ---- 3. DiT-S/2 generation-FID trajectory ----------------------------------
run 6000 dit_fid python -m deepl_project_tpu.cli.train_dit \
    --dit_variant S --vae_variant tiny --vae_compression 16 \
    --vae_checkpoint runs/two_stage_tiny256/checkpoints_best \
    --data shapes --resolution 256 --batch_size 64 \
    --total_steps 3000 --warmup_steps 200 --lr 2e-4 \
    --fid_every 500 --fid_samples 128 --save_every 3000 \
    --output_dir runs/dit_s_tiny256
python scripts/record_run.py --run_dir runs/dit_s_tiny256 \
    --name dit_s_tiny256_fid \
    --note "DiT-S/2 rectified flow on two_stage_tiny256 stage-1 latents (shapes, unconditional); gen_fid = vgg-feature FID every 500 steps, 128 samples, 50 Euler steps" || true

# ---- 4. Final headline bench (warm cache for the driver) -------------------
run 1500 bench_final python bench.py

echo "[$(stamp)] R4 QUEUE DONE"
