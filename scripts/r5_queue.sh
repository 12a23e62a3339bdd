#!/bin/bash
# Round-5 measured-run queue: IDEMPOTENT continuation of the r4 list.
# Each job is gated on its RESULTS artifact, so this can be launched first
# thing in any sitting (fresh VM, wiped runs/) and it only redoes what is
# missing. The axon tunnel is single-client: never import jax in another
# process while this runs (see ROADMAP round-4 notes).
#
# Usage: nohup bash scripts/r5_queue.sh > runs/r5_queue.log 2>&1 &
#        echo $! > /tmp/r5_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p runs RESULTS /tmp/jax_cache

stamp() { date -u "+%Y-%m-%dT%H:%M:%S"; }
have() { [ -s "$1" ]; }

probe() {
  timeout 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print('probe ok', float((x @ x).astype(jnp.float32).sum()))" \
    || { echo "[$(stamp)] PROBE FAILED rc=$? — waiting 120s for the tunnel"; sleep 120; }
}

run() { # run <bound_s> <tag> <cmd...>
  local bound=$1 tag=$2; shift 2
  echo "[$(stamp)] START $tag"
  timeout "$bound" "$@"
  echo "[$(stamp)] END $tag rc=$?"
}

commit_results() { git add RESULTS/ && git commit -m "$1" || true; }

sleep 5
probe

# ---- Two-stage lineage (only if the r4 queue did not finish it) ------------
if ! have RESULTS/two_stage_tiny256.json; then
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
      --note "stage-1, complete loss: l1=1 lpips=1 (RANDOM-HEAD VGG, WEIGHTS.md) kl=1e-8 vf=0.1 (stub); ema 0.999, best-ckpt, cosine LR" || true
  commit_results "RESULTS: two-stage stage-1 run record (r5 retry)"
  probe
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
      --note "stage-2 from the stage-1 checkpoint: +gan 0.05, frozen encoder, adaptive weight, ema 0.999" || true
  commit_results "RESULTS: two-stage stage-2 run record (r5 retry)"
  probe
  run 1800 eval_s1 python -m deepl_project_tpu.cli.evaluate \
      --checkpoint runs/two_stage_tiny256/checkpoints_best --data shapes \
      --resolution 256 --no_lpips --num_batches 8 --rfid \
      --output_dir runs/two_stage_tiny256/eval_best
  run 1800 eval_s2 python -m deepl_project_tpu.cli.evaluate \
      --checkpoint runs/two_stage_tiny256_s2/checkpoints_best --data shapes \
      --resolution 256 --no_lpips --num_batches 8 --rfid \
      --output_dir runs/two_stage_tiny256_s2/eval_best
  python scripts/record_two_stage.py || true
  commit_results "RESULTS: two-stage before/after eval record (r5 retry)"
  probe
fi

# ---- Stage-2 retake with the discriminator-warmup fix ----------------------
# (Validates the r4 gan_warmup_steps fix; needs a stage-1 checkpoint — train
#  one if the r4/r5 two-stage stage-1 is not on this VM.)
if ! have RESULTS/two_stage_tiny256_s2_fixed.json; then
  if [ ! -d runs/two_stage_tiny256/checkpoints ]; then
    run 9000 s2fix_stage1 python -m deepl_project_tpu.cli.train \
        --variant tiny --data shapes --resolution 256 --batch_size 16 \
        --lr 2e-4 --warmup_steps 500 --lr_schedule cosine \
        --l1_weight 1.0 --lpips_weight 1.0 --kl_weight 1e-8 --vf_weight 0.1 \
        --ema_decay 0.999 --num_epochs 6 --steps_per_epoch 1000 \
        --eval_every_steps 500 --val_batches 8 --save_every_steps 2000 \
        --seed 42 --output_dir runs/two_stage_tiny256
    probe
  fi
  bash scripts/r4_retake.sh
  probe
fi

# ---- DiT-S/2 FID trajectory (needs a trained VAE checkpoint) ---------------
if ! have RESULTS/dit_s_tiny256_fid.json; then
  VAE_CKPT=""
  for c in runs/two_stage_tiny256/checkpoints_best runs/two_stage_tiny256/checkpoints; do
    [ -d "$c" ] && VAE_CKPT="$c" && break
  done
  if [ -z "$VAE_CKPT" ]; then
    echo "[$(stamp)] no trained VAE on disk: training a fresh 3k-step tiny tokenizer for the DiT job"
    run 5000 dit_vae python -m deepl_project_tpu.cli.train \
        --variant tiny --data shapes --resolution 256 --batch_size 16 \
        --lr 2e-4 --warmup_steps 500 --lpips_weight 0 --vf_weight 0.1 \
        --ema_decay 0.999 --num_epochs 3 --steps_per_epoch 1000 \
        --eval_every_steps 1000 --val_batches 8 --seed 42 \
        --output_dir runs/dit_vae_tiny256
    VAE_CKPT=runs/dit_vae_tiny256/checkpoints_best
    [ -d "$VAE_CKPT" ] || VAE_CKPT=runs/dit_vae_tiny256/checkpoints
    probe
  fi
  run 6000 dit_fid python -m deepl_project_tpu.cli.train_dit \
      --dit_variant S --vae_variant tiny --vae_compression 16 \
      --vae_checkpoint "$VAE_CKPT" \
      --data shapes --resolution 256 --batch_size 64 \
      --total_steps 3000 --warmup_steps 200 --lr 2e-4 \
      --fid_every 500 --fid_samples 128 --save_every 3000 \
      --output_dir runs/dit_s_tiny256
  python scripts/record_run.py --run_dir runs/dit_s_tiny256 \
      --name dit_s_tiny256_fid \
      --note "DiT-S/2 rectified flow on trained-VAE latents (shapes, unconditional); gen_fid every 500 steps, 128 samples, 50 Euler steps" || true
  commit_results "RESULTS: DiT-S/2 generation-FID trajectory record (r5 retry)"
  probe
fi

# ---- Final bench (always: warms the driver cache on this VM) ---------------
run 2400 bench_final bash -c 'python bench.py | tee RESULTS/bench_r5_queue.json'
commit_results "RESULTS: r5 queue final bench line (warm driver cache)"

echo "[$(stamp)] R5 QUEUE DONE"
