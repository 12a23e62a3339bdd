#!/bin/bash
# Round-4 queue, continuation. The first stage-1 attempt was wedged by a
# stray second jax client (the axon tunnel is single-client); benches already
# recorded in runs/r4_queue.log (bf16p: 50.4 img/s). This queue restarts from
# stage-1 and finishes the r3-VERDICT measured-run list: two-stage lineage ->
# evals -> two_stage record -> trained-checkpoint torch export -> DiT-S/2 FID
# -> final full bench (fp32 + int8 lever, also warms the driver's cache).
#
# Usage: nohup bash scripts/r4_queue2.sh > runs/r4_queue2.log 2>&1 &
#        echo $! > /tmp/r4_queue.pid
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
mkdir -p runs RESULTS /tmp/jax_cache

stamp() { date -u "+%Y-%m-%dT%H:%M:%S"; }

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
  local rc=$?
  echo "[$(stamp)] END $tag rc=$rc"
}

commit_results() { # commit_results <msg>
  git add RESULTS/ && git commit -m "$1" || true
}

# Prove the chip answers before the first job.
sleep 5
probe

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
commit_results "RESULTS: two-stage stage-1 run record (complete loss + EMA + cosine LR)"
probe

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
commit_results "RESULTS: two-stage stage-2 run record (+GAN, frozen encoder, adaptive weight)"
probe

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
commit_results "RESULTS: two-stage before/after eval record (VERDICT r3 item 3)"
probe

# ---- 2d. Interop proof on a REAL trained checkpoint (CPU-pinned, no TPU) ---
run 900 export_torch python scripts/export_to_torch.py \
    --checkpoint runs/two_stage_tiny256/checkpoints_best \
    --out runs/two_stage_tiny256/transvae_tiny_ref.pt

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
commit_results "RESULTS: DiT-S/2 generation-FID trajectory record (VERDICT r3 item 6)"
probe

# ---- 4. Final full bench: fp32 headline + int8 lever (driver cache warm) ---
run 2400 bench_final bash -c 'python bench.py | tee RESULTS/bench_r4_queue.json'
commit_results "RESULTS: r4 queue final bench line (warm driver cache)"

echo "[$(stamp)] R4 QUEUE2 DONE"
