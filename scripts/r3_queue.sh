#!/bin/bash
# Round-3 measured-run queue: every TPU job strictly serial (the axon tunnel
# supports exactly ONE jax client at a time; a second wedges both), each step
# bounded by `timeout` so a wedge can't eat the session, with a tiny-matmul
# chip probe between steps. Results land in runs/<name>/history.jsonl and are
# snapshotted to RESULTS/ via scripts/record_run.py.
#
# Usage: nohup bash scripts/r3_queue.sh > runs/r3_queue.log 2>&1 &
set -u
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
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

# ---- 1. Finish the tiny@256 vf=0.1-stub ladder run (resumes at step 5000) --
run 7200 tiny256_vf01 python -m deepl_project_tpu.cli.train \
    --variant tiny --data shapes --resolution 256 --batch_size 16 \
    --lr 2e-4 --warmup_steps 500 --lpips_weight 0 --vf_weight 0.1 \
    --num_epochs 10 --steps_per_epoch 1000 --eval_every_steps 1000 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/tiny256_vf01
python scripts/record_run.py --run_dir runs/tiny256_vf01 --name tiny256_vf01 || true

# ---- 2. Final eval @256 (metrics.json + grids) ----------------------------
run 1800 eval_tiny256 python -m deepl_project_tpu.cli.evaluate \
    --checkpoint runs/tiny256_vf01/checkpoints --data shapes \
    --resolution 256 --no_lpips --num_batches 8 --rfid \
    --output_dir runs/tiny256_vf01/eval256

# ---- 3. RoPE extrapolation PSNR 256/512/1024 from the 256-trained ckpt ----
run 2400 extrapolation python scripts/reproduce/test_rope_extrapolation.py \
    --checkpoint runs/tiny256_vf01/checkpoints --data shapes \
    --resolutions 256 512 1024 --num_images 16 \
    | tee runs/extrapolation_tiny256.json

# ---- 4. Latent diagnostics + linear probe (paper Table 2a analogue) -------
run 1800 probe_latents python scripts/probe_latents.py \
    --checkpoint runs/tiny256_vf01/checkpoints \
    --name latent_probe_tiny256

# ---- 5. GAN stage-2 tail (copy the stage-1 run; resumes in-place) ---------
if [ ! -d runs/tiny256_gan ]; then cp -r runs/tiny256_vf01 runs/tiny256_gan; fi
run 5400 tiny256_gan python -m deepl_project_tpu.cli.train \
    --variant tiny --data shapes --resolution 256 --batch_size 16 \
    --lr 2e-4 --warmup_steps 500 --lpips_weight 0 --vf_weight 0.1 \
    --use_gan --freeze_encoder --gan_weight 0.05 \
    --num_epochs 11 --steps_per_epoch 1000 --eval_every_steps 500 \
    --val_batches 8 --seed 42 --output_dir runs/tiny256_gan
python scripts/record_run.py --run_dir runs/tiny256_gan --name tiny256_gan_stage2 || true

# ---- 6. A/B: same recipe with vf=0 (5k steps; compare val curves 1k..5k) ---
run 7200 tiny256_vf0 python -m deepl_project_tpu.cli.train \
    --variant tiny --data shapes --resolution 256 --batch_size 16 \
    --lr 2e-4 --warmup_steps 500 --lpips_weight 0 --vf_weight 0 \
    --num_epochs 5 --steps_per_epoch 1000 --eval_every_steps 1000 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/tiny256_vf0
python scripts/record_run.py --run_dir runs/tiny256_vf0 --name tiny256_vf0 || true

# ---- 7. base@256 (the reference's default variant at its operating point) --
run 9000 base256 python -m deepl_project_tpu.cli.train \
    --variant base --data shapes --resolution 256 --batch_size 8 \
    --lr 2e-4 --warmup_steps 500 --lpips_weight 0 --vf_weight 0.1 \
    --gradient_checkpointing --num_epochs 5 --steps_per_epoch 1000 \
    --eval_every_steps 1000 --val_batches 8 --save_every_steps 2000 \
    --seed 42 --output_dir runs/base256_vf01
python scripts/record_run.py --run_dir runs/base256_vf01 --name base256_vf01 || true

echo "[$(stamp)] QUEUE DONE"
