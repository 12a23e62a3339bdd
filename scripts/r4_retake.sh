#!/bin/bash
# Stage-2 retake with the discriminator-warmup fix (gan_warmup_steps=500,
# the VQGAN disc_start analogue added after the r4 queue's stage-2 collapsed:
# adaptive weight 41.9x against the fresh random discriminator -> -22 dB in
# 100 steps, no recovery; see PERFORMANCE.md "GAN stage-2" r4 section).
# Consumes the intact stage-1 best checkpoint from THIS sitting's queue.
# Runs after r4_queue2.sh finishes (chained by the sitting driver loop).
set -u
cd /root/repo
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache

stamp() { date -u "+%Y-%m-%dT%H:%M:%S"; }
run() { local bound=$1 tag=$2; shift 2
  echo "[$(stamp)] START $tag"; timeout "$bound" "$@"
  echo "[$(stamp)] END $tag rc=$?"; }

[ -d runs/two_stage_tiny256/checkpoints ] || { echo "no stage-1 checkpoints"; exit 1; }
rm -rf runs/two_stage_tiny256_s2b
mkdir -p runs/two_stage_tiny256_s2b
cp -r runs/two_stage_tiny256/checkpoints runs/two_stage_tiny256_s2b/checkpoints

run 5400 two_stage_s2b python -m deepl_project_tpu.cli.train \
    --variant tiny --data shapes --resolution 256 --batch_size 16 \
    --lr 1e-4 --warmup_steps 0 \
    --l1_weight 1.0 --lpips_weight 1.0 --kl_weight 1e-8 --vf_weight 0.1 \
    --use_gan --gan_weight 0.05 --freeze_encoder --gan_adaptive_weight \
    --gan_warmup_steps 500 --ema_decay 0.999 \
    --num_epochs 8 --steps_per_epoch 1000 --eval_every_steps 500 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/two_stage_tiny256_s2b
python scripts/record_run.py --run_dir runs/two_stage_tiny256_s2b \
    --name two_stage_tiny256_s2_fixed \
    --note "stage-2 RETAKE with gan_warmup_steps=500 (disc_start analogue): same lineage/flags as the collapsed s2 run otherwise (+gan 0.05 adaptive, frozen encoder, ema 0.999). The un-warmed run pinned at 10.6 dB; this validates the fix end-to-end." || true
git add RESULTS/ && git commit -m "RESULTS: stage-2 retake with discriminator warmup (fix validation)" || true

run 1800 eval_s2b python -m deepl_project_tpu.cli.evaluate \
    --checkpoint runs/two_stage_tiny256_s2b/checkpoints_best --data shapes \
    --resolution 256 --no_lpips --num_batches 8 --rfid \
    --output_dir runs/two_stage_tiny256_s2b/eval_best
python scripts/record_two_stage.py || true
git add RESULTS/ && git commit -m "RESULTS: two-stage record updated with fixed stage-2 eval" || true
echo "[$(stamp)] RETAKE DONE"
