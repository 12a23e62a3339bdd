#!/bin/bash
# Stage-2 retake, attempt 4 (r5): warmup + ramp + clamp + DISC LOSS FLOOR.
#
# History of this lineage (all from the same 33.4 dB stage-1 checkpoint):
#   attempt 1 (r4, no warmup):   adaptive weight exploded 41.9x against the
#                                random discriminator -> 10.6 dB, pinned.
#   attempt 2 (r4/r5, warmup):   gate-only. 500 disc-only steps produced a
#                                near-converged discriminator (hinge ~1e-4);
#                                the step-function handoff collapsed recon
#                                again: 33.5 -> 7.3 dB within 500 steps.
#                                Preserved in runs/two_stage_tiny256_s2b_warmuponly.
#   attempt 3 (ramp+clamp):      held a healthy equilibrium for 400 ramp
#                                steps (disc hinge ~1.8, logits ~0), then D
#                                abruptly achieved near-perfect separation
#                                (hinge -> 0.0, real-logit mean 4.6) and the
#                                runaway destroyed recon in 100 steps
#                                (l1 0.016 -> 0.22, val 32.7 -> 11.8 raw).
#                                RESULTS/two_stage_tiny256_s2_rampclamp.json.
#   attempt 4 (this script):     + gan_disc_loss_floor 0.6 — D's updates are
#                                zeroed while it is already winning (the
#                                classic "don't let D win" control), cutting
#                                the runaway at its root. Breaker now watches
#                                RAW val PSNR (the EMA lags a collapse).
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
    --gan_warmup_steps 500 --gan_ramp_steps 1000 --gan_adaptive_max 1.0 \
    --gan_disc_loss_floor 0.6 --ema_decay 0.999 \
    --num_epochs 8 --steps_per_epoch 1000 --eval_every_steps 500 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/two_stage_tiny256_s2b
python scripts/record_run.py --run_dir runs/two_stage_tiny256_s2b \
    --name two_stage_tiny256_s2_fixed \
    --note "stage-2 RETAKE (attempt 4) with gan_warmup_steps=500 + gan_ramp_steps=1000 + adaptive clamp 1.0 + disc_loss_floor 0.6: same lineage/flags as the collapsed runs otherwise (+gan 0.05 adaptive, frozen encoder, ema 0.999). Attempt 1 (no warmup) exploded 41.9x -> 10.6 dB; attempt 2 (gate only) collapsed 33.5 -> 7.3 at the step handoff; attempt 3 (ramp+clamp, no floor) held 400 healthy steps then D won abruptly (hinge -> 0) and destroyed recon. The floor freezes a winning D until G catches up." || true
git add RESULTS/ && git commit -m "RESULTS: stage-2 retake with warmup+ramp+clamp (fix validation)" || true

run 1800 eval_s2b python -m deepl_project_tpu.cli.evaluate \
    --checkpoint runs/two_stage_tiny256_s2b/checkpoints_best --data shapes \
    --resolution 256 --no_lpips --num_batches 8 --rfid \
    --output_dir runs/two_stage_tiny256_s2b/eval_best
python scripts/record_two_stage.py || true
git add RESULTS/ && git commit -m "RESULTS: two-stage record updated with fixed stage-2 eval" || true
echo "[$(stamp)] RETAKE3 DONE"
