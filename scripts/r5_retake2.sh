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
#   attempt 4 (warmup+floor):    the floor froze a winning D correctly, but
#                                G still degraded against the FROZEN D it had
#                                never co-adapted to (l1 0.016 -> 0.27 at
#                                scale 0.6-0.8). The WARMUP is the root
#                                defect: it hands D an edge. r3's stable
#                                fixed-weight run co-evolved both nets from
#                                scratch. RESULTS/..._s2_floor06.json.
#   attempt 5 (coevo+adaptive):  the game stayed balanced exactly as designed
#                                (hinge ~2.0, logits ~0) — but the gen
#                                grad_norm exploded 9.8 -> inf in 600 steps:
#                                a D-SLOPE arms race (hinge bounds outputs,
#                                not Lipschitz). RESULTS/..._s2_coevo_adaptive.
#   attempt 6 (fixed, no R1):    the reference's exact recipe (r3-stable for
#                                13k steps from a 27.9 dB ckpt) ALSO explodes
#                                from the 33.4 dB ckpt — same slope-race
#                                signature (gn 32 -> inf in 300 steps). A
#                                better G forces D to sharpen its boundary;
#                                the race is a property of the lineage.
#                                RESULTS/..._s2_fixed_nor1.json.
#   attempt 7 (this script):     fixed weight + R1 gradient penalty gamma=10
#                                (bounds D's slope directly — the quantity
#                                every prior collapse rode) + floor 0.6 as
#                                the second line of defense.
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
    --use_gan --gan_weight 0.05 --freeze_encoder \
    --gan_warmup_steps 0 --gan_ramp_steps 1 \
    --gan_disc_loss_floor 0.6 --gan_r1_gamma 10 --ema_decay 0.999 \
    --num_epochs 8 --steps_per_epoch 1000 --eval_every_steps 500 \
    --val_batches 8 --save_every_steps 2000 --seed 42 \
    --output_dir runs/two_stage_tiny256_s2b
python scripts/record_run.py --run_dir runs/two_stage_tiny256_s2b \
    --name two_stage_tiny256_s2_fixed \
    --note "stage-2 RETAKE (attempt 7): the reference's stage-2 recipe (FIXED gan_weight 0.05, frozen encoder, co-evolution; ref README.md:160-190) + R1 gradient penalty gamma=10 on the discriminator + disc_loss_floor 0.6, from the 33.4 dB stage-1 checkpoint, ema 0.999, divergence breaker on raw val PSNR. Six prior attempts across every schedule-side control collapsed with the same measured signature — gen grad_norm exploding through the discriminator's growing slope (hinge bounds D's outputs, not its Lipschitz constant) — recorded as RESULTS/two_stage_tiny256_s2_*.json negative results. R1 bounds the slope itself." || true
git add RESULTS/ && git commit -m "RESULTS: stage-2 retake with warmup+ramp+clamp (fix validation)" || true

run 1800 eval_s2b python -m deepl_project_tpu.cli.evaluate \
    --checkpoint runs/two_stage_tiny256_s2b/checkpoints_best --data shapes \
    --resolution 256 --no_lpips --num_batches 8 --rfid \
    --output_dir runs/two_stage_tiny256_s2b/eval_best
python scripts/record_two_stage.py || true
git add RESULTS/ && git commit -m "RESULTS: two-stage record updated with fixed stage-2 eval" || true
echo "[$(stamp)] RETAKE3 DONE"
