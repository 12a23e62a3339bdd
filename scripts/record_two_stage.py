#!/usr/bin/env python
"""Combine the two-stage lineage (r3 VERDICT item 3) into one record:
RESULTS/two_stage_tiny256.json — stage-1 vs stage-2 val PSNR/SSIM +
(vgg_)rfid from the best-checkpoint evals, plus the stage-2 adaptive-GAN
weight trace and discriminator stats.

Reads runs/two_stage_tiny256{,_s2}/{history.jsonl,eval_best/metrics.json}.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from record_run import _ordered, git_rev, summarize_history  # noqa: E402

S1 = os.path.join(REPO, "runs", "two_stage_tiny256")
S2 = os.path.join(REPO, "runs", "two_stage_tiny256_s2")
# Retake with the discriminator-warmup fix (scripts/r4_retake.sh); recorded
# as its own section when present so the collapsed run stays on the record.
S2B = os.path.join(REPO, "runs", "two_stage_tiny256_s2b")


def load_rows(run_dir: str) -> list[dict]:
    path = os.path.join(run_dir, "history.jsonl")
    if not os.path.exists(path):
        return []
    return [json.loads(line) for line in open(path) if line.strip()]


def load_eval(run_dir: str) -> dict | None:
    path = os.path.join(run_dir, "eval_best", "metrics.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def best_meta(run_dir: str) -> dict | None:
    path = os.path.join(run_dir, "checkpoints_best", "metrics.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def main() -> None:
    import time

    rows1, rows2 = load_rows(S1), load_rows(S2)
    record = {
        "name": "two_stage_tiny256",
        "git_rev": git_rev(),
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": ("Full two-stage recipe on ONE checkpoint lineage "
                 "(ref README.md:160-190): stage-1 l1=1 lpips=1 (RANDOM-HEAD "
                 "VGG — no pretrained weights in this env, WEIGHTS.md) "
                 "kl=1e-8 vf=0.1 (stub teacher), then stage-2 +gan 0.05 "
                 "(PatchGAN hinge), frozen encoder, VQGAN adaptive weight, "
                 "both with EMA 0.999 + best-ckpt retention. Metrics use the "
                 "VGG-feature rFID fallback."),
        "stage1": {
            "summary": summarize_history(rows1),
            "best_ckpt": best_meta(S1),
            "eval_best": load_eval(S1),
        },
        "stage2": {
            "summary": summarize_history(rows2),
            "best_ckpt": best_meta(S2),
            "eval_best": load_eval(S2),
        },
    }
    if os.path.isdir(S2B):
        record["stage2_fixed"] = {
            "note": ("stage-2 retake (attempt 5): both-fresh co-evolution — "
                     "no disc warmup/ramp, adaptive ratio clamped down-only "
                     "at 1.0 (kills the 41.9x explosion of attempt 1), "
                     "disc_loss_floor 1.0 (D's updates freeze while it wins "
                     "on average). Attempts 1-4 each collapsed and are "
                     "recorded as negative results (s2, _warmuponly, "
                     "_rampclamp, _floor06): ANY discriminator head start "
                     "destabilized the generator"),
            "summary": summarize_history(load_rows(S2B)),
            "best_ckpt": best_meta(S2B),
            "eval_best": load_eval(S2B),
        }

    # Adaptive-GAN-weight + discriminator trace (stage 2 train rows).
    trace = [
        {"step": r["step"],
         "adaptive_gan_weight": round(r["adaptive_gan_weight"], 5),
         "gan": round(r.get("gan", 0.0), 5),
         "disc_loss": round(r.get("disc_loss", 0.0), 5),
         "disc_real_mean": round(r.get("disc_real_mean", 0.0), 4),
         "disc_fake_mean": round(r.get("disc_fake_mean", 0.0), 4)}
        for r in _ordered(rows2)
        if r.get("kind") == "train" and "adaptive_gan_weight" in r]
    record["stage2"]["adaptive_weight_trace"] = trace

    # Headline delta: stage-2 best vs stage-1 best (EMA-selected PSNR).
    def sel(stage):
        bm = record[stage]["best_ckpt"] or {}
        return bm.get("val_psnr_ema", bm.get("val_psnr"))

    record["delta"] = {
        "stage1_best_val_psnr": sel("stage1"),
        "stage2_best_val_psnr": sel("stage2"),
    }
    if "stage2_fixed" in record:
        record["delta"]["stage2_fixed_best_val_psnr"] = sel("stage2_fixed")
    e1, e2 = record["stage1"]["eval_best"], record["stage2"]["eval_best"]
    if e1 and e2:
        key = "rfid" if "rfid" in e1 else "vgg_rfid"
        record["delta"]["eval_psnr_mean"] = [e1["psnr"]["mean"],
                                             e2["psnr"]["mean"]]
        record["delta"]["eval_ssim_mean"] = [e1["ssim"]["mean"],
                                             e2["ssim"]["mean"]]
        record["delta"][f"eval_{key}"] = [e1.get(key), e2.get(key)]

    out = os.path.join(REPO, "RESULTS", "two_stage_tiny256.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"recorded -> {out}")
    print(json.dumps(record["delta"]))


if __name__ == "__main__":
    main()
