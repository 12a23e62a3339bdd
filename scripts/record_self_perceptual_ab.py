#!/usr/bin/env python
"""Combine the self-perceptual A/B legs into RESULTS/self_perceptual_ab.json.

VERDICT r4 item 9: with real VGG-LPIPS weights unobtainable in this
environment (WEIGHTS.md), make the perceptual slot semantically non-random —
the frozen trained encoder as feature net (losses.make_self_perceptual) —
and measure the term's effect vs an l1-only baseline on val PSNR/SSIM and
vgg_rfid. Legs (identical seeds/recipes otherwise, scripts/r5_sitting2.sh):

  runs/ab_l1only      l1=1, lpips=0
  runs/ab_selfpercep  l1=1, lpips=1 with --perceptual self (frozen encoder
                      from the 33.4 dB stage-1 best checkpoint)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from record_run import git_rev, summarize_history  # noqa: E402


def leg(run_dir: str) -> dict:
    out: dict = {}
    hist = os.path.join(run_dir, "history.jsonl")
    if os.path.exists(hist):
        rows = [json.loads(line) for line in open(hist) if line.strip()]
        out["summary"] = summarize_history(rows)
    for tag, path in (("best_ckpt", os.path.join(run_dir, "checkpoints_best",
                                                 "metrics.json")),
                      ("eval_best", os.path.join(run_dir, "eval_best",
                                                 "metrics.json"))):
        if os.path.exists(path):
            with open(path) as f:
                out[tag] = json.load(f)
    return out


def main() -> None:
    a = leg(os.path.join(REPO, "runs", "ab_l1only"))
    b = leg(os.path.join(REPO, "runs", "ab_selfpercep"))
    record = {
        "name": "self_perceptual_ab",
        "git_rev": git_rev(),
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": __doc__.strip(),
        "l1_only": a,
        "self_perceptual": b,
    }

    def pick(leg_rec, key):
        ev = leg_rec.get("eval_best") or {}
        v = ev.get(key)
        if isinstance(v, dict):
            return v.get("mean")
        return v

    record["delta"] = {
        "psnr_l1_only": pick(a, "psnr"),
        "psnr_self_perceptual": pick(b, "psnr"),
        "ssim_l1_only": pick(a, "ssim"),
        "ssim_self_perceptual": pick(b, "ssim"),
        "vgg_rfid_l1_only": pick(a, "vgg_rfid"),
        "vgg_rfid_self_perceptual": pick(b, "vgg_rfid"),
    }
    out = os.path.join(REPO, "RESULTS", "self_perceptual_ab.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"recorded -> {out}")
    print(json.dumps(record["delta"], indent=1))


if __name__ == "__main__":
    main()
