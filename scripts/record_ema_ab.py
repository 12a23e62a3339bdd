#!/usr/bin/env python
"""EMA selection A/B record (VERDICT r4 weak #5): does EMA-preferred
best-checkpoint selection actually beat raw-param selection, or does the
shadow just lag?

Legs (identical recipe, seed 42, tiny @256 shapes, 6x1000 steps, ema 0.999):
  cosine LR   — runs/two_stage_tiny256 (the r4 stage-1 run; no dip regime)
  constant LR — runs/ema_ab_constlr (the r3 dip regime: r3 saw the final
                val PSNR end 2.6 dB below its best under constant LR)

Decision rule written into the record: EMA-preferred selection stays the
default only if, in at least one leg, best(val_psnr_ema) >= best(val_psnr)
- 0.1 dB AND the EMA curve is smoother (fewer >0.5 dB eval-to-eval drops);
otherwise selection should be gated on a measured benefit.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

from record_run import _ordered, git_rev  # noqa: E402


def leg(run_dir: str) -> dict | None:
    path = os.path.join(run_dir, "history.jsonl")
    if not os.path.exists(path):
        return None
    rows = _ordered([json.loads(l) for l in open(path) if l.strip()])
    val = [r for r in rows if r.get("kind") == "val" and "val_psnr" in r]
    if not val:
        return None
    out = {
        "n_evals": len(val),
        "best_raw": max(r["val_psnr"] for r in val),
        "final_raw": val[-1]["val_psnr"],
        "curve": [{"step": r["step"], "raw": round(r["val_psnr"], 3),
                   **({"ema": round(r["val_psnr_ema"], 3)}
                      if "val_psnr_ema" in r else {})} for r in val],
    }
    emas = [r["val_psnr_ema"] for r in val if "val_psnr_ema" in r]
    if emas:
        out["best_ema"] = max(emas)
        out["final_ema"] = emas[-1]
        out["ema_beats_raw_selection"] = out["best_ema"] >= out["best_raw"] - 0.1

        def drops(series):
            return sum(1 for a, b in zip(series, series[1:]) if a - b > 0.5)

        raws = [r["val_psnr"] for r in val if "val_psnr_ema" in r]
        out["raw_drops_gt_0p5db"] = drops(raws)
        out["ema_drops_gt_0p5db"] = drops(emas)
        out["end_of_run_dip_raw"] = round(out["best_raw"] - out["final_raw"], 3)
        out["end_of_run_dip_ema"] = round(out["best_ema"] - out["final_ema"], 3)
    return out


def main() -> None:
    cos = leg(os.path.join(REPO, "runs", "two_stage_tiny256"))
    con = leg(os.path.join(REPO, "runs", "ema_ab_constlr"))
    record = {
        "name": "ema_ab",
        "git_rev": git_rev(),
        "recorded_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "note": __doc__.strip(),
        "cosine_lr": cos,
        "constant_lr": con,
    }
    legs = [x for x in (cos, con) if x and "best_ema" in x]
    if legs:
        helps = any(x["ema_beats_raw_selection"] and
                    x["ema_drops_gt_0p5db"] <= x["raw_drops_gt_0p5db"]
                    for x in legs)
        record["decision"] = (
            "KEEP EMA-preferred best-checkpoint selection as the default"
            if helps else
            "GATE EMA-preferred selection: no measured leg showed the EMA "
            "shadow matching raw best AND smoothing the curve — prefer raw "
            "val_psnr for selection until a run shows the benefit")
        record["ema_helps"] = helps
    out = os.path.join(REPO, "RESULTS", "ema_ab.json")
    with open(out, "w") as f:
        json.dump(record, f, indent=1)
    print(f"recorded -> {out}")
    print(json.dumps({k: record.get(k) for k in ("decision", "ema_helps")},
                     indent=1))


if __name__ == "__main__":
    main()
