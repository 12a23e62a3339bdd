#!/usr/bin/env python
"""Export a trained checkpoint to a PyTorch reference state_dict (.pt).

The inverse of the import path (utils/convert.py): TPU-trained weights load
straight back into the reference implementation
(`/root/reference/transvae-implementation/transvae/models/transvae.py`) with
``load_state_dict(..., strict=False)`` — only the recomputed RoPE inv_freq
buffers are absent. EMA shadow params are preferred when present (they are
what best-checkpoint selection scored).

Usage:
  python scripts/export_to_torch.py --checkpoint runs/x/checkpoints_best \
      --out transvae_ref.pt [--no_ema]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Conversion is host-side work: force the CPU platform so this never opens a
# TPU client (the axon tunnel is single-client and may be held by a training
# run; the plugin ignores the JAX_PLATFORMS env var, so set it via config).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--checkpoint", required=True,
                   help="orbax checkpoint dir (with config.json)")
    p.add_argument("--out", required=True, help="output .pt path")
    p.add_argument("--no_ema", action="store_true",
                   help="export raw params even when an EMA shadow exists")
    args = p.parse_args(argv)

    from deepl_project_tpu.training.checkpoint import (load_config,
                                                       restore_model_params)
    from deepl_project_tpu.utils.convert import params_to_torch_state_dict

    cfg = load_config(args.checkpoint)
    params = restore_model_params(args.checkpoint, prefer_ema=not args.no_ema)
    sd = params_to_torch_state_dict(params, cfg)

    import torch

    torch.save({"model_state_dict": {k: torch.from_numpy(v.copy())
                                     for k, v in sd.items()},
                "config": {"variant": cfg.variant,
                           "compression_ratio": cfg.compression_ratio,
                           "latent_dim": cfg.latent_dim}}, args.out)
    n = sum(v.size for v in sd.values())
    print(f"[export] {len(sd)} tensors / {n / 1e6:.1f}M params -> {args.out}")


if __name__ == "__main__":
    main()
