#!/usr/bin/env python
"""One-time conversion of LPIPS(VGG16) weights to the .npz format
deepl_project_tpu.losses.lpips loads.

Sources (--source):
  auto (default)  pip `lpips` package when importable (pretrained weights),
                  else the local reimplementation scripts/torch_lpips.py
                  (seeded random — exercises the conversion + parity path in
                  zero-egress environments; quality needs real weights).
  lpips           require the pip package.
  local           force the local reimplementation (--seed controls init).

On a machine with network access:
    pip install lpips torch
    python scripts/convert_lpips_weights.py --out deepl_project_tpu/weights/lpips_vgg.npz
then ship the .npz (zero-egress TPU hosts can't download).
"""

import argparse
import os
import sys

import numpy as np


def build_net(source: str, seed: int):
    if source in ("auto", "lpips"):
        try:
            import lpips as lpips_pkg

            return lpips_pkg.LPIPS(net="vgg"), "lpips-pip (pretrained)"
        except ImportError:
            if source == "lpips":
                raise
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from torch_lpips import LPIPS

    return LPIPS(net="vgg", seed=seed), f"local reimplementation (seed {seed})"


def extract(net) -> dict:
    """Pull conv trunk + linear heads out of an lpips-shaped module into the
    npz schema losses/lpips.py loads (HWIO convs, flat head vectors)."""
    import torch.nn as nn

    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    idx = 0
    for m in convs:
        if isinstance(m, nn.Conv2d):
            out[f"conv/w{idx}"] = np.transpose(m.weight.detach().numpy(),
                                               (2, 3, 1, 0))  # OIHW→HWIO
            out[f"conv/b{idx}"] = m.bias.detach().numpy()
            idx += 1
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin/w{i}"] = w.reshape(-1)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="deepl_project_tpu/weights/lpips_vgg.npz")
    p.add_argument("--source", default="auto",
                   choices=["auto", "lpips", "local"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    net, desc = build_net(args.source, args.seed)
    out = extract(net)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    nconv = sum(1 for k in out if k.startswith("conv/w"))
    print(f"wrote {args.out} from {desc}: {len(out)} tensors "
          f"({nconv} convs, {len(net.lins)} heads)")


if __name__ == "__main__":
    main()
