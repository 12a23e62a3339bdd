#!/usr/bin/env python
"""One-time conversion of pretrained LPIPS(VGG16) weights to the .npz format
deepl_project_tpu.losses.lpips loads.

Run on any machine with `pip install lpips torch` and network access:
    python scripts/convert_lpips_weights.py --out deepl_project_tpu/weights/lpips_vgg.npz
then ship the .npz with your deployment (zero-egress TPU hosts can't download).
"""

import argparse

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="deepl_project_tpu/weights/lpips_vgg.npz")
    args = p.parse_args()

    import lpips as lpips_pkg  # noqa: requires network/pretrained cache

    net = lpips_pkg.LPIPS(net="vgg")
    out = {}
    # VGG16 trunk: torchvision features Sequential — conv layers in order.
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    import torch.nn as nn

    idx = 0
    for m in convs:
        if isinstance(m, nn.Conv2d):
            out[f"conv/w{idx}"] = np.transpose(m.weight.detach().numpy(),
                                               (2, 3, 1, 0))  # OIHW→HWIO
            out[f"conv/b{idx}"] = m.bias.detach().numpy()
            idx += 1
    # Linear heads: 1x1 convs [1, C, 1, 1] → [C]
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin/w{i}"] = w.reshape(-1)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} tensors "
          f"({idx} convs, {len(net.lins)} heads)")


if __name__ == "__main__":
    main()
