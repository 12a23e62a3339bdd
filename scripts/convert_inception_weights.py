#!/usr/bin/env python
"""One-time conversion of InceptionV3 weights to the .npz that
deepl_project_tpu.utils.inception loads (rFID backbone).

BatchNorm is folded into the conv (exact in eval mode):
  scale = gamma / sqrt(running_var + eps)
  w'    = w * scale (per out-channel),  b' = beta - running_mean * scale
so the JAX side is conv+bias+relu.

Sources (--source):
  auto (default)  torchvision inception_v3 pretrained when importable, else
                  the local reimplementation scripts/torch_inception.py
                  (seeded random — exercises conversion + parity offline).
  torchvision     require torchvision pretrained weights.
  local           force the local reimplementation (--seed controls init).

On a machine with network access:
    pip install torch torchvision
    python scripts/convert_inception_weights.py --out deepl_project_tpu/weights/inception_v3.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def build_net(source: str, seed: int):
    from torch_inception import InceptionV3Features

    if source in ("auto", "torchvision"):
        try:
            from torchvision.models import Inception_V3_Weights, inception_v3

            tv = inception_v3(weights=Inception_V3_Weights.IMAGENET1K_V1)
            net = InceptionV3Features(seed=seed)
            net.load_torchvision_state_dict(tv.state_dict())
            return net, "torchvision (pretrained)"
        except ImportError:
            if source == "torchvision":
                raise
    return (InceptionV3Features(seed=seed),
            f"local reimplementation (seed {seed})")


def extract(net) -> dict:
    """Fold each BasicConv2d's BN into conv w/b; emit HWIO + bias npz."""
    from deepl_project_tpu.utils.inception_spec import conv_specs

    out = {}
    for name in conv_specs():
        m = net
        for part in name.split("."):
            m = getattr(m, part)
        w = m.conv.weight.detach().numpy()  # OIHW
        bn = m.bn
        scale = (bn.weight.detach().numpy() /
                 np.sqrt(bn.running_var.detach().numpy() + bn.eps))
        w = w * scale[:, None, None, None]
        b = (bn.bias.detach().numpy() -
             bn.running_mean.detach().numpy() * scale)
        out[f"{name}/w"] = np.transpose(w, (2, 3, 1, 0))  # OIHW→HWIO
        out[f"{name}/b"] = b.astype(np.float32)
    return out


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out",
                   default="deepl_project_tpu/weights/inception_v3.npz")
    p.add_argument("--source", default="auto",
                   choices=["auto", "torchvision", "local"])
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    net, desc = build_net(args.source, args.seed)
    out = extract(net)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} from {desc}: {len(out)} tensors "
          f"({len(out) // 2} folded convs)")


if __name__ == "__main__":
    main()
