"""Measure the REFERENCE PyTorch model's forward FLOPs per image.

Pins bench.py's A100 denominator (VERDICT round-1, Weak-2): the baseline must
be what an A100 running the *reference architecture* would execute, not this
repo's compiled FLOPs — otherwise exact FLOP reductions (e.g. the fused
Upsample main path, 2.25x fewer FLOPs) shrink the numerator AND raise the
target, punishing optimization.

Method: load the reference package (/root/reference, import-aliased exactly as
tests/test_parity.py does — nothing is copied), build the requested variant on
the meta device, and run torch.utils.flop_counter.FlopCounterMode over
encode+decode at the benchmark shape. FlopCounterMode counts 2*MACs for
matmuls/convs — the same convention as XLA's cost analysis and the MFU
arithmetic in PERFORMANCE.md.

Usage:
  python scripts/reference_flops.py [--variant large] [--res 256]

The measured constants are pinned in deepl_project_tpu/utils/flops.py;
re-run this script to re-derive them.
"""

from __future__ import annotations

import argparse
import importlib.util
import os
import sys
import types

REF_PATH = "/root/reference/transvae-implementation"


def load_reference_package():
    sys.modules.setdefault("lpips", types.ModuleType("lpips"))
    pkg_dir = os.path.join(REF_PATH, "transvae")
    spec = importlib.util.spec_from_file_location(
        "ref_transvae", os.path.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir])
    module = importlib.util.module_from_spec(spec)
    sys.modules["ref_transvae"] = module
    spec.loader.exec_module(module)
    return module


VARIANTS = {  # (depths, base_dims) — reference transvae.py:110-147
    "tiny_f16d32": ([3, 3, 3, 3, 3], [128, 128, 256, 256, 512]),
    "base_f16d32": ([3, 3, 3, 3, 3], [128, 128, 256, 512, 1024]),
    "large_f16d32": ([3, 3, 3, 4, 6], [192, 192, 384, 768, 1536]),
    "huge_f16d32": ([3, 3, 4, 6, 8], [256, 256, 512, 1024, 2048]),
    "giant_f16d32": ([3, 3, 4, 8, 10], [320, 320, 640, 1280, 2560]),
    "large_f8d16": ([3, 3, 6, 8], [192, 384, 768, 1536]),
}


def measure(variant: str = "large", f: int = 16, d: int = 32,
            res: int = 256) -> float:
    """Reference encode+decode forward FLOPs per image (counted, fp-agnostic)."""
    import torch
    from torch.utils.flop_counter import FlopCounterMode

    load_reference_package()
    from ref_transvae.models.transvae import TransVAE as RefTransVAE

    depths, dims = VARIANTS[f"{variant}_f{f}d{d}"]
    cfg = {"depths": depths, "base_dims": dims, "mlp_ratio": 1.0,
           "head_dim": 64}
    with torch.device("meta"):
        model = RefTransVAE(cfg, variant=variant, compression_ratio=f,
                            latent_dim=d).eval()
        x = torch.zeros(1, 3, res, res)
        counter = FlopCounterMode(display=False)
        with counter, torch.no_grad():
            mu, logvar = model.encode(x)
            model.decode(mu)  # sample=False path: decode(mu)
    return float(counter.get_total_flops())


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="large")
    p.add_argument("--f", type=int, default=16)
    p.add_argument("--d", type=int, default=32)
    p.add_argument("--res", type=int, default=256)
    args = p.parse_args()
    flops = measure(args.variant, args.f, args.d, args.res)
    print(f"{args.variant}_f{args.f}d{args.d} @{args.res}px: "
          f"{flops / 1e12:.4f} TFLOPs/image (encode+decode forward)")


if __name__ == "__main__":
    main()
