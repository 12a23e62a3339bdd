#!/usr/bin/env python
"""RoPE resolution-extrapolation reproduction: PSNR at 256/512/1024 from a
256-trained checkpoint (ref: scripts/reproduce/test_rope_extrapolation.py).

    python scripts/reproduce/test_rope_extrapolation.py --checkpoint <dir> \
        --data <image folder> [--resolutions 256 512 1024]
"""

import argparse
import json

import numpy as np

from deepl_project_tpu.data import batch_iterator, make_dataset
from deepl_project_tpu.evaluation import extrapolation_sweep
from deepl_project_tpu.models.transvae import TransVAE
from deepl_project_tpu.training.checkpoint import load_config, restore_params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data", default="synthetic")
    p.add_argument("--resolutions", type=int, nargs="+",
                   default=[256, 512, 1024])
    p.add_argument("--num_images", type=int, default=16)
    p.add_argument("--rfid", action="store_true",
                   help="also compute (vgg_)rfid per resolution (paper "
                        "Table 1 reports rFID and PSNR per resolution)")
    p.add_argument("--chunk", type=int, default=8,
                   help="per-forward batch bound (1024px stage-2 is N=65k "
                        "tokens; a full large batch does not fit)")
    args = p.parse_args()

    cfg = load_config(args.checkpoint)
    model = TransVAE(cfg)
    params = restore_params(args.checkpoint)

    max_res = max(args.resolutions)
    batch = next(batch_iterator(
        make_dataset(args.data, resolution=max_res), args.num_images))
    results = extrapolation_sweep(model, params, batch,
                                  tuple(args.resolutions),
                                  compute_rfid=args.rfid, chunk=args.chunk)
    print(json.dumps({str(k): v for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
