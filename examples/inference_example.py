#!/usr/bin/env python
"""Minimal inference example (ref: inference_example.py:34-80): load a
checkpoint, encode an image (use mu — no sampling), decode, save side-by-side.
"""

import argparse

import numpy as np

from deepl_project_tpu.data import preprocess_file
from deepl_project_tpu.evaluation import reconstruct
from deepl_project_tpu.models.transvae import TransVAE
from deepl_project_tpu.training.checkpoint import load_config, restore_params
from deepl_project_tpu.utils.image import make_grid, save_image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True, help="checkpoint directory")
    p.add_argument("--image", required=True)
    p.add_argument("--out", default="reconstruction.png")
    p.add_argument("--resolution", type=int, default=256)
    args = p.parse_args()

    model = TransVAE(load_config(args.checkpoint))
    params = restore_params(args.checkpoint)
    x = preprocess_file(args.image, args.resolution)[None]
    recon = reconstruct(model, params, x)
    save_image(make_grid(np.concatenate([x, recon]), nrow=2), args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
