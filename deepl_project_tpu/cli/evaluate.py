"""Evaluation CLI: reconstruction metrics over a dataset + grids +
metrics.json (ref: evaluate.py:19-33 flags, patched evaluate_transvae.py)."""

from __future__ import annotations

import argparse
import json

import jax

from ..config import get_config
from ..data import batch_iterator, make_dataset
from ..evaluation import evaluate_model
from ..models.transvae import TransVAE, init_params
from ..training.checkpoint import load_config, restore_params


def main(argv=None):
    p = argparse.ArgumentParser(description="Evaluate TransVAE reconstructions")
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (with config.json); random init if absent")
    p.add_argument("--variant", default="tiny")
    p.add_argument("--compression_ratio", type=int, default=16)
    p.add_argument("--data", default="synthetic")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--num_batches", type=int, default=None)
    p.add_argument("--no_lpips", action="store_true")
    p.add_argument("--rfid", action="store_true",
                   help="also compute VGG-feature rFID (relative metric)")
    p.add_argument("--output_dir", default="eval_out")
    p.add_argument("--save_grids", type=int, default=4)
    args = p.parse_args(argv)

    if args.checkpoint:
        cfg = load_config(args.checkpoint)
        model = TransVAE(cfg)
        params = restore_params(args.checkpoint)
    else:
        cfg = get_config(args.variant, args.compression_ratio)
        model = TransVAE(cfg)
        params = init_params(model, jax.random.PRNGKey(0),
                             image_size=args.resolution)
        print("[evaluate] WARNING: no checkpoint given — random weights")

    batches = batch_iterator(
        make_dataset(args.data, resolution=args.resolution), args.batch_size)
    results = evaluate_model(model, params, batches,
                             use_lpips=not args.no_lpips,
                             max_batches=args.num_batches,
                             compute_rfid=args.rfid,
                             output_dir=args.output_dir,
                             save_grids=args.save_grids)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
