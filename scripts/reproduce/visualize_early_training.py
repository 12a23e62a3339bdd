#!/usr/bin/env python
"""Early-training reconstruction snapshots (ref:
scripts/reproduce/visualize_early_training.py): train briefly, dump
reconstruction + |difference| grids at chosen steps.

    python scripts/reproduce/visualize_early_training.py --steps 512 1500 6000
"""

import argparse
import os

import jax
import numpy as np

from deepl_project_tpu import TransVAE, get_config
from deepl_project_tpu.data import batch_iterator, make_dataset
from deepl_project_tpu.losses import LossWeights
from deepl_project_tpu.models.transvae import init_params
from deepl_project_tpu.training import (init_train_state, make_optimizer,
                                        make_train_step)
from deepl_project_tpu.utils.image import make_grid, save_image


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", default="tiny")
    p.add_argument("--data", default="synthetic")
    p.add_argument("--resolution", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, nargs="+", default=[512, 1500, 6000])
    p.add_argument("--output_dir", default="early_training_viz")
    args = p.parse_args()

    cfg = get_config(args.variant)
    model = TransVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = {"model": init_params(model, rng, image_size=args.resolution)}
    tx = make_optimizer(1e-4, warmup_steps=1000)
    state = init_train_state(params, tx)
    step_fn = make_train_step(model, tx,
                              LossWeights(lpips=0.0, vf=0.0, gan=0.0))

    data = batch_iterator(make_dataset(args.data, resolution=args.resolution,
                                       num_samples=10 ** 9), args.batch_size)
    viz_batch = next(data)
    os.makedirs(args.output_dir, exist_ok=True)

    snapshots = set(args.steps)
    for i in range(max(snapshots) + 1):
        state, metrics = step_fn(state, next(data), rng)
        if i in snapshots:
            from deepl_project_tpu.evaluation import reconstruct

            recon = reconstruct(model, state.params, viz_batch)
            diff = np.abs(recon - viz_batch)
            grid = np.concatenate([viz_batch, recon, diff / diff.max()], axis=0)
            save_image(make_grid(grid, nrow=len(viz_batch)),
                       os.path.join(args.output_dir, f"step_{i:06d}.png"))
            print(f"step {i}: loss {float(metrics['total']):.4f} — saved grid")


if __name__ == "__main__":
    main()
