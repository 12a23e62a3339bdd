"""Probe: does the large-f16d32 @256px training step compile+run on this chip?

Known blocker (PERFORMANCE.md): the tunnel's remote XLA compile helper failed
(HTTP 500) on the large-variant backward at >=128px in the first session.
Re-probing with scan_blocks + remat 'dots' and a persistent compile cache.

Usage: timeout 3600 python scripts/probe_large_train.py [res] [batch]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.losses.vae_loss import LossWeights
    from deepl_project_tpu.models import init_params
    from deepl_project_tpu.training import (init_train_state, make_optimizer,
                                            make_train_step)

    def env_flag(name, default):
        return os.environ.get(name, "1" if default else "0") not in ("0", "")

    cfg = get_config(os.environ.get("PROBE_VARIANT", "large"), 16, 32).replace(
        remat=env_flag("PROBE_REMAT", True),
        remat_policy=os.environ.get("PROBE_REMAT_POLICY", "dots"),
        scan_blocks=env_flag("PROBE_SCAN", True),
        norm_latents=True,
        remat_resample=env_flag("PROBE_REMAT_RESAMPLE", True),
        attention_impl=os.environ.get("PROBE_ATTN", "auto_train"))
    model = TransVAE(cfg)
    rng = jax.random.PRNGKey(0)
    params = {"model": init_params(model, rng, image_size=res, batch=1)}
    tx = make_optimizer(learning_rate=1e-4, warmup_steps=100,
                        mu_dtype=os.environ.get("PROBE_MU_DTYPE"),
                        optimizer=os.environ.get("PROBE_OPTIMIZER", "adamw"))
    state = init_train_state(params, tx)
    step = make_train_step(model, tx, weights=LossWeights(l1=1.0, kl=1e-8),
                           donate=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, res, res, 3),
                           jnp.float32)
    print(f"lowering large@{res} b{batch} train step...", flush=True)
    t0 = time.time()
    lowered = step.lower(state, x, rng)
    print(f"lowered in {time.time()-t0:.1f}s; compiling...", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"COMPILED in {time.time()-t0:.1f}s", flush=True)

    state, metrics = compiled(state, x, rng)
    loss = float(metrics["total"])
    print(f"step 1 ran: loss={loss:.4f}", flush=True)
    t0 = time.time()
    iters = 5
    for _ in range(iters):
        state, metrics = compiled(state, x, rng)
    loss = float(metrics["total"])  # readback fence (tunnel)
    dt = (time.time() - t0) / iters
    print(f"PROBE OK: {dt*1e3:.0f} ms/step, {batch/dt:.1f} img/s, "
          f"loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
