"""Probe: giant-variant (4.84B param) bf16 inference on ONE v5e chip.

fp32 weights are 19.3 GB (> HBM); bf16 params (9.7 GB) + bf16 activations
should fit for encode+decode at 256px. scan_blocks bounds the XLA program.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_giant_inference.py [res] [batch]
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
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.models import init_params

    cfg = get_config("giant", 16, 32).replace(
        param_dtype="bfloat16", scan_blocks=True)
    model = TransVAE(cfg)
    print("initializing 4.84B bf16 params on device...", flush=True)
    t0 = time.time()
    params = init_params(model, jax.random.PRNGKey(0), image_size=32, batch=1)
    print(f"init done in {time.time()-t0:.1f}s", flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, res, res, 3),
                           jnp.bfloat16)

    @jax.jit
    def encode_decode(params, x):
        recon, mu, logvar = model.apply({"params": params}, x, sample=False)
        return recon

    t0 = time.time()
    compiled = encode_decode.lower(params, x).compile()
    print(f"compiled in {time.time()-t0:.1f}s", flush=True)
    fetch = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    float(fetch(compiled(params, x)))
    iters = 5
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = compiled(params, x)
        float(fetch(out))
        best = min(best, time.perf_counter() - t0)
    print(f"GIANT OK: {best/iters*1e3:.0f} ms/batch, "
          f"{batch*iters/best:.2f} img/s @{res}px b{batch}", flush=True)


if __name__ == "__main__":
    main()
