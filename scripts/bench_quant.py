"""Measure the int8 PTQ serving path: throughput vs bf16, and quality delta.

Throughput: large f16d32 @256px batch 32 encode+decode (the headline bench
shape), float vs quant='int8'.  Quality: if a trained checkpoint is given
(--checkpoint, e.g. runs/tiny256/checkpoints), val PSNR on held-out shapes
for float vs int8 at the checkpoint's resolution.

Usage: python scripts/bench_quant.py [--checkpoint runs/tiny256/checkpoints]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def time_fn(fn, *args, iters=15):
    fetch = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    float(fetch(fn(*args)))  # warmup + fence
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(fetch(out))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def calib_batches(res, n=2, bs=4):
    from deepl_project_tpu.data.datasets import synthetic_shapes_dataset

    imgs = list(synthetic_shapes_dataset(res, num_samples=n * bs, seed=0))
    return [np.stack(imgs[i * bs:(i + 1) * bs]) for i in range(n)]


def throughput(variant="large", res=256, batch=32, param_dtype=None,
               scope="all"):
    from deepl_project_tpu import TransVAE, get_config
    from deepl_project_tpu.models import init_params
    from deepl_project_tpu.quantize import quantize_model

    kw = {"param_dtype": param_dtype} if param_dtype else {}
    cfg = get_config(variant, 16, 32, **kw)
    model = TransVAE(cfg)
    params = init_params(model, jax.random.PRNGKey(0), image_size=res, batch=1)
    x = jax.random.uniform(jax.random.PRNGKey(1), (batch, res, res, 3),
                           jnp.bfloat16)

    f_float = jax.jit(lambda p, x: model.apply({"params": p}, x,
                                               sample=False)[0])
    dt_f = time_fn(f_float, params, x)
    print(f"float  {variant}@{res} b{batch}: {batch/dt_f:7.2f} img/s "
          f"({dt_f*1e3:.1f} ms)", flush=True)

    qmodel, qparams = quantize_model(cfg, params, calib_batches(res),
                                     scope=scope)
    f_q = jax.jit(lambda p, x: qmodel.apply({"params": p}, x,
                                            sample=False)[0])
    dt_q = time_fn(f_q, qparams, x)
    print(f"int8/{scope:8s} {variant}@{res} b{batch}: {batch/dt_q:7.2f} img/s "
          f"({dt_q*1e3:.1f} ms)  speedup {dt_f/dt_q:.3f}x", flush=True)


def quality(checkpoint, scope="all"):
    from deepl_project_tpu.data.datasets import synthetic_shapes_dataset
    from deepl_project_tpu.models import TransVAE
    from deepl_project_tpu.quantize import quantize_model
    from deepl_project_tpu.training.checkpoint import (load_config,
                                                       restore_model_params)
    from deepl_project_tpu.utils.metrics import psnr

    cfg = load_config(checkpoint)
    params = restore_model_params(checkpoint)
    model = TransVAE(cfg)
    res = 256
    val = np.stack(list(synthetic_shapes_dataset(res, num_samples=64,
                                                 seed=777)))
    qmodel, qparams = quantize_model(cfg, params, calib_batches(res),
                                     scope=scope)

    def run(m, p):
        f = jax.jit(lambda p, x: jax.nn.sigmoid(
            m.apply({"params": p}, x, sample=False)[0].astype(jnp.float32)))
        outs = [f(p, val[i:i + 16]) for i in range(0, len(val), 16)]
        recon = jnp.concatenate(outs)
        return float(jnp.mean(psnr(recon, jnp.asarray(val))))

    p_f = run(model, params)
    p_q = run(qmodel, qparams)
    print(f"val PSNR float {p_f:.2f} dB | int8/{scope} {p_q:.2f} dB | "
          f"delta {p_q - p_f:+.2f} dB", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--variant", default="large")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--param_dtype", default=None, choices=["bfloat16"],
                    help="bf16 params (required to fit huge/giant on one "
                         "16 GB chip)")
    ap.add_argument("--scope", default="all",
                    choices=["all", "resblock", "ffn"])
    ap.add_argument("--skip_throughput", action="store_true")
    args = ap.parse_args()
    print(f"devices: {jax.devices()}", flush=True)
    if not args.skip_throughput:
        throughput(args.variant, batch=args.batch,
                   param_dtype=args.param_dtype, scope=args.scope)
    if args.checkpoint:
        quality(args.checkpoint, scope=args.scope)
