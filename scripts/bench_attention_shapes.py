"""Focused attention micro-bench at the in-model shapes (large @256, batch 32).

Times each dispatch path at stage-2/3/4 shapes to validate the auto/auto_train
thresholds at production batch sizes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_attention_shapes.py
"""

import jax
import jax.numpy as jnp

from bench_util import setup_cache
from bench_util import timed as _timed

setup_cache()


def timed(fn, *args, iters=20):
    return _timed(fn, *args, iters=iters)[0]


def main():
    from deepl_project_tpu.ops.attention import (core_attention, xla_attention,
                                                 xla_attention_chunked)

    rng = jax.random.PRNGKey(0)
    shapes = [  # (batch, n, heads, head_dim) — large @256px stages 2/3/4
        (32, 4096, 6, 64),
        (32, 1024, 12, 64),
        (32, 256, 24, 64),
    ]
    for b, n, h, d in shapes:
        ks = jax.random.split(rng, 3)
        q, k, v = (jax.random.normal(key, (b, n, h, d), jnp.bfloat16)
                   for key in ks)
        scale = d ** -0.5
        print(f"-- b={b} n={n} h={h} d={d}", flush=True)
        rows = [("xla_full", lambda q, k, v: xla_attention(q, k, v, scale))]
        for chunk in (512, 1024, 2048):
            if n % chunk == 0 and n > chunk:
                rows.append((f"xla_chunked{chunk}",
                             lambda q, k, v, c=chunk: xla_attention_chunked(
                                 q, k, v, scale, chunk=c)))
        if n % 512 == 0 and n >= 1024:
            rows.append(("pallas", lambda q, k, v: core_attention(
                q, k, v, scale, impl="pallas")))
        for name, fn in rows:
            try:
                dt = timed(fn, q, k, v)
                flops = 4 * b * h * n * n * d
                print(f"  {name:16s} {dt*1e3:8.2f} ms  "
                      f"{flops/dt/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:16s} FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
